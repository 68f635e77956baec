"""Deterministic top-k selection and merge primitives.

The reference gets global ranking determinism for free from Postgres's
``ORDER BY distance`` single scan (``orm/repository/base.py:409-415``). On a
sharded TPU index, per-shard candidates must merge to a *shard-count-invariant*
global ranking, so every selection in this framework orders by the composite
key ``(-score, doc_id)``: higher score first, ties broken by smaller id.
``jax.lax.sort`` with ``num_keys=2`` implements the lexicographic order
exactly, and ``jax.lax.top_k``'s lower-index-first tie rule is compatible with
it when per-tile indices are ascending.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# canonical pad sentinels shared by every kernel wrapper (dense.py re-exports
# them): large-FINITE score to avoid inf arithmetic on the VPU, INT_MAX id so
# pads always lose the (-score, id) tie-break
NEG_INF = -3.4e38
INT_MAX = 2**31 - 1


def pad_to_k(
    scores: jax.Array, ids: jax.Array, k: int, k_eff: int
) -> tuple[jax.Array, jax.Array]:
    """Pad [..., k_eff] results out to the caller's k with the sentinels
    (the shared epilogue of every top-k wrapper)."""
    if k_eff >= k:
        return scores, ids
    pad = [(0, 0)] * (scores.ndim - 1) + [(0, k - k_eff)]
    return (
        jnp.pad(scores, pad, constant_values=NEG_INF),
        jnp.pad(ids, pad, constant_values=INT_MAX),
    )


def sort_topk(scores: jax.Array, ids: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k along the last axis by ``(-score, id)`` lexicographic order.

    scores: [..., M] float; ids: [..., M] int. Returns ([..., k], [..., k]) —
    padded with the sentinels when fewer than k candidates exist, so the
    return shape contract holds for every M.
    """
    neg_scores, sorted_ids = jax.lax.sort(
        (-scores.astype(jnp.float32), ids), num_keys=2
    )
    out_s, out_i = -neg_scores[..., :k], sorted_ids[..., :k]
    return pad_to_k(out_s, out_i, k, out_s.shape[-1])


def merge_topk(
    parts_scores: jax.Array, parts_ids: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge per-shard/per-tile candidate lists into one deterministic top-k.

    parts_scores/ids: [..., P, K'] — P candidate lists per query row.
    Flattens the last two axes and re-selects with :func:`sort_topk`, so the
    result is invariant to how candidates were partitioned.
    """
    flat_scores = parts_scores.reshape(*parts_scores.shape[:-2], -1)
    flat_ids = parts_ids.reshape(*parts_ids.shape[:-2], -1)
    return sort_topk(flat_scores, flat_ids, k)
