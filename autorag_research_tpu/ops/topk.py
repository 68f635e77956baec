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

NEG_INF = jnp.float32(-jnp.inf)


def sort_topk(scores: jax.Array, ids: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k along the last axis by ``(-score, id)`` lexicographic order.

    scores: [..., M] float; ids: [..., M] int. Returns ([..., k], [..., k]).
    """
    neg_scores, sorted_ids = jax.lax.sort(
        (-scores.astype(jnp.float32), ids), num_keys=2
    )
    return -neg_scores[..., :k], sorted_ids[..., :k]


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
