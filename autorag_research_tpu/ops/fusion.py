"""Hybrid fusion: Reciprocal Rank Fusion and Convex Combination.

Exact behavioral parity with the reference's fusers
(``pipelines/retrieval/hybrid.py:46-177``):

- RRF: ``score(d) = sum_i 1/(k + rank_i(d))`` with rank starting at 1;
  documents missing from one list contribute ``1/(k + fetch_k + 1)`` for that
  list (missing-rank floor).
- CC: ``weight * norm(s1) + (1-weight) * norm(s2)`` with normalization in
  {mm, tmm, z, dbsf}; documents missing from a list take that method's
  post-normalization floor (0, 0, -3, 0).
- Ties in the fused ranking break deterministically by doc id (the reference
  relies on Python's stable sort of insertion order; id order is the
  shard-stable equivalent used across this framework).

``fuse_batch_*`` are vectorized jnp versions that fuse whole query batches of
padded candidate arrays on device.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from autorag_research_tpu.utils.normalize import (
    MISSING_SCORE_FLOORS,
    normalize_dbsf,
    normalize_minmax,
    normalize_tmm,
    normalize_zscore,
)

Hit = dict[str, Any]  # {"doc_id", "score"}


def id_tiebreak_sort(items, score_of, id_of):
    """Sort by (-score, doc_id) — the framework-wide deterministic order that
    matches sort_topk on device. Falls back to string ids only when a
    collection mixes incomparable id types (pathological)."""
    try:
        return sorted(items, key=lambda it: (-score_of(it), id_of(it)))
    except TypeError:
        return sorted(items, key=lambda it: (-score_of(it), str(id_of(it))))


def _sorted_hits(score_map: dict[Any, float], top_k: int) -> list[Hit]:
    items = id_tiebreak_sort(score_map.items(), lambda kv: kv[1], lambda kv: kv[0])
    return [{"doc_id": d, "score": float(s)} for d, s in items[:top_k]]


def rrf_fuse(
    results_1: Sequence[Hit],
    results_2: Sequence[Hit],
    k: int = 60,
    top_k: int = 10,
    fetch_k: int = 20,
) -> list[Hit]:
    scores: dict[Any, float] = {}
    for rank, hit in enumerate(results_1, start=1):
        scores[hit["doc_id"]] = scores.get(hit["doc_id"], 0.0) + 1.0 / (k + rank)
    for rank, hit in enumerate(results_2, start=1):
        scores[hit["doc_id"]] = scores.get(hit["doc_id"], 0.0) + 1.0 / (k + rank)
    missing = 1.0 / (k + fetch_k + 1)
    ids_1 = {h["doc_id"] for h in results_1}
    ids_2 = {h["doc_id"] for h in results_2}
    for doc_id in ids_1 ^ ids_2:  # present in exactly one list
        scores[doc_id] += missing
    return _sorted_hits(scores, top_k)


_NORMALIZERS = {
    "mm": lambda s, _min: normalize_minmax(s),
    "tmm": lambda s, _min: normalize_tmm(s, _min if _min is not None else 0.0),
    "z": lambda s, _min: normalize_zscore(s),
    "dbsf": lambda s, _min: normalize_dbsf(s),
}


def cc_fuse(
    results_1: Sequence[Hit],
    results_2: Sequence[Hit],
    weight: float = 0.5,
    top_k: int = 10,
    normalize_method: str = "mm",
    pipeline_1_min: float | None = None,
    pipeline_2_min: float | None = None,
) -> list[Hit]:
    if normalize_method not in _NORMALIZERS:
        raise ValueError(f"unknown normalization method: {normalize_method}")
    if normalize_method == "tmm" and (pipeline_1_min is None or pipeline_2_min is None):
        raise ValueError("tmm normalization requires pipeline_1_min and pipeline_2_min")
    map_1 = {h["doc_id"]: float(h["score"]) for h in results_1}
    map_2 = {h["doc_id"]: float(h["score"]) for h in results_2}
    all_ids = list(dict.fromkeys([*map_1, *map_2]))
    s1 = [map_1.get(d) for d in all_ids]
    s2 = [map_2.get(d) for d in all_ids]
    n1 = _NORMALIZERS[normalize_method](s1, pipeline_1_min)
    n2 = _NORMALIZERS[normalize_method](s2, pipeline_2_min)
    floor = MISSING_SCORE_FLOORS[normalize_method]
    fused = {
        d: weight * (a if a is not None else floor)
        + (1 - weight) * (b if b is not None else floor)
        for d, a, b in zip(all_ids, n1, n2)
    }
    return _sorted_hits(fused, top_k)


# ------------------------------------------------------------------- device
def fuse_batch_rrf(
    ids_1: np.ndarray, ids_2: np.ndarray, k: int, top_k: int, fetch_k: int
):
    """Vectorized RRF over padded candidate-id arrays [B, F] (pad = -1/INT_MAX
    sentinel ids never matching). Returns (scores [B, top_k], fused ids) —
    the same (scores, ids) order as :func:`fuse_batch_cc` and ``sort_topk``.

    Device variant of :func:`rrf_fuse` using rank arithmetic + the
    deterministic (-score, id-rank) merge; used when fusing large query
    batches without host round-trips.
    """
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import INT_MAX
    from autorag_research_tpu.ops.topk import sort_topk

    b, f = ids_1.shape
    union = jnp.concatenate([ids_1, ids_2], axis=1)  # [B, 2F]
    ranks = jnp.arange(1, f + 1, dtype=jnp.float32)
    base = jnp.concatenate([1.0 / (k + ranks)] * 2)[None, :].repeat(b, 0)  # [B, 2F]
    # score of each occurrence slot; duplicates resolved by matching ids
    eq = union[:, :, None] == union[:, None, :]  # [B, 2F, 2F]
    occ_scores = (eq * base[:, None, :]).sum(-1)  # summed over matching slots
    missing = 1.0 / (k + fetch_k + 1)
    dup = eq.sum(-1) > 1  # appears in both lists
    scores = jnp.where(dup, occ_scores, occ_scores + missing)
    # pads: the kernels emit INT_MAX for short result lists, callers may use -1
    valid = (union >= 0) & (union != INT_MAX)
    scores = jnp.where(valid, scores, -jnp.inf)
    # dedup: keep first occurrence only
    first_occ = jnp.argmax(eq, axis=-1) == jnp.arange(2 * f)[None, :]
    scores = jnp.where(first_occ, scores, -jnp.inf)
    return sort_topk(scores, union, top_k)


def fuse_batch_cc(
    ids_1: np.ndarray,
    scores_1: np.ndarray,
    ids_2: np.ndarray,
    scores_2: np.ndarray,
    weight: float,
    top_k: int,
    normalize_method: str = "mm",
    pipeline_1_min: float | None = None,
    pipeline_2_min: float | None = None,
):
    """Vectorized convex-combination fusion over padded candidate arrays
    [B, F] (pad ids < 0). Device variant of :func:`cc_fuse` with identical
    normalization/floor semantics, computed per query row in jnp.

    Returns (fused scores [B, top_k], fused ids [B, top_k]).
    """
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import INT_MAX
    from autorag_research_tpu.ops.topk import sort_topk

    b, f = ids_1.shape
    union = jnp.concatenate([ids_1, ids_2], axis=1)  # [B, 2F]
    valid = (union >= 0) & (union != INT_MAX)
    # docs in both lists appear twice in the union; statistics must count each
    # doc once (the host fuser dedups via a set), so restrict to first
    # occurrences
    eq_union = union[:, :, None] == union[:, None, :]
    first_occ = (jnp.argmax(eq_union, axis=-1) == jnp.arange(2 * f)[None, :]) & valid

    def lookup(ids_src, scores_src):
        # score of each union candidate in a source list; NaN = missing
        eq = union[:, :, None] == ids_src[:, None, :]  # [B, 2F, F]
        present = eq.any(-1) & valid
        val = (eq * scores_src[:, None, :]).sum(-1)
        return jnp.where(present, val, jnp.nan)

    s1 = lookup(ids_1, scores_1)
    s2 = lookup(ids_2, scores_2)

    def norm(s, theo_min):
        m = ~jnp.isnan(s) & first_occ
        cnt = jnp.maximum(m.sum(1, keepdims=True), 1)
        if normalize_method in ("mm", "tmm"):
            hi = jnp.where(m, s, -jnp.inf).max(1, keepdims=True)
            if normalize_method == "mm":
                lo = jnp.where(m, s, jnp.inf).min(1, keepdims=True)
            else:
                lo = jnp.full_like(hi, theo_min if theo_min is not None else 0.0)
            rng = hi - lo
            out = jnp.where(rng == 0, 0.5, (s - lo) / jnp.where(rng == 0, 1.0, rng))
        elif normalize_method in ("z", "dbsf"):
            mean = jnp.where(m, s, 0.0).sum(1, keepdims=True) / cnt
            var = (jnp.where(m, (s - mean) ** 2, 0.0)).sum(1, keepdims=True) / cnt
            std = jnp.sqrt(var)
            if normalize_method == "z":
                out = jnp.where(std == 0, 0.0, (s - mean) / jnp.where(std == 0, 1.0, std))
            else:
                lo = mean - 3 * std
                out = jnp.where(
                    std == 0, 0.5,
                    jnp.clip((s - lo) / jnp.where(std == 0, 1.0, 6 * std), 0.0, 1.0),
                )
        else:
            raise ValueError(f"unknown normalization method: {normalize_method}")
        floor = MISSING_SCORE_FLOORS[normalize_method]
        return jnp.where(m, out, floor)

    fused = weight * norm(s1, pipeline_1_min) + (1 - weight) * norm(s2, pipeline_2_min)
    fused = jnp.where(first_occ, fused, -jnp.inf)
    return sort_topk(fused, union, top_k)
