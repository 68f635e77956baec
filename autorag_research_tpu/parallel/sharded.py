"""Corpus-sharded retrieval: per-shard top-k + deterministic ICI merge.

This is the framework's "distributed communication backend" (the reference has
none — SURVEY.md §2.10/§5): each device scores its corpus shard with the dense
kernel, converts local row indices to global doc rows, then the per-shard
candidate lists are ``all_gather``-ed over the ``corpus`` mesh axis and merged
by the global ``(-score, doc_id)`` order. The merge is shard-count invariant
(tested against the single-device kernel), which is what makes sharded results
rank-identical to the reference's single-scan ``ORDER BY distance``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from autorag_research_tpu.ops.dense import (
    INT_MAX,
    NEG_INF,
    dense_topk,
    dense_topk_int8,
    on_tpu,
)
from autorag_research_tpu.ops.topk import merge_topk, pad_to_k
from autorag_research_tpu.parallel.mesh import CORPUS_AXIS


def _pad_rows(arr: jax.Array, multiple: int) -> jax.Array:
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad:
        arr = jnp.pad(arr, ((0, pad), (0, 0)))
    return arr


def shard_corpus(corpus: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a [N, d] corpus row-sharded over the mesh's corpus axis
    (zero-padded to a multiple of the axis size)."""
    n_shards = mesh.shape[CORPUS_AXIS]
    corpus = _pad_rows(corpus, n_shards)
    sharding = NamedSharding(mesh, P(CORPUS_AXIS, None))
    return jax.device_put(corpus, sharding)


@functools.partial(jax.jit, static_argnames=("k", "n_total", "mesh", "method"))
def sharded_dense_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    n_total: int,
    mesh: Mesh,
    method: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Global exact top-k over a corpus sharded on the ``corpus`` mesh axis.

    queries: [Q, d] (replicated); corpus: [N_pad, d] sharded (N_pad divisible
    by the axis size; rows >= n_total are padding). Returns replicated
    (scores [Q, k], doc_rows [Q, k]).
    """
    n_shards = mesh.shape[CORPUS_AXIS]
    shard_rows = corpus.shape[0] // n_shards
    k_eff = min(k, n_total)
    # zero-pad corpus rows score exactly 0 and would displace NEGATIVE-scoring
    # real docs from the local top-k before the validity mask (losing real
    # candidates from the global merge). Overfetch by the global pad count
    # (static, < n_shards) so k_eff real candidates always survive masking.
    n_pad = corpus.shape[0] - n_total
    k_sel = min(k_eff + n_pad, shard_rows)

    def local_search(q, c_shard):
        # c_shard: [shard_rows, d] — this device's slice; per-shard method
        # dispatch (fused dot+top_k while the local score matrix fits).
        scores, local_ids = dense_topk(q, c_shard, k_sel, method=method)
        offset = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32) * shard_rows
        gids = local_ids + offset
        # mask out padding rows and k>shard overfetch
        valid = (gids < n_total) & (local_ids < shard_rows)
        scores = jnp.where(valid, scores, NEG_INF)
        gids = jnp.where(valid, gids, INT_MAX)
        all_s = jax.lax.all_gather(scores, CORPUS_AXIS)  # [P, Q, k_sel]
        all_i = jax.lax.all_gather(gids, CORPUS_AXIS)
        return merge_topk(
            jnp.swapaxes(all_s, 0, 1), jnp.swapaxes(all_i, 0, 1), k_eff
        )

    in_specs = (P(None, None), P(CORPUS_AXIS, None))
    out_specs = (P(None, None), P(None, None))
    # check_vma off: the scan carry inside the local kernel starts from
    # replicated constants and becomes corpus-varying, which the varying-
    # manual-axes checker rejects; the final all_gather + merge makes the
    # outputs genuinely replicated.
    scores, ids = jax.shard_map(
        local_search, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )(queries, corpus)
    return pad_to_k(scores, ids, k, k_eff)


def shard_corpus_int8(
    corpus_q: jax.Array, corpus_scale: jax.Array, mesh: Mesh
) -> tuple[jax.Array, jax.Array]:
    """Place an int8-quantized corpus + per-row scales row-sharded over the
    corpus axis (zero-padded; pad rows score exactly 0 via scale 0)."""
    n_shards = mesh.shape[CORPUS_AXIS]
    corpus_q = _pad_rows(corpus_q, n_shards)
    pad = corpus_q.shape[0] - corpus_scale.shape[0]
    if pad:
        corpus_scale = jnp.pad(corpus_scale, (0, pad))
    return (
        jax.device_put(corpus_q, NamedSharding(mesh, P(CORPUS_AXIS, None))),
        jax.device_put(corpus_scale, NamedSharding(mesh, P(CORPUS_AXIS))),
    )


@functools.partial(jax.jit, static_argnames=("k", "n_total", "mesh"))
def sharded_dense_topk_int8(
    queries: jax.Array,
    corpus_q: jax.Array,
    corpus_scale: jax.Array,
    k: int,
    n_total: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Sharded counterpart of ``ops.dense.dense_topk_int8``: per-shard
    quantized scan + the same deterministic global merge. The per-query
    dequantization scale is identical on every shard (queries replicated),
    so per-shard candidate scores are globally comparable. APPROXIMATE like
    the single-device int8 path — serving mode, not for parity runs."""
    n_shards = mesh.shape[CORPUS_AXIS]
    shard_rows = corpus_q.shape[0] // n_shards
    k_eff = min(k, n_total)
    # scale-0 pad rows score exactly 0 — same displacement hazard as the f32
    # path above; overfetch by the static global pad count
    n_pad = corpus_q.shape[0] - n_total
    k_sel = min(k_eff + n_pad, shard_rows)

    def local_search(q, c_shard, s_shard):
        scores, local_ids = dense_topk_int8(q, c_shard, s_shard, k_sel)
        offset = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32) * shard_rows
        gids = local_ids + offset
        valid = (gids < n_total) & (local_ids < shard_rows)
        scores = jnp.where(valid, scores, NEG_INF)
        gids = jnp.where(valid, gids, INT_MAX)
        all_s = jax.lax.all_gather(scores, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gids, CORPUS_AXIS)
        return merge_topk(
            jnp.swapaxes(all_s, 0, 1), jnp.swapaxes(all_i, 0, 1), k_eff
        )

    in_specs = (P(None, None), P(CORPUS_AXIS, None), P(CORPUS_AXIS))
    out_specs = (P(None, None), P(None, None))
    scores, ids = jax.shard_map(
        local_search, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )(queries, corpus_q, corpus_scale)
    return pad_to_k(scores, ids, k, k_eff)


@functools.partial(jax.jit, static_argnames=("k", "n_total", "mesh", "method"))
def sharded_bm25_topk(
    q_ids: jax.Array,  # [B, T] replicated
    q_weights: jax.Array,  # [B, T] replicated
    doc_ids: jax.Array,  # [N_pad, L] sharded on corpus axis (pad rows = DOC_PAD)
    doc_weights: jax.Array,  # [N_pad, L] sharded
    k: int,
    n_total: int,
    mesh: Mesh,
    method: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Global BM25 top-k over a corpus-sharded slot layout; same per-shard +
    all_gather merge pattern as :func:`sharded_dense_topk`."""
    from autorag_research_tpu.ops.sparse import bm25_topk

    n_shards = mesh.shape[CORPUS_AXIS]
    shard_rows = doc_ids.shape[0] // n_shards
    k_eff = min(k, n_total)

    def local_search(qi, qw, d_ids, d_w):
        scores, local_ids = bm25_topk(qi, qw, d_ids, d_w, k_eff, method=method)
        offset = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32) * shard_rows
        gids = local_ids + offset
        valid = (gids < n_total) & (local_ids < shard_rows)
        scores = jnp.where(valid, scores, NEG_INF)
        gids = jnp.where(valid, gids, INT_MAX)
        all_s = jax.lax.all_gather(scores, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gids, CORPUS_AXIS)
        return merge_topk(jnp.swapaxes(all_s, 0, 1), jnp.swapaxes(all_i, 0, 1), k_eff)

    scores, ids = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(CORPUS_AXIS, None), P(CORPUS_AXIS, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(q_ids, q_weights, doc_ids, doc_weights)
    return pad_to_k(scores, ids, k, k_eff)


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "cell_pad", "shard_rows", "n_total", "mesh")
)
def sharded_ivf_topk(
    queries: jax.Array,        # [Q, d] replicated, normalized
    corpus_sh: jax.Array,      # [P, Ns+1, d] sharded on corpus axis (last row dummy)
    centroids_sh: jax.Array,   # [P, C, d] sharded
    members_sh: jax.Array,     # [P, C, cell_pad] sharded (dummy -> Ns)
    k: int,
    nprobe: int,
    cell_pad: int,
    shard_rows: int,           # Ns
    n_total: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Global IVF top-k over per-shard sub-indexes: each device probes its own
    centroids/cells and exact-reranks local candidates, then the per-shard
    lists merge by the global (-score, doc row) order — the ANN analogue of
    :func:`sharded_dense_topk` (total probed cells = P x nprobe)."""
    from autorag_research_tpu.index.ivf import _ivf_search

    k_eff = min(k, n_total)

    def local_search(q, corpus, centroids, members):
        scores, local_ids = _ivf_search(
            q, corpus[0], centroids[0], members[0],
            k=k_eff, nprobe=nprobe, cell_pad=cell_pad,
        )
        offset = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32) * shard_rows
        # dummy/pad candidates already carry INT_MAX ids; offsetting INT_MAX
        # would wrap, so validate on the LOCAL id first
        valid = local_ids < shard_rows
        gids = jnp.where(valid, local_ids + offset, INT_MAX)
        valid &= gids < n_total
        scores = jnp.where(valid, scores, NEG_INF)
        gids = jnp.where(valid, gids, INT_MAX)
        all_s = jax.lax.all_gather(scores, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gids, CORPUS_AXIS)
        return merge_topk(jnp.swapaxes(all_s, 0, 1), jnp.swapaxes(all_i, 0, 1), k_eff)

    scores, ids = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P(None, None),
            P(CORPUS_AXIS, None, None),
            P(CORPUS_AXIS, None, None),
            P(CORPUS_AXIS, None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(queries, corpus_sh, centroids_sh, members_sh)
    return pad_to_k(scores, ids, k, k_eff)


@functools.partial(jax.jit, static_argnames=("k", "n_total", "mesh", "method"))
def sharded_maxsim_topk(
    queries: jax.Array,  # [B, Tq, d] replicated
    query_lens: jax.Array,  # [B]
    docs: jax.Array,  # [N_pad, Td, d] sharded on corpus axis
    doc_lens: jax.Array,  # [N_pad] sharded
    k: int,
    n_total: int,
    mesh: Mesh,
    method: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Global MaxSim top-k over a corpus-sharded multi-vector index; same
    per-shard + all_gather merge pattern as :func:`sharded_dense_topk`
    (padding docs carry doc_lens == 0 and are masked by the local kernel)."""
    from autorag_research_tpu.ops.maxsim import maxsim_topk

    n_shards = mesh.shape[CORPUS_AXIS]
    shard_rows = docs.shape[0] // n_shards
    k_eff = min(k, n_total)

    def local_search(q, qlens, d_shard, dlens_shard):
        # one dispatch rule for both paths: maxsim_topk's measured auto
        # routing (f32 td<=256 on TPU -> pallas_v2 bn=16, else XLA scan)
        scores, local_ids = maxsim_topk(q, qlens, d_shard, dlens_shard, k_eff, method=method)
        offset = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32) * shard_rows
        gids = local_ids + offset
        valid = (gids < n_total) & (local_ids < shard_rows)
        scores = jnp.where(valid, scores, NEG_INF)
        gids = jnp.where(valid, gids, INT_MAX)
        all_s = jax.lax.all_gather(scores, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gids, CORPUS_AXIS)
        return merge_topk(jnp.swapaxes(all_s, 0, 1), jnp.swapaxes(all_i, 0, 1), k_eff)

    scores, ids = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(None, None, None), P(None), P(CORPUS_AXIS, None, None), P(CORPUS_AXIS)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(queries, query_lens, docs, doc_lens)
    return pad_to_k(scores, ids, k, k_eff)


def sharded_maxsim_topk_int8(
    queries: jax.Array,  # [B, Tq, d] f32 replicated
    query_lens: jax.Array,  # [B]
    docs_q: jax.Array,  # [N_pad, Td, d] int8, sharded on corpus axis
    doc_scales: jax.Array,  # [N_pad, Td] f32 per-token scales, sharded
    doc_lens: jax.Array,  # [N_pad] sharded (pad rows carry 0)
    k: int,
    n_total: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Global int8 MaxSim top-k over a corpus-sharded quantized index.

    Queries quantize identically on every shard (replicated input, same
    per-token scales), so a doc's dequantized score is shard-placement
    independent and the ``(-score, id)`` merge stays shard-count invariant
    — the same determinism argument as :func:`sharded_dense_topk_int8`.
    APPROXIMATE like the local kernel (ops/maxsim.maxsim_topk_int8)."""
    from autorag_research_tpu.ops.maxsim import maxsim_topk_int8

    n_shards = mesh.shape[CORPUS_AXIS]
    shard_rows = docs_q.shape[0] // n_shards
    k_eff = min(k, n_total)

    def local_search(q, qlens, d_shard, s_shard, dlens_shard):
        scores, local_ids = maxsim_topk_int8(
            q, qlens, d_shard, s_shard, dlens_shard, k_eff
        )
        offset = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32) * shard_rows
        gids = local_ids + offset
        valid = (gids < n_total) & (local_ids < shard_rows)
        scores = jnp.where(valid, scores, NEG_INF)
        gids = jnp.where(valid, gids, INT_MAX)
        all_s = jax.lax.all_gather(scores, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gids, CORPUS_AXIS)
        return merge_topk(jnp.swapaxes(all_s, 0, 1), jnp.swapaxes(all_i, 0, 1), k_eff)

    scores, ids = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P(None, None, None), P(None),
            P(CORPUS_AXIS, None, None), P(CORPUS_AXIS, None), P(CORPUS_AXIS),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(queries, query_lens, docs_q, doc_scales, doc_lens)
    return pad_to_k(scores, ids, k, k_eff)


def sharded_maxsim_topk_verified(
    queries: jax.Array,  # [B, Tq, d] replicated
    query_lens: jax.Array,  # [B]
    docs: jax.Array,  # [N_pad, Td, d] f32, sharded on corpus axis
    doc_lens: jax.Array,  # [N_pad] sharded (pad rows carry 0)
    docs_lo: jax.Array,  # [N_pad, Td, d] bf16 prescreen, sharded
    nd_max,
    r_max,
    k: int,
    n_total: int,
    mesh: Mesh,
    kprime: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Sharded verified-exact MaxSim top-k: each shard runs the verified
    fast path (bf16 prescreen + bound-checked exact rescore,
    ``ops/maxsim._maxsim_topk_verified``) over its slice — pad docs carry
    ``doc_lens == 0`` and are masked by every engine — then the per-shard
    EXACT lists merge by the global ``(-score, doc row)`` order. Same
    exactness contract as :func:`sharded_maxsim_topk` at verified speed.

    ``kprime`` defaults to the measured single-device operating point (64;
    kp<=32 fails ~41% on random corpora — docs/VERIFIED.md) and is clamped
    to ``max(kprime, k)`` so the per-shard coverage proof can pass."""
    from autorag_research_tpu.ops.maxsim import _maxsim_topk_verified

    kprime = max(kprime, k)
    n_shards = mesh.shape[CORPUS_AXIS]
    shard_rows = docs.shape[0] // n_shards
    k_eff = min(k, n_total)

    def local_search(q, qlens, d_shard, dlens_shard, lo_shard):
        scores, local_ids, _, _ = _maxsim_topk_verified(
            q, qlens, d_shard, dlens_shard, lo_shard,
            jnp.float32(nd_max), jnp.float32(r_max),
            k_eff, kprime, 0,
        )
        offset = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32) * shard_rows
        valid = (local_ids >= 0) & (local_ids < shard_rows) & (local_ids != INT_MAX)
        gids = jnp.where(valid, local_ids + offset, INT_MAX)
        valid &= gids < n_total
        scores = jnp.where(valid, scores, NEG_INF)
        gids = jnp.where(valid, gids, INT_MAX)
        all_s = jax.lax.all_gather(scores, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gids, CORPUS_AXIS)
        return merge_topk(jnp.swapaxes(all_s, 0, 1), jnp.swapaxes(all_i, 0, 1), k_eff)

    scores, ids = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P(None, None, None), P(None),
            P(CORPUS_AXIS, None, None), P(CORPUS_AXIS), P(CORPUS_AXIS, None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(queries, query_lens, docs, doc_lens, docs_lo)
    return pad_to_k(scores, ids, k, k_eff)


def shard_corpus_verified(
    corpus: jax.Array, sidecar: dict, mesh: Mesh, block: int = 2048
) -> tuple[jax.Array, jax.Array]:
    """Shard the f32 corpus + its bf16 prescreen sidecar for
    :func:`sharded_dense_topk_verified`: rows pad to ``n_shards * block`` so
    every shard's slice is already a Pallas block multiple (no in-jit pad
    copy). Returns (corpus_sh, corpus_lo_sh)."""
    import numpy as np

    n_shards = mesh.shape[CORPUS_AXIS]
    lo = sidecar["corpus_lo"]
    if sidecar.get("corpus_scale") is not None:
        raise ValueError("sharded verified retrieval supports the bf16 sidecar only")
    n = corpus.shape[0]
    shard_rows = -(-max(n, 1) // (n_shards * block)) * block
    n_pad = shard_rows * n_shards
    corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
    lo_np = np.asarray(lo)[:n]
    lo_np = np.concatenate(
        [lo_np, np.zeros((n_pad - n, lo_np.shape[1]), lo_np.dtype)]
    )
    return (
        jax.device_put(corpus, NamedSharding(mesh, P(CORPUS_AXIS, None))),
        jax.device_put(jnp.asarray(lo_np), NamedSharding(mesh, P(CORPUS_AXIS, None))),
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_total", "mesh", "m", "j", "seg", "engine", "interpret"),
)
def sharded_dense_topk_verified(
    queries: jax.Array,
    corpus: jax.Array,      # [N_pad, d] f32, sharded
    corpus_lo: jax.Array,   # [N_pad, d] bf16 prescreen, sharded
    nd_max,
    r_max,
    k: int,
    n_total: int,
    mesh: Mesh,
    m: int = 64,
    j: int = 2,
    seg: int = 128,
    engine: str = "auto",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Sharded verified-exact dense top-k: each shard runs the verified fast
    path over its slice (pads masked in-kernel via per-shard valid-row
    counts), then the per-shard EXACT lists merge by the global
    ``(-score, doc row)`` order — same exactness contract as
    :func:`sharded_dense_topk` at the verified path's speed."""
    from autorag_research_tpu.ops.dense import _dense_topk_verified, on_tpu

    if engine == "auto":
        engine = "pallas" if on_tpu() else "xla"
    n_shards = mesh.shape[CORPUS_AXIS]
    shard_rows = corpus.shape[0] // n_shards
    k_eff = min(k, n_total)

    def local_search(q, c_shard, lo_shard):
        offset = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32) * shard_rows
        n_local = jnp.clip(n_total - offset, 0, shard_rows)
        scores, local_ids, _, _ = _dense_topk_verified(
            q, c_shard, lo_shard, None,
            jnp.float32(nd_max), jnp.float32(r_max),
            k_eff, m, j, seg, 0, engine, interpret,
            n_valid=n_local,
        )
        gids = local_ids + offset
        valid = (local_ids < shard_rows) & (gids < n_total) & (local_ids >= 0)
        # pad-k sentinel rows carry INT_MAX local ids; mask them too
        valid &= local_ids != INT_MAX
        scores = jnp.where(valid, scores, NEG_INF)
        gids = jnp.where(valid, gids, INT_MAX)
        all_s = jax.lax.all_gather(scores, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gids, CORPUS_AXIS)
        return merge_topk(jnp.swapaxes(all_s, 0, 1), jnp.swapaxes(all_i, 0, 1), k_eff)

    scores, ids = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(None, None), P(CORPUS_AXIS, None), P(CORPUS_AXIS, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(queries, corpus, corpus_lo)
    return pad_to_k(scores, ids, k, k_eff)
