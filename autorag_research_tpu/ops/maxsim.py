"""Multi-vector MaxSim (late interaction) scoring: the VectorChord ``@#``
operator replacement.

The reference's multi-vector hot path is one SQL statement per query —
``embeddings @# ARRAY[...]::vector[] AS distance ORDER BY distance LIMIT k``
over ``VECTOR(dim)[]`` columns (``orm/repository/base.py:487-571``), i.e.
ColBERT/ColPali-style ``score(q, D) = sum_t max_s q_t . d_s``.

Device layout: documents padded to ``[N, Td, d]`` with a token-count array
``[N]``; queries padded to ``[B, Tq, d]`` with counts ``[B]``. The kernel
flattens token axes into the matmul —

    S[(b t), (n s)] = Q[(b t), d] @ D[(n s), d]^T        (MXU)
    maxsim[b, n]    = sum_t max_s S                       (VPU, masked)

- ``maxsim_topk_pallas``: fused Pallas kernel; the [B*Tq, BN*Td] score tile
  lives only in VMEM, with the same streaming top-k accumulator as the dense
  kernel.
- ``maxsim_topk_xla``: lax.scan over doc tiles (oracle + CPU path).

Raw scores are the MaxSim sums; the caller normalizes by the query's token
count for the reference's similarity convention
(``orm/service/retrieval_pipeline.py:501-514``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autorag_research_tpu.ops.dense import INT_MAX, NEG_INF, _extract_topk, _precision_for, _round_up
from autorag_research_tpu.ops.topk import pad_to_k, sort_topk


# score-intermediate budget for auto tile sizing: the scan materializes a
# [B, Tq, tile_n, Td] f32 tensor per step, so the tile must shrink as doc
# token counts grow (ViDoRe pages carry ~1k patches vs ~128 text tokens).
# Measured v5e (scripts/bench_maxsim_vidore.py, 10k pages x 1024 patches,
# 8q x 32tok): tiles 128/256/512 all ~160 QPS bf16 — flat within noise —
# so the budget only needs to keep the intermediate comfortably in HBM.
MAXSIM_TILE_BUDGET = 512 << 20


def _auto_tile_n(b: int, tq: int, td: int, n: int) -> int:
    per_doc = b * tq * td * 4
    tile = max(8, (MAXSIM_TILE_BUDGET // max(per_doc, 1)) // 8 * 8)
    return min(tile, 4096, _round_up(n, 8))


# ---------------------------------------------------------------------- XLA
@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def maxsim_topk_xla(
    queries: jax.Array,  # [B, Tq, d]
    query_lens: jax.Array,  # [B]
    docs: jax.Array,  # [N, Td, d]
    doc_lens: jax.Array,  # [N]
    k: int,
    tile_n: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    b, tq, d = queries.shape
    n, td, _ = docs.shape
    k_eff = min(k, n)
    if tile_n is None:
        tile_n = _auto_tile_n(b, tq, td, n)
    tile_n = min(tile_n, _round_up(n, 8))
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        docs = jnp.pad(docs, ((0, n_pad - n), (0, 0), (0, 0)))
        doc_lens = jnp.pad(doc_lens, (0, n_pad - n))
    doc_tiles = docs.reshape(n_pad // tile_n, tile_n, td, d)
    len_tiles = doc_lens.reshape(n_pad // tile_n, tile_n)

    q_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, tq), 1) < query_lens[:, None]
    )  # [B, Tq]

    def body(carry, inp):
        carry_s, carry_i = carry
        (tile, lens), tile_idx = inp
        # S: [B, Tq, tile_n, Td]
        s = jnp.einsum(
            "btd,nsd->btns",
            queries,
            tile,
            precision=_precision_for(queries.dtype),
            preferred_element_type=jnp.float32,
        )
        s_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (tile.shape[0], td), 1) < lens[:, None]
        )  # [tile_n, Td]
        s = jnp.where(s_mask[None, None, :, :], s, NEG_INF)
        per_token = jnp.max(s, axis=3)  # [B, Tq, tile_n]
        per_token = jnp.where(q_mask[:, :, None], per_token, 0.0)
        scores = jnp.sum(per_token, axis=1)  # [B, tile_n]
        base = tile_idx * tile_n
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
        valid = (col < n) & (lens[None, :] > 0)
        scores = jnp.where(valid, scores, NEG_INF)
        tile_k = min(k_eff, tile_n)
        tile_s, tile_local = jax.lax.top_k(scores, tile_k)
        merged = sort_topk(
            jnp.concatenate([carry_s, tile_s], axis=1),
            jnp.concatenate([carry_i, tile_local + base], axis=1),
            k_eff,
        )
        return merged, None

    init = (
        jnp.full((b, k_eff), NEG_INF, jnp.float32),
        jnp.full((b, k_eff), INT_MAX, jnp.int32),
    )
    (scores, ids), _ = jax.lax.scan(
        body,
        init,
        ((doc_tiles, len_tiles), jnp.arange(doc_tiles.shape[0], dtype=jnp.int32)),
    )
    return pad_to_k(scores, ids, k, k_eff)


# ------------------------------------------------------------------ Pallas
def _maxsim_kernel(
    q_ref,        # [BQ*Tq, d] — pad query-token rows are zero vectors
    d_ref,        # [BN*Td, d]
    dbias_ref,    # [BN, Td] f32 — 0 for real doc tokens, NEG_INF for pads
    out_s_ref,    # [BQ, K]
    out_i_ref,
    acc_s,
    acc_i,
    *, k, n, block_n, bq, tq, td,
):
    # Masking strategy (Mosaic-friendly, no bool rank-changing reshapes):
    # - pad QUERY token rows are zero vectors, so max_s(0 . d + bias) = 0 and
    #   they add nothing to the per-query sum;
    # - pad DOC tokens carry a NEG_INF additive bias before the max;
    # - fully-empty docs become -inf through every query token and fall out.
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, INT_MAX)

    s = jax.lax.dot_general(
        q_ref[:],
        d_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(q_ref.dtype),
    )  # [(BQ*Tq), (BN*Td)]

    rows = bq * tq
    s = s.reshape(rows, block_n, td) + dbias_ref[:][None, :, :]
    per_token = jnp.max(s, axis=2)  # [(BQ*Tq), BN]
    # sum over the Tq query tokens of each query: [(BQ*Tq), BN] -> [BQ, BN].
    # Expressed as a 0/1 grouping matmul (2-D, MXU) — small 3-D reductions
    # hit Mosaic relayout failures.
    row_of = jax.lax.broadcasted_iota(jnp.int32, (bq, rows), 1)
    owner = jax.lax.broadcasted_iota(jnp.int32, (bq, rows), 0)
    group = (row_of // tq == owner).astype(per_token.dtype)
    scores = jax.lax.dot_general(
        group,
        per_token,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact f32 sum of per-token maxes
    )

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * block_n
    scores = jnp.where(col < n, scores, NEG_INF)

    tile_s, tile_i = _extract_topk(scores, col, k)
    new_s, new_i = _extract_topk(
        jnp.concatenate([acc_s[:], tile_s], axis=1),
        jnp.concatenate([acc_i[:], tile_i], axis=1),
        k,
    )
    acc_s[:] = new_s
    acc_i[:] = new_i

    @pl.when(j == nj - 1)
    def _write():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "block_q", "block_n", "interpret")
)
def maxsim_topk_pallas(
    queries: jax.Array,  # [B, Tq, d]
    query_lens: jax.Array,
    docs: jax.Array,  # [N, Td, d]
    doc_lens: jax.Array,
    k: int,
    block_q: int = 8,
    block_n: int = 8,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    b, tq, d = queries.shape
    n, td, _ = docs.shape
    k_eff = min(k, n)

    d_pad = _round_up(d, 128)
    td_pad = _round_up(td, 128)
    tq_pad = _round_up(tq, 8)
    # round the query block up to the 8-sublane granularity (like the dense
    # and bm25 wrappers): b<8 would otherwise emit sub-8-row output/scratch
    # VMEM blocks, which Mosaic rejects; padded query rows are zeroed and
    # sliced off the outputs
    bq = min(block_q, _round_up(b, 8))
    b_pad = _round_up(b, bq)
    block_n = max(block_n, _round_up(k_eff, 8))  # tile must hold >= k
    n_pad = _round_up(n, block_n)

    queries = jnp.pad(
        queries, ((0, b_pad - b), (0, tq_pad - tq), (0, d_pad - d))
    ).reshape(b_pad * tq_pad, d_pad)
    docs = jnp.pad(
        docs, ((0, n_pad - n), (0, td_pad - td), (0, d_pad - d))
    ).reshape(n_pad * td_pad, d_pad)
    query_lens = jnp.pad(query_lens, (0, b_pad - b)).astype(jnp.int32)
    doc_lens = jnp.pad(doc_lens, (0, n_pad - n)).astype(jnp.int32)

    # Zero pad-query-token rows (true by construction of jnp.pad above, but
    # re-assert in case callers pass garbage beyond query_lens).
    q_tok = jax.lax.broadcasted_iota(jnp.int32, (b_pad, tq_pad), 1)
    qmask = (q_tok < query_lens[:, None]).astype(queries.dtype)
    queries = queries * qmask.reshape(b_pad * tq_pad, 1)
    # dbias [N, Td]: 0.0 for real doc tokens, NEG_INF for pads.
    d_tok = jax.lax.broadcasted_iota(jnp.int32, (n_pad, td_pad), 1)
    dbias = jnp.where(d_tok < doc_lens[:, None], 0.0, NEG_INF).astype(jnp.float32)

    grid = (b_pad // bq, n_pad // block_n)
    kernel = functools.partial(
        _maxsim_kernel, k=k_eff, n=n, block_n=block_n, bq=bq, tq=tq_pad, td=td_pad
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq * tq_pad, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n * td_pad, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, td_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k_eff), jnp.float32),
            pltpu.VMEM((bq, k_eff), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * tq_pad * n_pad * td_pad * d_pad,
            bytes_accessed=(b_pad * tq_pad + n_pad * td_pad) * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, docs, dbias)
    out_s, out_i = out_s[:b], out_i[:b]
    return pad_to_k(out_s, out_i, k, k_eff)


def _v2_tile_scores(
    q_ref, d_ref, dlen_ref, *, block_n, bq, tq, td, mm_docs,
    transpose_out=False,
):
    """Shared v2 tile body: chunked S matmul -> per-doc token maxima ->
    query-token sum via the 0/1 grouping matmul. Returns [BQ, BN] f32
    (``transpose_out`` computes [BN, BQ] directly on the MXU — no VPU
    transpose)."""
    rows = bq * tq
    tok = jax.lax.broadcasted_iota(jnp.int32, (td, rows), 0)
    per_doc = []
    for c0 in range(0, block_n, mm_docs):  # static unroll over matmul chunks
        s_c = jax.lax.dot_general(
            d_ref[c0 * td : (c0 + mm_docs) * td, :],
            q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision_for(q_ref.dtype),
        )  # [(mm_docs*Td), R]
        for b in range(c0, c0 + mm_docs):  # BN slices of Td sublanes
            s_b = s_c[(b - c0) * td : (b - c0 + 1) * td, :]  # [Td, R]
            masked = jnp.where(tok < dlen_ref[b, 0], s_b, NEG_INF)
            per_doc.append(jnp.max(masked, axis=0))  # [R]
    per_token = jnp.stack(per_doc, axis=0)  # [BN, R]

    row_of = jax.lax.broadcasted_iota(jnp.int32, (bq, rows), 1)
    owner = jax.lax.broadcasted_iota(jnp.int32, (bq, rows), 0)
    group = (row_of // tq == owner).astype(jnp.float32)
    lhs, rhs = (per_token, group) if transpose_out else (group, per_token)
    return jax.lax.dot_general(
        lhs,
        rhs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [BQ, BN] (or [BN, BQ] transposed)


def _maxsim_kernel_v2(
    q_ref,     # [R=BQ*Tq, d] — pad query-token rows zeroed
    d_ref,     # [BN*Td, d]
    dlen_ref,  # SMEM [BN, 1] int32 doc token counts
    out_s_ref, out_i_ref, acc_s, acc_i,
    *, k, n, block_n, bq, tq, td, mm_docs,
):
    """Transposed orientation: S = D @ Q^T puts doc tokens on SUBLANES, so the
    per-doc max is a static sublane-slice reduction (no lane-splitting reshape
    — the relayout cliff of v1). Doc-token masking uses SMEM scalar lengths
    against a static per-doc row slice; the query-token sum is the 0/1
    grouping matmul.

    ``mm_docs`` chunks the S matmul: at page scale (Td ~ 1024) the full
    ``[BN*Td, R]`` f32 S block is VMEM-prohibitive at useful BN, so S is
    produced ``mm_docs`` docs at a time and reduced to per-doc maxima before
    the next chunk — only ``[mm_docs*Td, R]`` is ever live. Each chunk's
    matmul is still MXU-sized (Td*mm_docs x d @ d x R)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, INT_MAX)

    scores = _v2_tile_scores(
        q_ref, d_ref, dlen_ref, block_n=block_n, bq=bq, tq=tq, td=td,
        mm_docs=mm_docs,
    )  # [BQ, BN]

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * block_n
    scores = jnp.where(col < n, scores, NEG_INF)

    tile_s, tile_i = _extract_topk(scores, col, k)
    new_s, new_i = _extract_topk(
        jnp.concatenate([acc_s[:], tile_s], axis=1),
        jnp.concatenate([acc_i[:], tile_i], axis=1),
        k,
    )
    acc_s[:] = new_s
    acc_i[:] = new_i

    @pl.when(j == nj - 1)
    def _write():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "block_q", "block_n", "mm_docs", "interpret")
)
def maxsim_topk_pallas_v2(
    queries: jax.Array,
    query_lens: jax.Array,
    docs: jax.Array,
    doc_lens: jax.Array,
    k: int,
    block_q: int = 8,
    block_n: int = 16,
    mm_docs: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    b, tq, d = queries.shape
    n, td, _ = docs.shape
    k_eff = min(k, n)

    d_pad = _round_up(d, 128)
    td_pad = _round_up(td, 8)  # sublane alignment only in this orientation
    tq_pad = _round_up(tq, 8)
    # round the query block up to the 8-sublane granularity (like the dense
    # and bm25 wrappers): b<8 would otherwise emit sub-8-row output/scratch
    # VMEM blocks, which Mosaic rejects; padded query rows are zeroed and
    # sliced off the outputs
    bq = min(block_q, _round_up(b, 8))
    b_pad = _round_up(b, bq)
    block_n = max(block_n, _round_up(k_eff, 8))
    n_pad = _round_up(n, block_n)

    queries = jnp.pad(queries, ((0, b_pad - b), (0, tq_pad - tq), (0, d_pad - d)))
    q_tok = jax.lax.broadcasted_iota(jnp.int32, (b_pad, tq_pad), 1)
    qmask = (q_tok < jnp.pad(query_lens, (0, b_pad - b))[:, None]).astype(queries.dtype)
    queries = (queries * qmask[:, :, None]).reshape(b_pad * tq_pad, d_pad)
    docs = jnp.pad(
        docs, ((0, n_pad - n), (0, td_pad - td), (0, d_pad - d))
    ).reshape(n_pad * td_pad, d_pad)
    dlens = jnp.pad(doc_lens, (0, n_pad - n)).reshape(n_pad, 1).astype(jnp.int32)

    if mm_docs is None:
        # keep the live S chunk small (scoped VMEM is 16MB and the docs
        # block needs most of it at page scale). f32 inputs get a tighter
        # budget: the HIGHEST-precision matmul decomposes each f32 operand
        # into bf16 hi/lo passes, so its scratch competes for the same VMEM
        # (measured: f32 td=512 compiles at a 1MB S chunk, not at 4MB).
        s_budget = (1 << 20) if docs.dtype == jnp.float32 else (4 << 20)
        s_budget_rows = max(td_pad, s_budget // (4 * bq * tq_pad))
        mm_docs = max(1, min(block_n, s_budget_rows // td_pad))
        while block_n % mm_docs:
            mm_docs -= 1

    grid = (b_pad // bq, n_pad // block_n)
    kernel = functools.partial(
        _maxsim_kernel_v2, k=k_eff, n=n, block_n=block_n, bq=bq, tq=tq_pad,
        td=td_pad, mm_docs=mm_docs,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq * tq_pad, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n * td_pad, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j: (j, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k_eff), jnp.float32),
            pltpu.VMEM((bq, k_eff), jnp.int32),
        ],
        interpret=interpret,
    )(queries, docs, dlens)
    out_s, out_i = out_s[:b], out_i[:b]
    return pad_to_k(out_s, out_i, k, k_eff)


def _maxsim_kernel_v2_scores(
    q_ref, d_ref, dlen_ref, out_ref, *, n, block_n, bq, tq, td, mm_docs,
):
    """v2 tile body writing RAW SCORES instead of a fused running top-k.

    The fused kernel must hold >= k candidates per tile (block_n >= k), so
    large-k requests (the verified prescreen's top-(k'+1), rerank fetches)
    would force VMEM-prohibitive doc blocks at page scale. This variant
    keeps the small doc block and defers selection to a host-side
    ``sort_topk`` over the flat [B, N] scores — cheap wherever page-scale
    corpora live (8q x 80k pages = 2.5MB f32).

    Output is TRANSPOSED [BN, BQ]: Mosaic requires an output block's lane
    dim be 128-divisible or the full array width, so the query axis (always
    fully resident per call) rides the lanes and the doc tile the sublanes
    — the same layout rule as the dense seg-stats kernel."""
    j = pl.program_id(0)
    scores_t = _v2_tile_scores(
        q_ref, d_ref, dlen_ref, block_n=block_n, bq=bq, tq=tq, td=td,
        mm_docs=mm_docs, transpose_out=True,
    )  # [BN, BQ]
    row = jax.lax.broadcasted_iota(jnp.int32, (block_n, bq), 0) + j * block_n
    out_ref[:] = jnp.where(row < n, scores_t, NEG_INF)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_n", "mm_docs", "interpret", "n", "td_pad", "tq_pad", "d_pad"
    ),
)
def _scores_chunk_pallas(
    queries, docs, dlens, *, block_n, mm_docs, interpret, n, td_pad, tq_pad, d_pad
):
    bq = queries.shape[0] // tq_pad
    n_pad = docs.shape[0] // td_pad
    kernel = functools.partial(
        _maxsim_kernel_v2_scores, n=n, block_n=block_n, bq=bq, tq=tq_pad,
        td=td_pad, mm_docs=mm_docs,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((bq * tq_pad, d_pad), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n * td_pad, d_pad), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda j: (j, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_n, bq), lambda j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, bq), jnp.float32),
        interpret=interpret,
    )(queries, docs, dlens)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_n", "mm_docs", "interpret")
)
def maxsim_scores_pallas_v2(
    queries: jax.Array,
    query_lens: jax.Array,
    docs: jax.Array,
    doc_lens: jax.Array,
    block_q: int = 8,
    block_n: int = 16,
    mm_docs: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Full [B, N] raw MaxSim scores via the chunked v2 tile body."""
    b, tq, d = queries.shape
    n, td, _ = docs.shape

    d_pad = _round_up(d, 128)
    td_pad = _round_up(td, 8)
    tq_pad = _round_up(tq, 8)
    bq = min(block_q, _round_up(b, 8))
    b_pad = _round_up(b, bq)
    n_pad = _round_up(n, block_n)

    queries = jnp.pad(queries, ((0, b_pad - b), (0, tq_pad - tq), (0, d_pad - d)))
    q_tok = jax.lax.broadcasted_iota(jnp.int32, (b_pad, tq_pad), 1)
    qmask = (q_tok < jnp.pad(query_lens, (0, b_pad - b))[:, None]).astype(queries.dtype)
    queries = (queries * qmask[:, :, None]).reshape(b_pad, tq_pad, d_pad)
    docs = jnp.pad(
        docs, ((0, n_pad - n), (0, td_pad - td), (0, d_pad - d))
    ).reshape(n_pad * td_pad, d_pad)
    dlens = jnp.pad(doc_lens, (0, n_pad - n)).reshape(n_pad, 1).astype(jnp.int32)

    if mm_docs is None:
        s_budget = (1 << 20) if docs.dtype == jnp.float32 else (4 << 20)
        s_budget_rows = max(td_pad, s_budget // (4 * bq * tq_pad))
        mm_docs = max(1, min(block_n, s_budget_rows // td_pad))
        while block_n % mm_docs:
            mm_docs -= 1

    chunks = []
    for c in range(b_pad // bq):  # static unroll over query chunks
        q_c = queries[c * bq : (c + 1) * bq].reshape(bq * tq_pad, d_pad)
        chunks.append(
            _scores_chunk_pallas(
                q_c, docs, dlens, block_n=block_n, mm_docs=mm_docs,
                interpret=interpret, n=n, td_pad=td_pad, tq_pad=tq_pad,
                d_pad=d_pad,
            )
        )  # [n_pad, bq]
    out = jnp.concatenate(chunks, axis=1)  # [n_pad, b_pad]
    return out.T[:b, :n]


def maxsim_topk_via_scores(
    queries, query_lens, docs, doc_lens, k, block_n: int = 16,
    interpret: bool = False,
):
    """Exact ``(-score, id)`` top-k from the flat Pallas score matrix —
    supports any k (unlike the fused kernel, whose doc block must hold k
    candidates)."""
    n = docs.shape[0]
    s = maxsim_scores_pallas_v2(
        queries, query_lens, docs, doc_lens, block_n=block_n,
        interpret=interpret,
    )
    ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), s.shape)
    return sort_topk(s, ids, k)


# bias value for matmul-fused doc-token masking (v3): must stay finite in
# bf16 (NEG_INF = -3.4e38 rounds to -inf there) and small enough that
# tq_pad * bias never overflows f32 when empty docs sum it per query token
_MASK_BIAS = -1.0e30


def _maxsim_kernel_v3(
    q_ref, d_ref, acc_s, acc_i, out_s_ref, out_i_ref,
    *, k, n, block_n, bq, tq, td,
):
    """v2 with masking FUSED INTO THE MATMUL: the wrapper writes a bias lane
    (docs carry 0 / -1e30 per token validity, queries carry 1), so S arrives
    pre-masked from the MXU and the kernel's VPU work drops to the bare
    sublane max + grouping matmul — the compare/select that left the bf16 v2
    VPU-bound is gone, and so is the SMEM length input."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, INT_MAX)

    rows = bq * tq
    s = jax.lax.dot_general(
        d_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(q_ref.dtype),
    )  # [(BN*Td), R], invalid doc tokens already at ~-1e30

    per_doc = []
    for b in range(block_n):  # static unroll: BN slices of Td sublanes
        per_doc.append(jnp.max(s[b * td : (b + 1) * td, :], axis=0))  # [R]
    per_token = jnp.stack(per_doc, axis=0)  # [BN, R]

    row_of = jax.lax.broadcasted_iota(jnp.int32, (bq, rows), 1)
    owner = jax.lax.broadcasted_iota(jnp.int32, (bq, rows), 0)
    group = (row_of // tq == owner).astype(jnp.float32)
    scores = jax.lax.dot_general(
        group,
        per_token,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [BQ, BN]

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * block_n
    scores = jnp.where(col < n, scores, NEG_INF)

    tile_s, tile_i = _extract_topk(scores, col, k)
    new_s, new_i = _extract_topk(
        jnp.concatenate([acc_s[:], tile_s], axis=1),
        jnp.concatenate([acc_i[:], tile_i], axis=1),
        k,
    )
    acc_s[:] = new_s
    acc_i[:] = new_i

    @pl.when(j == nj - 1)
    def _write():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "block_q", "block_n", "interpret")
)
def maxsim_topk_pallas_v3(
    queries: jax.Array,
    query_lens: jax.Array,
    docs: jax.Array,
    doc_lens: jax.Array,
    k: int,
    block_q: int = 8,
    block_n: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """v2 layout + matmul-fused masking via a bias lane.

    A free zero pad lane (d < d_pad) hosts the bias when available; otherwise
    the feature dim grows by one 128-lane block. Empty docs score
    tq_pad * -1e30 ≈ -3.2e31 — below every real score, above the -3.4e38
    padding columns, i.e. the same ranking v2 produces.

    MEASURED NEGATIVE RESULT (v5e, 50k docs x 128 tok x 128d bf16, same-day
    sweep /tmp/maxsim_v3_runs.log 2026-08-17): v3 bn=16/32/48 = 174.8 /
    214.7 / 230.8 QPS vs v2 bn=16 = 389.9 — ids identical. Root cause: at
    d=128 (every common late-interaction dim is a multiple of 128) there is
    no free pad lane, so the bias forces d_pad 128->256 and DOUBLES the
    matmul. Fused masking can only pay when d % 128 != 0; auto dispatch
    never selects v3. Kept for the oracle suite and odd-dim corpora.
    """
    b, tq, d = queries.shape
    n, td, _ = docs.shape
    k_eff = min(k, n)

    d_pad = _round_up(d, 128)
    if d_pad == d:
        d_pad += 128  # need one lane for the bias feature
    bias_lane = d  # first pad lane
    td_pad = _round_up(td, 8)
    tq_pad = _round_up(tq, 8)
    # round the query block up to the 8-sublane granularity (like the dense
    # and bm25 wrappers): b<8 would otherwise emit sub-8-row output/scratch
    # VMEM blocks, which Mosaic rejects; padded query rows are zeroed and
    # sliced off the outputs
    bq = min(block_q, _round_up(b, 8))
    b_pad = _round_up(b, bq)
    block_n = max(block_n, _round_up(k_eff, 8))
    n_pad = _round_up(n, block_n)

    queries = jnp.pad(queries, ((0, b_pad - b), (0, tq_pad - tq), (0, d_pad - d)))
    q_tok = jax.lax.broadcasted_iota(jnp.int32, (b_pad, tq_pad), 1)
    qmask = (q_tok < jnp.pad(query_lens, (0, b_pad - b))[:, None]).astype(queries.dtype)
    queries = queries * qmask[:, :, None]
    # bias multiplier: 1 on every query row (also padded ones — their doc-max
    # is then 0 for non-empty docs, contributing nothing to the group sum)
    queries = queries.at[:, :, bias_lane].set(1.0)
    queries = queries.reshape(b_pad * tq_pad, d_pad)

    docs = jnp.pad(docs, ((0, n_pad - n), (0, td_pad - td), (0, d_pad - d)))
    d_tok = jax.lax.broadcasted_iota(jnp.int32, (n_pad, td_pad), 1)
    dvalid = d_tok < jnp.pad(doc_lens, (0, n_pad - n))[:, None]
    docs = docs.at[:, :, bias_lane].set(
        jnp.where(dvalid, 0.0, _MASK_BIAS).astype(docs.dtype)
    )
    docs = docs.reshape(n_pad * td_pad, d_pad)

    grid = (b_pad // bq, n_pad // block_n)
    kernel = functools.partial(
        _maxsim_kernel_v3, k=k_eff, n=n, block_n=block_n, bq=bq, tq=tq_pad, td=td_pad
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq * tq_pad, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n * td_pad, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k_eff), jnp.float32),
            pltpu.VMEM((bq, k_eff), jnp.int32),
        ],
        interpret=interpret,
    )(queries, docs)
    out_s, out_i = out_s[:b], out_i[:b]
    return pad_to_k(out_s, out_i, k, k_eff)


@functools.partial(jax.jit, static_argnames=("k",))
def maxsim_rerank(
    queries: jax.Array,     # [B, Tq, d]
    query_lens: jax.Array,  # [B]
    docs: jax.Array,        # [N, Td, d]
    doc_lens: jax.Array,    # [N]
    cand: jax.Array,        # [B, C] int32 candidate rows (INT_MAX = pad)
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact MaxSim over per-query CANDIDATE subsets (the rerank stage of the
    PLAID-style two-stage search — proxy prefilter then exact late
    interaction; cf. the late-interaction efficiency literature in PAPERS.md).
    Returns (scores [B, k], doc rows [B, k]) in global (-score, row) order."""
    b, tq, d = queries.shape
    n, td, _ = docs.shape
    c = cand.shape[1]
    safe = jnp.where(cand < n, cand, 0)
    cand_docs = docs[safe]          # [B, C, Td, d]
    cand_lens = doc_lens[safe]      # [B, C]
    sims = jnp.einsum(
        "bqd,bctd->bqct", queries, cand_docs,
        preferred_element_type=jnp.float32,
        precision=_precision_for(queries.dtype),
    )  # [B, Tq, C, Td]
    tok_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (b, c, td), 2) < cand_lens[:, :, None]
    )  # [B, C, Td]
    sims = jnp.where(tok_ok[:, None, :, :], sims, NEG_INF)
    per_token = jnp.max(sims, axis=3)  # [B, Tq, C]
    q_ok = jax.lax.broadcasted_iota(jnp.int32, (b, tq), 1) < query_lens[:, None]
    per_token = jnp.where(q_ok[:, :, None], per_token, 0.0)
    # an empty candidate doc would sum Tq x NEG_INF into -inf; clamp per
    # token (empty docs are overridden to NEG_INF below anyway)
    per_token = jnp.maximum(per_token, -1e30)
    scores = per_token.sum(axis=1)  # [B, C]
    # empty docs (len 0) are not real hits
    scores = jnp.where(cand_lens > 0, scores, NEG_INF)
    valid = cand < n
    scores = jnp.where(valid, scores, NEG_INF)
    ids = jnp.where(valid, cand, INT_MAX)
    k_eff = min(k, c)
    s, i = sort_topk(scores, ids, k_eff)
    return pad_to_k(s, i, k, k_eff)


def maxsim_topk(
    queries, query_lens, docs, doc_lens, k, method: str = "auto",
    tile_n: int | None = None,
):
    # Measured v5e sweeps:
    # - text scale (scripts/bench_maxsim_pallas.py, 50k x 128tok x 128d,
    #   8q x 32tok sustained): f32-HIGHEST — pallas v2 bn=16 253.0 QPS >
    #   v1 244.3 > XLA scan 204.2. bf16 — the XLA scan wins 595.9 vs 511.0
    #   (cheap matmuls leave pallas VPU-bound at short docs).
    # - page scale (scripts/bench_maxsim_page.py, 10k pages, 2026-08-19,
    #   mm_docs-chunked kernel): bf16 v2 beats the scan from td=512 up
    #   (1046 vs 834 @ 512; bn=16 814.7 vs scan 487.0 @ 1024 — 1.67x, with
    #   bn=8 at 770.7); f32 v2 wins through td=512 (697 vs 602 @ 256; 475
    #   vs 354 @ 512) and cannot compile at td=1024 (HIGHEST decomposition
    #   scratch: docs block 4MB x 2 buffers x 2 hi/lo passes alone fills
    #   VMEM). ids == xla everywhere it runs.
    # Dispatch: per-dtype VMEM feasibility of the docs block picks block_n
    # in {16, 8}; f32 routes to pallas wherever feasible, bf16 only at
    # td_pad >= 512; XLA scan otherwise and on CPU.
    if method == "auto":
        from autorag_research_tpu.ops.dense import on_tpu

        method = "xla"
        if on_tpu():
            n, b = docs.shape[0], queries.shape[0]
            td_pad = _round_up(docs.shape[1], 8)
            d_pad = _round_up(docs.shape[2], 128)
            is_f32 = jnp.dtype(queries.dtype) == jnp.float32
            itemsize = 4 if is_f32 else 2
            # docs-block VMEM cost: x2 pipeline buffering, and x2 again for
            # the f32 HIGHEST hi/lo decomposition scratch
            factor = 4 if is_f32 else 2
            s_bytes = (1 << 20) if is_f32 else (4 << 20)
            # 12MB admits exactly the measured-good frontier: bf16 td=1024
            # fits bn=16 (12,582,912 bytes == budget; 814.7 QPS on chip)
            # while f32 td=1024 bn=8 (16.8MB) is excluded — that config
            # fails remote compile (HIGHEST hi/lo decomposition scratch)
            budget = 12 << 20
            bn_fit = next(
                (
                    bn
                    for bn in (16, 8)
                    if bn * td_pad * d_pad * itemsize * factor + s_bytes
                    <= budget
                ),
                None,
            )
            if bn_fit is not None and (is_f32 or td_pad >= 512):
                if _round_up(min(k, n), 8) <= bn_fit:
                    # fused running-top-k kernel: each tile holds >= k
                    return maxsim_topk_pallas_v2(
                        queries, query_lens, docs, doc_lens, k, block_n=bn_fit
                    )
                if b * n * 4 <= (256 << 20):
                    # large k (verified prescreen top-(k'+1), rerank
                    # fetches): flat scores + host-side exact sort
                    return maxsim_topk_via_scores(
                        queries, query_lens, docs, doc_lens, k, block_n=bn_fit
                    )
    if method in ("pallas", "pallas_v2", "pallas_v3"):
        from autorag_research_tpu.ops.dense import on_tpu

        kernel = {
            "pallas": maxsim_topk_pallas,
            "pallas_v2": maxsim_topk_pallas_v2,
            "pallas_v3": maxsim_topk_pallas_v3,
        }[method]
        # off-TPU an explicit pallas request runs the interpreter (tests)
        return kernel(queries, query_lens, docs, doc_lens, k, interpret=not on_tpu())
    if method == "xla":
        return maxsim_topk_xla(queries, query_lens, docs, doc_lens, k, tile_n=tile_n)
    raise ValueError(f"unknown maxsim method: {method}")


# ----------------------------------------------------------- int8 serving
def quantize_int8_tokens(docs):
    """Per-TOKEN-row symmetric int8 quantization of a padded ``[N, Td, d]``
    token matrix: ``docs ~= q * scale[..., None]``.

    Returns ``(q int8 [N, Td, d], scale f32 [N, Td])``. Padding tokens are
    zero rows and get scale 0 (scores exactly 0 — and they are additionally
    masked by ``doc_lens`` in the kernel). Accepts numpy (index build path —
    quantize once on host, ship 4x fewer bytes) or jax input, mirroring
    :func:`autorag_research_tpu.ops.dense.quantize_int8`.
    """
    from autorag_research_tpu.ops.dense import quantize_int8

    n, td, d = docs.shape
    q, scale = quantize_int8(docs.reshape(n * td, d))
    return q.reshape(n, td, d), scale.reshape(n, td)


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def maxsim_topk_int8(
    queries: jax.Array,  # [B, Tq, d] f32
    query_lens: jax.Array,  # [B]
    docs_q: jax.Array,  # [N, Td, d] int8 (quantize_int8_tokens)
    doc_scales: jax.Array,  # [N, Td] f32 per-token dequant scales
    doc_lens: jax.Array,  # [N]
    k: int,
    tile_n: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """MaxSim top-k over a per-token int8-quantized corpus.

    The s8 x s8 -> s32 token contraction runs on the MXU at 2x the bf16
    rate and reads 4x fewer corpus bytes than f32 — and multi-vector
    corpora are where HBM capacity actually runs out (50k ColPali pages x
    1024 patches x 128d = 26 GB f32, 6.6 GB int8). Queries quantize
    per token row on device; each doc token's dequant scale folds into the
    score tile BEFORE the max over doc tokens (scales vary per token, so
    they change which token wins), and the per-QUERY-token scale applies to
    the winning maxima before the token sum (it weights the sum).

    Contract: APPROXIMATE (quantization error ~1e-2 relative on
    L2-normalized token embeddings; agreement measured in
    scripts/bench_maxsim_int8.py). Selection within the quantized scores is
    exact ``(-score, id)`` — the kernel is deterministic, just not equal to
    the f32 scan. Serving-speed mode — never for parity/oracle runs.

    Replaces the reference's ``@#`` MaxSim scan
    (orm/repository/base.py:487-571) for capacity-bound serving corpora.
    """
    b, tq, d = queries.shape
    n, td, _ = docs_q.shape
    k_eff = min(k, n)
    if tile_n is None:
        tile_n = _auto_tile_n(b, tq, td, n)
    tile_n = min(tile_n, _round_up(n, 8))
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        docs_q = jnp.pad(docs_q, ((0, n_pad - n), (0, 0), (0, 0)))
        doc_scales = jnp.pad(doc_scales, ((0, n_pad - n), (0, 0)))
        doc_lens = jnp.pad(doc_lens, (0, n_pad - n))
    doc_tiles = docs_q.reshape(n_pad // tile_n, tile_n, td, d)
    scale_tiles = doc_scales.reshape(n_pad // tile_n, tile_n, td)
    len_tiles = doc_lens.reshape(n_pad // tile_n, tile_n)

    from autorag_research_tpu.ops.dense import quantize_int8

    q_q, q_scale = quantize_int8(queries.astype(jnp.float32).reshape(b * tq, d))
    q_q = q_q.reshape(b, tq, d)
    q_scale = q_scale.reshape(b, tq)
    q_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, tq), 1) < query_lens[:, None]
    )  # [B, Tq]
    # fold the query-token scale with the mask once: weights the per-token
    # maxima in the sum, zeroing padded query tokens
    q_weight = jnp.where(q_mask, q_scale, 0.0)  # [B, Tq]

    def body(carry, inp):
        carry_s, carry_i = carry
        (tile, scales, lens), tile_idx = inp
        # one plain 2-D s8 dot_general — the proven MXU int8 shape
        # (ops/dense._dense_topk_int8_flat)
        s_i32 = jax.lax.dot_general(
            q_q.reshape(b * tq, d),
            tile.reshape(tile_n * td, d),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # [B, Tq, tile_n, Td] — row/col splits are contiguous, free reshape
        s = s_i32.reshape(b, tq, tile_n, td).astype(jnp.float32)
        s = s * scales[None, None, :, :]  # per-doc-token dequant BEFORE max
        s_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (tile_n, td), 1) < lens[:, None]
        )  # [tile_n, Td]
        s = jnp.where(s_mask[None, None, :, :], s, NEG_INF)
        per_token = jnp.max(s, axis=3)  # [B, Tq, tile_n]
        per_token = per_token * q_weight[:, :, None]
        # padded query tokens must contribute exactly 0 even against the
        # NEG_INF maxima of empty docs (0 * -inf would be NaN if NEG_INF
        # were a true infinity) — re-mask instead of relying on q_weight
        per_token = jnp.where(q_mask[:, :, None], per_token, 0.0)
        scores = jnp.sum(per_token, axis=1)  # [B, tile_n]
        base = tile_idx * tile_n
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
        valid = (col < n) & (lens[None, :] > 0)
        scores = jnp.where(valid, scores, NEG_INF)
        tile_k = min(k_eff, tile_n)
        tile_s, tile_local = jax.lax.top_k(scores, tile_k)
        merged = sort_topk(
            jnp.concatenate([carry_s, tile_s], axis=1),
            jnp.concatenate([carry_i, tile_local + base], axis=1),
            k_eff,
        )
        return merged, None

    init = (
        jnp.full((b, k_eff), NEG_INF, jnp.float32),
        jnp.full((b, k_eff), INT_MAX, jnp.int32),
    )
    (scores, ids), _ = jax.lax.scan(
        body,
        init,
        ((doc_tiles, scale_tiles, len_tiles), jnp.arange(doc_tiles.shape[0], dtype=jnp.int32)),
    )
    return pad_to_k(scores, ids, k, k_eff)


# ------------------------------------------------------- verified-exact path
def build_maxsim_sidecar(docs, doc_lens) -> dict:
    """Host-side prescreen sidecar for :func:`maxsim_topk_verified`.

    Returns ``{"docs_lo", "nd_max", "r_max"}``:

    - ``docs_lo``: bf16 copy of the padded ``[N, Td, d]`` token matrix —
      the low-precision prescreen corpus (half the HBM traffic of f32).
    - ``nd_max``: max_j ||d_j||_2 over all VALID doc token vectors.
    - ``r_max``: max_j ||d_j - bf16(d_j)||_2 over all valid doc tokens —
      the exact per-token quantization residual, maximized.

    Maxima are computed in float64 and rounded UP (slack factor + nextafter)
    so they are provable upper bounds for the f32 arithmetic on device.
    Padding tokens are zeros (bf16-exact, residual 0) and are masked by
    ``doc_lens`` in every kernel, so including them in neither maximum
    changes validity.
    """
    import ml_dtypes
    import numpy as np

    d32 = np.asarray(docs, dtype=np.float32)
    if d32.size == 0:
        raise ValueError("cannot build a maxsim sidecar for an empty corpus")
    docs_lo = d32.astype(ml_dtypes.bfloat16)
    # row-chunked f64 maxima: the [N, Td, d] f64 intermediates would be 4x
    # the corpus (13 GB at 50k x 128 x 128); max is associative, so chunking
    # changes peak memory only
    r_max = 0.0
    nd_max = 0.0
    chunk = max(1, (1 << 28) // max(d32.shape[1] * d32.shape[2] * 8, 1))
    for lo in range(0, d32.shape[0], chunk):
        d64 = d32[lo : lo + chunk].astype(np.float64)
        resid = d64 - docs_lo[lo : lo + chunk].astype(np.float64)
        r_max = max(r_max, float(np.sqrt((resid * resid).sum(axis=2)).max()))
        nd_max = max(nd_max, float(np.sqrt((d64 * d64).sum(axis=2)).max()))

    def _up(x: float) -> float:
        x32 = np.float32(x * (1.0 + 1e-6))
        return float(np.nextafter(x32, np.float32(np.inf)))

    return {"docs_lo": docs_lo, "nd_max": _up(nd_max), "r_max": _up(r_max)}


def _maxsim_prescreen_eps(qf, q_hat, q_mask, nd_max, r_max):
    """Provable per-query MaxSim error bound (raw un-normalized scores).

    For one query token t and any doc token s:
      |q_t·d_s − q̂_t·d̂_s| <= ||q_t − q̂_t||·nd_max + ||q̂_t||·r_max   (C-S)
    max over s is 1-Lipschitz in the sup-norm, and MaxSim sums over the
    valid query tokens, so eps = sum_t of the per-token bounds. The 1.001
    factor + the (d + Tq)·2^-23 term cover every f32 evaluation rounding
    (per-dot accumulation over d, the Tq-term score sum, norms, and the f32
    accumulation of the bf16 MXU prescreen), scaled by the norm products
    they bound — the same slack structure as ops/dense._prescreen_eps."""
    d = qf.shape[2]
    tq = qf.shape[1]
    eq = qf - q_hat
    eqn = jnp.sqrt(jnp.sum(eq * eq, axis=2))  # [B, Tq]
    qn = jnp.sqrt(jnp.sum(q_hat * q_hat, axis=2))  # [B, Tq]
    eqn = jnp.where(q_mask, eqn, 0.0)
    qn = jnp.where(q_mask, qn, 0.0)
    s_eqn = jnp.sum(eqn, axis=1)
    s_qn = jnp.sum(qn, axis=1)
    return (s_eqn * nd_max + s_qn * r_max) * 1.001 + (
        (d + tq) * 2.0**-23
    ) * s_qn * (nd_max + r_max) + 1e-30


@functools.partial(
    jax.jit, static_argnames=("k", "kprime", "second_chance", "tile_n")
)
def _maxsim_topk_verified(
    queries: jax.Array,  # [B, Tq, d] f32
    query_lens: jax.Array,  # [B]
    docs: jax.Array,  # [N, Td, d] f32 (exact)
    doc_lens: jax.Array,  # [N]
    docs_lo: jax.Array,  # [N, Td, d] bf16 (prescreen)
    nd_max: jax.Array,
    r_max: jax.Array,
    k: int,
    kprime: int,
    second_chance: int,
    tile_n: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    b, tq, d = queries.shape
    n = docs.shape[0]
    k_eff = min(k, n)
    kp_eff = min(kprime, n)
    f_cap = min(second_chance, b)
    qf = queries.astype(jnp.float32)
    q_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, tq), 1) < query_lens[:, None]
    )

    # ---- pass 1: bf16 prescreen full scan -> top-(k'+1) candidates ---------
    q_lo = qf.astype(jnp.bfloat16)
    q_hat = q_lo.astype(jnp.float32)
    eps = _maxsim_prescreen_eps(qf, q_hat, q_mask, nd_max, r_max)
    # auto dispatch: at page scale (td >= 512) the bf16 prescreen rides the
    # chunked Pallas kernel (1.66x the XLA scan at Td=1024); the eps slack
    # already covers the bf16-MXU/f32-accumulation arithmetic of either
    # engine, so the proof is engine-independent
    ps, pi = maxsim_topk(
        q_lo, query_lens, docs_lo, doc_lens, kp_eff + 1, tile_n=tile_n
    )
    # (k'+1)-th prescreen score: any non-candidate doc scores <= this
    boundary = ps[:, kp_eff] if ps.shape[1] > kp_eff else jnp.full(
        (b,), NEG_INF, jnp.float32
    )
    cand = pi[:, :kp_eff]  # [B, k'] rows; INT_MAX pads when n < k'+1

    # ---- pass 2: exact f32 HIGHEST rescore of the candidates only ----------
    out_s, out_i = maxsim_rerank(
        qf, query_lens, docs, doc_lens, cand, k_eff
    )

    # ---- verification: no non-candidate doc can reach the top-k ------------
    # A doc with true >= e_(k) must prescreen >= theta = e_(k) - eps; every
    # non-candidate prescreens <= boundary, so boundary < theta proves the
    # true top-k — including (-score, id) tie order — lies inside the
    # exactly-ranked candidate set.
    ekth = out_s[:, k_eff - 1]
    theta = ekth - eps
    ok_q = boundary < theta
    n_fail = jnp.sum((~ok_q).astype(jnp.int32))

    # ---- second chance: full exact scan for up to f_cap failed queries -----
    if f_cap > 0:
        prio = jnp.where(
            ok_q,
            b + jnp.arange(b, dtype=jnp.int32),
            jnp.arange(b, dtype=jnp.int32),
        )
        order = jnp.argsort(prio)[:f_cap]
        fs, fi = maxsim_topk_xla(
            qf[order], query_lens[order], docs, doc_lens, k_eff, tile_n=tile_n
        )
        take = ~ok_q[order]
        out_s = out_s.at[order].set(jnp.where(take[:, None], fs, out_s[order]))
        out_i = out_i.at[order].set(jnp.where(take[:, None], fi, out_i[order]))

    covered = n_fail <= f_cap

    def _keep(args):
        return args

    def _full(args):
        return maxsim_topk_xla(qf, query_lens, docs, doc_lens, k_eff, tile_n=tile_n)

    out_s, out_i = jax.lax.cond(covered, _keep, _full, (out_s, out_i))
    out_s, out_i = pad_to_k(out_s, out_i, k, k_eff)
    return out_s, out_i, n_fail, covered


def maxsim_topk_verified(
    queries: jax.Array,  # [B, Tq, d]
    query_lens: jax.Array,  # [B]
    docs: jax.Array,  # [N, Td, d] f32 exact
    doc_lens: jax.Array,  # [N]
    sidecar: dict,
    k: int,
    kprime: int = 64,
    second_chance: int = 0,
    tile_n: int | None = None,
    return_stats: bool = False,
):
    """GUARANTEED-EXACT MaxSim top-k at bf16-prescreen speed.

    Two passes: (1) the bf16 XLA scan (the measured-fastest full-scan engine
    for bf16 inputs) prescreens ALL docs and keeps the top-``kprime``
    candidates plus the (k'+1)-th boundary score; (2) only the candidates
    are rescored exactly (f32 ``Precision.HIGHEST``, :func:`maxsim_rerank`)
    and selected by ``(-score, doc_id)``.

    Exactness is verified per query, never assumed: a provable per-query
    error bound eps (Cauchy-Schwarz over the sidecar's exact residual norms,
    summed over the query's valid tokens — :func:`build_maxsim_sidecar`)
    defines the prescreen score a contender must reach; ``boundary <
    e_k - eps`` proves the true top-k lies inside the exactly-ranked
    candidate set. Failures re-run as full exact scans (``second_chance``
    per batch at fixed cost, else the whole batch falls back), so results
    ALWAYS equal ``maxsim_topk(..., method='xla')`` on f32 inputs —
    including tie order on exact ties — up to the same sub-ulp
    reduction-split caveat the dense verified path documents.

    Replaces the reference's per-query MaxSim Postgres scan (VectorChord
    ``@#``, ``orm/repository/base.py:487-571``) without giving up its
    exactness contract. Raw (un-normalized) scores, like every other
    maxsim_* op; callers divide by the query token count.

    ``kprime`` sizing (v5e, 50k x 128tok x 128d random corpus,
    scripts/bench_maxsim_verified.py): eps sums over the query's tokens
    (~0.077 raw at 32 unit-norm tokens with the bf16 r_max 0.0024), so the
    (k'+1)-th boundary must sit that far below e_k — kp<=32 failed ~41% of
    random queries (every failure pays a full exact scan: 163 QPS, SLOWER
    than exact alone) while kp=64 passed with 602.8 QPS = 2.9x the exact
    f32 scan. Real clustered corpora have wider gaps; random data is the
    worst case. Failures only ever cost speed, never exactness.

    ``kprime`` is clamped to ``max(kprime, k)``: with k' < k the candidate
    list cannot even hold the top-k, e_k pads to the NEG_INF sentinel, the
    coverage proof can never pass, and every batch would silently pay
    prescreen + rescore + a full exact fallback — strictly slower than
    plain exact mode.
    """
    kprime = max(kprime, k)
    out_s, out_i, n_fail, covered = _maxsim_topk_verified(
        queries,
        query_lens,
        docs,
        doc_lens,
        jnp.asarray(sidecar["docs_lo"]),
        jnp.float32(sidecar["nd_max"]),
        jnp.float32(sidecar["r_max"]),
        k,
        kprime,
        second_chance,
        tile_n,
    )
    if return_stats:
        return out_s, out_i, n_fail, covered
    return out_s, out_i
