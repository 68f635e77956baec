"""Dense exact similarity scoring + top-k: the VectorChord ``<=>`` replacement.

The reference's dense hot path is one SQL statement per query —
``SELECT id, embedding <=> :q AS distance ORDER BY distance LIMIT k`` executed
by the VectorChord Rust extension inside Postgres
(``orm/repository/base.py:404-426``). Here the corpus lives in TPU HBM as an
``[N, d]`` array and a whole query batch is scored at once:

- ``dense_topk_pallas``: fused Pallas kernel — tiled query x corpus matmul on
  the MXU with a streaming on-chip top-k accumulator in VMEM, so the [Q, N]
  score matrix is never materialized in HBM. Grid = (q_tiles, n_tiles),
  n innermost; the running [BQ, K] accumulator merges each tile's scores by
  the global ``(-score, doc_id)`` order (k iterations of max + tie-break-min +
  mask, all VPU ops).
- ``dense_topk_xla``: XLA fallback — lax.scan over corpus tiles with a
  carry of the running top-k (lax.top_k per tile + deterministic 2-key merge).
  Used on CPU meshes and as the parity oracle.

Scores are raw dot products: with L2-normalized inputs this is cosine
similarity = 1 - cosine distance, matching the reference's score convention
(``orm/service/retrieval_pipeline.py:516-524``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sentinels re-exported from topk (the canonical definition) — Python
# literals there, so Pallas kernels see compile-time constants
from autorag_research_tpu.ops.topk import (  # noqa: F401
    INT_MAX,
    NEG_INF,
    pad_to_k,
    sort_topk,
)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# --------------------------------------------------------------------- XLA
@functools.partial(jax.jit, static_argnames=("k",))
def dense_topk_xla_full(
    queries: jax.Array, corpus: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Exact dense top-k via one fused dot + lax.top_k (scores materialized).

    Fastest single-chip path when the [Q, N] score matrix fits in HBM — XLA
    fuses the matmul with a streaming top-k. lax.top_k breaks ties toward the
    lower index, matching this framework's (-score, id) order exactly.
    """
    n = corpus.shape[0]
    k_eff = min(k, n)
    scores = jax.lax.dot_general(
        queries,
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(queries.dtype),
    )
    top_s, top_i = jax.lax.top_k(scores, k_eff)
    return pad_to_k(top_s, top_i, k, k_eff)


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def dense_topk_xla(
    queries: jax.Array, corpus: jax.Array, k: int, tile_n: int = 131072
) -> tuple[jax.Array, jax.Array]:
    """Exact dense top-k via XLA: scan over corpus tiles, bounded memory.

    queries: [Q, d], corpus: [N, d]. Returns (scores [Q, k], ids [Q, k])
    ordered by (-score, id).
    """
    q = queries.shape[0]
    n, d = corpus.shape
    k_eff = min(k, n)
    tile_n = min(tile_n, _round_up(n, 128))
    # Full tiles stream via dynamic_slice out of the ORIGINAL corpus buffer —
    # never pad the whole corpus (a padded scan-xs copy would double resident
    # HBM for the entire call). The ragged tail merges in one step outside
    # the scan.
    t_full = n // tile_n
    rem = n - t_full * tile_n
    tile_k = min(k_eff, tile_n)

    def body(carry, tile_idx):
        carry_s, carry_i = carry
        base = tile_idx * tile_n
        tile = jax.lax.dynamic_slice(corpus, (base, 0), (tile_n, d))
        scores = jnp.dot(
            queries,
            tile.T,
            preferred_element_type=jnp.float32,
            precision=_precision_for(queries.dtype),
        )  # [Q, tile_n]
        tile_s, tile_local = jax.lax.top_k(scores, tile_k)  # ties -> lower index
        tile_i = tile_local + base
        merged_s, merged_i = sort_topk(
            jnp.concatenate([carry_s, tile_s], axis=1),
            jnp.concatenate([carry_i, tile_i], axis=1),
            k_eff,
        )
        return (merged_s, merged_i), None

    init = (
        jnp.full((q, k_eff), NEG_INF, jnp.float32),
        jnp.full((q, k_eff), INT_MAX, jnp.int32),
    )
    scores, ids = init
    if t_full:
        (scores, ids), _ = jax.lax.scan(
            body, init, jnp.arange(t_full, dtype=jnp.int32)
        )
    if rem:
        tail_scores = jnp.dot(
            queries,
            corpus[t_full * tile_n :].T,
            preferred_element_type=jnp.float32,
            precision=_precision_for(queries.dtype),
        )  # [Q, rem]
        tail_k = min(k_eff, rem)
        tail_s, tail_local = jax.lax.top_k(tail_scores, tail_k)
        tail_i = tail_local + t_full * tile_n
        scores, ids = sort_topk(
            jnp.concatenate([scores, tail_s], axis=1),
            jnp.concatenate([ids, tail_i], axis=1),
            k_eff,
        )
    return pad_to_k(scores, ids, k, k_eff)


# ------------------------------------------------------------------ Pallas
def _extract_topk(cand_s, cand_i, k):
    """k rounds of (max score, min id among ties) extraction — the on-chip
    equivalent of sorting by (-score, id) and taking k. All VPU ops, no gather."""
    out_s = []
    out_i = []
    for _ in range(k):
        m = jnp.max(cand_s, axis=1)  # [BQ]
        tie = cand_s == m[:, None]
        chosen = jnp.min(jnp.where(tie, cand_i, INT_MAX), axis=1)  # [BQ]
        out_s.append(m)
        out_i.append(chosen)
        cand_s = jnp.where(tie & (cand_i == chosen[:, None]), NEG_INF, cand_s)
    return jnp.stack(out_s, axis=1), jnp.stack(out_i, axis=1)


def _precision_for(dtype) -> jax.lax.Precision:
    """HIGHEST (true f32 MXU passes) for f32 inputs — required for rank parity
    with the reference's exact f32 scan; bf16 inputs use DEFAULT (Mosaic
    rejects fp32 contract precision on bf16 operands)."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _dense_topk_kernel(q_ref, c_ref, out_s_ref, out_i_ref, acc_s, acc_i, *, k, n, block_n):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, INT_MAX)

    scores = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(q_ref.dtype),
    )  # [BQ, BN]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * block_n
    scores = jnp.where(col < n, scores, NEG_INF)

    # Threshold skip: once the accumulator is warm, most tiles cannot beat any
    # query's current k-th score — the expensive 2k-round extraction is
    # predicated away and only the matmul + row-max runs for those tiles.
    tile_row_max = jnp.max(scores, axis=1)  # [BQ]
    acc_kth = acc_s[:, k - 1]
    needs_merge = jnp.any(tile_row_max > acc_kth) | (j == 0)

    @pl.when(needs_merge)
    def _merge():
        tile_s, tile_i = _extract_topk(scores, col, k)
        cand_s = jnp.concatenate([acc_s[:], tile_s], axis=1)
        cand_i = jnp.concatenate([acc_i[:], tile_i], axis=1)
        new_s, new_i = _extract_topk(cand_s, cand_i, k)
        acc_s[:] = new_s
        acc_i[:] = new_i

    @pl.when(j == nj - 1)
    def _write():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "block_q", "block_n", "interpret")
)
def dense_topk_pallas(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    block_q: int = 128,
    block_n: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused Pallas dense top-k. See module docstring.

    queries [Q, d] and corpus [N, d] may be f32 or bf16; accumulation is f32.
    Returns (scores [Q, k], ids [Q, k]) in global (-score, id) order.
    """
    q, d = queries.shape
    n = corpus.shape[0]
    k_eff = min(k, n)

    # Pad shapes to hardware tiles: lanes (last dim) to 128, sublanes to 8.
    d_pad = _round_up(d, 128)
    bq = min(block_q, _round_up(q, 8))
    q_pad = _round_up(q, bq)
    # a tile must hold >= k candidates or the NEG_INF-tie extraction emits
    # duplicate ids
    bn = max(block_n, _round_up(k_eff, 128))
    n_pad = _round_up(n, bn)
    queries = jnp.pad(queries, ((0, q_pad - q), (0, d_pad - d)))
    corpus = jnp.pad(corpus, ((0, n_pad - n), (0, d_pad - d)))

    grid = (q_pad // bq, n_pad // bn)
    kernel = functools.partial(_dense_topk_kernel, k=k_eff, n=n, block_n=bn)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k_eff), jnp.float32),
            pltpu.VMEM((bq, k_eff), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d_pad,
            bytes_accessed=(q_pad * d_pad + n_pad * d_pad) * queries.dtype.itemsize
            + q_pad * k_eff * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, corpus)
    out_s, out_i = out_s[:q], out_i[:q]
    return pad_to_k(out_s, out_i, k, k_eff)


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def dense_topk_xla_two_stage(
    queries: jax.Array, corpus: jax.Array, k: int, tile: int = 2048
) -> tuple[jax.Array, jax.Array]:
    """Exact dense top-k via hierarchical k-selection: dot, reshape the score
    row into [T, tile] segments, one parallel ``lax.top_k`` per segment, then
    a global ``lax.top_k`` over the T*k survivors.

    Replaces the single ``lax.top_k`` over the full [Q, N] row, whose sort
    network dominates the fused path (measured v5e, 256q x 500k x 768: the
    matmul is ~1 ms of an 8.3 ms bf16 batch — see scripts/bench_dense_topk2.py).

    Exactness: the global winners are contained in the per-segment winners,
    and (-score, doc_id) ordering survives both stages — concat order is
    (segment, rank), both top_k calls break ties toward the lower position,
    and within a segment lower rank at equal score means lower doc id.
    """
    n = corpus.shape[0]
    k_eff = min(k, n)
    tile = max(tile, _round_up(k_eff, 128))
    n_pad = _round_up(n, tile)
    scores = jax.lax.dot_general(
        queries,
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(queries.dtype),
    )
    if n_pad != n:
        scores = jnp.pad(scores, ((0, 0), (0, n_pad - n)), constant_values=NEG_INF)
    t = n_pad // tile
    tile_s, tile_loc = jax.lax.top_k(scores.reshape(-1, t, tile), k_eff)
    base = (jnp.arange(t, dtype=jnp.int32) * tile)[None, :, None]
    cand_i = (tile_loc + base).reshape(-1, t * k_eff)
    cand_s = tile_s.reshape(-1, t * k_eff)
    out_s, pos = jax.lax.top_k(cand_s, k_eff)
    out_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return pad_to_k(out_s, out_i, k, k_eff)


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def dense_topk_approx(
    queries: jax.Array, corpus: jax.Array, k: int, recall_target: float = 0.99
) -> tuple[jax.Array, jax.Array]:
    """Approximate dense top-k: dot + ``lax.approx_max_k`` (the TPU
    PartialReduce op — k-selection fused into a single bucketed pass over
    the score row instead of a sort network).

    Measured v5e, 256q x 500k x 768 bf16 sustained
    (scripts/bench_dense_sustained.py): 2.74 ms/batch = 93.6k QPS at 71.9
    TFLOP/s vs 8.43 ms / 30.4k for dot + exact lax.top_k — the k-selection
    is effectively free (matmul-only measures 2.90 ms). Top-10 agreement
    with the exact ranking: 0.996 at recall_target 0.99.

    Contract: APPROXIMATE. Equal-score ties are NOT guaranteed to resolve
    by ascending doc id — use the exact paths for parity/oracle runs. On
    CPU backends approx_max_k lowers to an exact top-k.
    """
    n = corpus.shape[0]
    k_eff = min(k, n)
    scores = jax.lax.dot_general(
        queries,
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(queries.dtype),
    )
    out_s, out_i = jax.lax.approx_max_k(scores, k_eff, recall_target=recall_target)
    out_i = out_i.astype(jnp.int32)
    return pad_to_k(out_s, out_i, k, k_eff)


def quantize_int8(x) -> tuple["jnp.ndarray", "jnp.ndarray"]:
    """Per-row symmetric int8 quantization: ``x ~= q * scale[:, None]``.

    Returns (q int8 [N, d], scale f32 [N]). Zero rows get scale 0 (their
    scores stay exactly 0, matching ``l2_normalize``'s zero-row convention).
    Accepts numpy or jax input; returns numpy for numpy input (build path)
    so indexes can quantize once on host and ship 4x fewer bytes to HBM.
    """
    import numpy as np

    if isinstance(x, np.ndarray):
        absmax = np.max(np.abs(x), axis=1)
        scale = absmax / 127.0
        safe = np.where(scale == 0, 1.0, scale)
        q = np.clip(np.rint(x / safe[:, None]), -127, 127).astype(np.int8)
        return q, scale.astype(np.float32)
    absmax = jnp.max(jnp.abs(x), axis=1)
    scale = absmax / 127.0
    safe = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(x / safe[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_int8_global(x) -> tuple["jnp.ndarray", float]:
    """ONE symmetric scale for the whole matrix: ``x ~= q * scale``.

    With a global scale the raw s32 scores are already rank-faithful, so
    k-selection needs no per-doc dequant broadcast at all — the scale is a
    post-selection constant. On L2-normalized embeddings per-row absmax
    varies little, so quality is close to per-row (measured in
    scripts/bench_dense_int8.py). Host (numpy) input only — this is the
    index build path."""
    import numpy as np

    x = np.asarray(x)
    scale = float(np.max(np.abs(x))) / 127.0
    safe = scale if scale > 0 else 1.0
    q = np.clip(np.rint(x / safe), -127, 127).astype(np.int8)
    return q, scale


def dense_topk_int8(
    queries: jax.Array,
    corpus_q: jax.Array,
    corpus_scale: jax.Array,
    k: int,
    exact: bool = False,
    tile_n: int = 131072,
) -> tuple[jax.Array, jax.Array]:
    """Dense top-k over a per-row int8-quantized corpus.

    The s8 x s8 -> s32 contraction runs on the MXU at 2x the bf16 rate on
    v5e (394 vs 197 TOPS) and reads 4x fewer corpus bytes than f32 — and
    the large-batch regime is measured corpus-traffic-bound
    (scripts/bench_dense_bf16_push.py). Per-doc dequantization scales fold
    into the score tiles before k-selection (they change ranking); the
    per-QUERY scale is a positive row constant, so it is applied to the k
    winners after selection instead of the full [Q, N] row.

    Dispatches by shape like :func:`dense_topk`: one fused matmul +
    k-selection while the [Q, N] score matrix fits ``FULL_MATERIALIZE_BUDGET``;
    beyond that, a corpus-tiled scan with a running deterministic merge
    (bounded memory — this is what makes a 4x-denser int8 corpus servable
    on one chip where the flat score matrix would not fit HBM; MEASURED at
    8M x 768: 5.86 GB resident, 19.1k QPS @ Q=256 / 23.5k @ Q=1024 through
    the scan path, 0.975 top-10 agreement vs an f32 host oracle —
    scripts/bench_dense_int8_8m.py, 2026-08-19).

    ``tile_n`` only applies on the tiled-scan path — the flat path ignores
    it (and its peak HBM is the score matrix plus its f32 convert, so
    dispatch near the budget boundary can transiently hold ~2x the
    estimate).

    Contract: APPROXIMATE (quantization error ~1e-2 relative on
    L2-normalized embeddings; measured top-10 agreement in
    scripts/bench_dense_int8.py). ``exact=True`` selects with ``lax.top_k``
    ((-score, id) ties within the quantized scores — identical between the
    flat and scan paths); the default uses ``lax.approx_max_k`` like the
    bf16 fast mode. Serving-speed mode — never for parity/oracle runs.
    """
    score_bytes = queries.shape[0] * corpus_q.shape[0] * 4
    if score_bytes <= FULL_MATERIALIZE_BUDGET:
        return _dense_topk_int8_flat(queries, corpus_q, corpus_scale, k, exact)
    return _dense_topk_int8_scan(queries, corpus_q, corpus_scale, k, exact, tile_n)


@functools.partial(jax.jit, static_argnames=("k", "exact"))
def _dense_topk_int8_flat(
    queries: jax.Array,
    corpus_q: jax.Array,
    corpus_scale: jax.Array,
    k: int,
    exact: bool = False,
) -> tuple[jax.Array, jax.Array]:
    n = corpus_q.shape[0]
    k_eff = min(k, n)
    q_q, q_scale = quantize_int8(queries.astype(jnp.float32))
    s_i32 = jax.lax.dot_general(
        q_q,
        corpus_q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if jnp.ndim(corpus_scale) == 0:
        # global corpus scale: s32 scores are already rank-faithful — select
        # on the bare convert (no per-doc broadcast in the reduction) and
        # apply both scales to the k winners only.
        scores = s_i32.astype(jnp.float32)
        if exact:
            out_s, out_i = jax.lax.top_k(scores, k_eff)
        else:
            out_s, out_i = jax.lax.approx_max_k(scores, k_eff, recall_target=0.99)
        out_s = out_s * (q_scale[:, None] * corpus_scale)
        out_i = out_i.astype(jnp.int32)
        return pad_to_k(out_s, out_i, k, k_eff)
    scores = s_i32.astype(jnp.float32) * corpus_scale[None, :]
    if exact:
        out_s, out_i = jax.lax.top_k(scores, k_eff)
    else:
        out_s, out_i = jax.lax.approx_max_k(scores, k_eff, recall_target=0.99)
    out_s = out_s * q_scale[:, None]
    out_i = out_i.astype(jnp.int32)
    return pad_to_k(out_s, out_i, k, k_eff)


@functools.partial(jax.jit, static_argnames=("k", "exact", "tile_n"))
def _dense_topk_int8_scan(
    queries: jax.Array,
    corpus_q: jax.Array,
    corpus_scale: jax.Array,
    k: int,
    exact: bool = False,
    tile_n: int = 131072,
) -> tuple[jax.Array, jax.Array]:
    """Bounded-memory int8 top-k: lax.scan over corpus tiles, running merge.

    Same selection values as the flat path (per-doc dequant folded into each
    tile's scores; per-query scale applied post-merge), so exact mode is
    bit-identical to it including (-score, id) tie order: per-tile lax.top_k
    breaks ties toward the lower index and ``sort_topk`` merges cross-tile
    ties by ascending id.
    """
    q = queries.shape[0]
    n, d = corpus_q.shape
    k_eff = min(k, n)
    per_doc = jnp.ndim(corpus_scale) != 0
    q_q, q_scale = quantize_int8(queries.astype(jnp.float32))
    tile_n = min(tile_n, _round_up(n, 128))
    # Stream full tiles with dynamic_slice from the ORIGINAL int8 buffer and
    # merge the ragged tail outside the scan — padding the whole corpus would
    # hold a 2x-resident padded copy live for the entire scan (the exact
    # failure the bounded-memory path exists to avoid).
    t_full = n // tile_n
    rem = n - t_full * tile_n

    def select(scores, tile_width):
        sel_k = min(k_eff, tile_width)
        if exact:
            return jax.lax.top_k(scores, sel_k)
        return jax.lax.approx_max_k(scores, sel_k, recall_target=0.99)

    def score_tile(tile, scale_tile):
        s_i32 = jax.lax.dot_general(
            q_q,
            tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = s_i32.astype(jnp.float32)
        if per_doc:
            scores = scores * scale_tile[None, :]
        return scores

    def body(carry, tile_idx):
        carry_s, carry_i = carry
        base = tile_idx * tile_n
        tile = jax.lax.dynamic_slice(corpus_q, (base, 0), (tile_n, d))
        scale_tile = (
            jax.lax.dynamic_slice(corpus_scale, (base,), (tile_n,))
            if per_doc
            else None
        )
        tile_s, tile_local = select(score_tile(tile, scale_tile), tile_n)
        tile_i = tile_local.astype(jnp.int32) + base
        merged_s, merged_i = sort_topk(
            jnp.concatenate([carry_s, tile_s], axis=1),
            jnp.concatenate([carry_i, tile_i], axis=1),
            k_eff,
        )
        return (merged_s, merged_i), None

    init = (
        jnp.full((q, k_eff), NEG_INF, jnp.float32),
        jnp.full((q, k_eff), INT_MAX, jnp.int32),
    )
    out_s, out_i = init
    if t_full:
        (out_s, out_i), _ = jax.lax.scan(
            body, init, jnp.arange(t_full, dtype=jnp.int32)
        )
    if rem:
        tail_scale = corpus_scale[t_full * tile_n :] if per_doc else None
        tail_s, tail_local = select(
            score_tile(corpus_q[t_full * tile_n :], tail_scale), rem
        )
        tail_i = tail_local.astype(jnp.int32) + t_full * tile_n
        out_s, out_i = sort_topk(
            jnp.concatenate([out_s, tail_s], axis=1),
            jnp.concatenate([out_i, tail_i], axis=1),
            k_eff,
        )
    if not per_doc:
        out_s = out_s * corpus_scale
    out_s = out_s * q_scale[:, None]
    return pad_to_k(out_s, out_i, k, k_eff)


# ------------------------------------------------------- verified exact fast
def build_verified_sidecar(corpus, rep: str = "int8", pad_rows_to: int | None = None) -> dict:
    """Host-side prescreen sidecar for :func:`dense_topk_verified`.

    Returns ``{"corpus_lo", "corpus_scale", "nd_max", "r_max"}``:

    - ``corpus_lo``: the low-precision prescreen corpus — per-row symmetric
      int8 (``rep="int8"``, 4x less HBM traffic + 2x MXU rate) or bf16
      (``rep="bf16"``, tighter error bound).
    - ``corpus_scale``: per-row f32 dequant scales (int8) or None (bf16).
    - ``nd_max``: max_d ||d||_2 over the exact f32 corpus.
    - ``r_max``: max_d ||d - dequant(lo(d))||_2 — the exact per-row
      quantization residual, maximized over the corpus.

    Both maxima are computed in float64 and rounded UP (slack factor +
    nextafter) so they are provable upper bounds for the f32 arithmetic
    used on device.
    """
    c = np.asarray(corpus, dtype=np.float32)
    if c.size == 0:
        raise ValueError("cannot build a verified sidecar for an empty corpus")
    c64 = c.astype(np.float64)
    if rep == "int8":
        corpus_lo, corpus_scale = quantize_int8(c)
        deq = corpus_lo.astype(np.float64) * corpus_scale.astype(np.float64)[:, None]
    elif rep == "bf16":
        import ml_dtypes

        corpus_lo = c.astype(ml_dtypes.bfloat16)
        corpus_scale = None
        deq = corpus_lo.astype(np.float64)
    else:
        raise ValueError(f"unknown verified prescreen rep: {rep}")

    def _up(x: float) -> float:
        x32 = np.float32(x * (1.0 + 1e-6))
        return float(np.nextafter(x32, np.float32(np.inf)))

    r_max = _up(float(np.linalg.norm(c64 - deq, axis=1).max()))
    nd_max = _up(float(np.linalg.norm(c64, axis=1).max()))
    if pad_rows_to:
        # pre-pad to the Pallas block multiple ON HOST so the kernel wrapper's
        # in-jit jnp.pad becomes a no-op (a 500k x 768 bf16 pad copy otherwise
        # costs ~1.5 ms per call); pad rows are masked by col < n in-kernel
        pad = _round_up(corpus_lo.shape[0], pad_rows_to) - corpus_lo.shape[0]
        if pad:
            corpus_lo = np.concatenate(
                [corpus_lo, np.zeros((pad, corpus_lo.shape[1]), corpus_lo.dtype)]
            )
            if corpus_scale is not None:
                corpus_scale = np.concatenate(
                    [corpus_scale, np.zeros(pad, corpus_scale.dtype)]
                )
    return {
        "corpus_lo": corpus_lo,
        "corpus_scale": corpus_scale,
        "nd_max": nd_max,
        "r_max": r_max,
    }


def _prescreen_query_side(qf, corpus_lo, corpus_scale):
    """Low-precision query representation + the prescreen error bound inputs."""
    if corpus_lo.dtype == jnp.int8:
        q_q, q_scale = quantize_int8(qf)
        q_hat = q_q.astype(jnp.float32) * q_scale[:, None]
        return (q_q, q_scale), q_hat
    q_lo = qf.astype(corpus_lo.dtype)
    return (q_lo, None), q_lo.astype(jnp.float32)


def _prescreen_eps(qf, q_hat, nd_max, r_max):
    """Provable per-query error bound: |true(q,d) - shat(q,d)| <= eps for
    EVERY doc d.  true - shat = (q - q_hat)·d + q_hat·(d - d_hat), so by
    Cauchy-Schwarz  eps = ||q - q_hat||·nd_max + ||q_hat||·r_max.  The
    1.001 factor + the D·2^-23 term cover all f32 evaluation rounding
    (norms here, dequant multiplies and the f32 accumulation of the bf16
    MXU pass on device), scaled by the same norm products they bound."""
    d = qf.shape[1]
    eq = qf - q_hat
    eqn = jnp.sqrt(jnp.sum(eq * eq, axis=1))
    qn = jnp.sqrt(jnp.sum(q_hat * q_hat, axis=1))
    return (eqn * nd_max + qn * r_max) * 1.001 + (d * 2.0**-23) * qn * (
        nd_max + r_max
    ) + 1e-30


def _seg_stats_xla(q_rep, corpus_lo, corpus_scale, n, seg):
    """XLA segment statistics: materialize the prescreen score matrix, then
    three per-segment reductions -> (max1, loc1, max2), each [Q, S].

    ``corpus_lo`` may be padded beyond ``n`` rows (hardware-tile padding);
    the extra columns are masked to NEG_INF so they never become stats."""
    q_lo, q_scale = q_rep
    if corpus_lo.dtype == jnp.int8:
        s32 = jax.lax.dot_general(
            q_lo,
            corpus_lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        shat = s32.astype(jnp.float32) * corpus_scale[None, :] * q_scale[:, None]
    else:
        shat = jax.lax.dot_general(
            q_lo,
            corpus_lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    q_cnt, n_lo = shat.shape
    # n may be a TRACED scalar (per-shard valid-row counts under shard_map);
    # always mask — columns >= n never become stats
    col = jax.lax.broadcasted_iota(jnp.int32, shat.shape, 1)
    shat = jnp.where(col < n, shat, NEG_INF)
    s_cnt = -(-n_lo // seg)
    n_pad = s_cnt * seg
    shat_pad = (
        jnp.pad(shat, ((0, 0), (0, n_pad - n_lo)), constant_values=NEG_INF)
        if n_pad != n_lo
        else shat
    )
    segv = shat_pad.reshape(q_cnt, s_cnt, seg)
    max1 = jnp.max(segv, axis=2)  # [Q, S]
    iota = jax.lax.broadcasted_iota(jnp.int32, segv.shape, 2)
    is_max = segv == max1[:, :, None]
    loc1 = jnp.min(jnp.where(is_max, iota, INT_MAX), axis=2)  # [Q, S]
    max2 = jnp.max(jnp.where(iota == loc1[:, :, None], NEG_INF, segv), axis=2)
    return max1, loc1, max2


def _seg_stats_kernel(n_ref, q_ref, c_ref, max1_ref, loc_ref, max2_ref, *, seg, seg_per_step, block_n):
    """One fused pass: prescreen matmul tile + per-segment max/argmax/runner-up
    on-chip — the [Q, N] score matrix never exists in HBM. The valid-row
    count arrives as an SMEM scalar so per-shard counts can be dynamic."""
    n = n_ref[0, 0]
    jstep = pl.program_id(1)
    scores = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, block_n]
    base = jstep * block_n
    m1s, locs, m2s = [], [], []
    for s in range(seg_per_step):
        ss = scores[:, s * seg : (s + 1) * seg]
        lane = jax.lax.broadcasted_iota(jnp.int32, ss.shape, 1)
        col = lane + (base + s * seg)
        ss = jnp.where(col < n, ss, NEG_INF)
        m1 = jnp.max(ss, axis=1, keepdims=True)  # [BQ, 1]
        tie = ss == m1
        loc = jnp.min(jnp.where(tie, lane, INT_MAX), axis=1, keepdims=True)
        m2 = jnp.max(jnp.where(lane == loc, NEG_INF, ss), axis=1, keepdims=True)
        m1s.append(m1)
        locs.append(loc)
        m2s.append(m2)
    # outputs live TRANSPOSED [S, Q]: a (seg_per_step, BQ) block satisfies the
    # (8, 128)-divisibility rule where (BQ, seg_per_step) cannot
    max1_ref[:] = jnp.concatenate(m1s, axis=1).T
    loc_ref[:] = jnp.concatenate(locs, axis=1).T
    max2_ref[:] = jnp.concatenate(m2s, axis=1).T


@functools.partial(
    jax.jit, static_argnames=("seg", "block_q", "seg_per_step", "interpret")
)
def _seg_stats_pallas(
    q_lo: jax.Array,
    corpus_lo: jax.Array,
    n: jax.Array,
    seg: int = 128,
    block_q: int = 256,
    seg_per_step: int = 16,
    interpret: bool = False,
):
    """Pallas segment statistics -> (max1, loc1, max2), each [Q, S].

    Streams the corpus through VMEM in [seg_per_step*seg, d] tiles; each grid
    step runs one MXU matmul and ``seg_per_step`` 2-D VPU reductions, writing
    [BQ, seg_per_step] stat blocks. S may exceed ceil(n/seg) by tile padding;
    pad segments carry max1 = NEG_INF and are ignored downstream."""
    q, d = q_lo.shape
    block_n = seg_per_step * seg
    d_pad = _round_up(d, 128)
    bq = min(block_q, _round_up(q, 8))
    q_pad = _round_up(q, bq)
    n_pad = _round_up(corpus_lo.shape[0], block_n)
    q_lo = jnp.pad(q_lo, ((0, q_pad - q), (0, d_pad - d)))
    corpus_lo = jnp.pad(
        corpus_lo, ((0, n_pad - corpus_lo.shape[0]), (0, d_pad - d))
    )
    grid = (q_pad // bq, n_pad // block_n)
    s_cnt = n_pad // seg
    kernel = functools.partial(
        _seg_stats_kernel, seg=seg, seg_per_step=seg_per_step, block_n=block_n
    )
    n_arr = jnp.full((1, 1), n, jnp.int32)
    max1, loc1, max2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((seg_per_step, bq), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_per_step, bq), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_per_step, bq), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_cnt, q_pad), jnp.float32),
            jax.ShapeDtypeStruct((s_cnt, q_pad), jnp.int32),
            jax.ShapeDtypeStruct((s_cnt, q_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d_pad,
            bytes_accessed=(q_pad * d_pad + n_pad * d_pad) * q_lo.dtype.itemsize
            + 3 * q_pad * s_cnt * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_arr, q_lo, corpus_lo)
    return max1.T[:q], loc1.T[:q], max2.T[:q]


def _exact_scan_masked(
    qf: jax.Array, corpus: jax.Array, n_valid: jax.Array, k_eff: int
) -> tuple[jax.Array, jax.Array]:
    """Exact f32 HIGHEST top-k as a corpus-tiled scan with an n_valid row
    mask — the capacity-scale replacement for the flat [Q, N] fallback
    matmul inside the verified path (at 2M x 768 and Q=1024 the flat score
    matrix alone is 8 GB; XLA reserves a cond branch's temps whether or not
    the branch runs). Same (-score, id) merge order as the flat path."""
    q_cnt, d = qf.shape
    n = corpus.shape[0]
    # bound the per-step score tile to ~512 MB so the untaken-branch
    # reservation stays small at any Q
    tile_n = max(8192, min(131072, ((512 << 20) // max(1, q_cnt * 4)) // 128 * 128))
    t_full = n // tile_n
    rem = n - t_full * tile_n
    tile_k = min(k_eff, tile_n)

    def _tile_scores(tile, base):
        scores = jax.lax.dot_general(
            qf, tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision_for(jnp.float32),
        )
        col = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        return jnp.where(col < n_valid, scores, NEG_INF)

    def body(carry, tile_idx):
        carry_s, carry_i = carry
        base = tile_idx * tile_n
        tile = jax.lax.dynamic_slice(corpus, (base, 0), (tile_n, d))
        tile_s, tile_local = jax.lax.top_k(_tile_scores(tile, base), tile_k)
        merged = sort_topk(
            jnp.concatenate([carry_s, tile_s], axis=1),
            jnp.concatenate([carry_i, tile_local + base], axis=1),
            k_eff,
        )
        return merged, None

    scores = jnp.full((q_cnt, k_eff), NEG_INF, jnp.float32)
    ids = jnp.full((q_cnt, k_eff), INT_MAX, jnp.int32)
    if t_full:
        (scores, ids), _ = jax.lax.scan(
            body, (scores, ids), jnp.arange(t_full, dtype=jnp.int32)
        )
    if rem:
        tail_s, tail_local = jax.lax.top_k(
            _tile_scores(corpus[t_full * tile_n :], jnp.int32(t_full * tile_n)),
            min(k_eff, rem),
        )
        scores, ids = sort_topk(
            jnp.concatenate([scores, tail_s], axis=1),
            jnp.concatenate([ids, tail_local + t_full * tile_n], axis=1),
            k_eff,
        )
    return scores, ids


@functools.partial(
    jax.jit,
    static_argnames=("k", "m", "j", "seg", "second_chance", "engine", "interpret"),
)
def _dense_topk_verified(
    queries: jax.Array,
    corpus: jax.Array,
    corpus_lo: jax.Array,
    corpus_scale: jax.Array | None,
    nd_max: jax.Array,
    r_max: jax.Array,
    k: int,
    m: int,
    j: int,
    seg: int,
    second_chance: int,
    engine: str = "xla",
    interpret: bool = False,
    n_valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    q_cnt, d = queries.shape
    n = corpus.shape[0]
    # rows >= n_valid (zero-padding for sharding/tiling) are masked out of
    # stats, candidates, and the exact fallbacks — they can never surface
    n_valid = jnp.int32(n if n_valid is None else n_valid)
    k_eff = min(k, n)
    f_cap = min(second_chance, q_cnt)
    qf = queries.astype(jnp.float32)

    # ---- pass 1: prescreen scores -> per-segment statistics -----------------
    # Selecting hundreds of candidates per row with lax.top_k/approx_max_k over
    # [Q, N] is the measured bottleneck (cost grows ~linearly in k'), so no
    # large-k selection happens at corpus width. Instead the corpus splits into
    # S = ceil(N/seg) segments and three CHEAP per-segment reductions run:
    # max1 (segment max), loc1 (its min-id argmax), max2 (runner-up). The
    # candidate set is { argmax of the top-m segments by max1 } plus EVERY doc
    # of the top-j segments by max2; selection now costs top_k over [Q, S].
    q_rep, q_hat = _prescreen_query_side(qf, corpus_lo, corpus_scale)
    eps = _prescreen_eps(qf, q_hat, nd_max, r_max)
    if engine == "pallas":
        max1, loc1, max2 = _seg_stats_pallas(
            q_rep[0], corpus_lo, n_valid, seg, interpret=interpret
        )
    else:
        max1, loc1, max2 = _seg_stats_xla(
            q_rep, corpus_lo, corpus_scale, n_valid, seg
        )
    s_cnt = max1.shape[1]

    m_eff = min(m, s_cnt)
    j_eff = min(j, s_cnt)
    if s_cnt > m_eff:
        top1_s, top1_i = jax.lax.top_k(max1, m_eff + 1)
        boundary = top1_s[:, m_eff]  # (m+1)-th largest segment max
        sel_seg = top1_i[:, :m_eff]
        sel_val = top1_s[:, :m_eff]
    else:
        sel_val, sel_seg = jax.lax.top_k(max1, m_eff)
        boundary = jnp.full((q_cnt,), NEG_INF, jnp.float32)
    if s_cnt > j_eff:
        top2_s, top2_i = jax.lax.top_k(max2, j_eff + 1)
        m2bound = top2_s[:, j_eff]  # (j+1)-th largest runner-up
        r_seg = top2_i[:, :j_eff]
    else:
        _, r_seg = jax.lax.top_k(max2, j_eff)
        m2bound = jnp.full((q_cnt,), NEG_INF, jnp.float32)

    # argmax candidates: mask segments that are fully rescored below (their
    # argmax would duplicate) and NEG_INF pad segments
    in_r = jnp.any(sel_seg[:, :, None] == r_seg[:, None, :], axis=2)
    arg_ids = sel_seg * seg + jnp.take_along_axis(loc1, sel_seg, axis=1)
    arg_valid = (~in_r) & (sel_val > NEG_INF) & (arg_ids < n_valid)
    # full-segment candidates: every doc of the top-j runner-up segments
    seg_iota = jnp.arange(seg, dtype=jnp.int32)
    full_ids = (r_seg[:, :, None] * seg + seg_iota[None, None, :]).reshape(
        q_cnt, j_eff * seg
    )
    full_valid = full_ids < n_valid

    cand_i = jnp.concatenate([arg_ids, full_ids], axis=1)
    cand_valid = jnp.concatenate([arg_valid, full_valid], axis=1)
    safe_i = jnp.clip(cand_i, 0, n - 1)

    rows = jnp.take(corpus, safe_i, axis=0)  # [Q, m+j*seg, d]
    e = jax.lax.dot_general(
        qf,
        rows,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_precision_for(jnp.float32),
    )  # TRUE f32 HIGHEST scores of the rescore set
    e = jnp.where(cand_valid, e, NEG_INF)
    sort_ids = jnp.where(cand_valid, cand_i, INT_MAX)
    out_s, out_i = sort_topk(e, sort_ids, k_eff)

    # ---- verification: every doc that could reach the top-k was rescored ---
    # A doc with true >= e_(k) must have shat >= theta = e_(k) - eps. Every
    # non-candidate doc lives either in a non-selected segment (shat <= its
    # segment max1 <= boundary) or is a non-argmax doc of a segment that was
    # not fully rescored (shat <= its max2 <= m2bound). Two strict scalar
    # comparisons per query therefore prove the true top-k — including the
    # (-score, id) tie order — lies entirely inside the exactly-ranked
    # rescore set.
    ekth = out_s[:, k_eff - 1]
    theta = ekth - eps
    ok_q = (boundary < theta) & (m2bound < theta)
    n_fail = jnp.sum((~ok_q).astype(jnp.int32))

    # ---- second chance: full exact scan for up to f_cap failed queries -----
    if f_cap > 0:
        prio = jnp.where(
            ok_q, q_cnt + jnp.arange(q_cnt, dtype=jnp.int32), jnp.arange(q_cnt, dtype=jnp.int32)
        )
        order = jnp.argsort(prio)[:f_cap]
        fq = qf[order]
        if f_cap * n * 4 > FULL_MATERIALIZE_BUDGET:
            fs, fi = _exact_scan_masked(fq, corpus, n_valid, k_eff)
        else:
            fscores = jax.lax.dot_general(
                fq,
                corpus,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_precision_for(jnp.float32),
            )
            fcol = jax.lax.broadcasted_iota(jnp.int32, fscores.shape, 1)
            fscores = jnp.where(fcol < n_valid, fscores, NEG_INF)
            fs, fi = jax.lax.top_k(fscores, k_eff)
        take = ~ok_q[order]
        out_s = out_s.at[order].set(jnp.where(take[:, None], fs, out_s[order]))
        out_i = out_i.at[order].set(jnp.where(take[:, None], fi, out_i[order]))

    # ---- batch fallback: more failures than the second chance covers -------
    covered = n_fail <= f_cap

    def _keep(args):
        return args

    def _full(args):
        if q_cnt * n * 4 > FULL_MATERIALIZE_BUDGET:
            return _exact_scan_masked(qf, corpus, n_valid, k_eff)
        scores = jax.lax.dot_general(
            qf,
            corpus,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision_for(jnp.float32),
        )
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n_valid, scores, NEG_INF)
        fs, fi = jax.lax.top_k(scores, k_eff)
        return fs, fi

    out_s, out_i = jax.lax.cond(covered, _keep, _full, (out_s, out_i))
    out_s, out_i = pad_to_k(out_s, out_i, k, k_eff)
    return out_s, out_i, n_fail, covered


def dense_topk_verified(
    queries: jax.Array,
    corpus: jax.Array,
    sidecar: dict,
    k: int,
    m: int = 64,
    j: int = 2,
    seg: int = 128,
    second_chance: int = 0,
    engine: str = "auto",
    interpret: bool = False,
    return_stats: bool = False,
):
    """GUARANTEED-EXACT dense top-k at prescreen speed (the flat-regime
    replacement for ``dense_topk_xla_full``).

    Two passes: (1) a low-precision prescreen (int8 or bf16 MXU matmul —
    2-4x the f32 HIGHEST rate) scores the whole corpus, and candidates are
    extracted with cheap per-segment reductions (max / min-id argmax /
    runner-up over ``seg``-wide segments — no large-k selection ever runs
    at corpus width); (2) the argmaxes of the top-``m`` segments plus every
    doc of the top-``j`` runner-up segments are gathered from the exact f32
    corpus, rescored at ``Precision.HIGHEST``, and selected by
    ``(-score, doc_id)``.

    Exactness is *verified per query*, never assumed: a provable per-query
    quantization-error bound ``eps`` (Cauchy-Schwarz over the exact per-row
    residual norms in the sidecar — see :func:`build_verified_sidecar`)
    defines the prescreen score any contender must reach, and two strict
    per-query comparisons (the (m+1)-th segment max and the (j+1)-th
    runner-up, both below ``e_k - eps``) prove no non-rescored doc can
    reach the returned top-k. Queries that fail re-run as a full exact scan
    (up to ``second_chance`` per batch at fixed cost; more than that, or
    ``second_chance=0``, falls back to the whole-batch exact path). Every
    returned score is a true f32 HIGHEST dot product, so results match the
    full exact scan — including (-score, id) tie order on exact ties (e.g.
    duplicate rows, which score bitwise-equal on every path); the knobs only
    move the fast-path hit rate. One float-reduction caveat, shared with the
    full scan itself: docs whose true scores differ below f32
    reduction-split resolution (~1 ulp, measured 1.5e-8 at 500k x 768) may
    order differently between evaluation shapes — ``dense_topk_xla_full``
    orders such pairs differently at batch 1 vs batch 256 too. Returns
    (scores [Q, k], ids [Q, k]); with ``return_stats=True`` also
    (n_fail, covered).

    Replaces the reference's per-query exact Postgres scan
    (``orm/repository/base.py:404-426``) in the serving hot path without
    giving up its exactness contract.
    """
    corpus_scale = sidecar["corpus_scale"]
    corpus_lo = jnp.asarray(sidecar["corpus_lo"])
    if engine == "auto":
        engine = (
            "pallas" if on_tpu() and corpus_lo.dtype != jnp.int8 else "xla"
        )
    if engine == "pallas" and corpus_lo.dtype == jnp.int8:
        raise ValueError(
            "pallas verified engine supports the bf16 prescreen only "
            "(int8 per-row scale folding is not implemented in-kernel)"
        )
    out_s, out_i, n_fail, covered = _dense_topk_verified(
        queries,
        corpus,
        corpus_lo,
        None if corpus_scale is None else jnp.asarray(corpus_scale),
        jnp.float32(sidecar["nd_max"]),
        jnp.float32(sidecar["r_max"]),
        k,
        m,
        j,
        seg,
        second_chance,
        engine,
        interpret,
    )
    if return_stats:
        return out_s, out_i, n_fail, covered
    return out_s, out_i


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# Score-matrix budget for the full-materialize path (bytes). Measured on
# v5e: XLA's fused dot+top_k beats both the Pallas kernel and the scan for
# any [Q, N] that fits — k-selection dominates once matmuls are cheap.
# Beyond the budget (measured at 4096q x 500k x 768 = 8GB scores,
# scripts/bench_dense_big.py): the streaming Pallas kernel at block_n=1024
# does 17.7k QPS / 13.6 TFLOP/s vs the XLA scan's 17.3k at tile_n=128k;
# block_n=2048 overflows scoped VMEM. Dispatch below reflects this.
FULL_MATERIALIZE_BUDGET = 2 << 30


def dense_topk(
    queries: jax.Array, corpus: jax.Array, k: int, method: str = "auto"
) -> tuple[jax.Array, jax.Array]:
    """Dispatch by shape: fused XLA dot+top_k while the score matrix fits the
    HBM budget; the streaming Pallas kernel (TPU) / XLA scan (CPU) beyond."""
    if method == "auto":
        score_bytes = queries.shape[0] * corpus.shape[0] * 4
        if score_bytes <= FULL_MATERIALIZE_BUDGET:
            method = "xla_full"
        else:
            method = "pallas" if on_tpu() else "xla"
    if method == "xla_full":
        return dense_topk_xla_full(queries, corpus, k)
    if method == "xla_two_stage":
        return dense_topk_xla_two_stage(queries, corpus, k)
    if method == "approx":
        return dense_topk_approx(queries, corpus, k)
    if method == "pallas":
        return dense_topk_pallas(queries, corpus, k)
    if method == "xla":
        return dense_topk_xla(queries, corpus, k)
    raise ValueError(f"unknown dense_topk method: {method}")
