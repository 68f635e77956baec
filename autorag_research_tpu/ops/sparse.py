"""BM25 sparse scoring on TPU: the VectorChord-BM25 ``<&>`` replacement.

The reference scores BM25 inside Postgres via the Rust vchord_bm25 extension
(``orm/repository/chunk.py:185-247``). CSR gather/scatter is TPU-hostile, so
the device layout here is *slot-padded*: each document's (unique-term-id,
precomputed-BM25-term-weight) pairs occupy ``L`` padded slots -> two dense
``[N, L]`` arrays. A query is ``T`` (term-id, idf*qtf weight) pairs. Then

    score[b, n] = sum_l w[n, l] * sum_t (tid[n, l] == qid[b, t]) * qw[b, t]

is pure dense VPU compare/multiply/accumulate work with no gathers, fused with
the same streaming top-k accumulator as the dense kernel. Doc-side weights
``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` and query-side Lucene-style
``idf = ln(1 + (N-df+0.5)/(df+0.5))`` are precomputed at index build.

Pad conventions: empty doc slots have tid = -1, weight = 0; empty query slots
have qid = -2 (so pads never match each other).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autorag_research_tpu.ops.dense import INT_MAX, NEG_INF, _round_up
from autorag_research_tpu.ops.topk import pad_to_k, sort_topk

DOC_PAD = -1
QUERY_PAD = -2


# ---------------------------------------------------------------------- XLA
@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def bm25_topk_xla(
    q_ids: jax.Array,
    q_weights: jax.Array,
    doc_ids: jax.Array,
    doc_weights: jax.Array,
    k: int,
    tile_n: int = 65536,
) -> tuple[jax.Array, jax.Array]:
    """Exact BM25 top-k. q_ids/q_weights: [B, T]; doc_ids/doc_weights: [N, L].

    Measured on v5e @ 500k docs x 128 slots: 335 QPS with 64k tiles (the
    Pallas v2 term-major kernel does 452.8 QPS and is the TPU default; large
    tiles also keep remote-compile times second-scale — compile cost grows
    with scan length).

    Returns (scores [B, k], doc rows [B, k]) in (-score, id) order.
    """
    bsz = q_ids.shape[0]
    n = doc_ids.shape[0]
    k_eff = min(k, n)
    tile_n = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile_n)
    pad = n_pad - n
    if pad:
        doc_ids = jnp.pad(doc_ids, ((0, pad), (0, 0)), constant_values=DOC_PAD)
        doc_weights = jnp.pad(doc_weights, ((0, pad), (0, 0)))
    id_tiles = doc_ids.reshape(n_pad // tile_n, tile_n, -1)
    w_tiles = doc_weights.reshape(n_pad // tile_n, tile_n, -1)

    def tile_scores(tid, tw):
        # per-query einsum over the [tile_n, L, T] match tensor, scanned over
        # queries to bound memory
        def one(q):
            qid, qw = q
            m = (tid[:, :, None] == qid[None, None, :]).astype(tw.dtype)
            return jnp.einsum("nlt,nl,t->n", m, tw, qw)

        return jax.lax.map(one, (q_ids, q_weights))  # [B, tile_n]

    def body(carry, inp):
        carry_s, carry_i = carry
        (tid, tw), tile_idx = inp
        scores = tile_scores(tid, tw).astype(jnp.float32)
        base = tile_idx * tile_n
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
        scores = jnp.where(col < n, scores, NEG_INF)
        tile_k = min(k_eff, tile_n)
        tile_s, tile_local = jax.lax.top_k(scores, tile_k)
        tile_i = tile_local + base
        merged = sort_topk(
            jnp.concatenate([carry_s, tile_s], axis=1),
            jnp.concatenate([carry_i, tile_i], axis=1),
            k_eff,
        )
        return merged, None

    init = (
        jnp.full((bsz, k_eff), NEG_INF, jnp.float32),
        jnp.full((bsz, k_eff), INT_MAX, jnp.int32),
    )
    (scores, ids), _ = jax.lax.scan(
        body,
        init,
        ((id_tiles, w_tiles), jnp.arange(id_tiles.shape[0], dtype=jnp.int32)),
    )
    return pad_to_k(scores, ids, k, k_eff)


# ------------------------------------------------------------------ Pallas
def _bm25_kernel(
    qid_ref,  # SMEM [bq, T] int32 — scalar-indexed per (query, term)
    qw_ref,   # SMEM [bq, T] f32
    tid_ref,  # VMEM [BN, L]
    tw_ref,   # VMEM [BN, L]
    out_s_ref, out_i_ref, acc_s, acc_i,
    *, k, n, block_n, bq, n_query_terms,
):
    from autorag_research_tpu.ops.dense import _extract_topk

    j = pl.program_id(1)  # doc-tile index (innermost)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, INT_MAX)

    tid = tid_ref[:]  # [BN, L]
    tw = tw_ref[:]  # [BN, L]
    row_of = jax.lax.broadcasted_iota(jnp.int32, (bq, tid.shape[0]), 0)

    def body(step, scores):
        # one (query b, term t) pair per step; term ids/weights come from SMEM
        # as scalars (Mosaic rejects dynamic lane-indexed vector loads), the
        # [BN, L] compare/accumulate runs on the VPU, and the result lands in
        # query b's row via a broadcast select.
        b = step // n_query_terms
        t = step % n_query_terms
        term_id = qid_ref[b, t]
        term_w = qw_ref[b, t]
        contrib = jnp.sum(
            jnp.where(tid == term_id, tw, 0.0), axis=1
        )  # [BN]
        return scores + jnp.where(row_of == b, (contrib * term_w)[None, :], 0.0)

    scores = jax.lax.fori_loop(
        0, bq * n_query_terms, body, jnp.zeros((bq, tid.shape[0]), jnp.float32)
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


def _launch_bm25_pallas(
    kernel_fn,
    q_ids: jax.Array,
    q_weights: jax.Array,
    doc_ids: jax.Array,
    doc_weights: jax.Array,
    k: int,
    block_q: int,
    block_n: int,
    interpret: bool,
) -> tuple[jax.Array, jax.Array]:
    bsz, n_terms = q_ids.shape
    n, slots = doc_ids.shape
    k_eff = min(k, n)

    slots_pad = _round_up(slots, 128)
    bq = min(block_q, _round_up(bsz, 8))
    bsz_pad = _round_up(bsz, bq)
    block_n = max(block_n, _round_up(k_eff, 128))  # tile must hold >= k
    n_pad = _round_up(n, block_n)
    doc_ids = jnp.pad(
        doc_ids, ((0, n_pad - n), (0, slots_pad - slots)), constant_values=DOC_PAD
    )
    doc_weights = jnp.pad(doc_weights, ((0, n_pad - n), (0, slots_pad - slots)))
    terms_pad = _round_up(n_terms, 128)
    q_ids = jnp.pad(
        q_ids, ((0, bsz_pad - bsz), (0, terms_pad - n_terms)), constant_values=QUERY_PAD
    )
    q_weights = jnp.pad(q_weights, ((0, bsz_pad - bsz), (0, terms_pad - n_terms)))

    grid = (bsz_pad // bq, n_pad // block_n)
    kernel = functools.partial(
        kernel_fn, k=k_eff, n=n, block_n=block_n, bq=bq, n_query_terms=n_terms
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, terms_pad), lambda i, j: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, terms_pad), lambda i, j: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_n, slots_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, slots_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz_pad, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((bsz_pad, k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k_eff), jnp.float32),
            pltpu.VMEM((bq, k_eff), jnp.int32),
        ],
        interpret=interpret,
    )(q_ids, q_weights, doc_ids, doc_weights)
    out_s, out_i = out_s[:bsz], out_i[:bsz]
    return pad_to_k(out_s, out_i, k, k_eff)


@functools.partial(jax.jit, static_argnames=("k", "block_q", "block_n", "interpret"))
def bm25_topk_pallas(
    q_ids: jax.Array,
    q_weights: jax.Array,
    doc_ids: jax.Array,
    doc_weights: jax.Array,
    k: int,
    block_q: int = 8,
    block_n: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused slot-match BM25 + streaming top-k Pallas kernel.

    Grid is (query_tiles, doc_tiles) with small query tiles (default 8) so the
    per-term [bq, BN, L] match tensor stays within VMEM. One (query, term)
    pair per fori_loop step; see ``_bm25_kernel``.
    """
    return _launch_bm25_pallas(
        _bm25_kernel, q_ids, q_weights, doc_ids, doc_weights, k,
        block_q, block_n, interpret,
    )


@functools.partial(jax.jit, static_argnames=("k", "block_q", "block_n", "interpret"))
def bm25_topk_pallas_v2(
    q_ids: jax.Array,
    q_weights: jax.Array,
    doc_ids: jax.Array,
    doc_weights: jax.Array,
    k: int,
    block_q: int = 8,
    block_n: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """BM25 Pallas v2: term-major loop (T steps, all bq queries unrolled per
    step) — drops v1's per-step [bq, BN] row-select add. See ``_bm25_kernel_v2``.

    Measured on v5e @ 500k docs x 128 slots, 32 queries x 16 terms
    (scripts/bench_bm25.py): 452.8 QPS at block_n=2048 vs v1's 330.7 at 1024
    (same run, identical result ids); block_n=4096 overflows scoped VMEM.
    This is the TPU dispatch default.
    """
    return _launch_bm25_pallas(
        _bm25_kernel_v2, q_ids, q_weights, doc_ids, doc_weights, k,
        block_q, block_n, interpret,
    )


def _slot_match_scores(qid_ref, qw_ref, tid, tw, bq, n_query_terms):
    """Shared term-major slot-match scoring loop: per term t, compare ALL bq
    queries' t-th term against the doc tile at once. Used verbatim by the
    v2, v2_skip, and probe kernels — the skip/probe kernels' bit-parity with
    v2 depends on this being ONE implementation."""

    def term_body(t, scores):
        # qid/qw column t for every query, read as bq SMEM scalars into a
        # stacked comparison — still scalar reads (Mosaic-safe), one wide op
        contribs = []
        for b in range(bq):  # static unroll over the small query tile
            term_id = qid_ref[b, t]
            term_w = qw_ref[b, t]
            c = jnp.sum(jnp.where(tid == term_id, tw, 0.0), axis=1) * term_w  # [BN]
            contribs.append(c)
        return scores + jnp.stack(contribs, axis=0)  # [bq, BN]

    return jax.lax.fori_loop(
        0, n_query_terms, term_body, jnp.zeros((bq, tid.shape[0]), jnp.float32)
    )


def _bm25_kernel_v2(
    qid_ref,  # SMEM [bq, T] int32
    qw_ref,   # SMEM [bq, T] f32
    tid_ref,  # VMEM [BN, L]
    tw_ref,   # VMEM [BN, L]
    out_s_ref, out_i_ref, acc_s, acc_i,
    *, k, n, block_n, bq, n_query_terms,
):
    """v2: per term t, compare ALL bq queries' t-th term at once via a
    [bq, BN, L] broadcast (T loop iterations instead of bq*T) — trades VMEM
    for fewer, wider VPU ops. Requires bq * BN * L * 4B to fit VMEM."""
    from autorag_research_tpu.ops.dense import _extract_topk

    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, INT_MAX)

    tid = tid_ref[:]  # [BN, L]
    tw = tw_ref[:]
    scores = _slot_match_scores(qid_ref, qw_ref, tid, tw, bq, n_query_terms)
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


# Knuth-style odd multipliers for the 4 Bloom probes. A single-probe bitmap
# saturates: ~30k distinct terms/tile over 128k bits is 0.21 density, and the
# skip predicate ORs over every query term in the tile, so per-term false
# positives must be << 1/n_terms. Four probes take fp to density^4.
_BLOOM_MULTS = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)


def _bloom_positions(terms: "np.ndarray", space: int):
    import numpy as np

    t = terms.astype(np.uint64)
    return [
        ((t * np.uint64(m)) % np.uint64(space)).astype(np.int64) for m in _BLOOM_MULTS
    ]


def bitmap_words_for(doc_ids: "np.ndarray", block_n: int) -> int:
    """Size the per-tile Bloom filter at ~16 bits per distinct term (4 probes
    -> ~20% fill, ~0.2% per-term false positives). Distinct-terms-per-tile is
    estimated as the MAX over up to 8 evenly spaced tiles — clustered layouts
    make tile densities wildly uneven, and an undersized filter saturates
    (measured: density 0.84 -> zero skips)."""
    import numpy as np

    n = doc_ids.shape[0]
    if n == 0:
        return 64
    n_tiles = -(-n // block_n)
    distinct = 1
    for t in np.unique(np.linspace(0, n_tiles - 1, num=min(8, n_tiles), dtype=int)):
        tile = doc_ids[t * block_n : (t + 1) * block_n]
        distinct = max(distinct, len(np.unique(tile[tile >= 0])) or 1)
    return max(64, int(2 ** np.ceil(np.log2(distinct * 16 / 32))))


def build_tile_bitmaps(
    doc_ids: "np.ndarray", block_n: int, n_words: int | None = None
) -> "np.ndarray":
    """Per-doc-tile 4-probe Bloom term filters for the v2_skip kernel.

    Tile t covers doc rows [t*block_n, (t+1)*block_n); a term is *possibly
    present* iff all 4 probe bits are set. False positives only cost a missed
    skip, never a wrong result. Routes to the C++ builder when the native lib
    is present (22 s -> ~1 s at 2M x 64; bit-identical, tests/test_native.py).
    """
    import numpy as np

    n = doc_ids.shape[0]
    n_tiles = -(-n // block_n)
    if n_words is None:
        n_words = bitmap_words_for(doc_ids, block_n)
    space = 32 * n_words
    if space & (space - 1):
        raise ValueError(
            f"n_words must make 32*n_words a power of two (got {n_words}): the "
            "query-side probe multiplies in uint32, and its residues only match "
            "this builder's uint64 math when the space divides 2^32"
        )
    from autorag_research_tpu import native

    if native.aux_available():
        return native.build_tile_bitmaps_native(np.asarray(doc_ids), block_n, n_words)
    # vectorized: unique (tile, term) pairs in one pass, then scatter all 4
    # probe bits into a flat [n_tiles * n_words] view (per-tile loops took
    # minutes at 5M docs)
    rows, cols = np.nonzero(doc_ids >= 0)
    keys = np.unique(
        (rows // block_n).astype(np.int64) * (2**32) + doc_ids[rows, cols]
    )
    tile_of = (keys >> 32).astype(np.int64)
    term_of = (keys & 0xFFFFFFFF).astype(np.int64)
    total_bits = n_tiles * space
    if total_bits <= (1 << 31):
        # fast path: one byte per bit + packbits (plain fancy assignment is
        # ~10x np.bitwise_or.at, which is unbuffered and scalar)
        bits = np.zeros(total_bits, np.uint8)
        for pos in _bloom_positions(term_of, space):
            bits[tile_of * space + pos] = 1
        flat = np.packbits(bits, bitorder="little").view(np.int32)
    else:
        flat = np.zeros(n_tiles * n_words, dtype=np.int32)
        coords = np.unique(
            np.concatenate(
                [tile_of * space + pos for pos in _bloom_positions(term_of, space)]
            )
        )
        np.bitwise_or.at(
            flat, coords // 32, (np.int64(1) << (coords % 32)).astype(np.int32)
        )
    return flat.reshape(n_tiles, n_words)


def cluster_doc_order(doc_ids: "np.ndarray", doc_freq: "np.ndarray") -> "np.ndarray":
    """Permutation grouping docs by their RAREST term (lowest df), so that
    selective terms co-locate in few tiles and the v2_skip predicate can
    actually prune. On a shuffled corpus every 2048-doc tile contains nearly
    every live term and nothing skips (measured: 0 gain at density 0.21);
    after this ordering, a rare query term touches only the tiles that hold
    its group. Exactness caveat: tie-breaking inside the kernel is by
    physical row, so EQUAL-score candidates at the k boundary may resolve to
    different (equally-scored) docs than the unclustered layout.
    """
    import numpy as np

    n, _ = doc_ids.shape
    safe = np.where(doc_ids >= 0, doc_ids, 0)
    dfs = np.where(doc_ids >= 0, doc_freq[safe], np.iinfo(np.int64).max)
    rarest_slot = np.argmin(dfs, axis=1)
    rarest_term = doc_ids[np.arange(n), rarest_slot]
    return np.argsort(rarest_term, kind="stable")


def _tile_match(q_ids, bitmaps, row_src, bq):
    """XLA-side (query tile x doc tile) Bloom term-presence predicate.

    q_ids [B, T] raw query term ids (>=0 real), bitmaps [n_tiles, W] from
    ``build_tile_bitmaps``, row_src the bsz_pad replication map. Returns
    bool [q_tiles, n_tiles]: True iff some query term in the tile of bq
    queries is possibly present in the doc tile (no false negatives).
    """
    n_tiles = bitmaps.shape[0]
    space = 32 * bitmaps.shape[1]
    hit = None
    for mult in _BLOOM_MULTS:
        pos = jnp.where(
            q_ids >= 0, (q_ids.astype(jnp.uint32) * jnp.uint32(mult)) % space, 0
        ).astype(jnp.int32)
        words = bitmaps[:, pos // 32]  # [n_tiles, B, T]
        probe = ((words >> (pos % 32)) & 1) != 0
        hit = probe if hit is None else (hit & probe)
    hit = hit & (q_ids >= 0)[None, :, :]
    per_query = hit.any(axis=2)  # [n_tiles, B]
    per_query = per_query.T[row_src]  # [bsz_pad, n_tiles] (replicated rows)
    bsz_pad = row_src.shape[0]
    return per_query.reshape(bsz_pad // bq, bq, n_tiles).any(axis=1)


def _bm25_kernel_v2_skip(
    qid_ref,   # SMEM [bq, T] int32
    qw_ref,    # SMEM [bq, T] f32
    match_ref,  # SMEM [q_tiles, n_tiles] int32 (whole matrix; scalar-indexed)
    tid_ref,   # VMEM [BN, L]
    tw_ref,    # VMEM [BN, L]
    out_s_ref, out_i_ref, acc_s, acc_i,
    *, k, n, block_n, bq, n_query_terms, positive_only,
):
    """v2 + term-driven tile skip: when the precomputed (query-tile, doc-tile)
    term-presence predicate says no query term occurs in this tile, every doc
    scores exactly 0 and the whole scoring loop AND the 2k-round merge are
    predicated away (the tile's DMA still streams, so skipped tiles run at
    HBM bandwidth instead of VPU compare speed — same trick as the dense
    threshold skip, ops/dense.py).

    Two exactness modes:
    - ``positive_only=False`` (bit-parity with v2): skipping additionally
      requires every accumulator row's k-th score > 0 — zero-score docs may
      legitimately fill under-full top-k lists, and BM25 weights are
      non-negative so zeros can never beat a warm accumulator.
    - ``positive_only=True``: zero-score docs are masked out entirely (the
      search layer drops them anyway — no term overlap is not a hit), the
      accumulator starts at (0.0, INT_MAX), and a tile skips on the match
      predicate alone. Under-full rows come back padded with score <= 0 filler entries.
    """
    from autorag_research_tpu.ops.dense import _extract_topk

    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.full_like(acc_s, 0.0 if positive_only else NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, INT_MAX)

    matched = match_ref[pl.program_id(0), j] != 0
    if positive_only:
        needs_score = matched
    else:
        # callers replicate real rows into query-row pads, so pad rows never
        # hold the k-th at <= 0 forever
        warm = jnp.min(acc_s[:, k - 1]) > 0.0
        needs_score = matched | (~warm)

    @pl.when(needs_score)
    def _score():
        tid = tid_ref[:]
        tw = tw_ref[:]
        scores = _slot_match_scores(qid_ref, qw_ref, tid, tw, bq, n_query_terms)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * block_n
        scores = jnp.where(col < n, scores, NEG_INF)
        if positive_only:
            scores = jnp.where(scores > 0.0, scores, NEG_INF)

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
    jax.jit, static_argnames=("k", "block_q", "block_n", "positive_only", "interpret")
)
def bm25_topk_pallas_v2_skip(
    q_ids: jax.Array,
    q_weights: jax.Array,
    doc_ids: jax.Array,
    doc_weights: jax.Array,
    bitmaps: jax.Array,  # [n_tiles, W] int32 from build_tile_bitmaps(block_n)
    k: int,
    block_q: int = 8,
    block_n: int = 2048,
    positive_only: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """v2 kernel with term-driven tile skipping (sub-linear-ish scaling on
    selective queries). ``bitmaps`` must be built with the SAME block_n.

    The (query-tile, doc-tile) match matrix is computed here in XLA (bitmap
    word gathers — tiny) and fed to the kernel as one SMEM scalar per grid
    step. Results are bit-identical to v2.
    """
    bsz, n_terms = q_ids.shape
    n, slots = doc_ids.shape
    k_eff = min(k, n)

    slots_pad = _round_up(slots, 128)
    bq = min(block_q, _round_up(bsz, 8))
    bsz_pad = _round_up(bsz, bq)
    requested_block_n = block_n
    block_n = max(block_n, _round_up(k_eff, 128))
    if block_n != requested_block_n:
        # the Bloom bitmaps were built at the CALLER's tile granularity; a
        # k-driven bump re-tiles the corpus so bitmap tile t no longer covers
        # kernel tile t — false negatives would silently drop positive hits
        # even when the tile COUNTS happen to coincide. Refuse like the probe
        # wrapper does; callers gate k (index/sparse.py pruned_ok).
        raise ValueError(
            f"k={k} needs block_n >= {block_n} but tile bitmaps were built at "
            f"block_n={requested_block_n}; rebuild the bitmaps or route to an "
            "unpruned kernel"
        )
    n_pad = _round_up(n, block_n)
    n_tiles = n_pad // block_n
    if bitmaps.shape[0] != n_tiles:
        raise ValueError(
            f"bitmaps built for {bitmaps.shape[0]} tiles, kernel uses {n_tiles} "
            f"(block_n={block_n})"
        )
    doc_ids = jnp.pad(
        doc_ids, ((0, n_pad - n), (0, slots_pad - slots)), constant_values=DOC_PAD
    )
    doc_weights = jnp.pad(doc_weights, ((0, n_pad - n), (0, slots_pad - slots)))
    terms_pad = _round_up(n_terms, 128)
    # pad query ROWS by replicating real rows (NOT sentinel rows): pad rows'
    # zero scores would otherwise pin min(acc kth) at 0 and disable skipping
    row_src = jnp.arange(bsz_pad) % bsz
    q_ids_p = jnp.pad(
        q_ids[row_src], ((0, 0), (0, terms_pad - n_terms)), constant_values=QUERY_PAD
    )
    q_weights_p = jnp.pad(q_weights[row_src], ((0, 0), (0, terms_pad - n_terms)))

    matched = _tile_match(q_ids, bitmaps, row_src, bq).astype(jnp.int32)

    grid = (bsz_pad // bq, n_tiles)
    kernel = functools.partial(
        _bm25_kernel_v2_skip, k=k_eff, n=n, block_n=block_n, bq=bq,
        n_query_terms=n_terms, positive_only=positive_only,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, terms_pad), lambda i, j: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, terms_pad), lambda i, j: (i, 0), memory_space=pltpu.SMEM),
            # whole matrix in SMEM (Mosaic rejects sub-8 row blocks of 2-D
            # arrays); the kernel scalar-indexes [program_id(0), program_id(1)]
            pl.BlockSpec(
                (bsz_pad // bq, n_tiles), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((block_n, slots_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, slots_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz_pad, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((bsz_pad, k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k_eff), jnp.float32),
            pltpu.VMEM((bq, k_eff), jnp.int32),
        ],
        interpret=interpret,
    )(q_ids_p, q_weights_p, matched, doc_ids, doc_weights)
    out_s, out_i = out_s[:bsz], out_i[:bsz]
    return pad_to_k(out_s, out_i, k, k_eff)


def build_term_tile_lists(
    doc_ids: "np.ndarray", block_n: int
) -> tuple["np.ndarray", "np.ndarray"]:
    """Exact host-side inverted index at TILE granularity: CSR (indptr,
    tiles) mapping term id -> sorted unique doc-tile indices containing it.

    This is the probe kernel's candidate source: pointer-chasing happens
    here on host (microseconds per query over precomputed lists); the device
    then scores only the listed tiles as contiguous blocks. Unlike the Bloom
    bitmaps there are no false positives, and unioning a query's lists gives
    the exact minimal tile set (reference role: vchord_bm25 inverted index,
    orm/repository/chunk.py:185-247).

    Routes to the C++ builder when the native lib is present (35 s -> ~1 s at
    2M x 64; bit-identical output, tests/test_native.py).
    """
    import numpy as np

    from autorag_research_tpu import native

    if native.aux_available():
        return native.build_term_tile_lists_native(np.asarray(doc_ids), block_n)

    n = doc_ids.shape[0]
    n_tiles = max(1, -(-n // block_n))
    # one vectorized pass: pack every live (term, tile) slot into a single
    # int64 key and unique it (a per-tile np.unique loop measured ~6 min at
    # 5M docs; this is seconds)
    rows, cols = np.nonzero(doc_ids >= 0)
    terms_all = doc_ids[rows, cols].astype(np.int64)
    tiles_all = (rows // block_n).astype(np.int64)
    keys = np.unique(terms_all * n_tiles + tiles_all)
    terms = keys // n_tiles
    tiles = (keys % n_tiles).astype(np.int32)
    vocab = int(terms[-1]) + 1 if len(terms) else 1
    indptr = np.zeros(vocab + 1, np.int64)
    np.add.at(indptr, terms + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, tiles


def probe_candidates(
    q_ids: "np.ndarray",
    indptr: "np.ndarray",
    tiles: "np.ndarray",
    bq: int,
    cap: int,
) -> tuple["np.ndarray", "np.ndarray", int]:
    """Union the term->tile lists for each query tile of ``bq`` queries.

    Returns (cand [q_tiles, cap], count [q_tiles], max_count). When a query
    tile's union exceeds ``cap``, its list is TRUNCATED — the caller must
    check max_count and fall back to a full-scan kernel (exactness)."""
    import numpy as np

    bsz = q_ids.shape[0]
    q_tiles = -(-bsz // bq)
    vocab = len(indptr) - 1
    cand = np.zeros((q_tiles, cap), np.int32)
    count = np.zeros(q_tiles, np.int32)
    max_count = 0
    for i in range(q_tiles):
        chunks = []
        for b in range(i * bq, min((i + 1) * bq, bsz)):
            for t in q_ids[b]:
                if 0 <= t < vocab:
                    chunks.append(tiles[indptr[t] : indptr[t + 1]])
        union = (
            np.unique(np.concatenate(chunks)) if chunks else np.empty(0, np.int32)
        )
        max_count = max(max_count, len(union))
        union = union[:cap]
        cand[i, : len(union)] = union
        count[i] = len(union)
    return cand, count, max_count


def _bm25_kernel_probe(
    cand_ref,   # scalar-prefetch [q_tiles, cap] int32: tile index per grid step
    count_ref,  # scalar-prefetch [q_tiles] int32: live candidates per query tile
    qid_ref,    # SMEM [bq, T]
    qw_ref,     # SMEM [bq, T]
    tid_ref,    # VMEM [BN, L] — block cand_ref[i, j] of the corpus
    tw_ref,     # VMEM [BN, L]
    out_s_ref, out_i_ref, acc_s, acc_i,
    *, k, n, block_n, bq, n_query_terms,
):
    """Candidate-tile BM25 top-k: the grid's second axis walks an explicit
    list of doc tiles instead of the whole corpus, so cost is O(candidate
    tiles), not O(N) — the TPU-shaped equivalent of an inverted-index probe
    (reference vchord_bm25 `<&>`, orm/repository/chunk.py:185-247).

    positive_only semantics: the accumulator starts at (0.0, INT_MAX) and
    zero-score docs are masked to NEG_INF, so only term-overlap hits come
    back; filler rows have score <= 0 (consumers drop them). Steps past
    count_ref[i] are predicated off entirely (their DMA still lands, which
    is why the wrapper pads cand with tile 0, keeping padding cheap)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.zeros_like(acc_s)
        acc_i[:] = jnp.full_like(acc_i, INT_MAX)

    @pl.when(j < count_ref[i])
    def _score():
        from autorag_research_tpu.ops.dense import _extract_topk

        tid = tid_ref[:]
        tw = tw_ref[:]
        scores = _slot_match_scores(qid_ref, qw_ref, tid, tw, bq, n_query_terms)
        col = (
            jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            + cand_ref[i, j] * block_n
        )
        scores = jnp.where((col < n) & (scores > 0.0), scores, NEG_INF)
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
def bm25_topk_pallas_probe(
    q_ids: jax.Array,
    q_weights: jax.Array,
    doc_ids: jax.Array,
    doc_weights: jax.Array,
    cand: jax.Array,   # [q_tiles, cap] int32 candidate doc-tile indices
    count: jax.Array,  # [q_tiles] int32 number of live candidates (<= cap)
    k: int,
    block_q: int = 8,
    block_n: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Probe-mode BM25 top-k over an explicit candidate-tile list.

    The caller supplies, per query tile, the doc tiles that may contain any
    query term (e.g. from a host-side term->tile inverted index, or from the
    Bloom `_tile_match` predicate). EXACTNESS REQUIRES the candidate list to
    contain every tile with a positive-scoring doc — missing tiles silently
    lose hits. Entries past ``count`` are ignored (pad with 0). Results use
    positive_only semantics: hits ordered by (-score, doc_id), rows padded
    with score <= 0 filler.
    """
    bsz, n_terms = q_ids.shape
    n, slots = doc_ids.shape
    k_eff = min(k, n)

    slots_pad = _round_up(slots, 128)
    bq = min(block_q, _round_up(bsz, 8))
    bsz_pad = _round_up(bsz, bq)
    if _round_up(k_eff, 128) > block_n:
        # bumping block_n to hold k would silently re-tile the corpus at a
        # granularity the caller's cand lists were NOT built for (wrong doc
        # ranges, missing hits) — refuse instead
        raise ValueError(
            f"k={k_eff} needs block_n >= {_round_up(k_eff, 128)} but candidate "
            f"tiles were built at block_n={block_n}; rebuild the term->tile "
            "lists at the larger block size or use a full-scan method"
        )
    n_pad = _round_up(n, block_n)
    q_tiles, cap = cand.shape
    if q_tiles != bsz_pad // bq:
        raise ValueError(
            f"cand has {q_tiles} query tiles, kernel uses {bsz_pad // bq} "
            f"(bsz={bsz}, block_q={block_q})"
        )
    doc_ids = jnp.pad(
        doc_ids, ((0, n_pad - n), (0, slots_pad - slots)), constant_values=DOC_PAD
    )
    doc_weights = jnp.pad(doc_weights, ((0, n_pad - n), (0, slots_pad - slots)))
    terms_pad = _round_up(n_terms, 128)
    row_src = jnp.arange(bsz_pad) % bsz
    q_ids_p = jnp.pad(
        q_ids[row_src], ((0, 0), (0, terms_pad - n_terms)), constant_values=QUERY_PAD
    )
    q_weights_p = jnp.pad(q_weights[row_src], ((0, 0), (0, terms_pad - n_terms)))

    kernel = functools.partial(
        _bm25_kernel_probe, k=k_eff, n=n, block_n=block_n, bq=bq,
        n_query_terms=n_terms,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(q_tiles, cap),
        in_specs=[
            pl.BlockSpec(
                (bq, terms_pad), lambda i, j, cand, count: (i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (bq, terms_pad), lambda i, j, cand, count: (i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (block_n, slots_pad),
                lambda i, j, cand, count: (cand[i, j], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_n, slots_pad),
                lambda i, j, cand, count: (cand[i, j], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((bq, k_eff), lambda i, j, cand, count: (i, 0)),
            pl.BlockSpec((bq, k_eff), lambda i, j, cand, count: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k_eff), jnp.float32),
            pltpu.VMEM((bq, k_eff), jnp.int32),
        ],
    )
    # bigger candidate tiles amortize the ~50us/grid-step floor (the probe's
    # measured bottleneck: median 191 steps at block_n=2048); they need more
    # scoped VMEM than Mosaic's 12MB default, which is a soft cap — lift it
    # to the hardware's 128MB ceiling and let the compiler take what it
    # needs (a 24*block_n*slots_pad estimate under-shot by 1% at bn=4096)
    compiler_params = None
    if block_n > 2048:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=128 << 20)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz_pad, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((bsz_pad, k_eff), jnp.int32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(cand.astype(jnp.int32), count.astype(jnp.int32), q_ids_p, q_weights_p, doc_ids, doc_weights)
    out_s, out_i = out_s[:bsz], out_i[:bsz]
    return pad_to_k(out_s, out_i, k, k_eff)


def pack_slots(
    doc_ids: "np.ndarray", doc_weights: "np.ndarray", width: int
) -> tuple["np.ndarray", "np.ndarray", int]:
    """Pack P = 128 // width docs per 128-lane row (doc d -> row d // P,
    lane group d % P). Returns (packed_ids [ceil(N/P), 128], packed_weights,
    P). Requires every doc's terms to fit in ``width`` slots."""
    import numpy as np

    p = max(1, 128 // width)
    if p == 1:
        return doc_ids, doc_weights, 1
    if doc_ids.shape[1] > width and (doc_ids[:, width:] != DOC_PAD).any():
        # enforce the documented precondition instead of silently slicing
        # live term slots off (scores would quietly understate)
        raise ValueError(
            f"pack_slots(width={width}): some docs have live terms beyond "
            f"slot {width}; pack only corpora whose docs fit the width"
        )
    # layout stride MUST be 128 // p — the kernel derives its lane->group
    # mapping from pack alone, so the layout and mapping share one formula
    # (laying out at the raw width broke widths where 128 // (128 // width)
    # != width, e.g. 24 -> stride 25)
    stride = 128 // p
    n = doc_ids.shape[0]
    rows = -(-n // p)
    ids = np.full((rows * p, stride), DOC_PAD, doc_ids.dtype)
    w = np.zeros((rows * p, stride), doc_weights.dtype)
    ids[:n, :width] = doc_ids[:, :width]
    w[:n, :width] = doc_weights[:, :width]
    # exactly 128 lanes; lanes beyond p*stride are DOC_PAD/0 (dead — never
    # match a real term), otherwise pallas would pad the block with UNDEFINED
    # lanes that alias the last doc group
    out_ids = np.full((rows, 128), DOC_PAD, doc_ids.dtype)
    out_w = np.zeros((rows, 128), doc_weights.dtype)
    out_ids[:, : p * stride] = ids.reshape(rows, p * stride)
    out_w[:, : p * stride] = w.reshape(rows, p * stride)
    return out_ids, out_w, p


def _bm25_kernel_packed(
    qid_ref,  # SMEM [bq, T]
    qw_ref,   # SMEM [bq, T]
    tid_ref,  # VMEM [BN, 128] — P packed docs per row
    tw_ref,   # VMEM [BN, 128]
    g_ref,    # VMEM [128, P_pad] 0/1 lane->doc-group indicator
    out_s_ref, out_i_ref, acc_s, acc_i,
    *, k, n, block_n, bq, n_query_terms, pack,
):
    """Packed variant: P short docs share one 128-lane row; per (query, term)
    the [BN, 128] match row-reduces into per-doc contributions via ONE
    grouping matmul on the MXU ([BN,128] x [128,P]), so each VPU compare
    covers P x more docs than the slot-per-lane kernels. Top-k extracts per
    (query, lane-group) sub-row; the P sub-lists merge OUTSIDE the kernel
    (ids are globally consistent)."""
    from autorag_research_tpu.ops.dense import _extract_topk

    j = pl.program_id(1)
    nj = pl.num_programs(1)
    p_pad = g_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, INT_MAX)

    tid = tid_ref[:]  # [BN, 128]
    tw = tw_ref[:]
    g = g_ref[:]      # [128, P_pad]
    bn = tid.shape[0]

    def term_body(t, carry):  # carry: tuple of bq [P_pad, BN] accumulators
        new = []
        for b in range(bq):  # static unroll over the query tile
            term_id = qid_ref[b, t]
            term_w = qw_ref[b, t]
            match = jnp.where(tid == term_id, tw, 0.0)  # [BN, 128]
            # contributions per packed doc: [P_pad, BN] via MXU
            c = jax.lax.dot_general(
                g, match,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            new.append(carry[b] + c * term_w)
        return tuple(new)

    init = tuple(jnp.zeros((p_pad, bn), jnp.float32) for _ in range(bq))
    carry = jax.lax.fori_loop(0, n_query_terms, term_body, init)
    scores = jnp.concatenate(carry, axis=0)  # [bq * P_pad, BN]
    # candidate doc id at (sub-row p of query b, lane r) = (j*BN + r)*pack + p
    lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) % p_pad
    gids = (j * block_n + lane) * pack + sub
    valid = (sub < pack) & (gids < n)
    scores = jnp.where(valid, scores, NEG_INF)
    gids = jnp.where(valid, gids, INT_MAX)

    tile_s, tile_i = _extract_topk(scores, gids, k)  # [bq*P_pad, k]
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
    jax.jit,
    static_argnames=("n_docs", "k", "pack", "block_q", "block_n", "interpret"),
)
def bm25_topk_pallas_packed(
    q_ids: jax.Array,
    q_weights: jax.Array,
    packed_ids: jax.Array,    # [R, 128] from pack_slots
    packed_weights: jax.Array,
    n_docs: int,
    k: int,
    pack: int,
    block_q: int = 8,
    block_n: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """BM25 over a lane-packed layout (see ``pack_slots`` / kernel docstring).
    Each kernel compare covers ``pack`` x more docs than the per-doc-row
    kernels; per-(query, sub-row) top-k lists merge here via sort_topk."""
    bsz, n_terms = q_ids.shape
    rows = packed_ids.shape[0]
    k_eff = min(k, n_docs)
    p_pad = _round_up(pack, 8)  # sublane granularity for the scores tile
    width = 128 // pack

    bq = min(block_q, _round_up(bsz, 8))
    bsz_pad = _round_up(bsz, bq)
    block_n = max(block_n, _round_up(k_eff, 128))
    rows_pad = _round_up(rows, block_n)
    packed_ids = jnp.pad(
        packed_ids, ((0, rows_pad - rows), (0, 0)), constant_values=DOC_PAD
    )
    packed_weights = jnp.pad(packed_weights, ((0, rows_pad - rows), (0, 0)))
    terms_pad = _round_up(n_terms, 128)
    q_ids = jnp.pad(
        q_ids, ((0, bsz_pad - bsz), (0, terms_pad - n_terms)), constant_values=QUERY_PAD
    )
    q_weights = jnp.pad(q_weights, ((0, bsz_pad - bsz), (0, terms_pad - n_terms)))
    # lane l belongs to doc-group l // width
    import numpy as _np

    g_host = _np.zeros((128, p_pad), _np.float32)
    g_host[_np.arange(128), _np.minimum(_np.arange(128) // width, pack - 1)] = 1.0
    g = jnp.asarray(g_host)

    grid = (bsz_pad // bq, rows_pad // block_n)
    kernel = functools.partial(
        _bm25_kernel_packed, k=k_eff, n=n_docs, block_n=block_n,
        bq=bq, n_query_terms=n_terms, pack=pack,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, terms_pad), lambda i, j: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, terms_pad), lambda i, j: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_n, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, p_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq * p_pad, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq * p_pad, k_eff), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz_pad * p_pad, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((bsz_pad * p_pad, k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq * p_pad, k_eff), jnp.float32),
            pltpu.VMEM((bq * p_pad, k_eff), jnp.int32),
        ],
        interpret=interpret,
    )(q_ids, q_weights, packed_ids, packed_weights, g)
    # merge each query's P sub-row lists: [bsz, P_pad * k] -> top k
    out_s = out_s.reshape(bsz_pad, p_pad * k_eff)[:bsz]
    out_i = out_i.reshape(bsz_pad, p_pad * k_eff)[:bsz]
    out_s, out_i = sort_topk(out_s, out_i, k_eff)
    return pad_to_k(out_s, out_i, k, k_eff)


def _bm25_kernel_probe_packed(
    cand_ref,   # scalar-prefetch [q_tiles, cap] int32: packed-row tile per step
    count_ref,  # scalar-prefetch [q_tiles] int32
    qid_ref,    # SMEM [bq, T]
    qw_ref,     # SMEM [bq, T]
    tid_ref,    # VMEM [BN, 128] — P packed docs per row
    tw_ref,     # VMEM [BN, 128]
    g_ref,      # VMEM [128, P_pad]
    out_s_ref, out_i_ref, acc_s, acc_i,
    *, k, n, block_n, bq, n_query_terms, pack,
):
    """Probe x packed compose: the candidate-tile grid (sub-linear tile count)
    runs over the lane-packed layout (pack x docs per compare) — the two
    measured wins attack different costs (steps vs per-step doc coverage), so
    they multiply on rare-term queries over short-doc corpora.

    positive_only semantics like the flat probe kernel: acc starts at 0.0,
    non-positive scores mask to NEG_INF, filler rows come back score <= 0."""
    from autorag_research_tpu.ops.dense import _extract_topk

    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    p_pad = g_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.zeros_like(acc_s)
        acc_i[:] = jnp.full_like(acc_i, INT_MAX)

    @pl.when(j < count_ref[i])
    def _score():
        tid = tid_ref[:]
        tw = tw_ref[:]
        g = g_ref[:]
        bn = tid.shape[0]

        def term_body(t, carry):
            new = []
            for b in range(bq):
                term_id = qid_ref[b, t]
                term_w = qw_ref[b, t]
                match = jnp.where(tid == term_id, tw, 0.0)
                c = jax.lax.dot_general(
                    g, match,
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                new.append(carry[b] + c * term_w)
            return tuple(new)

        init = tuple(jnp.zeros((p_pad, bn), jnp.float32) for _ in range(bq))
        carry = jax.lax.fori_loop(0, n_query_terms, term_body, init)
        scores = jnp.concatenate(carry, axis=0)  # [bq * P_pad, BN]
        lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) % p_pad
        gids = (cand_ref[i, j] * block_n + lane) * pack + sub
        valid = (sub < pack) & (gids < n) & (scores > 0.0)
        scores = jnp.where(valid, scores, NEG_INF)
        gids = jnp.where(valid, gids, INT_MAX)
        tile_s, tile_i = _extract_topk(scores, gids, k)
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
    jax.jit,
    static_argnames=("n_docs", "k", "pack", "block_q", "block_n", "interpret"),
)
def bm25_topk_pallas_probe_packed(
    q_ids: jax.Array,
    q_weights: jax.Array,
    packed_ids: jax.Array,     # [R, 128] from pack_slots
    packed_weights: jax.Array,
    n_docs: int,
    pack: int,
    cand: jax.Array,   # [q_tiles, cap] candidate PACKED-ROW tiles
    count: jax.Array,  # [q_tiles]
    k: int,
    block_q: int = 8,
    block_n: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Probe-mode BM25 over the lane-packed layout.

    A candidate tile of ``block_n`` packed rows covers exactly
    ``block_n * pack`` docs, so the host term->tile lists from
    ``build_term_tile_lists(doc_ids, block_n * pack)`` are the correct
    candidate source. Same exactness contract as
    :func:`bm25_topk_pallas_probe`: every tile containing a positive-scoring
    doc must be listed."""
    bsz, n_terms = q_ids.shape
    rows = packed_ids.shape[0]
    k_eff = min(k, n_docs)
    p_pad = _round_up(pack, 8)

    bq = min(block_q, _round_up(bsz, 8))
    bsz_pad = _round_up(bsz, bq)
    if k_eff > block_n:
        # each per-(query, lane-group) sub-row extracts k from block_n packed
        # rows; fewer candidates than k would emit duplicate NEG_INF-tie ids
        raise ValueError(
            f"k={k_eff} needs block_n >= {k_eff} packed rows; rebuild the "
            "term->tile lists at a larger block or use a full-scan method"
        )
    if block_n % 8 and block_n != rows:
        # Mosaic block rows must be divisible by 8 (or span the array);
        # callers derive block_n from probe_block_n // pack — round there
        raise ValueError(f"block_n={block_n} must be a multiple of 8")
    rows_pad = _round_up(rows, block_n)
    q_tiles, cap = cand.shape
    if q_tiles != bsz_pad // bq:
        raise ValueError(
            f"cand has {q_tiles} query tiles, kernel uses {bsz_pad // bq} "
            f"(bsz={bsz}, block_q={block_q})"
        )
    packed_ids = jnp.pad(
        packed_ids, ((0, rows_pad - rows), (0, 0)), constant_values=DOC_PAD
    )
    packed_weights = jnp.pad(packed_weights, ((0, rows_pad - rows), (0, 0)))
    terms_pad = _round_up(n_terms, 128)
    row_src = jnp.arange(bsz_pad) % bsz
    q_ids_p = jnp.pad(
        q_ids[row_src], ((0, 0), (0, terms_pad - n_terms)), constant_values=QUERY_PAD
    )
    q_weights_p = jnp.pad(q_weights[row_src], ((0, 0), (0, terms_pad - n_terms)))
    import numpy as _np

    width = 128 // pack
    g_host = _np.zeros((128, p_pad), _np.float32)
    g_host[_np.arange(128), _np.minimum(_np.arange(128) // width, pack - 1)] = 1.0
    g = jnp.asarray(g_host)

    kernel = functools.partial(
        _bm25_kernel_probe_packed, k=k_eff, n=n_docs, block_n=block_n,
        bq=bq, n_query_terms=n_terms, pack=pack,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(q_tiles, cap),
        in_specs=[
            pl.BlockSpec(
                (bq, terms_pad), lambda i, j, cand, count: (i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (bq, terms_pad), lambda i, j, cand, count: (i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (block_n, 128),
                lambda i, j, cand, count: (cand[i, j], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_n, 128),
                lambda i, j, cand, count: (cand[i, j], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (128, p_pad), lambda i, j, cand, count: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((bq * p_pad, k_eff), lambda i, j, cand, count: (i, 0)),
            pl.BlockSpec((bq * p_pad, k_eff), lambda i, j, cand, count: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq * p_pad, k_eff), jnp.float32),
            pltpu.VMEM((bq * p_pad, k_eff), jnp.int32),
        ],
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz_pad * p_pad, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((bsz_pad * p_pad, k_eff), jnp.int32),
        ],
        interpret=interpret,
    )(
        cand.astype(jnp.int32), count.astype(jnp.int32),
        q_ids_p, q_weights_p, packed_ids, packed_weights, g,
    )
    out_s = out_s.reshape(bsz_pad, p_pad * k_eff)[:bsz]
    out_i = out_i.reshape(bsz_pad, p_pad * k_eff)[:bsz]
    out_s, out_i = sort_topk(out_s, out_i, k_eff)
    return pad_to_k(out_s, out_i, k, k_eff)


# ---------------------------------------------------------------- tile-WAND
#
# Upper-bound pruning for the one query class the probe path can't serve:
# COMMON-term queries, whose candidate-tile union is ~all tiles (probe only
# routes when the union <= half). The classic WAND bound — score(q, d) <=
# sum_t qw_t * max-weight-of-t-in-d's-tile — lets tiles that provably cannot
# reach the running k-th score be skipped entirely. TPU-shaped as a host-
# scheduled TWO-PASS probe (reference behavior: block-WAND inside
# vchord_bm25, orm/repository/chunk.py:185-247):
#
#   pass 1  score the top-B tiles by per-group upper bound exactly (one
#           probe launch); theta_q = the q-th query's k-th positive score
#   pass 2  score every REMAINING tile whose bound can still beat theta
#           (one more probe launch); merge the two exact top-k lists
#
# Exact by construction: a doc outside both passes sits in a tile with
# UB < theta, so its score < theta <= the final k-th score — it can never
# enter the top-k, and ties AT theta are covered because pass 2 keeps tiles
# with UB >= theta. The grid only visits tiles that survive the bound, so
# (unlike the Bloom skip kernel, which predicates compute but still pays
# ~50us per skipped grid step) pruning here removes the step itself.


def build_term_tile_maxw(
    doc_ids: "np.ndarray", doc_weights: "np.ndarray", block_n: int
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
    """Exact host-side (term -> tile -> max BM25 weight) CSR.

    Same key set and ordering as :func:`build_term_tile_lists` (one unique
    (term, tile) entry per live pair), with a parallel ``maxw`` array:
    ``maxw[i]`` = the maximum per-DOC total weight of ``terms[i]`` inside
    doc tile ``tiles[i]``. Per-doc TOTAL, not per-slot max: the scorer sums
    every slot matching a query term, so a doc holding the same term in
    several slots scores their sum — a per-slot max would NOT dominate it
    (and a violated bound silently drops true top-k docs). This is the WAND
    bound source: for query weights ``qw``, ``sum_t qw_t * maxw(t, tile)``
    >= every doc score in the tile.
    """
    import numpy as np

    n = doc_ids.shape[0]
    n_tiles = max(1, -(-n // block_n))
    rows, cols = np.nonzero(doc_ids >= 0)
    terms_all = doc_ids[rows, cols].astype(np.int64)
    w_all = np.asarray(doc_weights, np.float64)[rows, cols]
    # per-(term, doc) slot-weight totals first ...
    keys_td, inv_td = np.unique(terms_all * n + rows, return_inverse=True)
    sums = np.zeros(len(keys_td), np.float64)
    np.add.at(sums, inv_td, w_all)
    terms_u = keys_td // n
    tiles_u = (keys_td % n) // block_n
    # ... then the per-(term, tile) max over docs; the (1 + 1e-6) inflation
    # keeps the float32 bound above the kernel's own float32 sum regardless
    # of accumulation-order rounding (loosening is safe, tightening is not)
    keys, inv = np.unique(terms_u * n_tiles + tiles_u, return_inverse=True)
    maxw64 = np.zeros(len(keys), np.float64)
    np.maximum.at(maxw64, inv, sums)
    maxw = (maxw64 * (1.0 + 1e-6)).astype(np.float32)
    terms = keys // n_tiles
    tiles = (keys % n_tiles).astype(np.int32)
    vocab = int(terms[-1]) + 1 if len(terms) else 1
    indptr = np.zeros(vocab + 1, np.int64)
    np.add.at(indptr, terms + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, tiles, maxw


def wand_upper_bounds(
    q_ids: "np.ndarray",
    q_weights: "np.ndarray",
    indptr: "np.ndarray",
    tiles: "np.ndarray",
    maxw: "np.ndarray",
    n_tiles: int,
    return_single_best: bool = False,
):
    """Per-query per-tile WAND upper bounds [bsz, n_tiles] (host, numpy).

    ub[q, t] >= score(q, d) for every doc d in tile t; tiles sharing no
    query term get exactly 0 (BM25 weights are positive).

    With ``return_single_best`` also returns sb [bsz, n_tiles]: the best
    SINGLE-term contribution ``max_t qw_t * maxw(t, tile)`` — a LOWER bound
    on the best attainable doc score in the tile (the doc attaining maxw
    scores at least that), used for the pre-dispatch theta lower bound."""
    import numpy as np

    bsz, n_terms = q_ids.shape
    vocab = len(indptr) - 1
    ub = np.zeros((bsz, n_tiles), np.float32)
    sb = np.zeros((bsz, n_tiles), np.float32) if return_single_best else None
    for b in range(bsz):
        for t in range(n_terms):
            tid = int(q_ids[b, t])
            w = float(q_weights[b, t])
            if 0 <= tid < vocab and w > 0.0:
                lo, hi = indptr[tid], indptr[tid + 1]
                ub[b, tiles[lo:hi]] += w * maxw[lo:hi]
                if sb is not None:
                    np.maximum.at(sb, (b, tiles[lo:hi]), w * maxw[lo:hi])
    return (ub, sb) if return_single_best else ub


def _merge_topk_host(s1, i1, s2, i2, k):
    """Exact (-score, id) merge of two disjoint per-query top-k lists."""
    import numpy as np

    scores = np.concatenate([np.asarray(s1), np.asarray(s2)], axis=1)
    ids = np.concatenate([np.asarray(i1), np.asarray(i2)], axis=1)
    order = np.lexsort((ids, -scores), axis=1)[:, :k]
    b_idx = np.arange(scores.shape[0])[:, None]
    return scores[b_idx, order], ids[b_idx, order]


def bm25_topk_wand(
    q_ids,
    q_weights,
    doc_ids,
    doc_weights,
    term_tiles_maxw,
    k: int,
    block_q: int = 8,
    block_n: int = 2048,
    pass1_tiles: int | None = None,
    scan_fraction: float = 0.75,
    interpret: bool = False,
    packed: tuple | None = None,
    return_stats: bool = False,
    fallback=None,
):
    """Exact tile-WAND BM25 top-k (two-pass upper-bound-pruned probe).

    ``term_tiles_maxw`` is :func:`build_term_tile_maxw` output built at tile
    granularity ``block_n`` docs (or ``block_n * pack`` when ``packed``).
    ``packed=(packed_ids, packed_weights, n_docs, pack)`` runs both passes
    over the lane-packed layout (probe x packed compose). Results match the
    full scan's positive hits including (-score, id) tie order.

    Dispatch flow (cheapest exit first):

    1. ``fallback_early`` — a pre-dispatch theta LOWER bound (the k-th
       largest per-tile best-single-term attained score) already proves
       pruning can't reach ``scan_fraction``: run the fallback with ZERO
       probe launches. This is the long multi-term common-query case,
       where the additive sum-of-maxima bound structurally exceeds any
       real k-th score.
    2. ``single_pass`` — the est set (tiles whose bound reaches theta_lb)
       is barely larger than the pass-1 union: probe it directly, exact in
       ONE launch (single-term and dominant-term queries land here).
    3. two-pass — pass 1 probes each query's own top-B tiles by bound
       (unioned per bq group), theta = max(k-th pass-1 positive score,
       theta_lb); pass 2 probes remaining tiles with ub >= theta; exact
       host merge. ``fallback_full`` fires instead when the two passes
       would touch more than ``scan_fraction`` of all tiles.

    Returns (scores, ids); with ``return_stats`` also a dict holding the
    scanned-tile accounting and which exit fired.
    """
    import numpy as np

    q_np = np.asarray(q_ids)
    w_np = np.asarray(q_weights)
    bsz = q_np.shape[0]
    indptr, tiles, maxw = term_tiles_maxw
    if packed is not None:
        packed_ids, packed_weights, n_docs, pack = packed
        docs_per_tile = block_n * pack
    else:
        n_docs = doc_ids.shape[0]
        pack = 1
        docs_per_tile = block_n
    n_tiles = max(1, -(-n_docs // docs_per_tile))
    k_eff = min(k, n_docs)

    bq = min(block_q, _round_up(bsz, 8))
    q_tiles = -(-_round_up(bsz, bq) // bq)
    ub, sb = wand_upper_bounds(
        q_np, w_np, indptr, tiles, maxw, n_tiles, return_single_best=True
    )

    def _fallback_out(stats):
        stats["fallback_full"] = True
        if fallback is not None:
            out = fallback()
        elif packed is not None:
            out = bm25_topk_pallas_packed(
                jnp.asarray(q_ids), jnp.asarray(q_weights),
                packed_ids, packed_weights, n_docs, k_eff, pack,
                interpret=interpret,
            )
        else:
            out = bm25_topk(
                jnp.asarray(q_ids), jnp.asarray(q_weights), doc_ids,
                doc_weights, k_eff,
                method="xla" if interpret else "auto",
            )
        s, i = pad_to_k(out[0], out[1], k, k_eff)
        return (s, i, stats) if return_stats else (s, i)

    # ---- pre-dispatch predictor: a PROVABLE lower bound on each query's
    # final theta is the k-th largest per-tile best-single-term attained
    # score (distinct tiles -> k distinct docs, each scoring at least its
    # tile's sb). If even that bound cannot prune below scan_fraction,
    # pass 1 is wasted work — fall back before paying any dispatch. The
    # (1 - 1e-5) deflation covers the builder's bound inflation + f32
    # rounding so the lower bound stays on the safe side.
    if n_tiles > k_eff:
        theta_lb = -np.partition(-sb, k_eff - 1, axis=1)[:, k_eff - 1]
        theta_lb = np.maximum(theta_lb * (1.0 - 1e-5), 0.0).astype(np.float32)
    else:
        theta_lb = np.zeros(bsz, np.float32)
    est_q = (ub > 0.0) & (ub >= theta_lb[:, None])
    est = np.stack(
        [
            est_q[g * bq : min((g + 1) * bq, bsz)].any(axis=0)
            for g in range(q_tiles)
        ]
    )
    est_max = int(est.sum(axis=1).max()) if len(est) else 0
    if est_max > scan_fraction * n_tiles:
        return _fallback_out(
            {
                "n_tiles": n_tiles,
                "pass1_tiles": 0,
                "pass2_tiles_max": est_max,
                "fallback_full": False,
                "fallback_early": True,
                "single_pass": False,
            }
        )

    def _probe(cand, count, cap):
        cand = jnp.asarray(cand[:, :cap])
        count = jnp.asarray(count)
        if packed is not None:
            return bm25_topk_pallas_probe_packed(
                jnp.asarray(q_ids), jnp.asarray(q_weights),
                packed_ids, packed_weights, n_docs, pack,
                cand, count, k_eff, block_q=block_q, block_n=block_n,
                interpret=interpret,
            )
        return bm25_topk_pallas_probe(
            jnp.asarray(q_ids), jnp.asarray(q_weights), doc_ids, doc_weights,
            cand, count, k_eff, block_q=block_q, block_n=block_n,
            interpret=interpret,
        )

    # ---- pass 1: exact scores over each query's OWN top-B tiles by bound,
    # unioned per bq group (the kernel scores every member against every
    # tile in the group list). Selecting by a group-max bound instead
    # starves members whose terms miss those tiles — their theta collapses
    # to 0 and pass 2 degenerates to a full scan. B >= k matters: for a
    # single-term query the top-k docs' tiles all rank in the top-k tiles
    # by bound, so theta from pass 1 IS the true k-th score and pass 2
    # prunes to ~the tiles holding true top-k contenders (classic WAND).
    # default: at least k tiles per query (theta then equals the true k-th
    # score for single-term queries); an explicit pass1_tiles is respected
    # as-is (correctness never depends on pass-1 coverage)
    b1 = max(1, min(max(8, k_eff) if pass1_tiles is None else pass1_tiles, n_tiles))
    sel: list[np.ndarray] = []
    for q in range(bsz):
        order = np.argsort(-ub[q], kind="stable")[:b1]
        sel.append(order[ub[q][order] > 0.0])
    groups = [
        np.unique(np.concatenate(sel[g * bq : min((g + 1) * bq, bsz)] or [np.empty(0, np.int64)]))
        for g in range(q_tiles)
    ]
    max1 = max((len(u) for u in groups), default=0)

    # ---- single-pass shortcut: when the pre-dispatch est set is barely
    # larger than the pass-1 union, probing est DIRECTLY is exact (docs in
    # other tiles score < theta_lb <= true k-th) and saves the second
    # dispatch — the dominant cost at small tile counts is per-launch
    # overhead, not tiles (a tunnel RTT alone is worth ~3500 tile steps).
    if pass1_tiles is None and est_max <= 2 * max1 + 64:
        cap_e = min(n_tiles, max(16, 1 << max(0, est_max - 1).bit_length()))
        cand_e = np.zeros((q_tiles, cap_e), np.int32)
        count_e = np.zeros(q_tiles, np.int32)
        for g in range(q_tiles):
            live = np.flatnonzero(est[g])[:cap_e]
            cand_e[g, : len(live)] = live.astype(np.int32)
            count_e[g] = len(live)
        s1, i1 = _probe(cand_e, count_e, cap_e)
        stats = {
            "n_tiles": n_tiles,
            "pass1_tiles": est_max,
            "pass2_tiles_max": 0,
            "fallback_full": False,
            "fallback_early": False,
            "single_pass": True,
        }
        s, i = pad_to_k(s1, i1, k, k_eff)
        return (s, i, stats) if return_stats else (s, i)

    cap1 = min(n_tiles, max(16, 1 << max(0, max1 - 1).bit_length()))
    cand1 = np.zeros((q_tiles, cap1), np.int32)
    count1 = np.zeros(q_tiles, np.int32)
    for g, u in enumerate(groups):
        cand1[g, : len(u)] = u.astype(np.int32)
        count1[g] = len(u)
    s1, i1 = _probe(cand1, count1, cap1)
    s1_np = np.asarray(s1)

    # per-query threshold: the k-th positive pass-1 score (0 when fewer
    # than k positive hits exist — then every UB>0 tile must be scanned,
    # since only positive scores are hits)
    theta = s1_np[:, k_eff - 1].copy()
    theta[~(theta > 0.0)] = 0.0
    # the pre-dispatch lower bound can only raise theta (both are valid
    # lower bounds on the true k-th score; the max is the tighter one)
    theta = np.maximum(theta, theta_lb)
    # ---- pass 2: remaining tiles whose bound can still reach theta.
    # Per-QUERY test, then union over the group — strictly tighter than
    # comparing the group's max bound against its min theta (which a
    # heterogeneous group can satisfy with no individual member doing so).
    in_pass1 = np.zeros((q_tiles, n_tiles), bool)
    for g in range(q_tiles):
        in_pass1[g, cand1[g, : count1[g]]] = True
    need_q = (ub > 0.0) & (ub >= theta[:, None])  # [bsz, n_tiles]
    need = (
        np.stack(
            [
                need_q[g * bq : min((g + 1) * bq, bsz)].any(axis=0)
                for g in range(q_tiles)
            ]
        )
        & ~in_pass1
    )
    count2 = need.sum(axis=1).astype(np.int32)
    max2 = int(count2.max()) if len(count2) else 0
    stats = {
        "n_tiles": n_tiles,
        "pass1_tiles": int(count1.max()) if len(count1) else 0,
        "pass2_tiles_max": max2,
        "fallback_full": False,
        "fallback_early": False,
        "single_pass": False,
    }
    p1_max = int(count1.max()) if len(count1) else 0
    if max2 + p1_max > scan_fraction * n_tiles:
        # the bound prunes too little — a straight full scan (or the
        # caller's ``fallback``, e.g. the Bloom skip kernel) is cheaper
        # than a probe visiting nearly every tile plus this pass-1 work
        return _fallback_out(stats)

    if max2 == 0:
        s, i = pad_to_k(s1, i1, k, k_eff)
        return (s, i, stats) if return_stats else (s, i)

    # power-of-two cap buckets bound the number of compiled grids
    cap2 = min(n_tiles, max(16, 1 << max(0, max2 - 1).bit_length()))
    cand2 = np.zeros((q_tiles, cap2), np.int32)
    for g in range(q_tiles):
        live = np.flatnonzero(need[g])[:cap2]
        cand2[g, : len(live)] = live.astype(np.int32)
    s2, i2 = _probe(cand2, count2, cap2)

    sm, im = _merge_topk_host(s1, i1, s2, i2, k_eff)
    s, i = pad_to_k(jnp.asarray(sm), jnp.asarray(im), k, k_eff)
    return (s, i, stats) if return_stats else (s, i)


def bm25_topk(q_ids, q_weights, doc_ids, doc_weights, k, method: str = "auto"):
    from autorag_research_tpu.ops.dense import on_tpu

    if method == "auto":
        method = "pallas_v2" if on_tpu() else "xla"
    if method == "pallas":
        return bm25_topk_pallas(q_ids, q_weights, doc_ids, doc_weights, k)
    if method == "pallas_v2":
        return bm25_topk_pallas_v2(q_ids, q_weights, doc_ids, doc_weights, k)
    if method == "xla":
        return bm25_topk_xla(q_ids, q_weights, doc_ids, doc_weights, k)
    raise ValueError(f"unknown bm25_topk method: {method}")
