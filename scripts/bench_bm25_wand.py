"""Tile-WAND BM25 at 5M docs: can upper bounds prune COMMON-term queries?

The probe path (exact candidate tiles) serves rare-term queries sub-linearly
but refuses when the candidate union exceeds half the tiles — common-term
queries fall back to the packed full scan (29.0 ms/query @ 5M,
bench_bm25_probe_packed). Tile-WAND stores per-(term, tile) max weights at
build and runs a TWO-PASS probe: pass 1 scores the top-B tiles by upper
bound exactly, pass 2 scores only the remaining tiles whose bound can still
reach the pass-1 k-th score (theta). Exact including tie order; when the
bound prunes too little the kernel falls back to the full packed scan.

Reference behavior: block-WAND inside vchord_bm25
(/root/reference/autorag_research/orm/repository/chunk.py:185-247).

WAND is host-orchestrated (2 launches + a theta readback), so through the
axon tunnel each call pays ~2 RTTs (~60 ms) — batch queries to amortize.
Measured at equal batch size vs the single-launch full scan.

Run: python scripts/bench_bm25_wand.py [--n 5000000] [--bsz 32]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.sparse import (  # noqa: E402
    QUERY_PAD,
    bm25_topk_pallas_packed,
    bm25_topk_wand,
    build_term_tile_maxw,
    cluster_doc_order,
    pack_slots,
)

SLOTS, T, K, VOCAB = 16, 8, 10, 500_000
BN_ROWS = 256  # packed rows per candidate tile; x pack(8) = 2048 docs/tile


def gen_short_docs(n, rng):
    """Zipfian term draw with BM25-REALISTIC weights: w = idf(term) x a
    tf/length factor in [0.45, 1.0]. (The probe/packed benches use uniform
    weights, which are maximally adversarial for ANY upper-bound pruning:
    every tile's per-term max is ~the global max, so bounds carry zero
    variance. Real BM25 weights are idf-dominated — common terms are LOW
    impact — which is exactly the structure block-WAND exploits.)"""
    ids = np.full((n, SLOTS), -1, np.int32)
    tf = np.zeros((n, SLOTS), np.float32)
    for lo in range(0, n, 500_000):
        hi = min(lo + 500_000, n)
        cnt = rng.integers(4, SLOTS, size=hi - lo)
        u = rng.random((hi - lo, SLOTS))
        terms = np.minimum((VOCAB ** u).astype(np.int64), VOCAB - 1).astype(np.int32)
        mask = np.arange(SLOTS)[None, :] < cnt[:, None]
        ids[lo:hi] = np.where(mask, terms, -1)
        tf[lo:hi] = np.where(
            mask, rng.uniform(0.45, 1.0, (hi - lo, SLOTS)), 0.0
        ).astype(np.float32)
    df = np.zeros(VOCAB, np.int64)
    t_, c_ = np.unique(ids[ids >= 0], return_counts=True)
    df[t_] = c_
    idf = np.log1p((n - df + 0.5) / (df + 0.5)).astype(np.float32)
    w = np.where(ids >= 0, idf[np.where(ids >= 0, ids, 0)] * tf, 0.0).astype(np.float32)
    return ids, w, df


def load_corpus(n):
    cache = f"/tmp/bm25_wand_{n}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["ids"], z["w"]
    rng = np.random.default_rng(0)
    ids, w, df = gen_short_docs(n, rng)
    order = cluster_doc_order(ids, df)
    ids, w = ids[order], w[order]
    np.savez(cache, ids=ids, w=w)
    return ids, w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--bsz", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    n, bsz, reps = args.n, args.bsz, args.reps
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    ids, w = load_corpus(n)
    pids, pw, pack = pack_slots(ids, w, SLOTS)
    docs_per_tile = BN_ROWS * pack
    n_tiles = -(-n // docs_per_tile)
    maxw_csr = build_term_tile_maxw(ids, w, docs_per_tile)
    print(
        f"corpus ready {time.perf_counter() - t0:.0f}s: pack={pack}, "
        f"{pids.shape[0]} packed rows, {n_tiles} tiles, "
        f"maxw CSR {maxw_csr[1].nbytes / 1e6:.0f} MB",
        file=sys.stderr, flush=True,
    )
    pids_d = jax.device_put(jnp.asarray(pids))
    pw_d = jax.device_put(jnp.asarray(pw))

    rng = np.random.default_rng(7)
    results = {"pack": pack, "bsz": bsz, "n": n}
    # The bound's looseness grows with query term count (ub sums every
    # term's tile max, but a typical doc matches only 1-2), so sweep it:
    # short common-term queries are the realistic full-scan-paying class
    # (probe refuses them — their tile union is everything), long all-common
    # queries are the worst case where the internal fallback must fire.
    classes = (
        ("common1", 1, 0), ("common2", 2, 0), ("common4", 4, 0),
        ("common8", 8, 0), ("mixed", 6, 2),
    )
    for kind, n_common, n_rare in classes:
        nt = n_common + n_rare
        q_ids = np.full((reps, bsz, T), QUERY_PAD, np.int32)
        q_ids[:, :, :n_common] = rng.integers(0, 1000, size=(reps, bsz, n_common))
        if n_rare:
            q_ids[:, :, n_common:nt] = rng.integers(
                VOCAB // 2, VOCAB, size=(reps, bsz, n_rare)
            )
        q_w = np.zeros((reps, bsz, T), np.float32)
        q_w[:, :, :nt] = rng.uniform(0.5, 1.5, size=(reps, bsz, nt))

        # ---- WAND (host-orchestrated; warm every rep's grid shapes first)
        def wand_call(r, return_stats=False):
            return bm25_topk_wand(
                jnp.asarray(q_ids[r]), jnp.asarray(q_w[r]), None, None,
                maxw_csr, K, block_n=BN_ROWS,
                packed=(pids_d, pw_d, n, pack), return_stats=return_stats,
            )

        stats_all = []
        for r in range(reps):  # warmup: compile every cap bucket
            out = wand_call(r, return_stats=True)
            stats_all.append(out[2])
            float(np.asarray(out[0]).sum())
        t0 = time.perf_counter()
        for r in range(reps):
            s, i = wand_call(r)
            float(np.asarray(s).sum())
        dt_wand = (time.perf_counter() - t0) / (reps * bsz)
        p2 = [st["pass2_tiles_max"] for st in stats_all]
        fb = sum(st["fallback_full"] for st in stats_all)
        early = sum(st.get("fallback_early", False) for st in stats_all)
        single = sum(st.get("single_pass", False) for st in stats_all)
        results[f"{kind}_wand_ms"] = round(dt_wand * 1e3, 2)
        results[f"{kind}_pass2_tiles_med"] = int(np.median(p2))
        results[f"{kind}_fallbacks"] = fb
        results[f"{kind}_early"] = early
        results[f"{kind}_single_pass"] = single
        print(
            f"{kind}: wand          {dt_wand * 1e3:7.2f} ms/query "
            f"{1 / dt_wand:7.1f} QPS  pass2 tiles med {int(np.median(p2))}/"
            f"{n_tiles}  fallbacks {fb}/{reps} (early {early})  "
            f"single-pass {single}/{reps}",
            file=sys.stderr, flush=True,
        )

        # ---- packed full scan at the same batch size (sustained, one jit)
        @jax.jit
        def packed_sustained(qi, qw, p_ids, p_w):
            def one(x):
                q, qq = x
                return bm25_topk_pallas_packed(q, qq, p_ids, p_w, n, K, pack)
            return jax.lax.map(one, (qi, qw))

        qi_d, qw_d = jnp.asarray(q_ids), jnp.asarray(q_w)
        out = packed_sustained(qi_d, qw_d, pids_d, pw_d)
        float(jax.tree.leaves(out)[0].sum())
        t0 = time.perf_counter()
        out = packed_sustained(qi_d, qw_d, pids_d, pw_d)
        float(jax.tree.leaves(out)[0].sum())
        dt_full = (time.perf_counter() - t0) / (reps * bsz)
        results[f"{kind}_packed_full_ms"] = round(dt_full * 1e3, 2)
        results[f"{kind}_speedup"] = round(dt_full / dt_wand, 2)
        print(
            f"{kind}: packed_full   {dt_full * 1e3:7.2f} ms/query "
            f"{1 / dt_full:7.1f} QPS  -> wand speedup {dt_full / dt_wand:.2f}x",
            file=sys.stderr, flush=True,
        )

        # ---- correctness: positive hits identical vs full scan (rep 0)
        s0, i0 = map(
            np.asarray,
            bm25_topk_pallas_packed(
                jnp.asarray(q_ids[0]), jnp.asarray(q_w[0]), pids_d, pw_d, n, K, pack
            ),
        )
        s1, i1 = map(np.asarray, wand_call(0))
        ok = True
        for b in range(bsz):
            pos = s0[b] > 0
            ok &= np.array_equal(i1[b][: pos.sum()], i0[b][pos]) and np.allclose(
                s1[b][: pos.sum()], s0[b][pos], rtol=1e-5
            )
        results[f"{kind}_hits_identical"] = bool(ok)
        print(f"{kind}: positive hits identical: {ok}", file=sys.stderr, flush=True)
    print(results)


if __name__ == "__main__":
    main()
