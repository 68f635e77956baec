"""Probe x packed BM25 at 5M SHORT docs: do the two wins multiply?

The probe kernel (candidate-tile grid, 4.0x on rare terms @ 64 slots) and the
lane-packed kernel (8 docs/row at width 16, 3.4x full-scan) attack different
costs: step COUNT vs bytes/docs per step. On a width-16 corpus the flat probe
pads slots 16 -> 128 (8x dead lanes), so composing them should recover that
factor on rare-term queries. Candidate tiles are built at block_n_rows * pack
doc granularity (= the flat probe's 2048-doc tiles when block_n_rows = 256).

Run: python scripts/bench_bm25_probe_packed.py [--n 5000000]
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
    bm25_topk_pallas_probe,
    bm25_topk_pallas_probe_packed,
    bm25_topk_pallas_v2,
    build_term_tile_lists,
    cluster_doc_order,
    pack_slots,
    probe_candidates,
)

SLOTS, T, K, VOCAB = 16, 8, 10, 500_000
BN_ROWS = 256  # packed rows per candidate tile; x pack(8) = 2048 docs/tile


def gen_short_docs(n, rng):
    ids = np.full((n, SLOTS), -1, np.int32)
    w = np.zeros((n, SLOTS), np.float32)
    for lo in range(0, n, 500_000):
        hi = min(lo + 500_000, n)
        cnt = rng.integers(4, SLOTS, size=hi - lo)
        u = rng.random((hi - lo, SLOTS))
        terms = np.minimum((VOCAB ** u).astype(np.int64), VOCAB - 1).astype(np.int32)
        mask = np.arange(SLOTS)[None, :] < cnt[:, None]
        ids[lo:hi] = np.where(mask, terms, -1)
        w[lo:hi] = np.where(mask, rng.uniform(0.2, 2.0, (hi - lo, SLOTS)), 0.0).astype(np.float32)
    return ids, w


def load_corpus(n):
    cache = f"/tmp/bm25_pp_{n}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["ids"], z["w"], z["indptr"], z["tiles"]
    rng = np.random.default_rng(0)
    ids, w = gen_short_docs(n, rng)
    df = np.zeros(VOCAB, np.int64)
    t_, c_ = np.unique(ids[ids >= 0], return_counts=True)
    df[t_] = c_
    order = cluster_doc_order(ids, df)
    ids, w = ids[order], w[order]
    indptr, tiles = build_term_tile_lists(ids, BN_ROWS * 8)  # pack = 128 // 16
    np.savez(cache, ids=ids, w=w, indptr=indptr, tiles=tiles)
    return ids, w, indptr, tiles


def sustained(fn, reps):
    out = fn()
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    out = fn()
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    n, reps = args.n, args.reps
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    ids, w, indptr, tiles = load_corpus(n)
    pids, pw, pack = pack_slots(ids, w, SLOTS)
    n_tiles = -(-n // (BN_ROWS * pack))
    print(
        f"corpus ready {time.perf_counter() - t0:.0f}s: pack={pack}, "
        f"{pids.shape[0]} packed rows, {n_tiles} candidate tiles",
        file=sys.stderr, flush=True,
    )
    ids_d = jax.device_put(jnp.asarray(ids))
    w_d = jax.device_put(jnp.asarray(w))
    pids_d = jax.device_put(jnp.asarray(pids))
    pw_d = jax.device_put(jnp.asarray(pw))

    rng = np.random.default_rng(7)
    results = {"pack": pack}
    for kind, lo, hi in (("rare", VOCAB // 2, VOCAB), ("common", 0, 1000)):
        q_ids = np.full((reps, 1, T), QUERY_PAD, np.int32)
        q_w = rng.uniform(0.5, 1.5, size=(reps, 1, T)).astype(np.float32)
        cands, counts, maxcs = [], [], []
        for r in range(reps):
            q_ids[r, 0] = rng.integers(lo, hi, size=T)
            c, cnt, mc = probe_candidates(q_ids[r], indptr, tiles, bq=8, cap=n_tiles)
            cands.append(c)
            counts.append(cnt)
            maxcs.append(mc)
        cap = min(n_tiles, max(64, 1 << (max(maxcs) - 1).bit_length()))
        cand_d = jnp.asarray(np.stack([c[:, :cap] for c in cands]))
        count_d = jnp.asarray(np.stack(counts))
        qi_d, qw_d = jnp.asarray(q_ids), jnp.asarray(q_w)
        print(
            f"{kind}: candidate tiles min/med/max = {min(maxcs)}/"
            f"{int(np.median(maxcs))}/{max(maxcs)} of {n_tiles} (cap {cap})",
            file=sys.stderr, flush=True,
        )

        @jax.jit
        def pp_sustained(qi, qw, p_ids, p_w, cand, count):
            def one(x):
                q, qq, c, cnt = x
                s, i = bm25_topk_pallas_probe_packed(
                    q, qq, p_ids, p_w, n, pack, c, cnt, K, block_n=BN_ROWS
                )
                return s, i
            return jax.lax.map(one, (qi, qw, cand, count))

        @jax.jit
        def packed_sustained(qi, qw, p_ids, p_w):
            def one(x):
                q, qq = x
                return bm25_topk_pallas_packed(q, qq, p_ids, p_w, n, K, pack)
            return jax.lax.map(one, (qi, qw))

        @jax.jit
        def v2_sustained(qi, qw, dids, dw):
            def one(x):
                q, qq = x
                return bm25_topk_pallas_v2(q, qq, dids, dw, K)
            return jax.lax.map(one, (qi, qw))

        for name, fn in (
            ("probe_packed", lambda: pp_sustained(qi_d, qw_d, pids_d, pw_d, cand_d, count_d)),
            ("packed_full", lambda: packed_sustained(qi_d, qw_d, pids_d, pw_d)),
            ("v2_full", lambda: v2_sustained(qi_d, qw_d, ids_d, w_d)),
        ):
            try:
                dt = sustained(fn, reps)
            except Exception as exc:  # noqa: BLE001
                print(f"{kind}: {name} FAILED {str(exc)[:100]}", file=sys.stderr, flush=True)
                continue
            results[f"{kind}_{name}_ms"] = round(dt * 1e3, 1)
            print(
                f"{kind}: {name:13s} {dt * 1e3:7.1f} ms/query  {1 / dt:7.1f} QPS",
                file=sys.stderr, flush=True,
            )
        # correctness: probe_packed positive hits == v2 positive hits (rep 0)
        s0, i0 = map(np.asarray, jax.tree.leaves(v2_sustained(qi_d, qw_d, ids_d, w_d))[:2])
        s1, i1 = map(np.asarray, jax.tree.leaves(pp_sustained(qi_d, qw_d, pids_d, pw_d, cand_d, count_d))[:2])
        pos = s0[0, 0] > 0
        ok = np.array_equal(i1[0, 0][: pos.sum()], i0[0, 0][pos]) and np.allclose(
            s1[0, 0][: pos.sum()], s0[0, 0][pos], rtol=1e-5
        )
        results[f"{kind}_hits_identical"] = bool(ok)
        print(f"{kind}: positive hits identical: {ok} ({int(pos.sum())})", file=sys.stderr, flush=True)
    print(results)


if __name__ == "__main__":
    main()
