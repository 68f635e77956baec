"""BM25 probe kernel at 5M docs: candidate-tile grid vs full-scan kernels.

The inverted-index probe (bm25_topk_pallas_probe + host term->tile lists)
is the sub-linear path the tile-skip kernel couldn't reach (its grid still
iterates every tile at a ~50us/step floor — docs/BENCHMARKS.md). Measures
single rare-term / common-term queries on the clustered 5M corpus:

  per-call latency  (1 query per dispatch; includes ~30ms tunnel overhead)
  in-jit sustained  (REPS distinct queries + their candidate lists stacked,
                     lax.map inside one jit — amortizes dispatch)

Run: python scripts/bench_bm25_probe.py [--n 5000000]
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
    bm25_topk_pallas_probe,
    bm25_topk_pallas_v2,
    build_term_tile_lists,
    cluster_doc_order,
    probe_candidates,
)
from scripts.bench_bm25_5m import gen_docs  # noqa: E402

SLOTS, T, K, VOCAB = 64, 8, 10, 500_000
BLOCK_N = 2048  # overridden by --block-n


def load_corpus(n, block_n):
    cache = f"/tmp/bm25_sel_{n}.npz"
    cache2 = f"/tmp/bm25_probe_{n}_{block_n}.npz"
    if os.path.exists(cache2):
        z = np.load(cache2)
        return z["ids"], z["w"], z["indptr"], z["tiles"]
    if os.path.exists(cache):
        z = np.load(cache)
        ids, w = z["ids"], z["w"]
    else:
        rng = np.random.default_rng(0)
        ids, w = gen_docs(n, rng)
        df = np.zeros(VOCAB, np.int64)
        t_, c_ = np.unique(ids[ids >= 0], return_counts=True)
        df[t_] = c_
        order = cluster_doc_order(ids, df)
        ids, w = ids[order], w[order]
    indptr, tiles = build_term_tile_lists(ids, block_n)
    np.savez(cache2, ids=ids, w=w, indptr=indptr, tiles=tiles)
    return ids, w, indptr, tiles


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument(
        "--block-n", default="2048",
        help="comma-separated probe tile sizes; corpus H2D is shared",
    )
    ap.add_argument(
        "--skip-v2", action="store_true",
        help="skip the full-scan v2 reference (reuse a same-day number)",
    )
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    block_ns = [int(b) for b in str(args.block_n).split(",")]
    ids_d = w_d = None
    for i, bn in enumerate(block_ns):
        include_v2 = i == 0 and not args.skip_v2
        ids_d, w_d = run_block(args, bn, ids_d, w_d, include_v2)


def run_block(args, block_n, ids_d, w_d, include_v2):
    global BLOCK_N
    BLOCK_N = block_n
    t0 = time.perf_counter()
    ids, w, indptr, tiles = load_corpus(args.n, BLOCK_N)
    n_tiles = -(-args.n // BLOCK_N)
    print(
        f"[bn={BLOCK_N}] corpus+lists ready {time.perf_counter() - t0:.0f}s",
        file=sys.stderr, flush=True,
    )
    if ids_d is None:
        ids_d = jax.device_put(jnp.asarray(ids))
        w_d = jax.device_put(jnp.asarray(w))
        _ = float(jnp.sum(w_d[0]))
        print(
            f"H2D done {time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True
        )

    rng = np.random.default_rng(7)
    results = {}
    for kind, lo, hi in (("rare", VOCAB // 2, VOCAB), ("common", 0, 1000)):
        # REPS distinct queries of this kind + their exact candidate lists
        q_ids = np.full((args.reps, 1, T), QUERY_PAD, np.int32)
        q_w = rng.uniform(0.5, 1.5, size=(args.reps, 1, T)).astype(np.float32)
        cands, counts, maxcs = [], [], []
        for r in range(args.reps):
            q_ids[r, 0] = rng.integers(lo, hi, size=T)
            c, cnt, mc = probe_candidates(q_ids[r], indptr, tiles, bq=8, cap=n_tiles)
            cands.append(c)
            counts.append(cnt)
            maxcs.append(mc)
        cap = min(n_tiles, max(64, 1 << (max(maxcs) - 1).bit_length()))
        cand = np.stack([c[:, :cap] for c in cands])  # [R, 1, cap]
        count = np.stack(counts)  # [R, 1]
        print(
            f"{kind}: candidate tiles min/med/max = "
            f"{min(maxcs)}/{int(np.median(maxcs))}/{max(maxcs)} of {n_tiles} "
            f"(cap {cap})",
            file=sys.stderr,
        )

        qi_d = jnp.asarray(q_ids)
        qw_d = jnp.asarray(q_w)
        cand_d = jnp.asarray(cand)
        count_d = jnp.asarray(count)

        # ---- per-call latency (single dispatch per query) ------------------
        def probe_call(r):
            return bm25_topk_pallas_probe(
                qi_d[r], qw_d[r], ids_d, w_d, cand_d[r], count_d[r], K,
                block_n=BLOCK_N,
            )

        out = probe_call(0)
        _ = float(np.asarray(out[0]).sum())
        t0 = time.perf_counter()
        for r in range(args.reps):
            out = probe_call(r)
            _ = float(np.asarray(out[0]).sum())
        per = (time.perf_counter() - t0) / args.reps
        print(
            f"{kind}: probe per-call   {per * 1e3:7.1f} ms/query  {1 / per:7.1f} QPS",
            file=sys.stderr,
        )
        results[f"{kind}_probe_percall_ms"] = round(per * 1e3, 1)

        if include_v2:
            # v2 full-scan per-call reference (block-size independent)
            def v2_call(r):
                return bm25_topk_pallas_v2(qi_d[r], qw_d[r], ids_d, w_d, K)

            out2 = v2_call(0)
            _ = float(np.asarray(out2[0]).sum())
            t0 = time.perf_counter()
            for r in range(args.reps):
                out2 = v2_call(r)
                _ = float(np.asarray(out2[0]).sum())
            per2 = (time.perf_counter() - t0) / args.reps
            print(
                f"{kind}: v2    per-call   {per2 * 1e3:7.1f} ms/query  {1 / per2:7.1f} QPS",
                file=sys.stderr, flush=True,
            )
            results[f"{kind}_v2_percall_ms"] = round(per2 * 1e3, 1)

            # correctness: positive hits of the last query agree
            s0, i0 = map(np.asarray, out2)
            s1, i1 = map(np.asarray, out)
            pos = s0[0] > 0
            ok = np.array_equal(i1[0][: pos.sum()], i0[0][pos]) and np.allclose(
                s1[0][: pos.sum()], s0[0][pos], rtol=1e-6
            )
            print(
                f"    positive hits identical: {ok} ({int(pos.sum())})",
                file=sys.stderr, flush=True,
            )

            # v2 full-scan sustained reference
            @jax.jit
            def v2_sustained(qi, qw, dids, dw):
                def one(x):
                    q, qq = x
                    s, i = bm25_topk_pallas_v2(q, qq, dids, dw, K)
                    return s.sum()
                return jax.lax.map(one, (qi, qw)).sum()

            float(v2_sustained(qi_d, qw_d, ids_d, w_d))
            t0 = time.perf_counter()
            float(v2_sustained(qi_d, qw_d, ids_d, w_d))
            per_v2s = (time.perf_counter() - t0) / args.reps
            print(
                f"{kind}: v2    sustained  {per_v2s * 1e3:7.1f} ms/query  "
                f"{1 / per_v2s:7.1f} QPS",
                file=sys.stderr, flush=True,
            )
            results[f"{kind}_v2_sustained_ms"] = round(per_v2s * 1e3, 1)

        # ---- in-jit sustained (amortized dispatch) -------------------------
        @jax.jit
        def sustained(qi, qw, cand, count, dids, dw):
            def one(x):
                q, qq, c, ct = x
                s, i = bm25_topk_pallas_probe(
                    q, qq, dids, dw, c, ct, K, block_n=BLOCK_N
                )
                return s.sum()
            return jax.lax.map(one, (qi, qw, cand, count)).sum()

        tot = sustained(qi_d, qw_d, cand_d, count_d, ids_d, w_d)
        float(tot)
        t0 = time.perf_counter()
        tot = sustained(qi_d, qw_d, cand_d, count_d, ids_d, w_d)
        float(tot)
        per_s = (time.perf_counter() - t0) / args.reps
        print(
            f"{kind}: probe sustained  {per_s * 1e3:7.1f} ms/query  {1 / per_s:7.1f} QPS",
            file=sys.stderr,
        )
        results[f"{kind}_probe_sustained_qps"] = round(1 / per_s, 1)
        results[f"{kind}_probe_sustained_ms"] = round(per_s * 1e3, 1)

    print(
        {"metric": "bm25_probe_5m", "n": args.n, "block_n": BLOCK_N, **results},
        flush=True,
    )
    return ids_d, w_d


if __name__ == "__main__":
    main()
