"""BM25 at 5M docs: flat v2 kernel vs term-driven tile skip (v2_skip).

Reference capability: vchord_bm25's inverted index scales sub-linearly
(orm/repository/chunk.py:185-247); the flat slot-match kernel is O(N*L).
This measures (a) the 5M x 64-slot flat number, (b) what the tile-presence
skip recovers on selective (rare-term) queries vs common-term queries, and
(c) the 500k scaling row for comparison with round-1 numbers.

Anti-LICM: each rep uses distinct query weights; host readback forced.
Run: python scripts/bench_bm25_5m.py [--n 5000000]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.sparse import (  # noqa: E402
    QUERY_PAD,
    bm25_topk_pallas_v2,
    bm25_topk_pallas_v2_skip,
    build_tile_bitmaps,
)

SLOTS, B, T, K, VOCAB = 64, 32, 8, 10, 500_000


def gen_docs(n, rng):
    """Zipf-ish term ids: doc terms drawn with p ~ 1/rank."""
    ids = np.full((n, SLOTS), -1, np.int32)
    w = np.zeros((n, SLOTS), np.float32)
    # approximate Zipf by exponentiating uniforms
    for lo in range(0, n, 500_000):
        hi = min(lo + 500_000, n)
        cnt = rng.integers(16, SLOTS, size=hi - lo)
        u = rng.random((hi - lo, SLOTS))
        terms = np.minimum((VOCAB ** u).astype(np.int64), VOCAB - 1).astype(np.int32)
        mask = np.arange(SLOTS)[None, :] < cnt[:, None]
        ids[lo:hi] = np.where(mask, terms, -1)
        w[lo:hi] = np.where(mask, rng.uniform(0.2, 2.0, (hi - lo, SLOTS)), 0.0).astype(
            np.float32
        )
    return ids, w


def make_queries(rng, kind):
    q_ids = np.full((B, T), QUERY_PAD, np.int32)
    q_w = np.zeros((B, T), np.float32)
    for b in range(B):
        if kind == "common":
            terms = rng.integers(0, 1000, size=T)  # Zipf head: in most tiles
        else:
            terms = rng.integers(VOCAB // 2, VOCAB, size=T)  # tail: selective
        q_ids[b] = terms
        q_w[b] = rng.uniform(0.5, 1.5, size=T).astype(np.float32)
    return q_ids, q_w


def run(fn, label, reps, q_w_base, *args):
    # warmup
    out = fn(q_w_base, *args)
    _ = float(np.asarray(out[0]).sum())
    t0 = time.perf_counter()
    for r in range(reps):
        out = fn(q_w_base * (1.0 + 1e-6 * (r + 1)), *args)  # perturb (anti-LICM)
        _ = float(np.asarray(out[0]).sum())
    per = (time.perf_counter() - t0) / reps
    print(f"{label}: {per * 1e3:8.1f} ms/batch  {B / per:8.1f} QPS", file=sys.stderr)
    return B / per, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    results = {}
    for n in (500_000, args.n):
        t0 = time.perf_counter()
        ids, w = gen_docs(n, rng)
        bitmaps = build_tile_bitmaps(ids, block_n=2048)
        density = (
            np.unpackbits(bitmaps.view(np.uint8)).mean()
        )
        print(
            f"--- n={n}: gen+bitmaps {time.perf_counter() - t0:.0f}s, "
            f"bitmap density {density:.2f}",
            file=sys.stderr,
        )
        ids_d = jax.device_put(jnp.asarray(ids))
        w_d = jax.device_put(jnp.asarray(w))
        bm_d = jax.device_put(jnp.asarray(bitmaps))

        for kind in ("common", "rare"):
            q_ids, q_w = make_queries(rng, kind)
            qi = jnp.asarray(q_ids)

            def v2(qw, qi=qi):
                return bm25_topk_pallas_v2(qi, jnp.asarray(qw), ids_d, w_d, K)

            def v2s(qw, qi=qi):
                return bm25_topk_pallas_v2_skip(
                    qi, jnp.asarray(qw), ids_d, w_d, bm_d, K
                )

            qps_v2, out_v2 = run(v2, f"n={n} {kind:6s} v2     ", args.reps, q_w)
            qps_s, out_s = run(v2s, f"n={n} {kind:6s} v2_skip", args.reps, q_w)
            same = np.array_equal(np.asarray(out_v2[1]), np.asarray(out_s[1]))
            print(f"    ids identical: {same}", file=sys.stderr)
            results[f"n{n}_{kind}_v2"] = round(qps_v2, 1)
            results[f"n{n}_{kind}_skip"] = round(qps_s, 1)
        del ids_d, w_d, bm_d

        # ---- term-clustered layout: group docs by rarest term so rare-term
        # queries can actually prune tiles (cluster_doc_order)
        from autorag_research_tpu.ops.sparse import cluster_doc_order

        df = np.zeros(VOCAB, np.int64)
        t_, c_ = np.unique(ids[ids >= 0], return_counts=True)
        df[t_] = c_
        order = cluster_doc_order(ids, df)
        ids_c, w_c = ids[order], w[order]
        bitmaps_c = build_tile_bitmaps(ids_c, block_n=2048)
        print(
            f"    clustered bitmap density {np.unpackbits(bitmaps_c.view(np.uint8)).mean():.2f}",
            file=sys.stderr,
        )
        ids_d = jax.device_put(jnp.asarray(ids_c))
        w_d = jax.device_put(jnp.asarray(w_c))
        bm_d = jax.device_put(jnp.asarray(bitmaps_c))
        inv = np.empty_like(order)
        inv[order] = np.arange(n)
        for kind in ("common", "rare"):
            q_ids, q_w = make_queries(np.random.default_rng(42 + len(kind)), kind)
            qi = jnp.asarray(q_ids)

            def v2s_c(qw, qi=qi):
                return bm25_topk_pallas_v2_skip(
                    qi, jnp.asarray(qw), ids_d, w_d, bm_d, K
                )

            def v2_c(qw, qi=qi):
                return bm25_topk_pallas_v2(qi, jnp.asarray(qw), ids_d, w_d, K)

            qps_c, out_c = run(v2_c, f"n={n} {kind:6s} clustered v2     ", args.reps, q_w)
            qps_cs, out_cs = run(v2s_c, f"n={n} {kind:6s} clustered v2_skip", args.reps, q_w)
            same = np.array_equal(np.asarray(out_c[1]), np.asarray(out_cs[1]))
            print(f"    ids identical (within layout): {same}", file=sys.stderr)
            results[f"n{n}_{kind}_clustered_v2"] = round(qps_c, 1)
            results[f"n{n}_{kind}_clustered_skip"] = round(qps_cs, 1)
        del ids_d, w_d, bm_d

    print({"metric": "bm25_5m", **results})


if __name__ == "__main__":
    main()
