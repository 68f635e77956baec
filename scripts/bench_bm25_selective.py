"""BM25 single-query selective regime: clustered layout + Bloom tile skip.

The batched (B=32) regime ORs ~64 query terms per query-tile, so nearly
every doc tile matches and the skip predicate buys little (see
bench_bm25_5m.py). This measures the regime the pruning is FOR — one
selective (rare-term) query against a rarest-term-clustered corpus, with
``positive_only=True`` (zero-overlap docs are not hits; the search layer
drops them regardless) so a tile skips on the term-presence predicate alone.

Reference capability: vchord_bm25 inverted-index single-query lookups
(orm/repository/chunk.py:185-247) are sub-linear; this is the TPU-shaped
equivalent (bandwidth-limited skip instead of pointer chasing).

Run: python scripts/bench_bm25_selective.py [--n 5000000]
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
    cluster_doc_order,
)
from scripts.bench_bm25_5m import gen_docs  # noqa: E402

SLOTS, T, K, VOCAB = 64, 8, 10, 500_000


def run(fn, label, q_w, reps=10):
    out = fn(q_w)
    _ = float(np.asarray(out[0]).sum())
    t0 = time.perf_counter()
    for r in range(reps):
        out = fn(q_w * (1.0 + 1e-6 * (r + 1)))
        _ = float(np.asarray(out[0]).sum())
    per = (time.perf_counter() - t0) / reps
    print(f"{label:34s} {per * 1e3:7.1f} ms/query  {1 / per:7.1f} QPS", file=sys.stderr)
    return 1 / per, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    import os

    cache = f"/tmp/bm25_sel_{args.n}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        ids, w, bitmaps = z["ids"], z["w"], z["bitmaps"]
    else:
        ids, w = gen_docs(args.n, rng)
        df = np.zeros(VOCAB, np.int64)
        t_, c_ = np.unique(ids[ids >= 0], return_counts=True)
        df[t_] = c_
        order = cluster_doc_order(ids, df)
        ids, w = ids[order], w[order]
        bitmaps = build_tile_bitmaps(ids, block_n=2048)
        np.savez(cache, ids=ids, w=w, bitmaps=bitmaps)
    print(
        f"gen+cluster+bitmaps {time.perf_counter() - t0:.0f}s, "
        f"density {np.unpackbits(bitmaps.view(np.uint8)).mean():.3f}",
        file=sys.stderr,
    )
    ids_d = jax.device_put(jnp.asarray(ids))
    w_d = jax.device_put(jnp.asarray(w))
    bm_d = jax.device_put(jnp.asarray(bitmaps))

    results = {}
    for kind, terms in (
        ("rare", rng.integers(VOCAB // 2, VOCAB, size=T)),
        ("common", rng.integers(0, 1000, size=T)),
    ):
        q_ids = np.full((1, T), QUERY_PAD, np.int32)
        q_w = np.zeros((1, T), np.float32)
        q_ids[0] = terms
        q_w[0] = rng.uniform(0.5, 1.5, size=T).astype(np.float32)
        qi = jnp.asarray(q_ids)

        def v2(qw, qi=qi):
            return bm25_topk_pallas_v2(qi, jnp.asarray(qw), ids_d, w_d, K)

        def skip_pos(qw, qi=qi):
            return bm25_topk_pallas_v2_skip(
                qi, jnp.asarray(qw), ids_d, w_d, bm_d, K, positive_only=True
            )

        qps1, out1 = run(skip_pos, f"{kind}: skip positive_only", jnp.asarray(q_w), args.reps)
        qps0, out0 = run(v2, f"{kind}: v2 (full scan)", jnp.asarray(q_w), args.reps)
        # positive hits must agree exactly
        s0, i0 = map(np.asarray, out0)
        s1, i1 = map(np.asarray, out1)
        pos = s0[0] > 0
        ok = np.array_equal(i1[0][: pos.sum()], i0[0][pos]) and np.allclose(
            s1[0][: pos.sum()], s0[0][pos], rtol=1e-6
        )
        print(f"    positive hits identical: {ok} ({int(pos.sum())} hits)", file=sys.stderr)
        results[f"{kind}_v2"] = round(qps0, 1)
        results[f"{kind}_skip"] = round(qps1, 1)
        results[f"{kind}_speedup"] = round(qps1 / qps0, 2)

    print({"metric": "bm25_selective_single_query", "n": args.n, **results})


if __name__ == "__main__":
    main()
