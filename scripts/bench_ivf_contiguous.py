"""Cluster-contiguous IVF vs exact at 2M x 768: the honest-regime test.

Round-1 finding (scripts/bench_ann_scale.py): gather-based IVF collapses to
21.8 QPS vs 5,181 exact at 2M rows. This measures whether the block-
contiguous layout (index/ivf_contiguous.py) wins the regimes it targets:

1. single-query latency (the reference's per-SQL-statement shape,
   orm/repository/base.py:404-426) — device latency isolated from the ~30ms
   axon dispatch by lax.map-ing over R distinct queries inside one jit;
2. small-batch QPS;
3. recall@10 vs exact at several nprobe_blocks.

Run: python scripts/bench_ivf_contiguous.py [--n 2000000]
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.index.ivf_contiguous import IVFContiguousIndex  # noqa: E402
from autorag_research_tpu.ops.dense import INT_MAX, NEG_INF, dense_topk  # noqa: E402
from autorag_research_tpu.ops.topk import sort_topk  # noqa: E402

D, K = 768, 10


def gen_corpus(n, rng, noise=0.022):
    """Clustered unit vectors. NOISE CALIBRATION MATTERS: per-dim sigma s
    gives cos(member, center) = 1/sqrt(1 + s^2 * D). The round-1 value 0.5
    made ||noise|| ~ 13.9 vs ||center|| = 1 (cos ~ 0.07) — noise-dominated
    points no ANN can cluster, which silently turns any recall measurement
    into noise. s=0.022 -> cos ~ 0.85 (tight, ColBERT-ish); s=0.05 ->
    cos ~ 0.67 (loose)."""
    centers = rng.standard_normal((4096, D), dtype=np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    out = np.empty((n, D), dtype=np.float32)
    for lo in range(0, n, 200_000):
        hi = min(lo + 200_000, n)
        nz = rng.standard_normal((hi - lo, D), dtype=np.float32)
        chunk = centers[rng.integers(0, 4096, size=hi - lo)] + noise * nz
        out[lo:hi] = chunk / np.linalg.norm(chunk, axis=1, keepdims=True)
    return out, centers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--cells", type=int, default=4096)
    ap.add_argument("--block-rows", type=int, default=512)
    ap.add_argument("--probes", default="16,32,64,128")
    ap.add_argument("--lat-reps", type=int, default=32)
    ap.add_argument("--noise", type=float, default=0.022)
    args = ap.parse_args()
    n = args.n

    print(f"devices: {jax.devices()}; corpus {n} x {D}", file=sys.stderr)
    import os

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    cache = f"/tmp/ivfc_corpus_{n}_s{args.noise}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        corpus, centers = z["corpus"], z["centers"]
    else:
        corpus, centers = gen_corpus(n, rng, noise=args.noise)
        np.savez(cache, corpus=corpus, centers=centers)
    print(f"host gen {time.perf_counter() - t0:.0f}s", file=sys.stderr)
    q = centers[rng.integers(0, 4096, size=256)] + args.noise * rng.standard_normal(
        (256, D), dtype=np.float32
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # ---- exact reference + latency -----------------------------------------
    corpus_d = jnp.asarray(corpus)
    q_d = jnp.asarray(q)

    @jax.jit
    def exact_latency(qs, c):
        s, i = jax.lax.map(lambda one: dense_topk(one[None], c, K, method="pallas"), qs)
        return s.sum(), i[:, 0, :]

    r = args.lat_reps
    tot, exact_ids_lat = exact_latency(q_d[:r], corpus_d)
    float(tot)
    t0 = time.perf_counter()
    tot, _ = exact_latency(q_d[:r], corpus_d)
    float(tot)
    exact_lat = (time.perf_counter() - t0) / r
    print(f"exact single-query latency: {exact_lat * 1e3:8.2f} ms", file=sys.stderr)

    # exact batch-256 QPS
    @jax.jit
    def exact_batch(qs, c):
        s, i = dense_topk(qs, c, K)
        return s.sum(), i

    tot, exact_ids = exact_batch(q_d, corpus_d)
    float(tot)
    t0 = time.perf_counter()
    tot, exact_ids = exact_batch(q_d, corpus_d)
    float(tot)
    exact_qps = 256 / (time.perf_counter() - t0)
    exact_ids = np.asarray(exact_ids)
    print(f"exact batch-256: {exact_qps:9.1f} QPS", file=sys.stderr)
    del corpus_d

    # ---- build contiguous IVF ----------------------------------------------
    t0 = time.perf_counter()
    icache = f"/tmp/ivfc_index_{n}_{args.cells}_{args.block_rows}_s{args.noise}"
    if os.path.exists(icache):
        idx = IVFContiguousIndex.load(icache)
    else:
        idx = IVFContiguousIndex(
            list(range(n)), corpus, n_cells=args.cells, block_rows=args.block_rows
        )
        idx.save(icache)
    build_s = time.perf_counter() - t0
    print(
        f"ivf_cc build: {build_s:.0f}s  ({idx.n_blocks} blocks of {args.block_rows})",
        file=sys.stderr,
    )
    idx.to_device()
    keys, blocks_dev, row_ids_dev = idx._device

    results = {"exact_latency_ms": round(exact_lat * 1e3, 2), "exact_qps": round(exact_qps, 1)}
    for p in [int(x) for x in args.probes.split(",")]:

        @functools.partial(jax.jit, static_argnames=("p",))
        def ivf_latency(qs, keys, blocks, row_ids, p):
            # device arrays passed as ARGS — capturing the 7.3GB block array
            # as a jit constant ships it through the remote compiler (>>10min)
            def one(qq):
                ks = jnp.dot(qq[None], keys.T, preferred_element_type=jnp.float32)
                _, blks = jax.lax.top_k(ks, p)
                data = blocks[blks[0]]
                ids = row_ids[blks[0]].reshape(-1)
                scores = jnp.dot(
                    data.reshape(-1, D), qq, preferred_element_type=jnp.float32
                )
                scores = jnp.where(ids < n, scores, NEG_INF)
                oids = jnp.where(ids < n, ids, INT_MAX)
                return sort_topk(scores[None], oids[None], K)

            s, i = jax.lax.map(one, qs)
            return s.sum(), i[:, 0, :]

        tot, ids_lat = ivf_latency(q_d[:r], keys, blocks_dev, row_ids_dev, p=p)
        float(tot)
        t0 = time.perf_counter()
        tot, ids_lat = ivf_latency(q_d[:r], keys, blocks_dev, row_ids_dev, p=p)
        float(tot)
        lat = (time.perf_counter() - t0) / r
        ids_h = np.asarray(ids_lat)
        rec = float(
            np.mean(
                [
                    len(set(a[:K]) & set(b[:K])) / K
                    for a, b in zip(ids_h, exact_ids[:r])
                ]
            )
        )
        results[f"ivf_cc_p{p}_latency_ms"] = round(lat * 1e3, 2)
        results[f"ivf_cc_p{p}_recall"] = round(rec, 3)
        speedup = exact_lat / lat
        print(
            f"ivf_cc p={p:4d}: latency {lat * 1e3:8.2f} ms ({speedup:5.1f}x exact) "
            f"recall@{K}={rec:.3f}",
            file=sys.stderr,
        )

    print({"metric": "ivf_contiguous_2m", "n": n, **results})


if __name__ == "__main__":
    main()
