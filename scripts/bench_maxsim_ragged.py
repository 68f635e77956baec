"""Bucketed ragged multi-vector layout on chip: HBM + QPS vs the flat
global-Tmax layout on a SKEWED corpus (VERDICT r4 #3 "Done" measurement).

The flat layout pads every document to the corpus-wide max token count; on
real ColBERT-style corpora (tokens ~ lognormal 30-300) that wastes HBM and
compute proportional to Tmax/mean. The bucketed layout (MultiVectorIndex
bucketize>1) partitions docs by token count (index/sparse._plan_buckets DP),
pads each bucket to its own max, runs one kernel per bucket and merges by
the global (-score, id) order — results equal the flat layout exactly.

Reference capability being replaced: ragged VECTOR(dim)[] arrays
(/root/reference/autorag_research/orm/types.py:13-277) store ragged data
with no padding at all.

Run: python scripts/bench_maxsim_ragged.py [--n 50000]
"""

import argparse
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.index.multi_vector import MultiVectorIndex  # noqa: E402

D, K, B, REPS = 128, 10, 8, 6


def run(idx, queries, label):
    # warm (compiles every bucket's kernel shape)
    out = idx.search(queries[0], K)
    _ = [h.score for h in out[0]]
    t0 = time.perf_counter()
    for r in range(REPS):
        out = idx.search(queries[r % len(queries)], K)
        _ = [h.score for h in out[0]]
    dt = (time.perf_counter() - t0) / (REPS * B)
    qps = 1.0 / dt
    mb = idx.device_bytes() / 2**20
    print(f"{label:28s} {dt * 1e3:8.2f} ms/query {qps:8.1f} QPS  device {mb:8.1f} MiB",
          file=sys.stderr, flush=True)
    return out, round(qps, 1), round(mb, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--bucketize", type=int, default=4)
    args = ap.parse_args()
    n = args.n

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    # ColBERT-like skew: lognormal token counts clipped to [8, 300]
    lens = np.clip(rng.lognormal(mean=4.0, sigma=0.6, size=n), 8, 300).astype(int)
    print(f"token counts: mean {lens.mean():.0f}, p50 {np.median(lens):.0f}, "
          f"max {lens.max()}, Tmax/mean {lens.max() / lens.mean():.1f}x",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    mats = [rng.standard_normal((t, D), dtype=np.float32) for t in lens]
    queries = [
        [rng.standard_normal((32, D), dtype=np.float32) for _ in range(B)]
        for _ in range(3)
    ]
    print(f"corpus gen {time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)

    ids = list(range(n))
    results = {"metric": "maxsim_ragged_bucketed", "n": n,
               "tmax_over_mean": round(float(lens.max() / lens.mean()), 1)}
    out_flat = None
    try:
        out_flat, qps, mb = run(
            MultiVectorIndex(ids, mats), queries, "flat (global Tmax pad)"
        )
        results["flat_qps"], results["flat_mib"] = qps, mb
    except Exception as exc:  # noqa: BLE001
        # the flat layout's global-Tmax padding can exceed HBM where the
        # bucketed layout fits comfortably — that IS the capacity claim
        results["flat_oom"] = True
        print(f"flat layout FAILED (expected at large n): {str(exc)[:160]}",
              file=sys.stderr, flush=True)
    out_b, qps, mb = run(
        MultiVectorIndex(ids, mats, bucketize=args.bucketize), queries,
        f"bucketed (bucketize={args.bucketize})",
    )
    results["bucketed_qps"], results["bucketed_mib"] = qps, mb
    if out_flat is not None:
        results["speedup"] = round(results["bucketed_qps"] / results["flat_qps"], 2)
        results["mem_ratio"] = round(results["bucketed_mib"] / results["flat_mib"], 3)
        ok = all(
            [(h.doc_id, round(h.score, 5)) for h in a]
            == [(h.doc_id, round(h.score, 5)) for h in b]
            for a, b in zip(out_flat, out_b)
        )
        results["ids_identical"] = bool(ok)
        print(f"flat == bucketed hits: {ok}", file=sys.stderr, flush=True)
    print(results)


if __name__ == "__main__":
    main()
