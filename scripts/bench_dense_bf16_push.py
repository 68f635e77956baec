"""Push bf16 dense toward the HBM bound (VERDICT r2 #7).

Accounting at Q=256, N=500k, D=768 bf16: corpus read 768 MB (0.94 ms at
~819 GB/s), scores write 512 MB f32 (0.63 ms), MXU ideal 196 GFLOP
(~1.0 ms) — the measured 2.74 ms is roughly read + write + compute run
back-to-back. Levers measured here:

  1. query-batch sweep (Q=256/512/1024) on the fused approx path: if
     per-query throughput rises with Q, the batch is traffic-bound and
     amortizing the corpus read is free QPS;
  2. the Pallas streaming kernel (scores never leave VMEM) at several
     block sizes — kills the 512 MB write entirely;
  3. f32-accumulate matmul-only reference per Q for the compute floor.

Run: python scripts/bench_dense_bf16_push.py [--n 500000] [--method all]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.dense import (  # noqa: E402
    dense_topk_approx,
    dense_topk_pallas,
)
from autorag_research_tpu.utils.profiling import KernelTimer  # noqa: E402

D, K, REPS = 768, 10, 10


def load(n):
    cache = f"/tmp/dense_push_{n}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["c"]
    rng = np.random.default_rng(0)
    c = rng.standard_normal((n, D), dtype=np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    np.savez(cache, c=c)
    return c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--method", default="all",
                    help="all | q<batch> | pallas_<bn> (e.g. q512, pallas_2048)")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    c = load(args.n)
    t0 = time.time()
    c_d = jax.device_put(jnp.asarray(c, jnp.bfloat16))
    _ = float(jnp.sum(c_d[0]).astype(jnp.float32))
    print(f"H2D {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    rng = np.random.default_rng(1)

    results = {}

    def run_q(qsize):
        q = rng.standard_normal((REPS, qsize, D), dtype=np.float32)
        q /= np.linalg.norm(q, axis=2, keepdims=True)
        q_d = jnp.asarray(q, jnp.bfloat16)
        timer = KernelTimer(REPS)
        t0 = time.time()
        dt_s = timer.measure(
            lambda x, corp: dense_topk_approx(x, corp, K), q_d, c_d
        )
        qps = qsize / dt_s
        print(
            f"approx Q={qsize:5d}: {dt_s*1e3:7.2f} ms/batch {qps:9.0f} QPS "
            f"(measure {time.time()-t0:.0f}s)",
            file=sys.stderr, flush=True,
        )
        results[f"approx_q{qsize}"] = round(qps)

    def run_pallas(bn, qsize=256):
        q = rng.standard_normal((REPS, qsize, D), dtype=np.float32)
        q /= np.linalg.norm(q, axis=2, keepdims=True)
        q_d = jnp.asarray(q, jnp.bfloat16)
        timer = KernelTimer(REPS)
        t0 = time.time()
        try:
            dt_s = timer.measure(
                lambda x, corp: dense_topk_pallas(x, corp, K, block_n=bn), q_d, c_d
            )
        except Exception as exc:  # noqa: BLE001
            print(f"pallas bn={bn}: FAILED {str(exc)[:120]}", file=sys.stderr, flush=True)
            return
        qps = qsize / dt_s
        print(
            f"pallas bn={bn:5d}: {dt_s*1e3:7.2f} ms/batch {qps:9.0f} QPS "
            f"(measure {time.time()-t0:.0f}s)",
            file=sys.stderr, flush=True,
        )
        results[f"pallas_bn{bn}"] = round(qps)

    m = args.method
    if m == "all":
        for qsize in (256, 512, 1024):
            run_q(qsize)
        for bn in (1024, 2048):
            run_pallas(bn)
    elif m.startswith("q"):
        run_q(int(m[1:]))
    elif m.startswith("pallas_"):
        run_pallas(int(m[7:]))
    print({"metric": "dense_bf16_push", "n": args.n, **results})


if __name__ == "__main__":
    main()
