"""Focused bf16 MaxSim bench: XLA scan vs pallas v2 vs v3 (fused masking).

One method per invocation (--method) so a slow remote compile can't starve
the other measurements; the corpus is cached to /tmp between runs.

Run: for m in xla v2_16 v3_16 v3_32; do
       python scripts/bench_maxsim_v3.py --method $m
     done
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.maxsim import (  # noqa: E402
    maxsim_topk_pallas_v2,
    maxsim_topk_pallas_v3,
    maxsim_topk_xla,
)
from autorag_research_tpu.utils.profiling import KernelTimer  # noqa: E402

B, TQ, D, K, REPS = 8, 32, 128, 10, 10


def load(n, td):
    cache = f"/tmp/maxsim_bench_{n}_{td}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["docs"], z["dlens"], z["q"], z["ql"]
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((n, td, D), dtype=np.float32)
    docs /= np.linalg.norm(docs, axis=2, keepdims=True)
    dlens = rng.integers(td // 2, td + 1, size=n).astype(np.int32)
    q = rng.standard_normal((REPS, B, TQ, D), dtype=np.float32)
    q /= np.linalg.norm(q, axis=3, keepdims=True)
    ql = np.full((REPS, B), TQ, np.int32)
    np.savez(cache, docs=docs, dlens=dlens, q=q, ql=ql)
    return docs, dlens, q, ql


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", required=True,
                    help="xla | v2_<bn> | v3_<bn>")
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--td", type=int, default=128)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    t0 = time.time()
    docs, dlens, q, ql = load(args.n, args.td)
    print(f"host data {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    docs_d = jax.device_put(jnp.asarray(docs, dtype=dt))
    docs_d.block_until_ready()
    dlens_d = jax.device_put(jnp.asarray(dlens))
    q_d = jnp.asarray(q, dtype=dt)
    ql_d = jnp.asarray(ql)
    print(f"H2D {time.time()-t0:.0f}s ({docs_d.nbytes/1e9:.1f} GB)", file=sys.stderr, flush=True)

    m = args.method
    if m == "xla":
        fn = lambda q, ql, d_, dl: maxsim_topk_xla(q, ql, d_, dl, K)
    elif m.startswith("v2_"):
        bn = int(m[3:])
        fn = lambda q, ql, d_, dl: maxsim_topk_pallas_v2(q, ql, d_, dl, K, block_n=bn)
    elif m.startswith("v3_"):
        bn = int(m[3:])
        fn = lambda q, ql, d_, dl: maxsim_topk_pallas_v3(q, ql, d_, dl, K, block_n=bn)
    else:
        raise SystemExit(f"unknown method {m}")

    t0 = time.time()
    timer = KernelTimer(REPS)
    dt_s = timer.measure(lambda x, d_, dl: fn(x[0], x[1], d_, dl), (q_d, ql_d), docs_d, dlens_d)
    print(f"measure (incl compile) {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    qps = B / dt_s
    print(f"{m}: {dt_s*1e3:.2f} ms/batch  {qps:.1f} QPS", file=sys.stderr, flush=True)

    # correctness vs xla on one batch
    s0, i0 = maxsim_topk_xla(q_d[0], ql_d[0], docs_d, dlens_d, K)
    s1, i1 = fn(q_d[0], ql_d[0], docs_d, dlens_d)
    same = bool(np.array_equal(np.asarray(i0), np.asarray(i1)))
    print({"metric": f"maxsim_{m}_{args.dtype}", "qps": round(qps, 1),
           "ms_per_batch": round(dt_s * 1e3, 2), "ids_match_xla": same})


if __name__ == "__main__":
    main()
