"""Sustained dense top-k: full vs matmul-only vs fused approx_max_k.

The per-call probe (bench_dense_topk2.py) is dominated by ~30 ms tunnel
dispatch; this uses KernelTimer (REPS distinct query batches inside one jit
via lax.map — anti-LICM by construction) to resolve the real split, and
measures the approx_max_k fast path that the per-call probe showed running
at matmul speed.

Run: python scripts/bench_dense_sustained.py [--dtype bf16]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.dense import (  # noqa: E402
    _precision_for,
    dense_topk_xla_full,
    dense_topk_xla_two_stage,
)
from autorag_research_tpu.utils.profiling import KernelTimer  # noqa: E402

Q, D, K, REPS = 256, 768, 10, 20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((args.n, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((REPS, Q, D), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    c_d = jax.device_put(jnp.asarray(corpus, dtype=dt))
    q_d = jnp.asarray(queries, dtype=dt)

    timer = KernelTimer(REPS)

    def scores_of(q, c):
        return jax.lax.dot_general(
            q, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision_for(q.dtype),
        )

    variants = {
        "full": lambda q, c: dense_topk_xla_full(q, c, K),
        "matmul": lambda q, c: (scores_of(q, c).max(axis=1),),
        "approx99": lambda q, c: jax.lax.approx_max_k(
            scores_of(q, c), K, recall_target=0.99
        ),
        "approx95": lambda q, c: jax.lax.approx_max_k(
            scores_of(q, c), K, recall_target=0.95
        ),
        "two_stage1024": lambda q, c: dense_topk_xla_two_stage(q, c, K, tile=1024),
    }
    results = {}
    for name, fn in variants.items():
        dt_s = timer.measure(fn, q_d, c_d)
        qps = Q / dt_s
        results[name] = round(qps, 1)
        tflops = 2 * Q * args.n * D / dt_s / 1e12
        print(
            f"{name:14s} {dt_s * 1e3:7.2f} ms/batch  {qps:9.1f} QPS  {tflops:5.1f} TFLOP/s",
            file=sys.stderr,
        )
    print({"metric": f"dense_sustained_{args.dtype}", "n": args.n, **results})


if __name__ == "__main__":
    main()
