"""Dense top-k in the >2GB score-matrix regime (4096 q x 500k docs x 768d,
8GB scores): Pallas streaming kernel vs large-tile XLA scan.

Run: python scripts/bench_dense_big.py [--variants pallas,xla]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.dense import (  # noqa: E402
    dense_topk_pallas,
    dense_topk_xla,
)

N, D, Q, K = 500_000, 768, 4096, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="pallas,xla")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile-n", type=int, default=65536)
    ap.add_argument("--block-n", type=int, default=1024)
    ap.add_argument("--block-q", type=int, default=128)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(N, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    c_d = jnp.asarray(corpus, dtype=dt)
    q_d = jnp.asarray(queries, dtype=dt)

    fns = {
        "pallas": lambda q, c: dense_topk_pallas(
            q, c, K, block_q=args.block_q, block_n=args.block_n
        ),
        "xla": lambda q, c: dense_topk_xla(q, c, K, tile_n=args.tile_n),
    }

    ref_ids = None
    for name in args.variants.split(","):
        fn = fns[name]

        @jax.jit
        def run(q, c):
            def step(carry, _):
                s, i = fn(q, c)
                return carry + s.sum(), i
            tot, ids = jax.lax.scan(step, 0.0, None, length=args.reps)
            return tot, ids[0]

        t0 = time.perf_counter()
        tot, ids = run(q_d, c_d)
        float(tot)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        tot, ids = run(q_d, c_d)
        float(tot)
        per_iter = (time.perf_counter() - t0) / args.reps
        qps = Q / per_iter
        tflops = 2 * Q * N * D / per_iter / 1e12
        ids_h = np.asarray(ids)
        if ref_ids is None:
            ref_ids = ids_h
            agree = 1.0
        else:
            agree = float((ids_h == ref_ids).mean())
        print(
            f"{name:8s} compile={compile_s:6.1f}s  per_batch={per_iter*1e3:8.1f}ms"
            f"  QPS={qps:8.1f}  TFLOP/s={tflops:5.1f}  id_agreement={agree:.4f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
