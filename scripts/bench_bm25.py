"""Measure BM25 top-k variants on the real TPU (500k docs x 128 slots).

Run: python scripts/bench_bm25.py [--variants pallas,pallas_v2,xla]
Reports sustained QPS (loop inside jit, honest readback) per variant.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.sparse import (  # noqa: E402
    bm25_topk_pallas,
    bm25_topk_pallas_v2,
    bm25_topk_xla,
)

N, L, B, T, K = 500_000, 128, 32, 16, 10
REPS = 20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="pallas,pallas_v2")
    ap.add_argument("--reps", type=int, default=REPS)
    ap.add_argument("--block-n", type=int, default=1024)
    ap.add_argument("--block-q", type=int, default=8)
    args = ap.parse_args()

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    vocab = 200_000
    d_ids = rng.integers(0, vocab, (N, L)).astype(np.int32)
    d_w = rng.random((N, L)).astype(np.float32)
    pad = rng.random((N, L)) < 0.25
    d_ids[pad] = -1
    d_w[pad] = 0.0
    q_ids = rng.integers(0, vocab, (B, T)).astype(np.int32)
    q_w = rng.random((B, T)).astype(np.float32)

    d_ids_d = jnp.asarray(d_ids)
    d_w_d = jnp.asarray(d_w)
    q_ids_d = jnp.asarray(q_ids)
    q_w_d = jnp.asarray(q_w)

    bn, bq = args.block_n, args.block_q
    fns = {
        "pallas": lambda q, w, di, dw: bm25_topk_pallas(
            q, w, di, dw, K, block_q=bq, block_n=bn
        ),
        "pallas_v2": lambda q, w, di, dw: bm25_topk_pallas_v2(
            q, w, di, dw, K, block_q=bq, block_n=bn
        ),
        "xla": lambda q, w, di, dw: bm25_topk_xla(q, w, di, dw, K),
    }

    ref_ids = None
    for name in args.variants.split(","):
        fn = fns[name]

        # doc arrays are jit ARGUMENTS (closing over them bakes 512MB of
        # constants into the HLO -> remote-compile HTTP 413)
        @jax.jit
        def run(q, w, di, dw):
            # per-step perturbation defeats loop-invariant code motion (a
            # constant body can be hoisted -> one kernel run, bogus QPS)
            def step(c, t):
                s, i = fn(q, w * (1.0 + 1e-6 * t), di, dw)
                return c + s.sum(), i
            tot, ids = jax.lax.scan(
                step, 0.0, jnp.arange(args.reps, dtype=jnp.float32)
            )
            return tot, ids[0]

        t0 = time.perf_counter()
        tot, ids = run(q_ids_d, q_w_d, d_ids_d, d_w_d)
        float(tot)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        tot, ids = run(q_ids_d, q_w_d, d_ids_d, d_w_d)
        float(tot)
        per_iter = (time.perf_counter() - t0) / args.reps
        qps = B / per_iter
        ids_h = np.asarray(ids)
        if ref_ids is None:
            ref_ids = ids_h
            agree = 1.0
        else:
            agree = float((ids_h == ref_ids).mean())
        print(
            f"{name:10s} compile={compile_s:6.1f}s  per_batch={per_iter*1e3:7.2f}ms"
            f"  QPS={qps:8.1f}  id_agreement={agree:.4f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
