"""int8 dense fast mode vs bf16: is 2x MXU rate + 4x less corpus traffic real?

The large-batch bf16 fast path is measured corpus-traffic-bound (Q=1024
amortizes the 768 MB read to 135.8k QPS, scripts/bench_dense_bf16_push.py).
An int8 corpus reads 192 MB and contracts s8 x s8 -> s32 at 2x the bf16 MXU
rate on v5e, so the traffic-bound ceiling roughly quadruples IF XLA lowers
the quantized path cleanly. This measures:

  1. sustained QPS of dense_topk_int8 (approx selection) at Q=256/1024;
  2. the same for the bf16 approx path (same-day comparator);
  3. top-10 agreement of int8 vs the exact f32-HIGHEST ranking (quality).

Run: python scripts/bench_dense_int8.py [--n 500000] [--q 256,1024]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.dense import (  # noqa: E402
    dense_topk,
    dense_topk_approx,
    dense_topk_int8,
    quantize_int8,
    quantize_int8_global,
)
from autorag_research_tpu.utils.profiling import KernelTimer  # noqa: E402

D, K, REPS = 768, 10, 10

# one corpus recipe + /tmp cache shared with the bf16 comparator bench —
# duplicating it would let the recipes drift while reading the same cache
from bench_dense_bf16_push import load  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--q", default="256,1024")
    ap.add_argument("--skip-agreement", action="store_true")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    c = load(args.n)
    cq_h, cs_h = quantize_int8(c)
    cg_h, g_scale = quantize_int8_global(c)
    t0 = time.time()
    cq = jax.device_put(jnp.asarray(cq_h))
    cs = jax.device_put(jnp.asarray(cs_h))
    cg = jax.device_put(jnp.asarray(cg_h))
    gs = jnp.float32(g_scale)
    c16 = jax.device_put(jnp.asarray(c, jnp.bfloat16))
    _ = float(cs.sum()) + float(jnp.sum(c16[0]).astype(jnp.float32)) + float(cg[0].sum())
    print(f"H2D {time.time()-t0:.0f}s (int8 corpus {cq_h.nbytes>>20} MB, "
          f"bf16 {args.n*D*2>>20} MB)", file=sys.stderr, flush=True)
    rng = np.random.default_rng(1)
    results = {}

    if not args.skip_agreement:
        q = rng.standard_normal((64, D), dtype=np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        qj = jnp.asarray(q)
        s8, i8 = dense_topk_int8(qj, cq, cs, K, exact=True)
        sf, if_ = dense_topk(qj, jnp.asarray(c), K, method="xla_full")
        i8_h, if_h = np.asarray(i8), np.asarray(if_)
        agree = np.mean(
            [len(set(map(int, a)) & set(map(int, b))) / K for a, b in zip(i8_h, if_h)]
        )
        err = float(np.max(np.abs(np.asarray(s8) - np.asarray(sf))))
        print(f"int8-exact vs f32-exact: top-{K} agreement {agree:.3f}, "
              f"max|score err| {err:.4f}", file=sys.stderr, flush=True)
        results["top10_agreement"] = round(float(agree), 4)
        results["max_score_err"] = round(err, 5)
        sg, ig = dense_topk_int8(qj, cg, gs, K, exact=True)
        agree_g = np.mean(
            [len(set(map(int, a)) & set(map(int, b))) / K
             for a, b in zip(np.asarray(ig), if_h)]
        )
        err_g = float(np.max(np.abs(np.asarray(sg) - np.asarray(sf))))
        print(f"int8-GLOBAL-exact vs f32-exact: top-{K} agreement {agree_g:.3f}, "
              f"max|score err| {err_g:.4f}", file=sys.stderr, flush=True)
        results["top10_agreement_global"] = round(float(agree_g), 4)

    for qsize in [int(x) for x in args.q.split(",")]:
        q = rng.standard_normal((REPS, qsize, D), dtype=np.float32)
        q /= np.linalg.norm(q, axis=2, keepdims=True)
        qf = jnp.asarray(q)
        q16 = jnp.asarray(q, jnp.bfloat16)
        for name, fn, qa in (
            ("int8", lambda x, a, b: dense_topk_int8(x, a, b, K), (qf, cq, cs)),
            ("int8g", lambda x, a, b: dense_topk_int8(x, a, b, K), (qf, cg, gs)),
            ("bf16", lambda x, corp: dense_topk_approx(x, corp, K), (q16, c16)),
        ):
            timer = KernelTimer(REPS)
            t0 = time.time()
            dt_s = timer.measure(fn, *qa)
            qps = qsize / dt_s
            print(f"{name} approx Q={qsize:5d}: {dt_s*1e3:7.2f} ms/batch "
                  f"{qps:9.0f} QPS (measure {time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
            results[f"{name}_q{qsize}"] = round(qps)

    print({"metric": "dense_int8", "n": args.n, **results})


if __name__ == "__main__":
    main()
