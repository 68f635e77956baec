"""MaxSim Pallas retry: block_n sweep vs the XLA-scan default.

Round-1 verdict: the Pallas MaxSim paths lose to the XLA scan. Hypothesis:
the loss is the grid-step floor (~50us/step through the axon stack), not a
relayout — v1 defaulted to block_n=8 (6,250 steps at 50k docs) and v2's
static per-doc unroll caps block_n at ~16. This sweeps v1's 3-D-max
orientation at block_n up to 128 (390 steps), where the [rows, BN*Td] ->
[rows, BN, Td] reshape should be layout-preserving for Td=128.

Sustained timing (KernelTimer: lax.map over distinct query batches inside
one jit). Run: python scripts/bench_maxsim_pallas.py [--dtype f32]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.maxsim import (  # noqa: E402
    maxsim_topk_pallas,
    maxsim_topk_pallas_v2,
    maxsim_topk_pallas_v3,
    maxsim_topk_xla,
)
from autorag_research_tpu.utils.profiling import KernelTimer  # noqa: E402

B, TQ, D, K, REPS = 8, 32, 128, 10, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--td", type=int, default=128)
    ap.add_argument("--dtype", default="f32", choices=["bf16", "f32"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((args.n, args.td, D), dtype=np.float32)
    docs /= np.linalg.norm(docs, axis=2, keepdims=True)
    doc_lens = rng.integers(args.td // 2, args.td + 1, size=args.n).astype(np.int32)
    queries = rng.standard_normal((REPS, B, TQ, D), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=3, keepdims=True)
    q_lens = np.full((REPS, B), TQ, np.int32)

    docs_d = jax.device_put(jnp.asarray(docs, dtype=dt))
    dlens_d = jax.device_put(jnp.asarray(doc_lens))
    q_d = jnp.asarray(queries, dtype=dt)
    ql_d = jnp.asarray(q_lens)

    timer = KernelTimer(REPS)

    def measure(label, fn):
        try:
            dt_s = timer.measure(
                lambda x, d_, dl: fn(x[0], x[1], d_, dl), (q_d, ql_d), docs_d, dlens_d
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{label:22s} FAILED: {str(exc)[:200]}", file=sys.stderr)
            return None
        qps = B / dt_s
        print(f"{label:22s} {dt_s * 1e3:8.2f} ms/batch  {qps:8.1f} QPS", file=sys.stderr)
        return round(qps, 1)

    results = {}
    results["xla"] = measure(
        "xla scan (default)", lambda q, ql, d_, dl: maxsim_topk_xla(q, ql, d_, dl, K)
    )
    for bn in (8, 16, 32, 48):
        results[f"pallas_v1_bn{bn}"] = measure(
            f"pallas v1 bn={bn}",
            lambda q, ql, d_, dl, bn=bn: maxsim_topk_pallas(
                q, ql, d_, dl, K, block_n=bn
            ),
        )
    for bn in (16, 32, 48):
        results[f"pallas_v2_bn{bn}"] = measure(
            f"pallas v2 bn={bn}",
            lambda q, ql, d_, dl, bn=bn: maxsim_topk_pallas_v2(
                q, ql, d_, dl, K, block_n=bn
            ),
        )
    for bn in (16, 32, 48):
        results[f"pallas_v3_bn{bn}"] = measure(
            f"pallas v3 bn={bn} (fused mask)",
            lambda q, ql, d_, dl, bn=bn: maxsim_topk_pallas_v3(
                q, ql, d_, dl, K, block_n=bn
            ),
        )

    # correctness spot-check vs xla (VMEM-safe block size)
    try:
        s0, i0 = maxsim_topk_xla(q_d[0], ql_d[0], docs_d, dlens_d, K)
        s1, i1 = maxsim_topk_pallas_v2(q_d[0], ql_d[0], docs_d, dlens_d, K, block_n=16)
        s2, i2 = maxsim_topk_pallas_v3(q_d[0], ql_d[0], docs_d, dlens_d, K, block_n=16)
        same = np.array_equal(np.asarray(i0), np.asarray(i1))
        same3 = np.array_equal(np.asarray(i0), np.asarray(i2))
        print(f"ids pallas_v2(bn=16) == xla: {same}; v3 == xla: {same3}", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        print(f"spot-check failed: {str(exc)[:150]}", file=sys.stderr)
    print({"metric": f"maxsim_pallas_sweep_{args.dtype}", "n": args.n, "td": args.td, **results})


if __name__ == "__main__":
    main()
