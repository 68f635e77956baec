"""int8 MaxSim serving mode vs the measured bf16/f32 defaults.

The capacity story mirrors dense int8: a ColPali-scale token corpus
(N x Td x d) is the HBM hog — 50k x 128 x 128 = 3.3 GB f32 / 1.6 GB bf16 /
0.84 GB int8 (+3% scales). This measures sustained QPS of
ops/maxsim.maxsim_topk_int8 (s8 MXU contraction, per-token dequant before
the max) against the bf16 XLA scan (the measured serving default) and the
exact f32 scan, plus top-10 agreement vs exact.

Sustained timing (KernelTimer: lax.map over distinct query batches inside
one jit). Run: python scripts/bench_maxsim_int8.py [--n 50000]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.maxsim import (  # noqa: E402
    maxsim_topk_int8,
    maxsim_topk_xla,
    quantize_int8_tokens,
)
from autorag_research_tpu.utils.profiling import KernelTimer  # noqa: E402

B, TQ, D, K, REPS = 8, 32, 128, 10, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--td", type=int, default=128)
    ap.add_argument("--tile", type=int, default=None, help="int8 kernel tile_n override")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((args.n, args.td, D), dtype=np.float32)
    docs /= np.linalg.norm(docs, axis=2, keepdims=True)
    doc_lens = rng.integers(args.td // 2, args.td + 1, size=args.n).astype(np.int32)
    queries = rng.standard_normal((REPS, B, TQ, D), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=3, keepdims=True)
    q_lens = np.full((REPS, B), TQ, np.int32)

    dq, ds = quantize_int8_tokens(docs)
    int8_gb = (dq.nbytes + ds.nbytes) / 1e9
    print(
        f"resident corpus: f32 {docs.nbytes / 1e9:.2f} GB / bf16 "
        f"{docs.nbytes / 2e9:.2f} GB / int8 {int8_gb:.2f} GB",
        file=sys.stderr,
    )

    dq_d = jax.device_put(jnp.asarray(dq))
    ds_d = jax.device_put(jnp.asarray(ds))
    dlens_d = jax.device_put(jnp.asarray(doc_lens))
    q_d = jnp.asarray(queries)
    ql_d = jnp.asarray(q_lens)

    timer = KernelTimer(REPS)

    def qps(label, dt_s):
        print(f"{label:28s} {dt_s * 1e3:8.2f} ms/batch  {B / dt_s:8.1f} QPS", file=sys.stderr)

    dt8 = timer.measure(
        lambda x, d_, s_, dl: maxsim_topk_int8(x[0], x[1], d_, s_, dl, K, tile_n=args.tile),
        (q_d, ql_d), dq_d, ds_d, dlens_d,
    )
    qps("int8 (s8 MXU)", dt8)

    # ids for agreement: one batch through each path
    i8 = np.asarray(maxsim_topk_int8(q_d[0], ql_d[0], dq_d, ds_d, dlens_d, K, tile_n=args.tile)[1])
    del dq_d, ds_d

    docs_bf = jax.device_put(jnp.asarray(docs, dtype=jnp.bfloat16))
    dt_bf = timer.measure(
        lambda x, d_, dl: maxsim_topk_xla(x[0], x[1], d_, dl, K),
        (jnp.asarray(queries, jnp.bfloat16), ql_d), docs_bf, dlens_d,
    )
    qps("bf16 xla scan (default)", dt_bf)
    del docs_bf

    docs_f32 = jax.device_put(jnp.asarray(docs))
    dt_f32 = timer.measure(
        lambda x, d_, dl: maxsim_topk_xla(x[0], x[1], d_, dl, K),
        (q_d, ql_d), docs_f32, dlens_d,
    )
    qps("f32 xla scan (exact)", dt_f32)
    i_exact = np.asarray(maxsim_topk_xla(q_d[0], ql_d[0], docs_f32, dlens_d, K)[1])

    agree = np.mean([len(set(a) & set(b)) / K for a, b in zip(i8, i_exact)])
    print(f"int8 vs exact top-{K} agreement: {agree:.3f}", file=sys.stderr)
    print(
        f"int8 {B / dt8:.1f} QPS = {dt_bf / dt8:.2f}x bf16 / {dt_f32 / dt8:.2f}x f32; "
        f"agreement {agree:.3f}; corpus {int8_gb:.2f} GB (4x f32 capacity)"
    )


if __name__ == "__main__":
    main()
