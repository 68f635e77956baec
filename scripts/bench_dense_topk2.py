"""Dense top-k cost split + two-stage top-k experiments (bf16 regime fix).

VERDICT r1 #5: bf16 fast mode ran 29.3k QPS (8.3 ms / 256-query batch) vs a
~1 ms bandwidth/MXU bound — hypothesis: `lax.top_k` over the full [Q, N]
score row dominates, not the matmul. This measures:

  matmul      dot_general only (the irreducible cost)
  full        current dense_topk_xla_full (dot + lax.top_k over N)
  two_stage   dot + reshape [Q, T, tile] + per-tile lax.top_k + global
              top_k over T*k candidates (EXACT, ties preserved by position)
  approx      dot + lax.approx_max_k (TPU bucketed reduction, recall<=1)

Anti-LICM: queries perturbed per rep; forced host readback.
Run: python scripts/bench_dense_topk2.py [--dtype bf16] [--n 500000]
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.dense import (  # noqa: E402
    NEG_INF,
    _precision_for,
    dense_topk_xla_full,
)

Q, D, K = 256, 768, 10


def _scores(queries, corpus):
    return jax.lax.dot_general(
        queries,
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(queries.dtype),
    )


@functools.partial(jax.jit, static_argnames=())
def matmul_only(queries, corpus):
    return (_scores(queries, corpus).max(axis=1),)


from autorag_research_tpu.ops.dense import (  # noqa: E402
    dense_topk_xla_two_stage as two_stage,
)


@functools.partial(jax.jit, static_argnames=("k", "recall"))
def approx(queries, corpus, k: int, recall: float = 0.99):
    scores = _scores(queries, corpus)
    return jax.lax.approx_max_k(scores, k, recall_target=recall)


def run(fn, label, q_base, reps=20):
    out = fn(q_base)
    _ = float(np.asarray(out[0]).sum())
    t0 = time.perf_counter()
    for r in range(reps):
        out = fn(q_base * (1.0 + 1e-6 * (r + 1)))
        _ = float(np.asarray(out[0]).sum())
    per = (time.perf_counter() - t0) / reps
    print(f"{label:28s} {per * 1e3:7.2f} ms/batch  {Q / per:9.1f} QPS", file=sys.stderr)
    return Q / per, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((args.n, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((Q, D), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    c_d = jax.device_put(jnp.asarray(corpus, dtype=dt))
    q_d = jnp.asarray(queries, dtype=dt)

    results = {}
    _, ref = run(lambda q: dense_topk_xla_full(q, c_d, K), "full (current)", q_d, args.reps)
    results["full"], _ = run(
        lambda q: dense_topk_xla_full(q, c_d, K), "full (current)", q_d, args.reps
    )
    results["matmul"], _ = run(lambda q: matmul_only(q, c_d), "matmul only", q_d, args.reps)
    for tile in (1024, 2048, 4096, 8192):
        qps, out = run(
            lambda q, t=tile: two_stage(q, c_d, K, tile=t),
            f"two_stage tile={tile}",
            q_d,
            args.reps,
        )
        same = np.array_equal(np.asarray(out[1]), np.asarray(ref[1]))
        print(f"    ids == full: {same}", file=sys.stderr)
        results[f"two_stage_{tile}"] = round(qps, 1)
    for recall in (0.95, 0.99):
        qps, out = run(
            lambda q, r=recall: approx(q, c_d, K, recall=r),
            f"approx recall={recall}",
            q_d,
            args.reps,
        )
        agree = float(
            np.mean(
                [
                    len(set(map(int, a)) & set(map(int, b))) / K
                    for a, b in zip(np.asarray(out[1]), np.asarray(ref[1]))
                ]
            )
        )
        print(f"    top-{K} agreement: {agree:.3f}", file=sys.stderr)
        results[f"approx_{recall}"] = round(qps, 1)
    print({"metric": f"dense_topk2_{args.dtype}", "n": args.n, **results})


if __name__ == "__main__":
    main()
