"""Component profile of the verified-exact pipeline: where do the ms go?

Isolates int8 matmul, approx_max_k at various k', exact top_k at various k',
the [Q,m,d] gather+rescore, the verification counts, and sort_topk merges.

Run: python scripts/bench_verified_profile.py [--n 100000]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.dense import quantize_int8  # noqa: E402
from autorag_research_tpu.ops.topk import sort_topk  # noqa: E402

Q, D, REPS = 256, 768, 20


def timeit(fn, *args):
    @jax.jit
    def run(xs, *rest):
        outs = jax.lax.map(lambda x: fn(x, *rest), xs)
        first = jax.tree.leaves(outs)[0]
        return first.astype(jnp.float32).sum(), outs

    tot, _ = run(*args)
    float(tot)
    t0 = time.perf_counter()
    tot, _ = run(*args)
    float(tot)
    return (time.perf_counter() - t0) / REPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    args = ap.parse_args()
    n = args.n
    print(f"devices: {jax.devices()}  n={n}", file=sys.stderr)
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((n, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((REPS, Q, D), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    cq_h, cs_h = quantize_int8(corpus)
    c_d = jax.device_put(jnp.asarray(corpus))
    cq = jax.device_put(jnp.asarray(cq_h))
    cs = jax.device_put(jnp.asarray(cs_h))
    q_d = jnp.asarray(queries)

    def shat_of(q, cq, cs):
        q_q, q_scale = quantize_int8(q.astype(jnp.float32))
        s32 = jax.lax.dot_general(
            q_q, cq, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return s32.astype(jnp.float32) * cs[None, :] * q_scale[:, None]

    dt = timeit(lambda q, a, b: (shat_of(q, a, b).max(axis=1),), q_d, cq, cs)
    print(f"int8 matmul+scales (row max)     {dt * 1e3:7.2f} ms", file=sys.stderr)

    for kp in (10, 64, 128, 256, 512, 1024):
        dt = timeit(
            lambda q, a, b, kp=kp: jax.lax.approx_max_k(shat_of(q, a, b), kp, recall_target=0.99),
            q_d, cq, cs,
        )
        print(f"  + approx_max_k(k'={kp:5d})        {dt * 1e3:7.2f} ms", file=sys.stderr)
    for kp in (10, 128, 512):
        dt = timeit(
            lambda q, a, b, kp=kp: jax.lax.top_k(shat_of(q, a, b), kp),
            q_d, cq, cs,
        )
        print(f"  + exact top_k(k'={kp:5d})         {dt * 1e3:7.2f} ms", file=sys.stderr)

    # counts pass
    def with_counts(q, a, b):
        s = shat_of(q, a, b)
        cnt = jnp.sum((s >= 0.1).astype(jnp.int32), axis=1)
        return s.max(axis=1), cnt

    dt = timeit(with_counts, q_d, cq, cs)
    print(f"  + threshold count               {dt * 1e3:7.2f} ms", file=sys.stderr)

    # gather + rescore with random fixed indices
    for m in (64, 128, 256):
        idx = jnp.asarray(rng.integers(0, n, size=(Q, m), dtype=np.int32))

        def gr(q, c, idx=idx):
            rows = jnp.take(c, idx, axis=0)
            e = jax.lax.dot_general(
                q.astype(jnp.float32), rows,
                dimension_numbers=(((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return sort_topk(e, idx, 10)

        dt = timeit(gr, q_d, c_d)
        print(f"gather+rescore+sort m={m:4d}        {dt * 1e3:7.2f} ms", file=sys.stderr)

    # second-chance style: argsort over Q + [F, n] exact
    for f in (16, 32):
        def sc(q, c, f=f):
            fq = q[:f].astype(jnp.float32)
            s = jax.lax.dot_general(
                fq, c, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jax.lax.top_k(s, 10)

        dt = timeit(sc, q_d, c_d)
        print(f"second-chance exact F={f:3d}          {dt * 1e3:7.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
