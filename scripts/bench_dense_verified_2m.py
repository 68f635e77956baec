"""Verified-exact dense at CAPACITY scale (2M x 768): QPS, fail rate vs
segment count, parity (VERDICT r4 #2).

All prior verified measurements sit at 500k x 768 where flat [Q, N] scores
fit; at 2M the corpus is 6.1 GB f32 + 3.1 GB bf16 sidecar (both resident —
the verified mode NEEDS the exact corpus for rescore; 8M does not fit and
DenseIndex(mode="verified") refuses there). Segments grow 4x (15,625 at
seg=128), so fixed m=64 covers a 4x smaller fraction — this sweeps m to
chart the fail-rate growth the r4 verdict flagged.

Corpus + sidecar are generated ON DEVICE (host gen + ~9 GB over the
~17 MB/s tunnel would dominate). Measurement-only caveat: the device maxima
are f32 with a 1.01 inflation instead of the production host-f64 rounded-up
bounds — a wider bound only raises the fail rate, never breaks the proof.
Parity is asserted vs the on-device exact scan (dense_topk_xla_full per
query, [1, N] scores).

Run: python scripts/bench_dense_verified_2m.py [--n 2000000] [--q 256]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.dense import (  # noqa: E402
    _dense_topk_verified,
    dense_topk_xla_full,
)

D, K, REPS = 768, 10, 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--q", type=int, default=256)
    ap.add_argument("--reps", type=int, default=REPS)
    args = ap.parse_args()
    n, q_sz, reps = args.n, args.q, args.reps

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    queries = rng.standard_normal((reps, q_sz, D), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    q_d = jnp.asarray(queries)

    @jax.jit
    def gen(key):
        c = jax.random.normal(key, (n, D), dtype=jnp.float32)
        c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
        return c, c.astype(jnp.bfloat16)

    # residuals in a SEPARATE jit: inside one jit XLA folds the
    # f32->bf16->f32 round-trip to identity and r_max comes out 0,
    # silently unbudgeting the doc-side prescreen error
    @jax.jit
    def stats(c, lo):
        resid = c - lo.astype(jnp.float32)
        r_max = jnp.sqrt((resid * resid).sum(axis=1)).max() * 1.01
        nd_max = jnp.sqrt((c * c).sum(axis=1)).max() * 1.01
        return r_max, nd_max

    t0 = time.perf_counter()
    c_d, lo_d = gen(jax.random.PRNGKey(0))
    r_dev, nd_dev = stats(c_d, lo_d)
    r_max, nd_max = float(r_dev), float(nd_dev)
    assert r_max > 0.0, 'doc-side residual must be budgeted'
    print(
        f"device-gen {time.perf_counter() - t0:.0f}s: corpus "
        f"{n * D * 4 / 2**30:.2f} GB f32 + {n * D * 2 / 2**30:.2f} GB bf16 "
        f"resident; r_max={r_max:.6f} nd_max={nd_max:.4f}",
        file=sys.stderr, flush=True,
    )

    # exact baseline + parity oracle
    @jax.jit
    def run_exact(qs, c):
        s, i = jax.lax.map(lambda q: dense_topk_xla_full(q, c, K), qs)
        return s.sum(), s, i

    tot, _s, ids_exact = run_exact(q_d, c_d)
    float(tot)
    t0 = time.perf_counter()
    tot, _s, ids_exact = run_exact(q_d, c_d)
    float(tot)
    dt_exact = (time.perf_counter() - t0) / reps
    ids_exact = np.asarray(ids_exact)
    exact_qps = q_sz / dt_exact
    print(
        f"exact xla_full   {dt_exact * 1e3:7.2f} ms/batch {exact_qps:9.1f} QPS",
        file=sys.stderr, flush=True,
    )

    results = {"exact_full": round(exact_qps, 1)}
    fail_table = {}
    for m, j, engine in (
        (64, 1, "pallas"),
        (64, 2, "pallas"),
        (128, 2, "pallas"),
        (256, 2, "pallas"),
        (128, 2, "xla"),
    ):
        name = f"bf16_{engine}_m{m}_j{j}"

        @jax.jit
        def run(qs, c, lo, m=m, j=j, engine=engine):
            def one(q):
                return _dense_topk_verified(
                    q, c, lo, None, jnp.float32(nd_max), jnp.float32(r_max),
                    K, m, j, 128, 0, engine,
                )

            s, i, n_fail, covered = jax.lax.map(one, qs)
            return s.sum(), i, n_fail, covered

        try:
            tot, ids, n_fail, cov = run(q_d, c_d, lo_d)
            float(tot)
            t0 = time.perf_counter()
            tot, ids, n_fail, cov = run(q_d, c_d, lo_d)
            float(tot)
            dt = (time.perf_counter() - t0) / reps
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} FAILED: {str(exc)[:200]}", file=sys.stderr, flush=True)
            continue
        nf = int(np.asarray(n_fail).sum())
        nb = reps - int(np.asarray(cov).sum())
        match = bool((np.asarray(ids) == ids_exact).all())
        qps = q_sz / dt
        results[name] = round(qps, 1)
        fail_table[name] = f"{nf}/{reps * q_sz}"
        print(
            f"{name:24s} {dt * 1e3:7.2f} ms/batch {qps:9.1f} QPS "
            f"({qps / exact_qps:4.2f}x)  fails={nf}/{reps * q_sz} "
            f"batch_fallbacks={nb}/{reps}  ids_match={match}",
            file=sys.stderr, flush=True,
        )
    print({"metric": "dense_verified_2m", "n": n, "q": q_sz,
           "fails": fail_table, **results})


if __name__ == "__main__":
    main()
