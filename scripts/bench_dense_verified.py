"""Sweep the verified-exact dense top-k (prescreen + bound-checked rescore).

The exact/parity flagship has been flat at ~19.8k QPS for three rounds while
the approximate serving modes reached 100k+. dense_topk_verified keeps the
exact contract (every batch either passes a provable coverage check or falls
back to the full exact scan) but pays prescreen prices. This sweeps the
knobs — prescreen rep (int8/bf16), candidate count kprime, rescore width m,
approx recall_target, second-chance size — on the flagship 500k x 768 shape
and reports sustained QPS + measured fail/fallback rates + id parity vs the
full exact scan on real hardware.

Run: python scripts/bench_dense_verified.py [--n 500000] [--q 256]
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
    build_verified_sidecar,
    dense_topk_xla_full,
)

D, K, REPS = 768, 10, 20


def sustained(qs, corpus, corpus_lo, corpus_scale, nd_max, r_max, cfg):
    m, j, seg, sc, engine = cfg

    @jax.jit
    def run(qs, corpus, corpus_lo, corpus_scale):
        def one(q):
            s, i, n_fail, covered = _dense_topk_verified(
                q, corpus, corpus_lo, corpus_scale,
                jnp.float32(nd_max), jnp.float32(r_max),
                K, m, j, seg, sc, engine,
            )
            return s, i, n_fail, covered

        s, i, n_fail, covered = jax.lax.map(one, qs)
        return s.sum(), i, n_fail, covered

    tot, ids, n_fail, covered = run(qs, corpus, corpus_lo, corpus_scale)
    float(tot)  # compile + warm
    t0 = time.perf_counter()
    tot, ids, n_fail, covered = run(qs, corpus, corpus_lo, corpus_scale)
    float(tot)
    dt = (time.perf_counter() - t0) / REPS
    return dt, np.asarray(ids), int(np.asarray(n_fail).sum()), int(
        np.asarray(covered).sum()
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--q", type=int, default=256)
    args = ap.parse_args()
    n, q_sz = args.n, args.q

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((n, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((REPS, q_sz, D), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    c_d = jax.device_put(jnp.asarray(corpus))
    q_d = jnp.asarray(queries)

    # exact baseline
    @jax.jit
    def run_exact(qs, c):
        s, i = jax.lax.map(lambda q: dense_topk_xla_full(q, c, K), qs)
        return s.sum(), i

    tot, ids_exact = run_exact(q_d, c_d)
    float(tot)
    t0 = time.perf_counter()
    tot, ids_exact = run_exact(q_d, c_d)
    float(tot)
    dt_exact = (time.perf_counter() - t0) / REPS
    ids_exact = np.asarray(ids_exact)
    print(
        f"exact xla_full   {dt_exact * 1e3:7.2f} ms/batch {q_sz / dt_exact:9.1f} QPS",
        file=sys.stderr,
    )

    results = {"exact_full": round(q_sz / dt_exact, 1)}
    for rep in ("int8", "bf16"):
        side = build_verified_sidecar(corpus, rep=rep)
        lo_d = jax.device_put(jnp.asarray(side["corpus_lo"]))
        sc_d = (
            None
            if side["corpus_scale"] is None
            else jax.device_put(jnp.asarray(side["corpus_scale"]))
        )
        print(
            f"[{rep}] nd_max={side['nd_max']:.4f} r_max={side['r_max']:.6f}",
            file=sys.stderr,
        )
        grid = [
            (128, 2, 128, 0, "xla"),
        ] if rep == "int8" else [
            (128, 2, 128, 0, "xla"),
            (128, 2, 128, 0, "pallas"),
            (64, 1, 128, 0, "pallas"),
            (128, 2, 128, 16, "pallas"),
            (256, 2, 128, 0, "pallas"),
            (128, 4, 128, 0, "pallas"),
        ]
        for cfg in grid:
            m, j, seg, sc, engine = cfg
            name = f"{rep}_{engine}_m{m}_j{j}_seg{seg}_sc{sc}"
            try:
                dt, ids, n_fail, n_cov = sustained(
                    q_d, c_d, lo_d, sc_d, side["nd_max"], side["r_max"], cfg
                )
            except Exception as exc:  # noqa: BLE001
                print(f"{name:34s} FAILED: {exc}", file=sys.stderr)
                continue
            match = (ids == ids_exact).all()
            qps = q_sz / dt
            results[name] = round(qps, 1)
            print(
                f"{name:34s} {dt * 1e3:7.2f} ms/batch {qps:9.1f} QPS "
                f"({qps / (q_sz / dt_exact):4.2f}x)  fails={n_fail}/{REPS * q_sz} "
                f"batch_fallbacks={REPS - n_cov}/{REPS}  ids_match={bool(match)}",
                file=sys.stderr,
            )
    print({"metric": "dense_verified_sweep", "n": n, "q": q_sz, **results})


if __name__ == "__main__":
    main()
