"""Root-cause the ~25 ms single-query fixed cost at multi-GB resident arrays.

Round-2 finding: at 2M x 768 the per-query latency is ~25 ms whether the
kernel reads 5.7 GB (exact) or ~1% of it (IVF probe) — the floor tracks
RESIDENT-ARRAY SIZE, not bytes touched. This experiment decomposes one call:

  A  trivial jit, no device-resident args        -> tunnel RTT + dispatch
  B  jit over the resident corpus, O(1) compute  -> + big-arg handling
  C  jit over a SMALL resident slice, O(1)       -> resident-size control
  D  exact dense search (1 query)                -> + kernel time
  E  exact dense search (256 queries)            -> amortization reference
  F  B with donate_argnums on the corpus         -> donation effect
  G  two chained B calls (device-to-device dep)  -> per-call vs per-chain

Per-call timing (time.perf_counter around a forced scalar readback — this is
EXACTLY the serving path cost, not sustained lax.map throughput).

Run: python scripts/profile_query_floor.py [--n 2000000] [--reps 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def percall(fn, *args, reps=30, warmup=3, label=""):
    for _ in range(warmup):
        r = fn(*args)
        float(np.asarray(r).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(np.asarray(r).ravel()[0])  # forced host readback (tunnel-safe)
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1000
    if label:
        print(
            f"{label:28s} median {np.median(ts):7.2f} ms   min {ts.min():7.2f} ms",
            file=sys.stderr, flush=True,
        )
    return float(np.median(ts)), float(ts.min())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    import ml_dtypes

    # convert to bf16 on host: halves the tunnel H2D (3 GB instead of 6)
    host = rng.standard_normal((args.n, args.d), dtype=np.float32).astype(
        ml_dtypes.bfloat16
    )
    corpus = jax.device_put(jnp.asarray(host))
    small = jax.device_put(corpus[:1024])
    q1 = jax.device_put(jnp.asarray(rng.standard_normal((1, args.d), dtype=np.float32), jnp.bfloat16))
    qb = jax.device_put(jnp.asarray(rng.standard_normal((256, args.d), dtype=np.float32), jnp.bfloat16))
    gb = corpus.nbytes / 1e9
    print(f"corpus resident: {gb:.2f} GB bf16", file=sys.stderr)

    results = {}

    f_trivial = jax.jit(lambda q: q.sum())
    results["A_trivial_no_big_args"] = percall(f_trivial, q1, reps=args.reps, label="A_trivial_no_big_args")

    f_bigarg = jax.jit(lambda q, c: q.sum() + c[0, 0].astype(jnp.float32))
    results["B_bigarg_o1_compute"] = percall(f_bigarg, q1, corpus, reps=args.reps, label="B_bigarg_o1_compute")

    f_small = jax.jit(lambda q, c: q.sum() + c[0, 0].astype(jnp.float32))
    results["C_smallarg_o1_compute"] = percall(f_small, q1, small, reps=args.reps, label="C_smallarg_o1_compute")

    def search(q, c):
        s = jax.lax.dot_general(
            q, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v, i = jax.lax.top_k(s, 10)
        return v

    f_search1 = jax.jit(search)
    results["D_exact_search_1q"] = percall(f_search1, q1, corpus, reps=args.reps, label="D_exact_search_1q")
    results["E_exact_search_256q"] = percall(f_search1, qb, corpus, reps=max(5, args.reps // 3), label="E_exact_search_256q")

    # donation of a live buffer would invalidate it; measure with a dedicated
    # throwaway copy ONCE per rep is too slow — instead donate the QUERY only
    f_donq = jax.jit(lambda q, c: q.sum() + c[0, 0].astype(jnp.float32), donate_argnums=(0,))
    results["F_donated_query"] = percall(
        lambda c: f_donq(jax.device_put(q1), c), corpus, reps=args.reps
    , label="F_donated_query")

    def two_calls(q, c):
        a = f_bigarg(q, c)
        b = f_bigarg(q, c)
        return a + b
    results["G_two_chained_calls"] = percall(two_calls, q1, corpus, reps=args.reps, label="G_two_chained_calls")

    for k in sorted(results):
        med, mn = results[k]
        print(f"{k:28s} median {med:7.2f} ms   min {mn:7.2f} ms", file=sys.stderr)

    import json

    print(json.dumps({k: {"median_ms": round(v[0], 2), "min_ms": round(v[1], 2)} for k, v in results.items()}))


if __name__ == "__main__":
    main()
