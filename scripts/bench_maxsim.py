"""MaxSim XLA-scan tile sweep on the real TPU (50k docs x 128 tokens x 128d,
8 queries x 32 tokens). Run: python scripts/bench_maxsim.py --tiles 4096,8192
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.maxsim import maxsim_topk_xla  # noqa: E402

N, TD, D, B, TQ, K = 50_000, 128, 128, 8, 32, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="4096,8192")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    docs = rng.normal(size=(N, TD, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=2, keepdims=True)
    lens = np.full(N, TD, np.int32)
    q = rng.normal(size=(B, TQ, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=2, keepdims=True)
    qlens = np.full(B, TQ, np.int32)
    docs_d, lens_d, q_d, qlens_d = (
        jnp.asarray(docs), jnp.asarray(lens), jnp.asarray(q), jnp.asarray(qlens)
    )

    ref = None
    for tile in [int(t) for t in args.tiles.split(",")]:

        @jax.jit
        def run(qq, ql, dd, ll):
            def step(c, _):
                s, i = maxsim_topk_xla(qq, ql, dd, ll, K, tile_n=tile)
                return c + s.sum(), i
            tot, ids = jax.lax.scan(step, 0.0, None, length=args.reps)
            return tot, ids[0]

        t0 = time.perf_counter()
        tot, ids = run(q_d, qlens_d, docs_d, lens_d)
        float(tot)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        tot, ids = run(q_d, qlens_d, docs_d, lens_d)
        float(tot)
        per = (time.perf_counter() - t0) / args.reps
        ids_h = np.asarray(ids)
        agree = 1.0 if ref is None else float((ids_h == ref).mean())
        ref = ids_h if ref is None else ref
        print(
            f"tile={tile:6d} compile={compile_s:6.1f}s per_batch={per*1e3:7.1f}ms"
            f" QPS={B/per:7.1f} id_agreement={agree:.4f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
