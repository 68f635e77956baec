"""Lane-packed BM25 kernel vs v2 on a short-doc corpus (real TPU).

500k docs x 16 unique terms: v2 pads the slot axis to 128 lanes (8x waste);
the packed kernel puts 8 docs per row. Run: python scripts/bench_bm25_packed.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

N, W, B, T, K = 500_000, 16, 32, 16, 10
VOCAB = 200_000
REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from autorag_research_tpu.ops.sparse import (
        bm25_topk_pallas_packed,
        bm25_topk_pallas_v2,
        pack_slots,
    )

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    d_ids = rng.integers(0, VOCAB, (N, W)).astype(np.int32)
    d_w = rng.random((N, W)).astype(np.float32)
    q_ids = rng.integers(0, VOCAB, (B, T)).astype(np.int32)
    q_w = rng.random((B, T)).astype(np.float32)
    pids, pw, pack = pack_slots(d_ids, d_w, W)
    print(f"pack={pack} packed rows={pids.shape[0]}", file=sys.stderr)

    d_ids_d, d_w_d = jnp.asarray(d_ids), jnp.asarray(d_w)
    pids_d, pw_d = jnp.asarray(pids), jnp.asarray(pw)
    q_ids_d, q_w_d = jnp.asarray(q_ids), jnp.asarray(q_w)

    variants = {
        "v2": lambda q, w: bm25_topk_pallas_v2(q, w, d_ids_d, d_w_d, K),
        "packed": lambda q, w: bm25_topk_pallas_packed(
            q, w, pids_d, pw_d, N, K, pack
        ),
    }
    ref = None
    for name, fn in variants.items():

        @jax.jit
        def run(q, w):
            def step(c, t):
                s, i = fn(q, w * (1.0 + 1e-6 * t))
                return c + s.sum(), i
            tot, ids = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.float32))
            return tot, ids[0]

        t0 = time.perf_counter()
        tot, ids = run(q_ids_d, q_w_d)
        float(tot)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        tot, ids = run(q_ids_d, q_w_d)
        float(tot)
        per = (time.perf_counter() - t0) / REPS
        ids_h = np.asarray(ids)
        agree = 1.0 if ref is None else float((ids_h == ref).mean())
        ref = ids_h if ref is None else ref
        print(
            f"{name:8s} compile={compile_s:6.1f}s per_batch={per*1e3:7.2f}ms "
            f"QPS={B/per:8.1f} id_agreement={agree:.4f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
