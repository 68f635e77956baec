"""Bucketed vs flat BM25 device layout on a SKEWED corpus (real TPU).

90% of docs have ~16 unique terms, 10% have ~128 -> a flat [N, 128] layout
pads 90% of rows 8x. Measures HBM footprint and sustained QPS for both
layouts at 500k docs. Run: python scripts/bench_bm25_bucketed.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

N, B, T, K = 500_000, 32, 16, 10
VOCAB = 200_000
REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from autorag_research_tpu.index.sparse import SparseIndex, _plan_buckets
    from autorag_research_tpu.ops.sparse import DOC_PAD, bm25_topk_pallas_v2

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    n_long = N // 10
    counts = np.where(rng.random(N) < 0.9, 16, 128)
    slot_ids = np.full((N, 128), DOC_PAD, np.int32)
    slot_w = np.zeros((N, 128), np.float32)
    for width in (16, 128):
        rows = np.nonzero(counts == width)[0]
        slot_ids[rows[:, None], np.arange(width)[None]] = rng.integers(
            0, VOCAB, (len(rows), width), dtype=np.int32
        )
        slot_w[rows[:, None], np.arange(width)[None]] = rng.random(
            (len(rows), width)
        ).astype(np.float32)
    q_ids = rng.integers(0, VOCAB, (B, T)).astype(np.int32)
    q_w = rng.random((B, T)).astype(np.float32)

    bounds = _plan_buckets(counts, 2)
    print(f"bucket plan: {bounds}", file=sys.stderr)

    def measure(name, launches):
        """launches: list of (q_ids, q_w, d_ids, d_w, row_map) per bucket."""
        @jax.jit
        def run(args_list):
            # perturb the query weights per step: a loop-INVARIANT body gets
            # hoisted out of the scan by XLA (one kernel run amortized over
            # REPS -> bogus QPS)
            def step(c, t):
                outs = []
                for (qi, qw, di, dw) in args_list:
                    s, i = bm25_topk_pallas_v2(qi, qw * (1.0 + 1e-6 * t), di, dw, K)
                    outs.append((s, i))
                return c + sum(s.sum() for s, _ in outs), None
            tot, _ = jax.lax.scan(
                step, 0.0, jnp.arange(REPS, dtype=jnp.float32)
            )
            return tot

        args_list = tuple(
            (jnp.asarray(qi), jnp.asarray(qw), jnp.asarray(di), jnp.asarray(dw))
            for qi, qw, di, dw, _ in launches
        )
        hbm = sum(di.nbytes + dw.nbytes for _, _, di, dw, _ in launches)
        t0 = time.perf_counter()
        tot = run(args_list)
        float(tot)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(args_list))
        per = (time.perf_counter() - t0) / REPS
        print(
            f"{name:10s} hbm={hbm/2**20:7.1f}MiB compile={compile_s:5.1f}s "
            f"per_batch={per*1e3:7.2f}ms QPS={B/per:7.1f}",
            file=sys.stderr,
        )

    # flat layout: one [N, 128] launch
    measure("flat", [(q_ids, q_w, slot_ids, slot_w, None)])
    # bucketed: [N_short, 16] + [N_long, 128]
    launches = []
    for bound, width in zip(bounds, (16, 128)):
        rows = np.nonzero(counts == width)[0]
        launches.append((q_ids, q_w, slot_ids[rows, :width].copy(), slot_w[rows, :width].copy(), rows))
    measure("bucketed", launches)


if __name__ == "__main__":
    main()
