"""IVF vs batched exact at 2M x 768 on the real TPU (the scale where ANN
should start paying). Run: python scripts/bench_ann_scale.py [--n 2000000]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--q", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from autorag_research_tpu.index.ivf import IVFIndex
    from autorag_research_tpu.ops.dense import dense_topk

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    # clustered synthetic (ANN-favorable but realistic for embeddings)
    centers = rng.normal(size=(2000, args.d)).astype(np.float32)
    assign = rng.integers(0, 2000, args.n)
    corpus = centers[assign] + rng.normal(size=(args.n, args.d)).astype(np.float32) * 0.3
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = centers[rng.integers(0, 2000, args.q)] + \
        rng.normal(size=(args.q, args.d)).astype(np.float32) * 0.3
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    print(f"corpus {args.n}x{args.d} = {corpus.nbytes/2**30:.1f} GiB", file=sys.stderr)

    c_d = jnp.asarray(corpus)
    q_d = jnp.asarray(queries)

    # exact (auto dispatch)
    @jax.jit
    def run_exact(q, c):
        def step(cr, t):
            s, i = dense_topk(q * (1.0 + 1e-6 * t), c, args.k)
            return cr + s.sum(), i
        tot, ids = jax.lax.scan(step, 0.0, jnp.arange(args.reps, dtype=jnp.float32))
        return tot, ids[0]

    t0 = time.perf_counter()
    tot, exact_ids = run_exact(q_d, c_d)
    float(tot)
    print(f"exact compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    tot, exact_ids = run_exact(q_d, c_d)
    float(tot)
    per = (time.perf_counter() - t0) / args.reps
    exact_ids = np.asarray(exact_ids)
    print(f"exact    per_batch={per*1e3:7.1f}ms QPS={args.q/per:8.1f}", file=sys.stderr)

    # IVF
    t0 = time.perf_counter()
    ivf = IVFIndex(list(range(args.n)), corpus)
    print(f"ivf build: {time.perf_counter()-t0:.1f}s "
          f"(cells={ivf.n_cells}, pad={ivf.cell_pad})", file=sys.stderr)
    del c_d
    for nprobe in (ivf.nprobe, ivf.nprobe * 2):
        hits = ivf.search(queries[:2], args.k, nprobe=nprobe)  # warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            hits = ivf.search(queries, args.k, nprobe=nprobe)
        per = (time.perf_counter() - t0) / args.reps
        got = np.array([[h.doc_id for h in row] + [-1] * (args.k - len(row)) for row in hits])
        recall = np.mean([
            len(set(got[i]) & set(exact_ids[i])) / args.k for i in range(args.q)
        ])
        print(f"ivf np={nprobe:4d} per_batch={per*1e3:7.1f}ms QPS={args.q/per:8.1f} "
              f"recall@{args.k}={recall:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
