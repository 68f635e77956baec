"""Two-stage MaxSim (proxy prefilter -> exact rerank) vs full scan on the
real TPU (50k docs x 128 tokens x 128d). Reports QPS and recall@10 vs exact.
Run: python scripts/bench_maxsim_prefilter.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

N, TD, D, B, TQ, K = 50_000, 128, 128, 8, 32, 10
REPS = 10


def main():
    import jax
    import jax.numpy as jnp

    from autorag_research_tpu.index.dense import l2_normalize
    from autorag_research_tpu.ops.dense import dense_topk
    from autorag_research_tpu.ops.maxsim import maxsim_rerank, maxsim_topk_xla

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    # clustered docs so the proxy carries signal (like real embeddings)
    centers = rng.normal(size=(500, D)).astype(np.float32)
    assign = rng.integers(0, 500, N)
    docs = centers[assign][:, None, :] + rng.normal(size=(N, TD, D)).astype(np.float32) * 0.7
    docs = docs / np.linalg.norm(docs, axis=2, keepdims=True)
    lens = np.full(N, TD, np.int32)
    q = centers[rng.integers(0, 500, B)][:, None, :] + \
        rng.normal(size=(B, TQ, D)).astype(np.float32) * 0.7
    q = q / np.linalg.norm(q, axis=2, keepdims=True)
    qlens = np.full(B, TQ, np.int32)
    proxies = l2_normalize(docs.sum(axis=1) / TD)
    q_proxy = l2_normalize(q.sum(axis=1) / TQ)

    docs_d, lens_d = jnp.asarray(docs), jnp.asarray(lens)
    q_d, qlens_d = jnp.asarray(q), jnp.asarray(qlens)
    prox_d, qprox_d = jnp.asarray(proxies), jnp.asarray(q_proxy)

    def timed(fn):
        # docs/proxies are jit ARGUMENTS — closing over them captures GBs of
        # constants into the HLO (remote-compile 413)
        @jax.jit
        def run(qq, ql, qp, dd, ll, pp):
            def step(c, t):
                s, i = fn(qq, ql, qp, dd, ll, pp, t)
                return c + s.sum(), i
            tot, ids = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.float32))
            return tot, ids[0]

        t0 = time.perf_counter()
        tot, ids = run(q_d, qlens_d, qprox_d, docs_d, lens_d, prox_d)
        float(tot)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        tot, ids = run(q_d, qlens_d, qprox_d, docs_d, lens_d, prox_d)
        float(tot)
        per = (time.perf_counter() - t0) / REPS
        return np.asarray(ids), per, compile_s

    def full(qq, ql, qp, dd, ll, pp, t):
        return maxsim_topk_xla(qq * (1.0 + 1e-7 * t), ql, dd, ll, K)

    exact_ids, per, comp = timed(full)
    print(f"full      compile={comp:6.1f}s per_batch={per*1e3:7.1f}ms QPS={B/per:7.1f}",
          file=sys.stderr)

    for mult in (8, 32, 128):
        n_cand = K * mult

        def two_stage(qq, ql, qp, dd, ll, pp, t):
            _, cand = dense_topk(qp * (1.0 + 1e-7 * t), pp, n_cand)
            return maxsim_rerank(qq, ql, dd, ll, cand, K)

        ids, per, comp = timed(two_stage)
        recall = np.mean([
            len(set(ids[i]) & set(exact_ids[i])) / K for i in range(B)
        ])
        print(f"prefilter x{mult:3d} (C={n_cand:5d}) compile={comp:5.1f}s "
              f"per_batch={per*1e3:7.1f}ms QPS={B/per:7.1f} recall@10={recall:.3f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
