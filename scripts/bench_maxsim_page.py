"""Page-scale MaxSim: chunked-matmul Pallas v2 vs the XLA scan.

The mm_docs chunking in ``maxsim_topk_pallas_v2`` keeps the live f32 S
chunk ~4MB so the kernel compiles at ViDoRe page scale (Td=1024), where the
un-chunked block would need a [BN*1024, 256] f32 S in VMEM. This measures
the dispatch crossover in Td (the XLA scan wins at Td=128 bf16, the chunked
kernel at Td=1024) and re-checks exactness per config.

Corpus is generated ON DEVICE (normal + normalize) — no tunnel H2D.

Run: python scripts/bench_maxsim_page.py [--n 10000] [--td 256 512 1024]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.maxsim import (  # noqa: E402
    maxsim_topk_pallas_v2,
    maxsim_topk_xla,
)
from autorag_research_tpu.utils.profiling import KernelTimer  # noqa: E402

B, TQ, D, K, REPS = 8, 32, 128, 10, 10


def device_corpus(n, td, dtype, seed=0):
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def gen(key):
        d = jax.random.normal(key, (n, td, D), dtype=jnp.float32)
        d = d / jnp.linalg.norm(d, axis=2, keepdims=True)
        return d.astype(dtype)

    docs = gen(key)
    docs.block_until_ready()
    return docs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--td", type=int, nargs="+", default=[256, 512, 1024])
    ap.add_argument("--dtypes", nargs="+", default=["bf16", "f32"])
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((REPS, B, TQ, D), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=3, keepdims=True)
    q_lens = np.full((REPS, B), TQ, np.int32)
    ql_d = jnp.asarray(q_lens)
    timer = KernelTimer(REPS)

    results = {}
    for td in args.td:
        doc_lens = rng.integers(td // 2, td + 1, size=args.n).astype(np.int32)
        dlens_d = jax.device_put(jnp.asarray(doc_lens))
        for dts in args.dtypes:
            dt = jnp.bfloat16 if dts == "bf16" else jnp.float32
            docs_d = device_corpus(args.n, td, dt)
            q_d = jnp.asarray(queries, dtype=dt)

            def measure(label, fn):
                try:
                    dt_s = timer.measure(
                        lambda x, d_, dl: fn(x[0], x[1], d_, dl),
                        (q_d, ql_d), docs_d, dlens_d,
                    )
                except Exception as exc:  # noqa: BLE001
                    print(f"{label:34s} FAILED: {str(exc)[:160]}", file=sys.stderr)
                    return None
                qps = B / dt_s
                print(
                    f"{label:34s} {dt_s * 1e3:8.2f} ms/batch  {qps:8.1f} QPS",
                    file=sys.stderr,
                )
                return round(qps, 1)

            tag = f"td{td}_{dts}"
            results[f"xla_{tag}"] = measure(
                f"xla scan td={td} {dts}",
                lambda q, ql, d_, dl: maxsim_topk_xla(q, ql, d_, dl, K),
            )
            bns = (8, 16) if dts == "bf16" else (8,)
            for bn in bns:
                results[f"v2_bn{bn}_{tag}"] = measure(
                    f"pallas v2 bn={bn} td={td} {dts}",
                    lambda q, ql, d_, dl, bn=bn: maxsim_topk_pallas_v2(
                        q, ql, d_, dl, K, block_n=bn
                    ),
                )
                # per-config exactness (separate try: one bad config must
                # not mask another's check)
                try:
                    s0, i0 = maxsim_topk_xla(q_d[0], ql_d[0], docs_d, dlens_d, K)
                    s1, i1 = maxsim_topk_pallas_v2(
                        q_d[0], ql_d[0], docs_d, dlens_d, K, block_n=bn
                    )
                    same = bool(np.array_equal(np.asarray(i0), np.asarray(i1)))
                    print(f"  ids v2(bn={bn}) == xla @ {tag}: {same}", file=sys.stderr)
                    results[f"ids_match_bn{bn}_{tag}"] = same
                except Exception as exc:  # noqa: BLE001
                    print(f"  spot-check {tag} failed: {str(exc)[:120]}", file=sys.stderr)
            del docs_d

    print({"metric": "maxsim_page_sweep", "n": args.n, **results})


if __name__ == "__main__":
    main()
