"""Verified-exact MaxSim bench: bf16 prescreen + bound-checked exact rescore
vs the f32 exact engines (ops/maxsim.maxsim_topk_verified).

Motivation: exact f32 MaxSim is the weakest hot path (253 QPS pallas_v2 @
50k x 128tok vs the bf16 scan's 596) — the verified design should serve
EXACT results at roughly bf16-prescreen speed, like the dense flagship.

Sustained timing (KernelTimer). Run:
  python scripts/bench_maxsim_verified.py [--n 50000 --td 128]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.maxsim import (  # noqa: E402
    _maxsim_topk_verified,
    build_maxsim_sidecar,
    maxsim_topk_pallas_v2,
    maxsim_topk_xla,
)
from autorag_research_tpu.utils.profiling import KernelTimer  # noqa: E402

B, TQ, D, K, REPS = 8, 32, 128, 10, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--td", type=int, default=128)
    ap.add_argument(
        "--device-gen",
        action="store_true",
        help="generate the corpus and sidecar maxima ON DEVICE — required at "
        "page scale, where host gen + tunnel H2D of the f32+bf16 corpora "
        "(~7.8GB at 10k x 1024) would dominate. Measurement-only: the "
        "device maxima are f32 with a 1.01 inflation instead of the "
        "production host-f64 rounded-up bounds (a wider bound only raises "
        "the fail rate, never breaks the proof).",
    )
    ap.add_argument("--kp", type=int, nargs="+", default=[16, 32, 64, 128])
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    doc_lens = rng.integers(args.td // 2, args.td + 1, size=args.n).astype(np.int32)
    queries = rng.standard_normal((REPS, B, TQ, D), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=3, keepdims=True)
    q_lens = np.full((REPS, B), TQ, np.int32)

    if args.device_gen:
        dlens_d = jax.device_put(jnp.asarray(doc_lens))

        @jax.jit
        def gen(key, dlens):
            d = jax.random.normal(key, (args.n, args.td, D), dtype=jnp.float32)
            d = d / jnp.linalg.norm(d, axis=2, keepdims=True)
            tok = jnp.arange(args.td)[None, :] < dlens[:, None]
            return d * tok[:, :, None].astype(jnp.float32)

        @jax.jit
        def to_lo(d):
            return d.astype(jnp.bfloat16)

        # residuals in a SEPARATE jit from the bf16 cast: fused, XLA folds
        # f32->bf16->f32 to identity and r_max silently reads 0, which
        # unbudgets the doc-side prescreen error in eps
        @jax.jit
        def stats(d, lo, dlens):
            resid = d - lo.astype(jnp.float32)
            tok = jnp.arange(args.td)[None, :] < dlens[:, None]
            rn = jnp.sqrt((resid * resid).sum(axis=2)) * tok
            dn = jnp.sqrt((d * d).sum(axis=2)) * tok
            return rn.max(), dn.max()

        docs_d = gen(jax.random.PRNGKey(0), dlens_d)
        lo_d = to_lo(docs_d)
        r_dev, nd_dev = stats(docs_d, lo_d, dlens_d)
        side = {
            "r_max": float(r_dev) * 1.01,
            "nd_max": float(nd_dev) * 1.01,
        }
        assert side["r_max"] > 0.0, "doc-side residual must be budgeted" 
        print(
            f"device-gen sidecar: r_max={side['r_max']:.5f} "
            f"nd_max={side['nd_max']:.5f}",
            file=sys.stderr,
        )
    else:
        docs = rng.standard_normal((args.n, args.td, D), dtype=np.float32)
        docs /= np.linalg.norm(docs, axis=2, keepdims=True)
        tok = np.arange(args.td)[None, :] < doc_lens[:, None]
        docs *= tok[:, :, None]

        print("building sidecar ...", file=sys.stderr)
        side = build_maxsim_sidecar(docs, doc_lens)
        print(f"r_max={side['r_max']:.5f} nd_max={side['nd_max']:.5f}", file=sys.stderr)

        docs_d = jax.device_put(jnp.asarray(docs))
        lo_d = jax.device_put(jnp.asarray(side["docs_lo"]))
        dlens_d = jax.device_put(jnp.asarray(doc_lens))
    q_d = jnp.asarray(queries)
    ql_d = jnp.asarray(q_lens)

    timer = KernelTimer(REPS)
    results = {}

    def measure(label, fn, *extra):
        try:
            dt_s = timer.measure(
                lambda x, *rest: fn(x[0], x[1], *rest), (q_d, ql_d), docs_d, dlens_d, *extra
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{label:26s} FAILED: {str(exc)[:200]}", file=sys.stderr)
            return None
        qps = B / dt_s
        print(f"{label:26s} {dt_s * 1e3:8.2f} ms/batch  {qps:8.1f} QPS", file=sys.stderr)
        return round(qps, 1)

    results["exact_xla"] = measure(
        "exact f32 xla scan", lambda q, ql, d_, dl: maxsim_topk_xla(q, ql, d_, dl, K)
    )
    results["exact_pallas_v2"] = measure(
        "exact f32 pallas v2 bn16",
        lambda q, ql, d_, dl: maxsim_topk_pallas_v2(q, ql, d_, dl, K, block_n=16),
    )
    results["prescreen_bf16"] = measure(
        "bf16 xla scan (prescreen rate)",
        lambda q, ql, d_, dl: maxsim_topk_xla(
            q.astype(jnp.bfloat16), ql, d_.astype(jnp.bfloat16), dl, K
        ),
    )
    for kp in args.kp:
        results[f"verified_kp{kp}"] = measure(
            f"VERIFIED kprime={kp}",
            lambda q, ql, d_, dl, lo, kp=kp: _maxsim_topk_verified(
                q, ql, d_, dl, lo,
                jnp.float32(side["nd_max"]), jnp.float32(side["r_max"]),
                K, kp, 0,
            )[:2],
            lo_d,
        )

    # correctness + fail-rate spot check over all REPS batches
    for kp in args.kp:
        fails = 0
        mism = 0
        for r in range(REPS):
            es, ei = maxsim_topk_xla(q_d[r], ql_d[r], docs_d, dlens_d, K)
            vs, vi, nf, cov = _maxsim_topk_verified(
                q_d[r], ql_d[r], docs_d, dlens_d, lo_d,
                jnp.float32(side["nd_max"]), jnp.float32(side["r_max"]),
                K, kp, 0,
            )
            fails += int(nf)
            mism += int((np.asarray(vi) != np.asarray(ei)).sum())
        print(
            f"verified kp={kp}: fails={fails}/{REPS * B} "
            f"id mismatches={mism}/{REPS * B * K}",
            file=sys.stderr,
        )
        results[f"fails_kp{kp}"] = fails
        results[f"id_mismatches_kp{kp}"] = mism
    print({"metric": "maxsim_verified", "n": args.n, "td": args.td, **results})


if __name__ == "__main__":
    main()
