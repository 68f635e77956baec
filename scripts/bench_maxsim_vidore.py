"""MaxSim at ViDoRe page scale: ~1k patch vectors per page (ColPali regime).

Reference capability: VectorChord ``@#`` over VECTOR(128)[] arrays of ~1030
patches/page (``orm/repository/base.py:487-571``). This measures the exact
XLA-scan kernel (tile sweep) and the two-stage proxy-prefilter +
maxsim_rerank path, f32 and bf16 docs, with per-call query perturbation
(anti-LICM) and forced host readback.

Run: python scripts/bench_maxsim_vidore.py [--n 10000] [--reps 5]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from autorag_research_tpu.ops.dense import dense_topk  # noqa: E402
from autorag_research_tpu.ops.maxsim import maxsim_rerank, maxsim_topk_xla  # noqa: E402

TD, D, B, TQ, K = 1024, 128, 8, 32, 10


def to_device_chunked(arr, dtype, chunk_rows=1000):
    """Large one-shot transfers wedge the axon tunnel; stream in ~0.5GB pieces."""
    parts = []
    for lo in range(0, arr.shape[0], chunk_rows):
        # ship in the host dtype and cast ON DEVICE: ml_dtypes' host-side
        # f32->bf16 conversion is single-threaded and dominates the transfer
        part = jax.device_put(jnp.asarray(arr[lo : lo + chunk_rows])).astype(dtype)
        _ = float(part.ravel()[0])  # force the chunk through before the next
        parts.append(part)
        print(f"  transferred {min(lo + chunk_rows, arr.shape[0])}/{arr.shape[0]} rows",
              file=sys.stderr, flush=True)
    out = jnp.concatenate(parts, axis=0)
    _ = float(out.ravel()[0])
    return out


def timed(fn, qs, reps):
    # warmup + compile on the first query batch
    out = fn(qs[0])
    _ = float(np.asarray(out[0]).sum())
    t0 = time.perf_counter()
    for r in range(reps):
        out = fn(qs[1 + r])  # distinct inputs defeat hoisting
        _ = float(np.asarray(out[0]).sum())
    per = (time.perf_counter() - t0) / reps
    return per, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiles", default="128,256,512")
    ap.add_argument("--prefilters", default="5,10,20")
    ap.add_argument("--dtype", default="both", choices=["both", "f32", "bf16"])
    args = ap.parse_args()
    n = args.n

    print(f"devices: {jax.devices()}  corpus {n} pages x {TD} patches x {D}d",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    # clustered corpus so proxy prefilter recall is non-trivial but realistic;
    # f32 standard_normal + chunked build (float64 gen at this size takes
    # minutes and doubles host RAM)
    centers = rng.standard_normal((256, D), dtype=np.float32)
    docs = np.empty((n, TD, D), dtype=np.float32)
    for lo in range(0, n, 1000):
        hi = min(lo + 1000, n)
        noise = rng.standard_normal((hi - lo, TD, D), dtype=np.float32)
        chunk = centers[rng.integers(0, 256, size=hi - lo)][:, None, :] + 0.7 * noise
        docs[lo:hi] = chunk / np.linalg.norm(chunk, axis=2, keepdims=True)
    lens = np.full(n, TD, np.int32)
    qs = []
    for r in range(args.reps + 1):
        q = centers[rng.integers(0, 256, size=B)][:, None, :] + 0.7 * rng.standard_normal(
            (B, TQ, D), dtype=np.float32
        )
        qs.append((q / np.linalg.norm(q, axis=2, keepdims=True)).astype(np.float32))
    qlens = jnp.asarray(np.full(B, TQ, np.int32))

    results = {}
    dtypes = [("f32", jnp.float32), ("bf16", jnp.bfloat16)]
    if args.dtype != "both":
        dtypes = [(x, t) for x, t in dtypes if x == args.dtype]
    for dtype_name, dtype in dtypes:
        docs_d = to_device_chunked(docs, dtype)
        lens_d = jnp.asarray(lens)
        gb = docs_d.size * docs_d.dtype.itemsize / 1e9
        print(f"--- docs dtype {dtype_name} ({gb:.1f} GB on device)", file=sys.stderr)

        exact_ids = None
        for tile in [int(t) for t in args.tiles.split(",")]:
            fn = lambda q, tile=tile: maxsim_topk_xla(
                jnp.asarray(q, dtype=dtype), qlens, docs_d, lens_d, K, tile_n=tile
            )
            try:
                per, out = timed(fn, qs, args.reps)
            except Exception as e:  # noqa: BLE001
                print(f"exact tile={tile}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
                continue
            qps = B / per
            if exact_ids is None:
                exact_ids = np.asarray(out[1])
            results[f"exact_{dtype_name}_t{tile}"] = qps
            print(
                f"exact tile={tile:5d}: {per * 1e3:8.1f} ms/batch  {qps:7.1f} QPS",
                file=sys.stderr,
            )

        proxies = l2n(docs.astype(np.float32).sum(axis=1) / TD)
        proxies_d = jnp.asarray(proxies, dtype=dtype)
        for m in [int(x) for x in args.prefilters.split(",")]:
            n_cand = min(n, K * m)

            def fn(q, n_cand=n_cand):
                qd = jnp.asarray(q, dtype=dtype)
                q_proxy = qd.sum(axis=1) / TQ
                q_proxy = q_proxy / jnp.linalg.norm(q_proxy, axis=1, keepdims=True)
                _, cand = dense_topk(q_proxy, proxies_d, n_cand)
                return maxsim_rerank(qd, qlens, docs_d, lens_d, cand, K)

            per, out = timed(fn, qs, args.reps)
            qps = B / per
            ids = np.asarray(out[1])
            rec = (
                float((ids[:, :K] == exact_ids[:, :K]).mean())
                if exact_ids is not None
                else float("nan")
            )
            results[f"prefilter{m}_{dtype_name}"] = qps
            print(
                f"prefilter M={m:3d} (C={n_cand:4d}): {per * 1e3:8.1f} ms/batch "
                f"{qps:7.1f} QPS  recall@{K} vs exact={rec:.3f}",
                file=sys.stderr,
            )
        del docs_d, proxies_d  # free HBM before the next dtype's corpus

    print({"metric": "maxsim_vidore_qps", "n": n, **{k: round(v, 1) for k, v in results.items()}})


def l2n(x):
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


if __name__ == "__main__":
    main()
