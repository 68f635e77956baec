"""Headline benchmark: dense exact top-k retrieval QPS on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Method: BEIR-scale synthetic corpus (500k docs x 768-dim f32, L2-normalized —
the reference's pgvector layout is f32; exact scan, not ANN), query batches of
256, sustained throughput measured with the repeat loop *inside* one jit call
(per-call tunnel latency would otherwise dominate; see SKILL notes).

vs_baseline: the reference executes one exact scan per query inside Postgres
(`ORDER BY embedding <=> q LIMIT k`, orm/repository/base.py:404-426). As the
reference publishes no numbers (BASELINE.md), the baseline is *measured here*:
the same exact top-k computed per query on this host's CPU with numpy — an
upper bound on single-process CPU exact-scan QPS, which is the reference's
algorithmic shape. vs_baseline = tpu_qps / cpu_qps.

Details go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def cpu_baseline_qps(corpus: np.ndarray, queries: np.ndarray, k: int) -> float:
    """Reference-shaped cost: one exact scan + top-k per query on CPU."""
    n_queries = min(8, len(queries))
    t0 = time.perf_counter()
    for q in queries[:n_queries]:
        scores = corpus @ q
        idx = np.argpartition(-scores, k)[:k]
        idx[np.argsort(-scores[idx])]
    dt = time.perf_counter() - t0
    return n_queries / dt


def probe_device(timeout_s: float = 240.0) -> None:
    """Fail fast (one JSON error line) when the TPU tunnel is unreachable.

    ``jax.devices()`` through a dead axon relay blocks FOREVER — without this
    probe the whole bench (and the driver running it) hangs instead of
    reporting. Probed in a subprocess so the hang can be bounded."""
    import subprocess

    try:
        out = subprocess.run(
            [
                sys.executable,
                "-c",
                # a silent CPU fallback must NOT publish host-CPU numbers
                # under the TPU flagship metric
                "import jax; ds = jax.devices(); "
                "assert ds[0].platform != 'cpu', f'cpu fallback: {ds}'; "
                "print(ds)",
            ],
            timeout=timeout_s, capture_output=True, text=True,
        )
        if out.returncode == 0:
            log(f"devices: {out.stdout.strip().splitlines()[-1]}")
            return
        err = (out.stderr or "").strip().splitlines()[-1:] or ["unknown"]
        reason = f"device init failed: {err[0]}"
    except subprocess.TimeoutExpired:
        reason = f"device init timed out after {timeout_s:.0f}s (axon tunnel down?)"
    print(
        json.dumps(
            {
                "metric": "dense_exact_top10_qps_500k_x768",
                "value": 0,
                "unit": "queries/sec",
                "vs_baseline": 0,
                "error": reason,
            }
        ),
        flush=True,
    )
    log(f"ABORT: {reason}")
    sys.exit(1)


def main() -> None:
    probe_device()

    import jax
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import dense_topk

    # B=1024: the verified prescreen is corpus-traffic-bound, so larger query
    # batches amortize the corpus read — measured 57.0k QPS @ Q=1024 m=64 j=2
    # vs 54.9k @ Q=256 m=64 j=1 (/tmp sweep on this exact seed, 2026-08-20)
    N, d, B, K, REPS = 500_000, 768, 1024, 10, 20
    rng = np.random.default_rng(0)
    log(f"building corpus {N}x{d} f32 ...")
    corpus = rng.normal(size=(N, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(REPS, B, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    log("measuring CPU exact-scan baseline ...")
    baseline_qps = cpu_baseline_qps(corpus, queries[0], K)
    log(f"cpu exact-scan baseline: {baseline_qps:.1f} QPS")

    log("transferring to TPU + compiling ...")
    # one shared f32 corpus + query transfer — 1.5GB over the ~17MB/s tunnel
    # costs ~90s per device_put, so every stage must reuse these
    corpus_dev = jax.device_put(jnp.asarray(corpus))
    queries_dev = jax.device_put(jnp.asarray(queries))

    def sustained(qs_host, c_host, method="auto"):
        cj = corpus_dev if c_host is corpus else jax.device_put(jnp.asarray(c_host))
        qj = queries_dev if qs_host is queries else jax.device_put(jnp.asarray(qs_host))

        @jax.jit
        def run(qs, c):
            s, i = jax.lax.map(lambda q: dense_topk(q, c, K, method=method), qs)
            return s.sum(), s, i

        tot, scores, ids = run(qj, cj)
        float(tot)  # force full execution (block_until_ready is lazy over the tunnel)
        t0 = time.perf_counter()
        tot, scores, ids = run(qj, cj)
        float(tot)
        return (time.perf_counter() - t0) / REPS, np.asarray(scores), np.asarray(ids)

    dt, scores_exact, ids_exact = sustained(queries, corpus)
    qps_full = B / dt
    tflops = 2 * B * N * d / dt / 1e12
    log(
        f"tpu dense exact top-{K} (full f32 HIGHEST scan): {dt * 1e3:.2f} ms / "
        f"{B}-query batch, {qps_full:,.0f} QPS, {tflops:.1f} TFLOP/s"
    )

    # verified-exact fast path (ops/dense.dense_topk_verified): bf16 Pallas
    # prescreen + per-segment stats + bound-checked f32 HIGHEST rescore.
    # Results are verified per query and fall back to the full scan when the
    # coverage proof fails, so this IS the exact mode — the flagship metric
    # reports it, guarded by an ids-equality check against the full scan.
    qps = qps_full
    try:
        from autorag_research_tpu.ops.dense import (
            _dense_topk_verified,
            build_verified_sidecar,
        )

        side = build_verified_sidecar(corpus, rep="bf16", pad_rows_to=4096)
        lo = jax.device_put(jnp.asarray(side["corpus_lo"]))
        cj = corpus_dev
        qj = queries_dev

        @jax.jit
        def run_v(qs, c, lo):
            def one(q):
                # m=64 j=2: fastest 0-fallback config at Q=1024 on this seed
                # (57.0k; j=1 hits 3/20 batch fallbacks — each costs a full
                # exact scan — and drops to 49.3k; raising m alone does NOT
                # clear the fails, the second-chance segment leg does).
                # Exactness never depends on the knobs — failures re-run
                # exactly, and the ids-equality guard below reverts the
                # flagship to the full-scan number on any real divergence.
                s, i, n_fail, covered = _dense_topk_verified(
                    q, c, lo, None,
                    jnp.float32(side["nd_max"]), jnp.float32(side["r_max"]),
                    K, 64, 2, 128, 0, "pallas",
                )
                return s, i, n_fail, covered

            s, i, nf, cov = jax.lax.map(one, qs)
            return s.sum(), s, i, nf, cov

        tot, sv, ids_v, nf, cov = run_v(qj, cj, lo)
        float(tot)
        t0 = time.perf_counter()
        tot, sv, ids_v, nf, cov = run_v(qj, cj, lo)
        float(tot)
        dt_v = (time.perf_counter() - t0) / REPS
        ids_v = np.asarray(ids_v)
        sv = np.asarray(sv)
        mism = ids_v != ids_exact
        # sub-ulp near-ties may ORDER differently between f32 HIGHEST
        # reduction splits — the full scan itself orders such pairs
        # differently at batch 1 vs batch 256 (measured: a 1.5e-8 pair,
        # docs/BENCHMARKS.md). Any mismatch beyond ulp scale is a real bug
        # and reverts the flagship to the full-scan number.
        ulp_ok = bool(
            (np.abs(sv[mism] - scores_exact[mism]) <= 4e-7 * (1 + np.abs(scores_exact[mism]))).all()
        )
        if ulp_ok:
            qps = B / dt_v
            log(
                f"tpu dense exact top-{K} (VERIFIED fast path): {dt_v * 1e3:.2f} ms "
                f"/ batch, {qps:,.0f} QPS ({qps / qps_full:.2f}x the full scan; "
                f"fails={int(np.asarray(nf).sum())}/{REPS * B}, "
                f"fallbacks={REPS - int(np.asarray(cov).sum())}/{REPS}, "
                f"id mismatches {int(mism.sum())}/{ids_exact.size} all sub-ulp near-ties)"
            )
        else:
            log("verified fast path DIVERGED beyond ulp scale — reporting the full-scan number")
    except Exception as exc:  # noqa: BLE001 - flagship must fall back to the full-scan number
        log(f"verified fast path skipped: {exc}")
    # fast mode: bf16 scores + approx_max_k fused k-selection
    # (ops/dense.dense_topk_approx — measured 3.1x the exact-top_k bf16 path)
    dt16, _, ids_fast = sustained(
        queries.astype(np.float32).astype(jnp.bfloat16),
        corpus.astype(jnp.bfloat16),
        method="approx",
    )
    agree = np.mean(
        [
            len(set(map(int, a)) & set(map(int, b))) / K
            for ra, rb in zip(ids_exact, ids_fast)
            for a, b in zip(ra, rb)
        ]
    )
    log(
        f"tpu dense top-{K} (bf16 fast mode, approx_max_k): {dt16 * 1e3:.2f} ms "
        f"/ batch, {B / dt16:,.0f} QPS ({agree:.1%} top-10 agreement with exact)"
    )
    # int8 serving mode: per-row symmetric quant corpus, s8 MXU matmul
    # (ops/dense.dense_topk_int8 — measured 1.26x bf16 at Q=1024; 4x corpus
    # HBM capacity). Secondary detail row, never the flagship metric.
    try:
        from autorag_research_tpu.ops.dense import dense_topk_int8, quantize_int8

        cq_h, cs_h = quantize_int8(corpus)
        cq = jax.device_put(jnp.asarray(cq_h))
        cs = jax.device_put(jnp.asarray(cs_h))
        qj = queries_dev

        @jax.jit
        def run_i8(qs, a, b):
            s, i = jax.lax.map(lambda q: dense_topk_int8(q, a, b, K), qs)
            return s.sum(), i

        tot, ids8 = run_i8(qj, cq, cs)
        float(tot)
        t0 = time.perf_counter()
        tot, ids8 = run_i8(qj, cq, cs)
        float(tot)
        dt8 = (time.perf_counter() - t0) / REPS
        agree8 = np.mean(
            [
                len(set(map(int, a)) & set(map(int, b))) / K
                for ra, rb in zip(ids_exact, np.asarray(ids8))
                for a, b in zip(ra, rb)
            ]
        )
        log(
            f"tpu dense top-{K} (int8 serving mode): {dt8 * 1e3:.2f} ms / batch, "
            f"{B / dt8:,.0f} QPS ({agree8:.1%} top-10 agreement with exact)"
        )
    except Exception as exc:  # noqa: BLE001 - detail row must not break bench
        log(f"int8 detail row skipped: {exc}")

    # secondary metric: index-build embedding throughput with the native
    # JAX encoder (BASELINE.md "index build docs/sec")
    try:
        from autorag_research_tpu.embeddings.jax_encoder import JaxEncoderEmbedding
        from autorag_research_tpu.models.encoder import EncoderConfig

        encoder = JaxEncoderEmbedding(
            EncoderConfig(hidden=512, layers=6, heads=8, max_len=128, out_dim=768),
            batch_size=512,
        )
        docs = [f"synthetic document number {i} about topic {i % 97}" for i in range(8192)]
        encoder.embed_texts(docs[:512])  # compile
        t0 = time.perf_counter()
        encoder.embed_texts(docs)
        build_dt = time.perf_counter() - t0
        log(
            f"tpu index-build embedding (512h/6L encoder, seq 128): "
            f"{len(docs) / build_dt:,.0f} docs/sec"
        )
    except Exception as exc:  # noqa: BLE001 - secondary metric must not break bench
        log(f"index-build metric skipped: {exc}")
    result = {
        "metric": f"dense_exact_top{K}_qps_{N // 1000}k_x{d}",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / baseline_qps, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
