"""End-to-end serving throughput on the real TPU: HTTP -> micro-batcher ->
one batched embed + dense kernel launch per coalesced batch.

Run: python scripts/bench_serving.py [--docs 100000 --clients 32 --requests 960]
Prints steady-state QPS and latency percentiles.
"""

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--requests", type=int, default=960)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--window-ms", type=float, default=5.0)
    ap.add_argument(
        "--sweep", type=str, default=None,
        help="comma list of 'inflight:clients' configs measured in ONE "
        "process (reuses the ingest + compiled index), e.g. "
        "'2:32,3:32,4:32,2:128,3:128'; overrides --inflight/--clients",
    )
    ap.add_argument(
        "--inflight", type=int, default=3,
        help="max concurrently executing batches (pipelining depth; ~90%% "
        "of a batch's cost is dispatch round-trip, so depth d can hide "
        "d-1 RTTs)",
    )
    ap.add_argument(
        "--fast", action="store_true",
        help="vector_search_fast profile: approx_max_k + bf16 corpus",
    )
    ap.add_argument(
        "--profile", choices=["exact", "fast", "int8", "verified"], default=None,
        help="index profile (exact f32 | bf16 approx | int8 quantized corpus | "
        "verified-exact fast path); --fast is shorthand for --profile fast",
    )
    args = ap.parse_args()
    if args.fast and args.profile and args.profile != "fast":
        ap.error("--fast conflicts with --profile " + args.profile)
    profile = args.profile or ("fast" if args.fast else "exact")

    import jax

    print("devices:", jax.devices(), file=sys.stderr)

    from autorag_research_tpu.embeddings.base import MockEmbedding
    from autorag_research_tpu.index import registry
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchPipeline
    from autorag_research_tpu.serving.server import ServingHandle
    from autorag_research_tpu.store.catalog import Catalog
    from autorag_research_tpu.store.ingestion import IngestionService

    import tempfile

    registry.invalidate()
    tmp = Path(tempfile.mkdtemp(prefix="serve_bench_"))
    cat = Catalog(tmp / "catalog.db")
    emb = MockEmbedding(dim=args.dim)

    t0 = time.perf_counter()
    cat.add_chunks(
        [{"id": i, "contents": f"document {i} topic {i % 997}"} for i in range(args.docs)]
    )
    svc = IngestionService(cat)
    stats = svc.embed_all(emb, batch_size=4096)
    print(
        f"ingest+embed {args.docs} docs in {time.perf_counter()-t0:.1f}s "
        f"({stats['chunk'].embedded} embedded)",
        file=sys.stderr,
    )

    index_options = {
        "exact": None,
        "fast": {"mode": "approx", "dtype": "bfloat16"},
        "int8": {"mode": "int8"},
        # verified: serves results IDENTICAL to exact (coverage-proof rescore,
        # ops/dense.dense_topk_verified) at prescreen speed
        "verified": {"mode": "verified"},
    }[profile]
    pipe = VectorSearchPipeline(
        cat, "dense_serve", embedding_model=emb, index_options=index_options
    )
    configs = (
        [tuple(map(int, c.split(":"))) for c in args.sweep.split(",")]
        if args.sweep
        else [(args.inflight, args.clients)]
    )
    for inflight, clients in configs:
        _run_config(cat, pipe, args, profile, inflight, clients)


def _run_config(cat, pipe, args, profile, inflight, clients):
    import json
    import threading
    import time
    import urllib.request

    from autorag_research_tpu.serving.server import ServingHandle

    handle = ServingHandle(
        cat, {"dense": pipe}, batch_window_ms=args.window_ms,
        include_contents=False, max_inflight=inflight,
    ).start(port=0)
    url = f"http://127.0.0.1:{handle.port}/search"
    requests_total = args.requests * max(1, clients // 32)

    def do_request(q, retries=3, timeout=120):
        req = urllib.request.Request(
            url,
            data=json.dumps({"query": q, "top_k": args.top_k}).encode(),
            headers={"Content-Type": "application/json"},
        )
        for attempt in range(retries + 1):
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    return json.loads(resp.read())
            except (ConnectionResetError, ConnectionRefusedError, TimeoutError):
                if attempt == retries:
                    raise
                time.sleep(0.05 * (attempt + 1))

    # warm (compile)
    t0 = time.perf_counter()
    # the zero-wait backlog drain lets batches reach the client count, so
    # warm every bucket the traffic can hit (an unwarmed bucket recompiles
    # mid-traffic, seconds over the tunnel)
    bucket_cap = 1 << (max(clients, 1) - 1).bit_length()
    handle.warmup(max_bucket=max(64, bucket_cap), top_k=args.top_k)
    print(f"first request (compile): {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    latencies = []
    lat_lock = threading.Lock()
    per_client = requests_total // clients

    def client(cid):
        for r in range(per_client):
            q = f"find documents about topic {(cid * per_client + r) % 997}"
            t = time.perf_counter()
            do_request(q)
            with lat_lock:
                latencies.append(time.perf_counter() - t)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,)) for c in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    n = len(latencies)
    latencies.sort()
    qps = n / wall
    p50 = latencies[n // 2] * 1e3
    p99 = latencies[int(n * 0.99)] * 1e3
    print(
        f"served {n} requests in {wall:.1f}s -> {qps:.1f} QPS end-to-end "
        f"(p50 {p50:.0f}ms, p99 {p99:.0f}ms, {clients} clients, "
        f"inflight {inflight})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "serving_qps": round(qps, 1),
                "p50_ms": round(p50),
                "p99_ms": round(p99),
                "profile": profile,
                "docs": args.docs,
                "clients": clients,
                "inflight": inflight,
            }
        )
    )
    handle.stop()


if __name__ == "__main__":
    main()
