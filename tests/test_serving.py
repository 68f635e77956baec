"""Serving layer: HTTP endpoints, micro-batching, generation, errors."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from autorag_research_tpu.index import registry
from autorag_research_tpu.llm import MockLLM
from autorag_research_tpu.pipelines.generation.basic_rag import BasicRAGPipeline
from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Pipeline
from autorag_research_tpu.serving.server import ServingHandle
from autorag_research_tpu.store.catalog import Catalog

DOCS = [
    "Paris is the capital of France",
    "Berlin is the capital of Germany",
    "TPUs accelerate matrix multiplication",
    "BM25 ranks by term rarity",
]


@pytest.fixture
def handle(tmp_path):
    registry.invalidate()
    cat = Catalog(tmp_path / "serve.db")
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(DOCS)])
    cat.add_queries([{"id": 0, "contents": "capital of France"}])
    bm25 = BM25Pipeline(cat, "bm25_serve")
    rag = BasicRAGPipeline(
        cat, "rag_serve", retrieval_pipeline=bm25,
        llm=MockLLM(responder=lambda p: "Paris" if "France" in p else "unknown"),
    )
    h = ServingHandle(
        cat, {"bm25": bm25}, {"basic_rag": rag}, batch_window_ms=10
    ).start(port=0)
    yield h
    h.stop()
    registry.invalidate()


def post(handle, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{handle.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(handle):
    with urllib.request.urlopen(f"http://127.0.0.1:{handle.port}/health", timeout=10) as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"
    assert data["corpus"] == 4
    assert "bm25" in data["retrieval_pipelines"]


def test_search_single_and_batch(handle):
    code, data = post(handle, "/search", {"query": "capital France", "top_k": 2})
    assert code == 200
    hits = data["results"][0]
    assert hits[0]["doc_id"] == 0
    assert "capital of France" in hits[0]["content"]
    code, data = post(handle, "/search", {"queries": ["TPU matrix", "term rarity"], "top_k": 1})
    assert code == 200
    assert data["results"][0][0]["doc_id"] == 2
    assert data["results"][1][0]["doc_id"] == 3


def test_concurrent_searches_microbatch(handle):
    results = {}

    def worker(i, q):
        results[i] = post(handle, "/search", {"query": q, "top_k": 1})

    threads = [
        threading.Thread(target=worker, args=(i, q))
        for i, q in enumerate(["capital France", "capital Germany", "TPU matrix"] * 3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(code == 200 for code, _ in results.values())
    assert results[0][1]["results"][0][0]["doc_id"] == 0
    assert results[1][1]["results"][0][0]["doc_id"] == 1


def test_generate_known_and_adhoc(handle):
    # query exists in catalog
    code, data = post(handle, "/generate", {"query": "capital of France"})
    assert code == 200 and data["text"] == "Paris"
    # ad-hoc query not in catalog: staged + cleaned up
    before = handle.catalog.count("query")
    code, data = post(handle, "/generate", {"query": "what is the capital of France?"})
    assert code == 200 and data["text"] == "Paris"
    assert handle.catalog.count("query") == before


def test_generate_batched_endpoint(handle):
    """/generate with a queries list returns per-query results through ONE
    micro-batched retrieval+decode; single queries ride the same batcher."""
    code, data = post(
        handle,
        "/generate",
        {"queries": ["capital of France", "something else entirely"]},
    )
    assert code == 200
    texts = [r["text"] for r in data["results"]]
    assert texts == ["Paris", "unknown"]
    assert all("context_chunk_ids" in r["metadata"] for r in data["results"])


def test_generate_batch_uses_batch_llm(tmp_path):
    """A batch-capable LLM (JaxLM-shaped) gets ONE generate_batch call for a
    coalesced micro-batch, not N agenerate calls."""
    registry.invalidate()
    cat = Catalog(tmp_path / "gb.db")
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(DOCS)])
    bm25 = BM25Pipeline(cat, "bm25_gb")

    calls = []

    class BatchLLM(MockLLM):
        def generate_batch(self, prompts):
            calls.append(len(prompts))
            return ["ans"] * len(prompts)

    rag = BasicRAGPipeline(cat, "rag_gb", retrieval_pipeline=bm25, llm=BatchLLM())
    h = ServingHandle(cat, {"bm25": bm25}, {"rag": rag}, batch_window_ms=10).start(port=0)
    try:
        out = h.generate_batch(["q one", "q two", "q three"], top_k=2)
        assert [r["text"] for r in out] == ["ans"] * 3
        # the 3 jobs coalesce into one (or at most two) decode batches
        assert sum(calls) >= 3 and len(calls) <= 2, calls
    finally:
        h.stop()
        registry.invalidate()


def test_error_paths(handle):
    code, data = post(handle, "/search", {"query": "x", "pipeline": "nope"})
    assert code == 400 and "unknown pipeline" in data["error"]
    code, data = post(handle, "/nope", {})
    assert code == 404
    code, data = post(handle, "/generate", {"query": "x", "pipeline": "nope"})
    assert code == 400


def test_adhoc_generate_with_dense_retriever(tmp_path):
    """Regression: ad-hoc /generate must work when the generation pipeline
    composes DENSE retrieval (the staged temp query has no embedding; the
    pipeline falls back to text retrieval)."""
    from autorag_research_tpu.embeddings import MockEmbedding
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchPipeline

    registry.invalidate()
    emb = MockEmbedding(dim=16)
    cat = Catalog(tmp_path / "adg.db", embedding_dim=16)
    cat.add_chunks(
        [{"id": i, "contents": d, "embedding": emb.embed_query(d)} for i, d in enumerate(DOCS)]
    )
    vs = VectorSearchPipeline(cat, "vs_adhoc", embedding_model=emb)
    rag = BasicRAGPipeline(
        cat, "rag_adhoc", retrieval_pipeline=vs, llm=MockLLM(responder=lambda p: "ok")
    )
    h = ServingHandle(cat, {"vs": vs}, {"rag": rag}).start(port=0)
    try:
        code, data = post(h, "/generate", {"query": "brand new ad hoc question"})
        assert code == 200 and data["text"] == "ok"
    finally:
        h.stop()
        registry.invalidate()


def test_serving_with_mesh_sharded_index(tmp_path):
    """Serving over a corpus sharded across the 8-device CPU mesh."""
    from autorag_research_tpu.embeddings import MockEmbedding
    from autorag_research_tpu.parallel.mesh import corpus_mesh
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchPipeline

    registry.invalidate()
    emb = MockEmbedding(dim=16)
    cat = Catalog(tmp_path / "mesh_serve.db", embedding_dim=16)
    docs = [f"unique document number {i}" for i in range(64)]
    cat.add_chunks(
        [{"id": i, "contents": d, "embedding": emb.embed_query(d)} for i, d in enumerate(docs)]
    )
    mesh = corpus_mesh(n_corpus=8)
    vs = VectorSearchPipeline(cat, "vs_mesh", embedding_model=emb, mesh=mesh)
    h = ServingHandle(cat, {"vs": vs}).start(port=0)
    try:
        code, data = post(h, "/search", {"query": docs[42], "top_k": 3})
        assert code == 200
        assert data["results"][0][0]["doc_id"] == 42
        # and a batch across the mesh
        code, data = post(h, "/search", {"queries": [docs[1], docs[60]], "top_k": 1})
        assert [r[0]["doc_id"] for r in data["results"]] == [1, 60]
    finally:
        h.stop()
        registry.invalidate()


def test_microbatch_uses_single_batched_kernel_call(tmp_path):
    """Coalesced requests must hit the device as ONE batched call, not a
    per-query fan-out (the serving throughput contract)."""
    registry.invalidate()
    cat = Catalog(tmp_path / "mb.db")
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(DOCS)])

    calls = []

    class CountingBM25(BM25Pipeline):
        def _retrieve_batch_by_texts(self, texts, top_k):
            calls.append(list(texts))
            return super()._retrieve_batch_by_texts(texts, top_k)

    pipe = CountingBM25(cat, "bm25_count")
    h = ServingHandle(cat, {"bm25": pipe}, batch_window_ms=50).start(port=0)
    try:
        # one multi-query POST -> exactly one batched call with all queries
        code, data = post(
            h, "/search", {"queries": ["capital France", "TPU matrix", "term rarity"]}
        )
        assert code == 200 and len(data["results"]) == 3
        # one batched call, padded to the power-of-two bucket (3 -> 4) so the
        # device sees a bounded set of jit shapes
        assert len(calls) == 1 and len(calls[0]) == 4
        assert calls[0][:3] == ["capital France", "TPU matrix", "term rarity"]
    finally:
        h.stop()
        registry.invalidate()


def test_serving_multi_vector_pipeline(tmp_path):
    """MaxSim (late-interaction) retrieval behind the HTTP API — batched
    embed_texts_multi + one maxsim kernel launch per micro-batch."""
    from autorag_research_tpu.embeddings import MockMultiVectorEmbedding
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchPipeline

    registry.invalidate()
    memb = MockMultiVectorEmbedding(dim=16, max_tokens=4)
    cat = Catalog(tmp_path / "mv.db", embedding_dim=16)
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(DOCS)])
    cat.set_multi_embeddings(
        "chunk", [(i, memb.embed_texts_multi([d])[0]) for i, d in enumerate(DOCS)]
    )
    pipe = VectorSearchPipeline(cat, "mv_serve", search_mode="multi", embedding_model=memb)
    h = ServingHandle(cat, {"maxsim": pipe}, batch_window_ms=10).start(port=0)
    try:
        code, data = post(
            h, "/search",
            {"queries": [DOCS[0], DOCS[2]], "top_k": 1, "pipeline": "maxsim"},
        )
        assert code == 200
        assert data["results"][0][0]["doc_id"] == 0  # self-match wins
        assert data["results"][1][0]["doc_id"] == 2
    finally:
        h.stop()
        registry.invalidate()


def test_malformed_requests(handle):
    import urllib.request

    # invalid JSON body
    req = urllib.request.Request(
        f"http://127.0.0.1:{handle.port}/search",
        data=b"{not json",
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            code = resp.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400

    # missing query field
    code, data = post(handle, "/search", {"top_k": 3})
    assert code == 400 and "error" in data

    # non-integer top_k must not crash the server
    code, _ = post(handle, "/search", {"query": "x", "top_k": "many"})
    assert code == 400
    # server is still alive afterwards
    code, data = post(handle, "/search", {"query": "capital of France"})
    assert code == 200


def test_zero_and_huge_top_k(handle):
    code, data = post(handle, "/search", {"query": "capital", "top_k": 0})
    assert code in (200, 400)
    if code == 200:
        assert data["results"][0] == []
    code, data = post(handle, "/search", {"query": "capital", "top_k": 10_000})
    assert code == 200
    assert len(data["results"][0]) <= len(DOCS)


def test_fast_profile_serving(tmp_path):
    """The vector_search_fast profile (approx + bf16) serves correctly —
    CPU approx lowering is exact, so the top hit is the cosine-nearest doc."""
    import numpy as np

    from autorag_research_tpu.embeddings.base import MockEmbedding
    from autorag_research_tpu.pipelines.retrieval.vector_search import (
        VectorSearchPipeline,
    )
    from autorag_research_tpu.store.ingestion import IngestionService

    registry.invalidate()
    cat = Catalog(tmp_path / "fast.db")
    cat.add_chunks([{"id": i, "contents": f"document {i}"} for i in range(30)])
    emb = MockEmbedding(dim=32)
    IngestionService(cat).embed_all(emb, batch_size=16)
    pipe = VectorSearchPipeline(
        cat, "dense_fast", embedding_model=emb,
        index_options={"mode": "approx", "dtype": "bfloat16"},
    )
    h = ServingHandle(cat, {"dense": pipe}, batch_window_ms=5).start(port=0)
    try:
        code, data = post(h, "/search", {"query": "document 7", "top_k": 3})
        assert code == 200 and len(data["results"][0]) == 3
        # MockEmbedding is deterministic on text: doc 7's own text is top-1
        assert data["results"][0][0]["doc_id"] == 7
    finally:
        h.stop()
        registry.invalidate()


def test_verified_profile_serves_identical_to_exact(tmp_path):
    """The verified profile must return the exact profile's results —
    same ids AND same scores (it is the guaranteed-exact fast path)."""
    import numpy as np

    from autorag_research_tpu.embeddings.base import MockEmbedding
    from autorag_research_tpu.pipelines.retrieval.vector_search import (
        VectorSearchPipeline,
    )
    from autorag_research_tpu.store.ingestion import IngestionService

    registry.invalidate()
    cat = Catalog(tmp_path / "ver.db")
    cat.add_chunks([{"id": i, "contents": f"document {i}"} for i in range(60)])
    emb = MockEmbedding(dim=32)
    IngestionService(cat).embed_all(emb, batch_size=16)
    exact = VectorSearchPipeline(cat, "dense_exact", embedding_model=emb)
    verified = VectorSearchPipeline(
        cat, "dense_verified", embedding_model=emb,
        index_options={"mode": "verified"},
    )
    h = ServingHandle(
        cat, {"exact": exact, "verified": verified}, batch_window_ms=5
    ).start(port=0)
    try:
        for q in ("document 7", "document 41", "unrelated words"):
            _, de = post(h, "/search", {"query": q, "top_k": 5, "pipeline": "exact"})
            _, dv = post(h, "/search", {"query": q, "top_k": 5, "pipeline": "verified"})
            assert [r["doc_id"] for r in de["results"][0]] == [
                r["doc_id"] for r in dv["results"][0]
            ]
            se = [r["score"] for r in de["results"][0]]
            sv = [r["score"] for r in dv["results"][0]]
            np.testing.assert_allclose(se, sv, rtol=1e-6, atol=1e-7)
    finally:
        h.stop()
        registry.invalidate()


def test_generate_mixed_top_k_not_coalesced(tmp_path):
    """Jobs with different top_k in one /generate window must NOT share a
    max(top_k) retrieval: the answer is conditioned on however many chunks
    were retrieved, so each k runs its own group (regression: a top_k=1
    client got context_chunk_ids of length 5 when batched with a top_k=5
    client)."""
    registry.invalidate()
    cat = Catalog(tmp_path / "mk.db")
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(DOCS)])
    bm25 = BM25Pipeline(cat, "bm25_mk")
    rag = BasicRAGPipeline(cat, "rag_mk", retrieval_pipeline=bm25, llm=MockLLM())
    h = ServingHandle(cat, {"bm25": bm25}, {"rag": rag}, batch_window_ms=50).start(port=0)
    try:
        # warm so the batcher runs threaded batches (first batch is solo)
        h.generate_batch(["warm"], top_k=1)
        results = {}

        def call(k):
            code, data = post(h, "/generate", {"query": "capital of France", "top_k": k})
            results[k] = (code, data)

        t1 = threading.Thread(target=call, args=(1,))
        t2 = threading.Thread(target=call, args=(3,))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert results[1][0] == 200 and results[3][0] == 200
        assert len(results[1][1]["metadata"]["context_chunk_ids"]) == 1
        # positive_only semantics cap hits below k; the point is k=3 gets
        # MORE context than the k=1 job it shared a window with
        assert len(results[3][1]["metadata"]["context_chunk_ids"]) >= 2
    finally:
        h.stop()
        registry.invalidate()


def test_batcher_group_failure_is_isolated():
    """A non-truncatable batch split into per-k groups must fail ONLY the
    group that raised — other groups' completed results survive."""
    from autorag_research_tpu.serving.server import _Batcher, _SearchJob

    def fn(queries, top_k):
        if top_k == 50:
            raise RuntimeError("boom at k=50")
        return [{"text": f"ok-{q}"} for q in queries]

    b = _Batcher(fn, truncatable=False)
    b.stop()
    good, bad = _SearchJob("a", 5), _SearchJob("b", 50)
    b._run_batch([good, bad])
    assert good.result == {"text": "ok-a"} and good.error is None
    assert bad.result is None and "boom at k=50" in bad.error
    # one successful group proves index+kernel are up -> warm gate opens
    assert b._warmed.is_set()
    assert good.done.is_set() and bad.done.is_set()


def test_batcher_all_groups_failing_stays_cold():
    from autorag_research_tpu.serving.server import _Batcher, _SearchJob

    def fn(queries, top_k):
        raise ValueError("nothing works")

    b = _Batcher(fn, truncatable=False)
    b.stop()
    j = _SearchJob("a", 5)
    b._run_batch([j])
    assert "nothing works" in j.error
    assert not b._warmed.is_set()


def test_metrics_label_escaping_and_bucket_guard():
    from autorag_research_tpu.serving.metrics import BATCH_BUCKETS, ServingMetrics

    m = ServingMetrics()
    m.inc("autorag_requests_total", {"pipeline": 'we"ird\\name\nx'})
    text = m.render()
    line = next(
        l for l in text.splitlines() if l.startswith("autorag_requests_total{")
    )
    # the raw quote/backslash/newline must be escaped or the whole scrape
    # becomes unparseable; the series line must stay single-line
    assert 'pipeline="we\\"ird\\\\name\\nx"' in line
    assert line.endswith(" 1")
    # histogram buckets are fixed per metric name
    m.observe("hist_guard", 1.0, buckets=BATCH_BUCKETS)
    with pytest.raises(ValueError, match="already registered"):
        m.observe("hist_guard", 1.0)  # default LATENCY_BUCKETS differ


def test_metrics_collector_render_and_quantile():
    from autorag_research_tpu.serving.metrics import (
        BATCH_BUCKETS,
        ServingMetrics,
    )

    m = ServingMetrics()
    m.inc("autorag_requests_total", {"endpoint": "/search", "code": "200"})
    m.inc("autorag_requests_total", {"endpoint": "/search", "code": "200"})
    m.inc("autorag_requests_total", {"endpoint": "/search", "code": "400"})
    for v in (0.004, 0.02, 0.02, 0.3):
        m.observe("autorag_request_latency_seconds", v, {"endpoint": "/search"})
    m.observe("autorag_batch_size", 3, {"pipeline": "bm25"}, buckets=BATCH_BUCKETS)
    m.set_gauge("autorag_uptime_seconds", 12.5)
    text = m.render()
    assert 'autorag_requests_total{code="200",endpoint="/search"} 2' in text
    assert 'autorag_requests_total{code="400",endpoint="/search"} 1' in text
    # cumulative buckets: le=0.005 holds 1, le=0.025 holds 3, +Inf holds 4
    assert 'autorag_request_latency_seconds_bucket{endpoint="/search",le="0.005"} 1' in text
    assert 'autorag_request_latency_seconds_bucket{endpoint="/search",le="0.025"} 3' in text
    assert 'autorag_request_latency_seconds_bucket{endpoint="/search",le="+Inf"} 4' in text
    assert 'autorag_request_latency_seconds_count{endpoint="/search"} 4' in text
    # batch size 3 lands in the le=4 power-of-two bucket, not le=2
    assert 'autorag_batch_size_bucket{pipeline="bm25",le="2"} 0' in text
    assert 'autorag_batch_size_bucket{pipeline="bm25",le="4"} 1' in text
    assert "# TYPE autorag_requests_total counter" in text
    assert "# TYPE autorag_request_latency_seconds histogram" in text
    assert "autorag_uptime_seconds 12.5" in text
    # p50 of (0.004, 0.02, 0.02, 0.3) sits in the 0.025 bucket
    assert m.latency_quantile(
        "autorag_request_latency_seconds", 0.5, {"endpoint": "/search"}
    ) == 0.025


def test_metrics_endpoint_live(tmp_path):
    registry.invalidate()
    cat = Catalog(tmp_path / "metrics.db")
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(DOCS)])
    bm25 = BM25Pipeline(cat, "bm25_metrics")
    rag = BasicRAGPipeline(cat, "rag_metrics", retrieval_pipeline=bm25, llm=MockLLM())
    h = ServingHandle(cat, {"bm25": bm25}, {"rag": rag}, batch_window_ms=5).start(port=0)
    try:
        post(h, "/search", {"query": "capital of France", "top_k": 2})
        post(h, "/search", {"query": "no such field", "top_k": -1})  # 400
        post(h, "/generate", {"query": "capital of France"})
        url = f"http://127.0.0.1:{h.port}/metrics"
        # counters record AFTER the response body is sent (Prometheus
        # counters are eventually consistent) — poll briefly
        import time as _time

        text = ""
        for _ in range(40):
            with urllib.request.urlopen(url) as resp:
                assert resp.headers["Content-Type"].startswith("text/plain")
                text = resp.read().decode()
            if 'code="200",endpoint="/generate"' in text:
                break
            _time.sleep(0.05)
        assert 'autorag_requests_total{code="200",endpoint="/search"} 1' in text
        assert 'autorag_requests_total{code="400",endpoint="/search"} 1' in text
        assert 'autorag_requests_total{code="200",endpoint="/generate"} 1' in text
        # device batches were recorded for both batcher kinds
        assert 'autorag_batch_size_count{kind="search",pipeline="bm25"} 1' in text
        assert 'autorag_batch_size_count{kind="generate",pipeline="rag"} 1' in text
        assert 'autorag_batch_device_seconds_sum{kind="search",pipeline="bm25"}' in text
        # scrape-time gauges
        assert f"autorag_corpus_docs {len(DOCS)}" in text
        assert 'autorag_queue_depth{kind="search",pipeline="bm25"} 0' in text
        assert "autorag_batches_inflight" in text
        # a later scrape counts the earlier /metrics hits themselves
        # (same post-send recording race: poll)
        text2 = ""
        for _ in range(40):
            with urllib.request.urlopen(url) as resp:
                text2 = resp.read().decode()
            if 'autorag_requests_total{code="200",endpoint="/metrics"}' in text2:
                break
            _time.sleep(0.05)
        assert 'autorag_requests_total{code="200",endpoint="/metrics"}' in text2
        # unknown (client-controlled) paths clamp to endpoint="other" so a
        # scanner can't mint unbounded label series
        for bad in ("/nope", "/nope2?q=1"):
            try:
                urllib.request.urlopen(f"http://127.0.0.1:{h.port}{bad}")
            except urllib.error.HTTPError as e:
                assert e.code == 404
        with urllib.request.urlopen(url) as resp:
            text3 = resp.read().decode()
        assert 'autorag_requests_total{code="404",endpoint="other"} 2' in text3
        assert "/nope" not in text3
    finally:
        h.stop()
        registry.invalidate()


def test_search_string_queries_is_rejected(handle):
    """{'queries': 'text'} must be a 400 — a plain string would fan out one
    device search per CHARACTER (regression)."""
    code, data = post(handle, "/search", {"queries": "capital of France", "top_k": 2})
    assert code == 400 and "list" in data["error"]
    code, data = post(handle, "/generate", {"queries": "capital of France"})
    assert code == 400 and "list" in data["error"]


def test_stop_fails_queued_jobs_instead_of_hanging():
    """Jobs still queued at stop() must complete with an error immediately,
    not strand their waiters until the timeout (regression)."""
    from autorag_research_tpu.serving.server import _Batcher, _SearchJob

    import threading as _threading

    release = _threading.Event()

    def slow_fn(queries, top_k):
        release.wait(timeout=30)
        return [[] for _ in queries]

    b = _Batcher(slow_fn, batch_window_ms=1, max_inflight=1)
    b._warmed.set()
    first = _SearchJob("a", 1)
    b.submit(first)  # occupies the single inflight slot
    import time as _time

    _time.sleep(0.3)
    queued = _SearchJob("b", 1)
    b.jobs.put(queued)
    # emulate ServingHandle.stop()'s drain on this batcher
    b.stop()
    import queue as _queue

    while True:
        try:
            job = b.jobs.get_nowait()
        except _queue.Empty:
            break
        job.error = "server shutting down"
        job.done.set()
    assert queued.done.wait(timeout=5) and queued.error
    release.set()
    assert first.done.wait(timeout=5)
