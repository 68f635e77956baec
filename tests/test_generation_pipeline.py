"""Generation pipeline engine + executor integration (retrieval AND generation metrics)."""

import json

import pytest

from autorag_research_tpu.config import BaseMetricConfig, BuildContext, ExecutorConfig
from autorag_research_tpu.executor import Executor
from autorag_research_tpu.index import registry
from autorag_research_tpu.llm import MockLLM
from autorag_research_tpu.pipelines.generation.basic_rag import BasicRAGConfig
from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config
from autorag_research_tpu.store.catalog import Catalog
from autorag_research_tpu.store.gt import or_all


@pytest.fixture
def gen_catalog(tmp_path):
    registry.invalidate()
    cat = Catalog(tmp_path / "gen.db")
    cat.add_chunks(
        [
            {"id": 0, "contents": "Paris is the capital of France."},
            {"id": 1, "contents": "Berlin is the capital of Germany."},
            {"id": 2, "contents": "The mitochondria is the powerhouse of the cell."},
        ]
    )
    cat.add_queries(
        [
            {"id": 0, "contents": "capital of France", "generation_gt": ["Paris"]},
            {"id": 1, "contents": "capital of Germany", "generation_gt": ["Berlin"]},
        ]
    )
    cat.add_retrieval_gt(0, 0)
    cat.add_retrieval_gt(1, 1)
    yield cat
    registry.invalidate()


def answering_llm(prompt: str) -> str:
    question = prompt.split("Question:")[-1]
    if "France" in question:
        return "Paris"
    if "Germany" in question:
        return "Berlin"
    return "unknown"


def make_config():
    return ExecutorConfig(
        pipelines=[
            BasicRAGConfig(
                name="rag", retrieval_pipeline_name="bm25",
                llm=MockLLM(responder=answering_llm), top_k=2,
            )
        ],
        metrics=[
            BaseMetricConfig(name="recall", metric_type="retrieval"),
            BaseMetricConfig(name="exact_match", metric_type="generation"),
            BaseMetricConfig(name="token_f1", metric_type="generation"),
        ],
        health_check=False,
    )


def test_basic_rag_end_to_end(gen_catalog):
    ctx = BuildContext(pipeline_configs={"bm25": BM25Config(name="bm25")})
    result = Executor(gen_catalog, make_config(), ctx).run()
    assert result.success, result.report()
    pres = result.pipelines[0]
    metrics = {m.metric_name: m for m in pres.metrics}
    # generation pipeline gets BOTH retrieval and generation metrics
    assert set(metrics) == {"recall", "exact_match", "token_f1"}
    assert metrics["exact_match"].average == 1.0
    assert metrics["recall"].average == 1.0

    row = gen_catalog.get_executor_result(0, pres.stats["pipeline_id"])
    assert row["generation_result"] == "Paris"
    assert row["execution_time"] is not None and row["execution_time"] >= 0
    meta = json.loads(row["result_metadata"])
    assert 0 in meta["context_chunk_ids"]
    usage = json.loads(row["token_usage"])
    assert usage["total_tokens"] > 0


def test_generation_resume(gen_catalog):
    ctx = BuildContext(pipeline_configs={"bm25": BM25Config(name="bm25")})
    ex = Executor(gen_catalog, make_config(), ctx)
    r1 = ex.run()
    assert r1.success
    registry.invalidate()
    ctx2 = BuildContext(pipeline_configs={"bm25": BM25Config(name="bm25")})
    r2 = Executor(gen_catalog, make_config(), ctx2).run()
    assert r2.pipelines[0].stats["total_queries"] == 0  # all resumed


def test_generation_failure_isolation(gen_catalog):
    from autorag_research_tpu.llm import ScriptedLLM

    # first query's generation works, second exhausts the script -> failure
    llm = ScriptedLLM(responses=["only one answer"] )
    cfg = ExecutorConfig(
        pipelines=[
            BasicRAGConfig(
                name="rag_fail", retrieval_pipeline_name="bm25", llm=llm,
                top_k=1, max_retries=1,
            )
        ],
        metrics=[],
        health_check=False,
        max_retries=0,
    )
    ctx = BuildContext(pipeline_configs={"bm25": BM25Config(name="bm25")})
    result = Executor(gen_catalog, cfg, ctx).run()
    pres = result.pipelines[0]
    assert not pres.success
    assert len(pres.stats.get("failed_queries", [])) == 1
    assert pres.stats["total_queries"] == 1  # the good one persisted


def test_crash_between_inserts_does_not_contaminate_resume(gen_catalog):
    """A crash AFTER retrieved rows commit but BEFORE the executor result
    leaves the query pending; the resumed attempt's (different) doc set must
    fully REPLACE the stale rows, not union with them (regression)."""
    from autorag_research_tpu.pipelines.generation.basic_rag import BasicRAGPipeline
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Pipeline

    cat = gen_catalog
    bm25 = BM25Pipeline(cat, "bm25_crash")
    rag = BasicRAGPipeline(
        cat, "rag_crash", retrieval_pipeline=bm25,
        llm=MockLLM(responder=lambda p: "Paris"),
    )
    pid = rag.pipeline_id
    # simulate the interrupted first attempt: retrieved rows for a DIFFERENT
    # doc set committed, no executor result
    cat.add_retrieved_results(pid, [(0, 2, 0.9), (0, 1, 0.8)])
    assert cat.get_executor_result(0, pid) is None  # query still pending
    stats = rag.run(top_k=1)
    assert stats["failed_queries"] == []
    rows = cat.get_retrieved(0, pid, "chunk")
    # only the resumed attempt's docs remain (top_k=1 on 'capital of France'
    # retrieves doc 0) — the stale docs 1/2 are gone
    assert [r["doc_id"] for r in rows] == [0]
