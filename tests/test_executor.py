"""Executor end-to-end: vector search pipeline + metrics over the seed catalog."""

import numpy as np
import pytest

from autorag_research_tpu.config import BaseMetricConfig, ExecutorConfig
from autorag_research_tpu.exceptions import NoQueryInDBError
from autorag_research_tpu.executor import Executor
from autorag_research_tpu.index import registry
from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchConfig
from autorag_research_tpu.store.catalog import Catalog


@pytest.fixture(autouse=True)
def clear_index_cache():
    registry.invalidate()
    yield
    registry.invalidate()


def make_config(**kw):
    defaults = dict(
        pipelines=[VectorSearchConfig(name="vs", top_k=3)],
        metrics=[
            BaseMetricConfig(name="recall", metric_type="retrieval"),
            BaseMetricConfig(name="ndcg", metric_type="retrieval"),
        ],
        health_check_queries=2,
    )
    defaults.update(kw)
    return ExecutorConfig(**defaults)


def test_executor_end_to_end(catalog):
    result = Executor(catalog, make_config()).run()
    assert result.success, result.report()
    pres = result.pipelines[0]
    assert pres.stats["total_queries"] == 3
    assert pres.stats["failed_queries"] == []
    recalls = {m.metric_name: m for m in pres.metrics}
    # query i's embedding == chunk i's embedding, and each GT contains that
    # chunk in its first group -> recall for q1 (or_all) = 1, q3 (single) = 1;
    # q2 has and_all([2, 5]) so only group [2] is guaranteed hit in top-3.
    assert recalls["recall"].count == 3
    assert recalls["recall"].average is not None and recalls["recall"].average > 0.4
    assert recalls["ndcg"].average is not None
    # health-check artifacts must be cleaned up
    assert catalog.get_pipeline("vs_health_check") is None


def test_executor_resume_skips_done(catalog):
    cfg = make_config()
    ex = Executor(catalog, cfg)
    r1 = ex.run()
    assert r1.success
    # second run should succeed instantly with 0 newly processed queries
    registry.invalidate()
    ex2 = Executor(catalog, make_config())
    r2 = ex2.run()
    assert r2.success
    assert r2.pipelines[0].stats["total_queries"] == 0


def test_executor_no_queries():
    cat = Catalog()
    with pytest.raises(NoQueryInDBError):
        Executor(cat, make_config()).run()


def test_health_check_failure_on_missing_embeddings(catalog):
    # remove query embeddings -> health check must fail the pipeline
    with catalog.connect() as conn:
        conn.execute("UPDATE query SET embedding=NULL")
    result = Executor(catalog, make_config()).run()
    assert not result.success
    assert "HealthCheck" in (result.pipelines[0].error or "")


def test_executor_without_health_check(catalog):
    result = Executor(catalog, make_config(health_check=False)).run()
    assert result.success


def test_report_format(catalog):
    result = Executor(catalog, make_config()).run()
    text = result.report()
    assert "vs [retrieval]" in text
    assert "retrieval/recall" in text


def test_query_limit(catalog):
    cfg = make_config(
        pipelines=[VectorSearchConfig(name="vs_lim", top_k=2, query_limit=2)],
        health_check=False,
    )
    result = Executor(catalog, cfg).run()
    assert result.success, result.report()
    assert result.pipelines[0].stats["total_queries"] == 2


def test_retrieval_fault_injection(catalog):
    """Always-failing search must not crash the executor; failures are
    reported per query and the pipeline marked unsuccessful (mirrors the
    reference's mocked-failure executor test)."""
    from autorag_research_tpu.pipelines.retrieval.base import BaseRetrievalPipeline

    class ExplodingPipeline(BaseRetrievalPipeline):
        retrieval_unit = "chunk"

        def _get_pipeline_config(self):
            return {"type": "exploding"}

        async def _retrieve_by_id(self, query_id, top_k):
            raise RuntimeError("search backend down")

        async def _retrieve_by_text(self, query_text, top_k):
            raise RuntimeError("search backend down")

    from dataclasses import dataclass

    from autorag_research_tpu.config import BasePipelineConfig

    @dataclass(kw_only=True)
    class ExplodingConfig(BasePipelineConfig):
        config_type = "exploding_test"
        kind = "retrieval"

        def build(self, cat, context):
            return ExplodingPipeline(cat, self.name)

    cfg = make_config(
        pipelines=[ExplodingConfig(name="boom", max_retries=1, retry_delay=0.0)],
        health_check=False,
        max_retries=0,
    )
    result = Executor(catalog, cfg).run()
    pres = result.pipelines[0]
    assert not pres.success
    assert len(pres.stats["failed_queries"]) == 3  # all queries failed, none fatal
    assert pres.error is not None


def test_zero_hit_query_passes_verification(catalog):
    """A query that legitimately retrieves nothing must not fail the run."""
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config

    # query 50 shares no terms with any chunk
    catalog.add_queries([{"id": 50, "contents": "xylophone zygote quux"}])
    cfg = make_config(
        pipelines=[BM25Config(name="bm25_zero", top_k=3)], health_check=False
    )
    result = Executor(catalog, cfg).run()
    assert result.success, result.report()
    stats = result.pipelines[0].stats
    assert 50 in stats["empty_queries"]
    assert stats["failed_queries"] == []


def test_query_limit_is_fixed_window(catalog):
    """Retries/resumes must stay inside the first-N window."""
    cfg = make_config(
        pipelines=[VectorSearchConfig(name="vs_win", top_k=2, query_limit=2)],
        health_check=False,
    )
    r1 = Executor(catalog, cfg).run()
    assert r1.success
    window = set(catalog.get_all_query_ids()[:2])
    pid = r1.pipelines[0].stats["pipeline_id"]
    assert catalog.get_queries_with_results(pid) == window
    # re-run: still only the window, nothing new processed
    registry.invalidate()
    r2 = Executor(catalog, make_config(
        pipelines=[VectorSearchConfig(name="vs_win", top_k=2, query_limit=2)],
        health_check=False,
    )).run()
    assert r2.success and r2.pipelines[0].stats["total_queries"] == 0
    assert catalog.get_queries_with_results(pid) == window


def test_executor_fast_mode_index_options(catalog):
    """index_options flow into the DenseIndex (approx fast mode) and the
    executor still evaluates — CPU approx lowering is exact, so metrics
    match the default run."""
    cfg = make_config(
        pipelines=[
            VectorSearchConfig(
                name="vs_fast",
                top_k=3,
                index_options={"mode": "approx", "dtype": "bfloat16"},
            )
        ],
    )
    result = Executor(catalog, cfg).run()
    assert result.success, result.report()
    from autorag_research_tpu.index import registry as reg

    idx = reg.get_or_build(catalog, "dense", "chunk", builder=lambda: None,
                           dtype="bfloat16", mode="approx")
    assert idx is not None and idx.mode == "approx" and idx.dtype == "bfloat16"
