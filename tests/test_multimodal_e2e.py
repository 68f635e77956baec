"""Full multimodal vertical: image ingest -> image retrieval (single + MaxSim)
-> VisRAG generation -> retrieval AND generation metrics via the Executor."""

import json

import pytest

from autorag_research_tpu.config import BaseMetricConfig, BuildContext, ExecutorConfig
from autorag_research_tpu.embeddings import MockEmbedding, MockMultiVectorEmbedding
from autorag_research_tpu.executor import Executor
from autorag_research_tpu.index import registry
from autorag_research_tpu.llm import LLMResult, MockLLM
from autorag_research_tpu.pipelines.generation.visrag_gen import VisRAGGenConfig
from autorag_research_tpu.pipelines.retrieval.image_vector_search import ImageVectorSearchConfig
from autorag_research_tpu.store.catalog import Catalog
from autorag_research_tpu.store.ingestion import IngestionService


@pytest.fixture
def mm_catalog(tmp_path):
    registry.invalidate()
    emb = MockEmbedding(dim=24)
    memb = MockMultiVectorEmbedding(dim=24, max_tokens=5)
    cat = Catalog(tmp_path / "mm.db", embedding_dim=24)
    service = IngestionService(cat)
    pages = [f"page image bytes {i}".encode() for i in range(6)]
    service.add_image_chunks(
        [{"id": f"pg{i}", "image": img, "mimetype": "image/png"} for i, img in enumerate(pages)]
    )
    service.add_queries(
        [
            {"id": "q0", "contents": "what is on page two", "generation_gt": ["chart on page two"]},
            {"id": "q1", "contents": "what is on page five", "generation_gt": ["table on page five"]},
        ]
    )
    # image GT via the text/image chunk-type API
    service.add_retrieval_gt("q0", "pg2", chunk_type="image")
    service.add_retrieval_gt("q1", "pg5", chunk_type="image")
    # embeddings: queries point at their gold pages
    cat.set_embeddings("image_chunk", [(f"pg{i}", emb.embed_images([img])[0]) for i, img in enumerate(pages)])
    cat.set_multi_embeddings(
        "image_chunk", [(f"pg{i}", memb.embed_images_multi([img])[0]) for i, img in enumerate(pages)]
    )
    cat.set_embeddings("query", [("q0", emb.embed_images([pages[2]])[0]), ("q1", emb.embed_images([pages[5]])[0])])
    cat.set_multi_embeddings(
        "query", [("q0", memb.embed_images_multi([pages[2]])[0]), ("q1", memb.embed_images_multi([pages[5]])[0])]
    )
    yield cat, pages
    registry.invalidate()


class PageVLM(MockLLM):
    """Answers based on which page image bytes it receives."""

    async def agenerate(self, prompt, images=None, **kw):
        self.calls.append(prompt)
        if images and b"2" in images[0]:
            text = "chart on page two"
        elif images and b"5" in images[0]:
            text = "table on page five"
        else:
            text = "unknown page"
        return LLMResult(text=text, token_usage={"prompt_tokens": 2, "completion_tokens": 3, "total_tokens": 5})


def test_multimodal_executor_end_to_end(mm_catalog):
    cat, pages = mm_catalog
    cfg = ExecutorConfig(
        pipelines=[
            ImageVectorSearchConfig(name="ivs_single", search_mode="single", top_k=2),
            ImageVectorSearchConfig(name="ivs_multi", search_mode="multi", top_k=2),
            VisRAGGenConfig(name="visrag", retrieval_pipeline_name="ivs_single",
                            llm=PageVLM(), top_k=2, max_images=1),
        ],
        metrics=[
            BaseMetricConfig(name="recall", metric_type="retrieval"),
            BaseMetricConfig(name="exact_match", metric_type="generation"),
        ],
        health_check=True,
        health_check_queries=1,
    )
    result = Executor(cat, cfg).run()
    assert result.success, result.report()
    by_name = {p.name: p for p in result.pipelines}
    for name in ("ivs_single", "ivs_multi"):
        metrics = {m.metric_name: m for m in by_name[name].metrics}
        assert metrics["recall"].average == 1.0, name
        assert "exact_match" not in metrics  # retrieval pipelines skip gen metrics
    gen_metrics = {m.metric_name: m for m in by_name["visrag"].metrics}
    assert gen_metrics["exact_match"].average == 1.0
    # generation results carry image evidence ids in metadata
    pid = by_name["visrag"].stats["pipeline_id"]
    row = cat.get_executor_result("q0", pid)
    meta = json.loads(row["result_metadata"])
    assert meta["image_chunk_ids"] == ["pg2"]
    assert row["generation_result"] == "chart on page two"
    # visrag persists its retrieval into the IMAGE result table so retrieval
    # metrics for the generation pipeline evaluate non-empty sets (regression:
    # GenerationResult.retrieved was never set)
    retrieved = cat.get_retrieved("q0", pid, "image_chunk")
    assert [r["doc_id"] for r in retrieved][:1] == ["pg2"]
    gen_recall = {m.metric_name: m for m in by_name["visrag"].metrics}.get("recall")
    assert gen_recall is not None and gen_recall.average == 1.0
