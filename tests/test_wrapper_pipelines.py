"""Wrapper retrieval pipelines: hyde, query_rewrite, question_decomposition,
rerank, power_of_noise, retro_star, gqr_hybrid, heaven, image_vector_search."""

import numpy as np
import pytest

from autorag_research_tpu.config import BaseMetricConfig, BuildContext, ExecutorConfig
from autorag_research_tpu.embeddings import MockEmbedding, MockMultiVectorEmbedding
from autorag_research_tpu.executor import Executor
from autorag_research_tpu.index import registry
from autorag_research_tpu.llm import MockLLM, ScriptedLLM
from autorag_research_tpu.rerankers import MockReranker
from autorag_research_tpu.store.catalog import Catalog
from autorag_research_tpu.store.gt import or_all
from autorag_research_tpu.utils.concurrency import run_async

DOCS = [
    "quick brown fox jumps over dog",
    "lazy dog sleeps in the sun",
    "vector database retrieval systems",
    "tpu hardware matrix acceleration",
    "fox hunting season regulations",
    "dogs and foxes in the wild",
]
EMB = MockEmbedding(dim=32)


@pytest.fixture
def wcat(tmp_path):
    registry.invalidate()
    cat = Catalog(tmp_path / "w.db", embedding_dim=32)
    cat.add_chunks(
        [{"id": i, "contents": d, "embedding": EMB.embed_query(d)} for i, d in enumerate(DOCS)]
    )
    cat.add_queries(
        [{"id": 0, "contents": "quick fox", "embedding": EMB.embed_query("quick fox")},
         {"id": 1, "contents": "dog sleeping", "embedding": EMB.embed_query("dog sleeping")}]
    )
    cat.add_retrieval_gt(0, or_all([0, 4, 5]))
    cat.add_retrieval_gt(1, 1)
    yield cat
    registry.invalidate()


def run_pipeline_config(cat, config, subs=(), metrics=("recall",)):
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchConfig

    base = {
        "vs": VectorSearchConfig(name="vs", embedding_model=EMB),
        "bm25": BM25Config(name="bm25"),
    }
    ctx = BuildContext(pipeline_configs={k: base[k] for k in subs})
    cfg = ExecutorConfig(
        pipelines=[config],
        metrics=[BaseMetricConfig(name=m) for m in metrics],
        health_check=False,
    )
    return Executor(cat, cfg, ctx).run()


class TestHyDE:
    def test_hyde_uses_hypothetical_doc(self, wcat):
        from autorag_research_tpu.pipelines.retrieval.hyde import HyDEConfig

        llm = MockLLM(responder=lambda p: "quick brown fox jumps over dog")
        res = run_pipeline_config(
            wcat, HyDEConfig(name="hyde", llm=llm, embedding_model=EMB, top_k=3)
        )
        assert res.success, res.report()
        pid = res.pipelines[0].stats["pipeline_id"]
        # hypothetical doc == doc 0 -> doc 0 must rank first for both queries
        rows = wcat.get_retrieved(0, pid)
        assert rows[0]["doc_id"] == 0
        assert len(llm.calls) == 2


class TestQueryRewrite:
    def test_rewrite_delegates(self, wcat):
        from autorag_research_tpu.pipelines.retrieval.query_rewrite import QueryRewriteConfig

        llm = MockLLM(responder=lambda p: "vector database retrieval")
        res = run_pipeline_config(
            wcat,
            QueryRewriteConfig(name="qr", inner_retrieval_pipeline_name="bm25", llm=llm, top_k=2),
            subs=("bm25",),
        )
        assert res.success, res.report()
        pid = res.pipelines[0].stats["pipeline_id"]
        # rewritten query is about vector databases -> doc 2 top for q0
        assert wcat.get_retrieved(0, pid)[0]["doc_id"] == 2


class TestQuestionDecomposition:
    def test_parse_subquestions_formats(self):
        from autorag_research_tpu.pipelines.retrieval.question_decomposition import parse_subquestions

        assert parse_subquestions("1. What is A?\n2. What is B?") == ["What is A?", "What is B?"]
        assert parse_subquestions("- alpha\n- beta") == ["alpha", "beta"]
        assert parse_subquestions("What is A? What is B?") == ["What is A?", "What is B?"]

    def test_decomposition_merges_max_score(self, wcat):
        from autorag_research_tpu.pipelines.retrieval.question_decomposition import (
            QuestionDecompositionConfig,
        )

        llm = MockLLM(responder=lambda p: "lazy dog sun\nfox hunting rules")
        res = run_pipeline_config(
            wcat,
            QuestionDecompositionConfig(
                name="qd", inner_retrieval_pipeline_name="bm25", llm=llm, top_k=4
            ),
            subs=("bm25",),
        )
        assert res.success, res.report()
        pid = res.pipelines[0].stats["pipeline_id"]
        got = {r["doc_id"] for r in wcat.get_retrieved(0, pid)}
        assert 1 in got or 4 in got  # sub-question hits merged in


class TestRerank:
    def test_rerank_reorders(self, wcat):
        from autorag_research_tpu.pipelines.retrieval.rerank import RerankConfig

        res = run_pipeline_config(
            wcat,
            RerankConfig(
                name="rr", inner_retrieval_pipeline_name="vs",
                reranker=MockReranker(), top_k=3,
            ),
            subs=("vs",),
        )
        assert res.success, res.report()
        pid = res.pipelines[0].stats["pipeline_id"]
        # MockReranker scores token overlap: "quick fox" -> docs 0/4/5 on top
        top = wcat.get_retrieved(0, pid)[0]["doc_id"]
        assert top in (0, 4, 5)


class TestPowerOfNoise:
    def test_noise_injection_and_order(self, wcat):
        from autorag_research_tpu.pipelines.retrieval.power_of_noise import PowerOfNoiseConfig

        res = run_pipeline_config(
            wcat,
            PowerOfNoiseConfig(
                name="pon", base_retrieval_pipeline_name="vs",
                noise_count=2, noise_order="noise_first", top_k=5, seed=1,
            ),
            subs=("vs",),
        )
        assert res.success, res.report()
        pid = res.pipelines[0].stats["pipeline_id"]
        rows = wcat.get_retrieved(0, pid)
        assert len(rows) == 5
        # deterministic for the seed: rerunning gives identical rows
        registry.invalidate()
        wcat.delete_retrieved_by_pipeline(pid)
        res2 = run_pipeline_config(
            wcat,
            PowerOfNoiseConfig(
                name="pon", base_retrieval_pipeline_name="vs",
                noise_count=2, noise_order="noise_first", top_k=5, seed=1,
            ),
            subs=("vs",),
        )
        rows2 = wcat.get_retrieved(0, pid)
        assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in rows2]

    def test_validation(self, wcat):
        from autorag_research_tpu.pipelines.retrieval.power_of_noise import PowerOfNoisePipeline

        with pytest.raises(ValueError):
            PowerOfNoisePipeline(wcat, noise_count=-1)
        with pytest.raises(ValueError):
            PowerOfNoisePipeline(wcat, noise_ratio=1.5)


class TestRetroStar:
    def test_rubric_scores_rank(self, wcat):
        from autorag_research_tpu.pipelines.retrieval.retro_star import RetroStarConfig

        def scorer(prompt):
            # give 10 to the doc about dogs sleeping, low otherwise
            return "10" if "lazy dog sleeps" in prompt else "2"

        res = run_pipeline_config(
            wcat,
            RetroStarConfig(
                name="rs", retrieval_pipeline_name="bm25",
                llm=MockLLM(responder=scorer), candidate_top_k=6, top_k=3,
            ),
            subs=("bm25",),
        )
        assert res.success, res.report()
        pid = res.pipelines[0].stats["pipeline_id"]
        for qid in (0, 1):
            rows = wcat.get_retrieved(qid, pid)
            if any(r["doc_id"] == 1 for r in rows):
                assert rows[0]["doc_id"] == 1  # rubric winner ranks first


class TestGQR:
    def test_refinement_runs_and_improves_consensus(self, wcat):
        from autorag_research_tpu.pipelines.retrieval.gqr_hybrid import GQRHybridConfig

        res = run_pipeline_config(
            wcat,
            GQRHybridConfig(
                name="gqr", retrieval_pipeline_1_name="vs",
                retrieval_pipeline_2_name="bm25", top_k=3, n_steps=10,
            ),
            subs=("vs", "bm25"),
        )
        assert res.success, res.report()
        pid = res.pipelines[0].stats["pipeline_id"]
        rows = wcat.get_retrieved(0, pid)
        assert len(rows) == 3
        # refined scores are cosines in [-1, 1]
        assert all(-1.01 <= r["rel_score"] <= 1.01 for r in rows)

    def test_multi_vector_maxsim_refinement(self, tmp_path):
        """MaxSim GQR: argmax-subgradient ascent over a multi-vector primary
        (reference _maxsim_gradients path)."""
        import numpy as np

        from autorag_research_tpu.embeddings import MockMultiVectorEmbedding
        from autorag_research_tpu.pipelines.retrieval.gqr_hybrid import GQRHybridPipeline
        from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchPipeline
        from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Pipeline
        from autorag_research_tpu.store.catalog import Catalog

        registry.invalidate()
        memb = MockMultiVectorEmbedding(dim=16, max_tokens=4)
        docs = [f"topic {chr(97 + i)} words here" for i in range(6)]
        cat = Catalog(tmp_path / "gqrm.db", embedding_dim=16)
        cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(docs)])
        cat.set_multi_embeddings(
            "chunk", [(i, memb.embed_texts_multi([d])[0]) for i, d in enumerate(docs)]
        )
        cat.add_queries([{"id": 0, "contents": docs[2]}])
        cat.set_multi_embeddings("query", [(0, memb.embed_texts_multi([docs[2]])[0])])

        primary = VectorSearchPipeline(cat, "mv", search_mode="multi")
        comp = BM25Pipeline(cat, "bm25_gqr")
        gqr = GQRHybridPipeline(
            cat, "gqr_mv",
            primary_retrieval_pipeline=primary,
            complementary_retrieval_pipeline=comp,
            n_steps=5,
        )
        hits = run_async(gqr._retrieve_by_id(0, 3))
        assert len(hits) == 3
        assert hits[0]["doc_id"] == 2  # exact-match doc stays on top
        assert all(np.isfinite(h["score"]) for h in hits)
        registry.invalidate()


@pytest.fixture
def image_catalog(tmp_path):
    registry.invalidate()
    memb = MockMultiVectorEmbedding(dim=32, max_tokens=6)
    cat = Catalog(tmp_path / "img.db", embedding_dim=32)
    images = [f"image bytes {i}".encode() for i in range(5)]
    cat.add_image_chunks(
        [
            {"id": i, "image": img, "mimetype": "image/png",
             "embedding": EMB.embed_images([img])[0]}
            for i, img in enumerate(images)
        ]
    )
    cat.set_multi_embeddings(
        "image_chunk", [(i, memb.embed_images_multi([img])[0]) for i, img in enumerate(images)]
    )
    cat.add_queries([{"id": 0, "contents": "find image three"}])
    cat.set_embeddings("query", [(0, EMB.embed_images([images[3]])[0])])
    cat.set_multi_embeddings("query", [(0, memb.embed_images_multi([images[3]])[0])])
    cat.add_retrieval_gt(0, 3, chunk_type="image_chunk")
    yield cat
    registry.invalidate()


class TestImagePipelines:
    def test_image_vector_search(self, image_catalog):
        from autorag_research_tpu.pipelines.retrieval.image_vector_search import (
            ImageVectorSearchConfig,
        )

        res = run_pipeline_config(
            image_catalog, ImageVectorSearchConfig(name="ivs", top_k=2)
        )
        assert res.success, res.report()
        pid = res.pipelines[0].stats["pipeline_id"]
        rows = image_catalog.get_retrieved(0, pid, "image_chunk")
        assert rows[0]["doc_id"] == 3  # query embedding == image 3 embedding
        # persisted in the image table, not the chunk table
        assert image_catalog.get_retrieved(0, pid, "chunk") == []
        assert res.pipelines[0].metrics[0].average == 1.0

    def test_heaven_two_stage(self, image_catalog):
        from autorag_research_tpu.pipelines.retrieval.heaven import HEAVENConfig

        res = run_pipeline_config(
            image_catalog,
            HEAVENConfig(name="heaven", stage1_candidate_count=5, top_k=2),
        )
        assert res.success, res.report()
        pid = res.pipelines[0].stats["pipeline_id"]
        rows = image_catalog.get_retrieved(0, pid, "image_chunk")
        assert rows[0]["doc_id"] == 3
        assert res.pipelines[0].metrics[0].average == 1.0


class TestRerankers:
    def test_llm_listwise(self):
        from autorag_research_tpu.rerankers import LLMListwiseReranker

        llm = MockLLM(responder=lambda p: "3 > 1 > 2")
        rr = LLMListwiseReranker(llm)
        out = rr.rerank("q", ["a", "b", "c"])
        assert [r.index for r in out] == [2, 0, 1]

    def test_llm_listwise_handles_partial_ranking(self):
        from autorag_research_tpu.rerankers import LLMListwiseReranker

        llm = MockLLM(responder=lambda p: "2")
        out = LLMListwiseReranker(llm).rerank("q", ["a", "b", "c"])
        assert [r.index for r in out] == [1, 0, 2]

    def test_llm_listwise_sliding_window(self):
        """Lists longer than the window rank via RankGPT sliding passes —
        each prompt holds at most `window` passages, and a strong tail
        candidate bubbles to the front (regression: window was unused and
        the whole list went into ONE prompt)."""
        import re

        from autorag_research_tpu.rerankers import LLMListwiseReranker

        prompts = []

        def responder(p):
            prompts.append(p)
            # rank the passage whose text contains 'best' first, rest as-is
            nums = re.findall(r"\[(\d+)\] (\w+)", p)
            order = sorted(nums, key=lambda t: t[1] != "best")
            return " > ".join(n for n, _ in order)

        texts = ["doc%d" % i for i in range(9)] + ["best"]
        out = LLMListwiseReranker(MockLLM(responder=responder), window=4).rerank(
            "q", texts
        )
        assert out[0].text == "best"  # bubbled from the tail through windows
        for p in prompts:
            assert len(re.findall(r"\[\d+\]", p)) <= 4

    def test_api_reranker_provider_param_names(self):
        """Voyage/Mixedbread take top_k (and Mixedbread 'input'); Cohere/Jina
        take top_n/documents (regression: one payload shape for all four)."""
        from autorag_research_tpu.rerankers.api import (
            CohereReranker,
            MixedbreadReranker,
            VoyageReranker,
        )

        seen = {}

        def fake_post(self, payload):
            seen.update(payload)
            return {"results": [{"index": 0, "relevance_score": 1.0}]}

        for cls, docs_key, topk_key in (
            (CohereReranker, "documents", "top_n"),
            (VoyageReranker, "documents", "top_k"),
            (MixedbreadReranker, "input", "top_k"),
        ):
            seen.clear()
            rr = cls(api_key="k")
            rr._post = fake_post.__get__(rr)
            rr.rerank("q", ["a", "b"], top_k=1)
            assert seen[docs_key] == ["a", "b"], cls.__name__
            assert seen[topk_key] == 1, cls.__name__

    def test_embedding_similarity(self):
        from autorag_research_tpu.rerankers import EmbeddingSimilarityReranker

        rr = EmbeddingSimilarityReranker(EMB)
        out = rr.rerank("quick fox", ["quick fox", "other text"], top_k=1)
        assert out[0].text == "quick fox"
        assert out[0].score == pytest.approx(1.0, abs=1e-5)

    def test_hf_rerankers_gate_cleanly(self):
        from autorag_research_tpu.exceptions import ModelLoadError
        from autorag_research_tpu.rerankers.hf import CrossEncoderReranker

        with pytest.raises(ModelLoadError):
            CrossEncoderReranker("nonexistent/model").rerank("q", ["a"])

    def test_api_rerankers_gate_cleanly(self):
        from autorag_research_tpu.exceptions import LLMError
        from autorag_research_tpu.rerankers.api import CohereReranker

        with pytest.raises(LLMError):
            CohereReranker(api_key=None).rerank("q", ["a"])


def test_colbert_reranker_offline():
    from autorag_research_tpu.embeddings import MockMultiVectorEmbedding
    from autorag_research_tpu.rerankers.colbert import ColBERTReranker

    rr = ColBERTReranker(MockMultiVectorEmbedding(dim=32))
    out = rr.rerank("quick fox", ["quick fox", "unrelated text entirely"], top_k=2)
    assert out[0].text == "quick fox"
    assert out[0].score > out[1].score
    assert out[0].score == pytest.approx(1.0, abs=1e-5)


def test_retro_star_score_tag_contract():
    from autorag_research_tpu.pipelines.retrieval.retro_star import _parse_score

    assert _parse_score("reasoning... <score>87</score>") == 87.0
    assert _parse_score("<score>10</score> draft <score>92</score>") == 92.0  # last wins
    assert _parse_score("<score>150</score>") == 100.0  # clamped
    assert _parse_score("I rate this 7") == 7.0  # bare-number fallback
    assert _parse_score("no score") == 0.0


class TestUnitPropagation:
    def test_hybrid_of_image_pipelines_uses_image_unit(self, tmp_path):
        """Hybrid legs' unit propagates (regression: hardcoded 'chunk' wrote
        image ids into the chunk result table); mixed legs raise."""
        from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Pipeline
        from autorag_research_tpu.pipelines.retrieval.hybrid import HybridRRFPipeline
        from autorag_research_tpu.pipelines.retrieval.image_vector_search import (
            ImageVectorSearchPipeline,
        )

        registry.invalidate()
        cat = Catalog(tmp_path / "u.db", embedding_dim=32)
        cat.add_chunks([{"id": 0, "contents": "text", "embedding": EMB.embed_query("t")}])
        cat.add_image_chunks(
            [{"id": "p1", "image": b"\x89PNG", "mimetype": "image/png",
              "embedding": EMB.embed_query("img")}]
        )
        img1 = ImageVectorSearchPipeline(cat, "i1", embedding_model=EMB)
        img2 = ImageVectorSearchPipeline(cat, "i2", embedding_model=EMB)
        hy = HybridRRFPipeline(cat, "h_img", pipeline_1=img1, pipeline_2=img2)
        assert hy.retrieval_unit == "image_chunk"
        from autorag_research_tpu.pipelines.retrieval.rerank import RerankPipeline
        from autorag_research_tpu.rerankers import MockReranker

        rr = RerankPipeline(cat, "rr_img", inner_retrieval_pipeline=img1,
                            reranker=MockReranker())
        assert rr.retrieval_unit == "image_chunk"
        with pytest.raises(ValueError, match="different units"):
            HybridRRFPipeline(cat, "h_mixed", pipeline_1=img1,
                              pipeline_2=BM25Pipeline(cat, "b_mix"))
        registry.invalidate()


class TestPowerOfNoiseSemantics:
    def test_noise_capped_at_top_k_and_base_skipped(self, wcat):
        from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Pipeline
        from autorag_research_tpu.pipelines.retrieval.power_of_noise import (
            PowerOfNoisePipeline,
        )

        base = BM25Pipeline(wcat, "b_pon")
        calls = []
        orig = base._retrieve_by_id

        async def spy(qid, k):
            calls.append(k)
            return await orig(qid, k)

        base._retrieve_by_id = spy
        pipe = PowerOfNoisePipeline(
            wcat, "pon_cap", base_retrieval_pipeline=base, noise_count=20
        )
        out = run_async(pipe._retrieve_by_id(0, 5))
        # reference: noise = min(top_k, count) = 5, base_k = 0 -> base SKIPPED
        assert len(out) == 5 and calls == []

    def test_text_path_noise_varies_by_query_text(self, wcat):
        from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Pipeline
        from autorag_research_tpu.pipelines.retrieval.power_of_noise import (
            PowerOfNoisePipeline,
        )

        pipe = PowerOfNoisePipeline(
            wcat, "pon_seed",
            base_retrieval_pipeline=BM25Pipeline(wcat, "b_seed"),
            noise_count=3,
        )
        sets = [
            {h["doc_id"] for h in run_async(pipe._retrieve_by_text(t, 4))}
            for t in ("alpha question", "beta question", "gamma question")
        ]
        # seeded by query TEXT (reference _build_seed_key): distinct texts
        # must not all draw an identical noise set (regression: seed was None)
        assert len({frozenset(s) for s in sets}) > 1
