"""Fusion math parity + hybrid pipeline end-to-end (dense + BM25 legs)."""

import numpy as np
import pytest

from autorag_research_tpu.ops.fusion import cc_fuse, fuse_batch_rrf, rrf_fuse


def hits(pairs):
    return [{"doc_id": d, "score": s} for d, s in pairs]


class TestRRF:
    def test_basic_fusion(self):
        r1 = hits([("a", 0.9), ("b", 0.8), ("c", 0.7)])
        r2 = hits([("b", 10.0), ("d", 5.0)])
        out = rrf_fuse(r1, r2, k=60, top_k=4, fetch_k=3)
        by_id = {h["doc_id"]: h["score"] for h in out}
        missing = 1.0 / (60 + 3 + 1)
        assert by_id["b"] == pytest.approx(1 / 62 + 1 / 61)
        assert by_id["a"] == pytest.approx(1 / 61 + missing)
        assert by_id["d"] == pytest.approx(1 / 62 + missing)
        assert out[0]["doc_id"] == "b"  # in both lists -> wins

    def test_rank_based_ignores_scores(self):
        r1 = hits([("a", 1000.0)])
        r2 = hits([("b", 0.001)])
        out = rrf_fuse(r1, r2, k=60, top_k=2, fetch_k=1)
        assert out[0]["score"] == pytest.approx(out[1]["score"])

    def test_device_batch_matches_host(self):
        r1 = hits([(3, 0.9), (1, 0.8), (7, 0.7)])
        r2 = hits([(1, 10.0), (9, 5.0), (3, 1.0)])
        host = rrf_fuse(r1, r2, k=60, top_k=4, fetch_k=3)
        ids_1 = np.array([[3, 1, 7]], dtype=np.int32)
        ids_2 = np.array([[1, 9, 3]], dtype=np.int32)
        scores, ids = fuse_batch_rrf(ids_1, ids_2, k=60, top_k=4, fetch_k=3)
        assert list(np.asarray(ids)[0]) == [h["doc_id"] for h in host]
        np.testing.assert_allclose(
            np.asarray(scores)[0], [h["score"] for h in host], rtol=1e-6
        )


class TestCC:
    def test_mm_fusion(self):
        r1 = hits([("a", 0.9), ("b", 0.5), ("c", 0.1)])
        r2 = hits([("b", 20.0), ("c", 10.0)])
        out = cc_fuse(r1, r2, weight=0.5, top_k=3, normalize_method="mm")
        by_id = {h["doc_id"]: h["score"] for h in out}
        # norm1: a=1, b=0.5, c=0; norm2: b=1, c=0; a missing->floor 0
        assert by_id["a"] == pytest.approx(0.5 * 1.0 + 0.5 * 0.0)
        assert by_id["b"] == pytest.approx(0.5 * 0.5 + 0.5 * 1.0)
        assert out[0]["doc_id"] == "b"

    def test_weight_extremes(self):
        r1 = hits([("a", 1.0), ("b", 0.5)])
        r2 = hits([("b", 1.0), ("a", 0.5)])
        out1 = cc_fuse(r1, r2, weight=1.0, top_k=2, normalize_method="mm")
        assert out1[0]["doc_id"] == "a"
        out0 = cc_fuse(r1, r2, weight=0.0, top_k=2, normalize_method="mm")
        assert out0[0]["doc_id"] == "b"

    def test_z_floor(self):
        r1 = hits([("a", 1.0), ("b", 0.0)])
        r2 = hits([("a", 5.0)])
        out = cc_fuse(r1, r2, weight=0.5, top_k=2, normalize_method="z")
        by_id = {h["doc_id"]: h["score"] for h in out}
        # b missing from r2 -> floor -3 for that leg
        assert by_id["b"] == pytest.approx(0.5 * -1.0 + 0.5 * -3.0)

    def test_tmm_requires_mins(self):
        with pytest.raises(ValueError):
            cc_fuse(hits([("a", 1.0)]), hits([("a", 1.0)]), normalize_method="tmm")

    def test_tmm_with_mins(self):
        r1 = hits([("a", 0.5), ("b", -0.5)])  # cosine-like, min -1
        r2 = hits([("a", 4.0), ("b", 2.0)])  # bm25-like, min 0
        out = cc_fuse(
            r1, r2, weight=0.5, top_k=2, normalize_method="tmm",
            pipeline_1_min=-1.0, pipeline_2_min=0.0,
        )
        by_id = {h["doc_id"]: h["score"] for h in out}
        assert by_id["a"] == pytest.approx(0.5 * 1.0 + 0.5 * 1.0)
        assert by_id["b"] == pytest.approx(0.5 * (0.5 / 1.5) + 0.5 * 0.5)


class TestHybridPipelines:
    @pytest.fixture
    def hybrid_catalog(self, tmp_path):
        from autorag_research_tpu.embeddings import MockEmbedding
        from autorag_research_tpu.index import registry
        from autorag_research_tpu.store.catalog import Catalog
        from autorag_research_tpu.store.gt import or_all

        registry.invalidate()
        emb = MockEmbedding(dim=32)
        docs = [
            "quick brown fox jumps",
            "lazy dog sleeps",
            "database of vectors",
            "fox and dog together",
            "tpu matrix hardware",
        ]
        cat = Catalog(tmp_path / "hyb.db", embedding_dim=32)
        cat.add_chunks(
            [{"id": i, "contents": d, "embedding": emb.embed_query(d)} for i, d in enumerate(docs)]
        )
        cat.add_queries(
            [{"id": 0, "contents": "quick fox", "embedding": emb.embed_query("quick fox")},
             {"id": 1, "contents": "dog sleeping", "embedding": emb.embed_query("dog sleeping")}]
        )
        cat.add_retrieval_gt(0, or_all([0, 3]))
        cat.add_retrieval_gt(1, 1)
        yield cat
        registry.invalidate()

    @pytest.mark.parametrize("hybrid_type,extra", [
        ("hybrid_rrf", {}),
        ("hybrid_cc", {"normalize_method": "mm"}),
        ("hybrid_cc", {"normalize_method": "tmm"}),
        ("hybrid_cc", {"normalize_method": "z"}),
        ("hybrid_cc", {"normalize_method": "dbsf"}),
    ])
    def test_executor_with_hybrid(self, hybrid_catalog, hybrid_type, extra):
        from autorag_research_tpu.config import BaseMetricConfig, ExecutorConfig
        from autorag_research_tpu.executor import Executor
        from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config
        from autorag_research_tpu.pipelines.retrieval.hybrid import HybridCCConfig, HybridRRFConfig
        from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchConfig

        sub = [VectorSearchConfig(name="vs"), BM25Config(name="bm25")]
        if hybrid_type == "hybrid_rrf":
            hyb = HybridRRFConfig(
                name="hyb", retrieval_pipeline_1_name="vs",
                retrieval_pipeline_2_name="bm25", top_k=3,
            )
        else:
            hyb = HybridCCConfig(
                name=f"hyb_{extra['normalize_method']}",
                retrieval_pipeline_1_name="vs",
                retrieval_pipeline_2_name="bm25", top_k=3, **extra,
            )
        cfg = ExecutorConfig(
            pipelines=[hyb],
            metrics=[BaseMetricConfig(name="recall"), BaseMetricConfig(name="ndcg")],
            health_check=False,
        )
        ctx_pipelines = {c.name: c for c in sub}
        from autorag_research_tpu.config import BuildContext

        result = Executor(
            hybrid_catalog, cfg, BuildContext(pipeline_configs=ctx_pipelines)
        ).run()
        assert result.success, result.report()
        # BM25 leg guarantees the lexical-match docs surface
        assert result.pipelines[0].metrics[0].average == 1.0

    def test_cycle_detection(self, hybrid_catalog):
        from autorag_research_tpu.config import BuildContext
        from autorag_research_tpu.exceptions import PipelineCycleError
        from autorag_research_tpu.pipelines.loader import PipelineLoader
        from autorag_research_tpu.pipelines.retrieval.hybrid import HybridRRFConfig

        a = HybridRRFConfig(name="a", retrieval_pipeline_1_name="b", retrieval_pipeline_2_name="b")
        b = HybridRRFConfig(name="b", retrieval_pipeline_1_name="a", retrieval_pipeline_2_name="a")
        loader = PipelineLoader(
            hybrid_catalog, BuildContext(pipeline_configs={"a": a, "b": b})
        )
        with pytest.raises(PipelineCycleError):
            loader.load("a")


class TestDeviceCC:
    @pytest.mark.parametrize("method,mins", [
        ("mm", (None, None)), ("z", (None, None)),
        ("dbsf", (None, None)), ("tmm", (-1.0, 0.0)),
    ])
    def test_device_cc_matches_host(self, method, mins):
        from autorag_research_tpu.ops.fusion import fuse_batch_cc

        r1 = hits([(3, 0.9), (1, 0.5), (7, 0.2)])
        r2 = hits([(1, 12.0), (9, 6.0), (3, 1.0)])
        host = cc_fuse(
            r1, r2, weight=0.3, top_k=4, normalize_method=method,
            pipeline_1_min=mins[0], pipeline_2_min=mins[1],
        )
        ids_1 = np.array([[3, 1, 7]], dtype=np.int32)
        s_1 = np.array([[0.9, 0.5, 0.2]], dtype=np.float32)
        ids_2 = np.array([[1, 9, 3]], dtype=np.int32)
        s_2 = np.array([[12.0, 6.0, 1.0]], dtype=np.float32)
        scores, ids = fuse_batch_cc(
            ids_1, s_1, ids_2, s_2, weight=0.3, top_k=4,
            normalize_method=method, pipeline_1_min=mins[0], pipeline_2_min=mins[1],
        )
        assert list(np.asarray(ids)[0]) == [h["doc_id"] for h in host]
        np.testing.assert_allclose(
            np.asarray(scores)[0], [h["score"] for h in host], rtol=1e-5, atol=1e-6
        )


class TestReviewRegressions:
    def test_device_rrf_ignores_intmax_pads(self):
        from autorag_research_tpu.ops.dense import INT_MAX

        ids_1 = np.array([[5, 7, INT_MAX]], dtype=np.int32)
        ids_2 = np.array([[7, INT_MAX, INT_MAX]], dtype=np.int32)
        scores, ids = fuse_batch_rrf(ids_1, ids_2, k=60, top_k=3, fetch_k=3)
        ids = np.asarray(ids)[0]
        assert INT_MAX not in ids[:2]
        assert ids[0] == 7  # in both lists

    def test_device_cc_ignores_intmax_pads(self):
        from autorag_research_tpu.ops.dense import INT_MAX
        from autorag_research_tpu.ops.fusion import fuse_batch_cc

        ids_1 = np.array([[5, 7, INT_MAX]], dtype=np.int32)
        s_1 = np.array([[0.9, 0.5, -3.4e38]], dtype=np.float32)
        ids_2 = np.array([[7, INT_MAX, INT_MAX]], dtype=np.int32)
        s_2 = np.array([[4.0, -3.4e38, -3.4e38]], dtype=np.float32)
        scores, ids = fuse_batch_cc(
            ids_1, s_1, ids_2, s_2, weight=0.5, top_k=3, normalize_method="mm"
        )
        host = cc_fuse(
            hits([(5, 0.9), (7, 0.5)]), hits([(7, 4.0)]),
            weight=0.5, top_k=3, normalize_method="mm",
        )
        assert list(np.asarray(ids)[0][:2]) == [h["doc_id"] for h in host[:2]]
        np.testing.assert_allclose(
            np.asarray(scores)[0][:2], [h["score"] for h in host[:2]], rtol=1e-5
        )

    def test_host_fusers_int_id_tiebreak(self):
        # tied scores: doc 2 must rank before doc 10 (numeric, not string, order)
        out = rrf_fuse(hits([(10, 1.0)]), hits([(2, 1.0)]), k=60, top_k=2, fetch_k=1)
        assert [h["doc_id"] for h in out] == [2, 10]


class TestFusionHostDeviceFuzz:
    """Randomized host-vs-device fusion agreement: the batched device fusers
    must reproduce the host fusers' exact ids and scores over random
    candidate lists (overlaps, disjoint tails, duplicates across legs)."""

    @pytest.mark.parametrize("seed", range(4))
    def test_rrf_agreement(self, seed):
        rng = np.random.default_rng(300 + seed)
        fetch_k = int(rng.integers(2, 9))
        top_k = int(rng.integers(1, 2 * fetch_k + 1))
        pool = int(rng.integers(fetch_k, 4 * fetch_k))
        ids_1 = rng.choice(pool, size=fetch_k, replace=False).astype(np.int32)
        ids_2 = rng.choice(pool, size=fetch_k, replace=False).astype(np.int32)
        r1 = hits([(int(i), float(fetch_k - r)) for r, i in enumerate(ids_1)])
        r2 = hits([(int(i), float(fetch_k - r)) for r, i in enumerate(ids_2)])
        host = rrf_fuse(r1, r2, k=60, top_k=top_k, fetch_k=fetch_k)
        scores, ids = fuse_batch_rrf(
            ids_1[None, :], ids_2[None, :], k=60, top_k=top_k, fetch_k=fetch_k
        )
        got_ids = [int(i) for i in np.asarray(ids)[0][: len(host)]]
        assert got_ids == [h["doc_id"] for h in host], (seed, fetch_k, top_k)
        np.testing.assert_allclose(
            np.asarray(scores)[0][: len(host)],
            [h["score"] for h in host], rtol=1e-6,
        )

    @pytest.mark.parametrize("seed", range(4))
    def test_cc_agreement(self, seed):
        from autorag_research_tpu.ops.fusion import fuse_batch_cc

        rng = np.random.default_rng(400 + seed)
        fetch_k = int(rng.integers(2, 8))
        top_k = int(rng.integers(1, fetch_k + 2))
        weight = float(rng.uniform(0.1, 0.9))
        pool = int(rng.integers(fetch_k, 3 * fetch_k))
        ids_1 = rng.choice(pool, size=fetch_k, replace=False).astype(np.int32)
        ids_2 = rng.choice(pool, size=fetch_k, replace=False).astype(np.int32)
        s1 = np.sort(rng.uniform(-0.5, 1.0, size=fetch_k))[::-1].astype(np.float32)
        s2 = np.sort(rng.uniform(0.0, 10.0, size=fetch_k))[::-1].astype(np.float32)
        r1 = hits([(int(i), float(s)) for i, s in zip(ids_1, s1)])
        r2 = hits([(int(i), float(s)) for i, s in zip(ids_2, s2)])
        host = cc_fuse(r1, r2, weight=weight, top_k=top_k, normalize_method="mm")
        scores, ids = fuse_batch_cc(
            ids_1[None, :], s1[None, :], ids_2[None, :], s2[None, :],
            weight=weight, top_k=top_k, normalize_method="mm",
        )
        got_ids = [int(i) for i in np.asarray(ids)[0][: len(host)]]
        assert got_ids == [h["doc_id"] for h in host], (seed, fetch_k, top_k)
        np.testing.assert_allclose(
            np.asarray(scores)[0][: len(host)],
            [h["score"] for h in host], rtol=1e-5, atol=1e-6,
        )
