"""IVF ANN index: recall vs exact, spill handling, persistence, pipeline opt-in."""

import numpy as np
import pytest

from autorag_research_tpu.index.dense import DenseIndex
from autorag_research_tpu.index.ivf import IVFIndex


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(20, 48)).astype(np.float32) * 3
    points = np.concatenate(
        [c + rng.normal(size=(100, 48)).astype(np.float32) * 0.3 for c in centers]
    )
    queries = np.concatenate(
        [c + rng.normal(size=(2, 48)).astype(np.float32) * 0.3 for c in centers]
    )
    ids = [f"d{i}" for i in range(len(points))]
    return ids, points, queries


def recall_at_k(approx_hits, exact_hits, k):
    scores = []
    for a, e in zip(approx_hits, exact_hits):
        a_ids = {h.doc_id for h in a[:k]}
        e_ids = {h.doc_id for h in e[:k]}
        scores.append(len(a_ids & e_ids) / max(len(e_ids), 1))
    return float(np.mean(scores))


def test_recall_vs_exact(clustered):
    ids, points, queries = clustered
    exact = DenseIndex(ids, points).search(queries, 10)
    ivf = IVFIndex(ids, points, n_cells=20, nprobe=4, seed=0)
    approx = ivf.search(queries, 10)
    assert recall_at_k(approx, exact, 10) > 0.9
    # more probes -> recall monotonically complete
    full = ivf.search(queries, 10, nprobe=20)
    assert recall_at_k(full, exact, 10) == pytest.approx(1.0)


def test_no_docs_dropped(clustered):
    ids, points, _ = clustered
    ivf = IVFIndex(ids, points, n_cells=16, pad_factor=1.2)
    packed = ivf.members[ivf.members < len(ids)]
    assert len(packed) == len(ids)
    assert len(set(packed.tolist())) == len(ids)  # each doc exactly once


def test_scores_match_exact_for_found_docs(clustered):
    ids, points, queries = clustered
    exact = DenseIndex(ids, points).search(queries[:4], 5)
    ivf = IVFIndex(ids, points, n_cells=20, nprobe=20)
    approx = ivf.search(queries[:4], 5)
    for a, e in zip(approx, exact):
        assert [h.doc_id for h in a] == [h.doc_id for h in e]
        np.testing.assert_allclose(
            [h.score for h in a], [h.score for h in e], rtol=1e-4, atol=1e-5
        )


def test_save_load(tmp_path, clustered):
    ids, points, queries = clustered
    ivf = IVFIndex(ids, points, n_cells=16)
    before = ivf.search(queries[:2], 5)
    ivf.save(tmp_path / "ivf")
    ivf2 = IVFIndex.load(tmp_path / "ivf")
    after = ivf2.search(queries[:2], 5)
    assert [[h.doc_id for h in r] for r in before] == [[h.doc_id for h in r] for r in after]


def test_tiny_corpus():
    rng = np.random.default_rng(1)
    points = rng.normal(size=(5, 16)).astype(np.float32)
    ivf = IVFIndex(list(range(5)), points)
    hits = ivf.search(points[:1], 3)
    assert hits[0][0].doc_id == 0


def test_pipeline_opt_in(tmp_path):
    from autorag_research_tpu.config import BaseMetricConfig, ExecutorConfig
    from autorag_research_tpu.embeddings import MockEmbedding
    from autorag_research_tpu.executor import Executor
    from autorag_research_tpu.index import registry
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchConfig
    from autorag_research_tpu.store.catalog import Catalog

    registry.invalidate()
    emb = MockEmbedding(dim=32)
    cat = Catalog(tmp_path / "ivf.db", embedding_dim=32)
    docs = [f"document number {i}" for i in range(64)]
    cat.add_chunks([{"id": i, "contents": d, "embedding": emb.embed_query(d)} for i, d in enumerate(docs)])
    cat.add_queries([{"id": 0, "contents": docs[7], "embedding": emb.embed_query(docs[7])}])
    cat.add_retrieval_gt(0, 7)
    cfg = ExecutorConfig(
        pipelines=[VectorSearchConfig(name="ivf_vs", index_type="ivf", top_k=3)],
        metrics=[BaseMetricConfig(name="recall")],
        health_check=False,
    )
    result = Executor(cat, cfg).run()
    assert result.success, result.report()
    assert result.pipelines[0].metrics[0].average == 1.0
    registry.invalidate()


def test_small_pad_factor_never_crashes(clustered):
    ids, points, _ = clustered
    ivf = IVFIndex(ids, points, n_cells=16, pad_factor=0.5)
    packed = ivf.members[ivf.members < len(ids)]
    assert len(set(packed.tolist())) == len(ids)


class TestShardedIVF:
    def test_full_probe_matches_exact(self, clustered):
        """nprobe = all cells per shard -> every local doc is a candidate, so
        the sharded ANN must equal the exact dense ranking."""
        from autorag_research_tpu.parallel.mesh import corpus_mesh

        ids, points, queries = clustered
        exact = DenseIndex(ids, points).search(queries[:6], 8)
        ivf = IVFIndex(ids, points, n_cells=32, nprobe=8, seed=0)
        ivf.to_device(corpus_mesh(n_corpus=8))
        full = ivf.search(queries[:6], 8, nprobe=10_000)  # clamped to all cells
        for a, e in zip(full, exact):
            assert [h.doc_id for h in a] == [h.doc_id for h in e]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in e], rtol=1e-4, atol=1e-5
            )

    def test_sharded_recall(self, clustered):
        from autorag_research_tpu.parallel.mesh import corpus_mesh

        ids, points, queries = clustered
        exact = DenseIndex(ids, points).search(queries, 10)
        ivf = IVFIndex(ids, points, n_cells=32, nprobe=4, seed=0)
        ivf.to_device(corpus_mesh(n_corpus=4))
        approx = ivf.search(queries, 10)
        assert recall_at_k(approx, exact, 10) > 0.9

    def test_uneven_shards(self):
        """n not divisible by shard count: tail padding must not leak fake
        hits (zero pad rows score 0 and would pollute low-score queries)."""
        from autorag_research_tpu.parallel.mesh import corpus_mesh

        rng = np.random.default_rng(3)
        points = rng.normal(size=(101, 24)).astype(np.float32)
        ids = list(range(101))
        ivf = IVFIndex(ids, points, n_cells=8, nprobe=8)
        ivf.to_device(corpus_mesh(n_corpus=8))
        hits = ivf.search(points[:5], 7, nprobe=8)
        exact = DenseIndex(ids, points).search(points[:5], 7)
        for a, e in zip(hits, exact):
            assert [h.doc_id for h in a] == [h.doc_id for h in e]

    def test_pipeline_with_mesh_uses_sharded_ivf(self, tmp_path):
        from autorag_research_tpu.config import BaseMetricConfig, BuildContext, ExecutorConfig
        from autorag_research_tpu.embeddings import MockEmbedding
        from autorag_research_tpu.executor import Executor
        from autorag_research_tpu.index import registry
        from autorag_research_tpu.parallel.mesh import corpus_mesh
        from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchConfig
        from autorag_research_tpu.store.catalog import Catalog

        registry.invalidate()
        emb = MockEmbedding(dim=32)
        cat = Catalog(tmp_path / "sivf.db", embedding_dim=32)
        docs = [f"document number {i}" for i in range(64)]
        cat.add_chunks(
            [{"id": i, "contents": d, "embedding": emb.embed_query(d)} for i, d in enumerate(docs)]
        )
        cat.add_queries([{"id": 0, "contents": docs[9], "embedding": emb.embed_query(docs[9])}])
        cat.add_retrieval_gt(0, 9)
        cfg = ExecutorConfig(
            pipelines=[VectorSearchConfig(name="sivf_vs", index_type="ivf", top_k=3)],
            metrics=[BaseMetricConfig(name="recall")],
            health_check=False,
        )
        context = BuildContext(mesh=corpus_mesh(n_corpus=8))
        result = Executor(cat, cfg, context).run()
        assert result.success, result.report()
        assert result.pipelines[0].metrics[0].average == 1.0
        registry.invalidate()
