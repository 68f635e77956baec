"""MaxSim kernels vs numpy oracle; MultiVectorIndex; multi-mode pipeline."""

import numpy as np
import pytest

from autorag_research_tpu.index.dense import l2_normalize
from autorag_research_tpu.index.multi_vector import MultiVectorIndex, pad_ragged
from autorag_research_tpu.ops.maxsim import maxsim_topk_pallas, maxsim_topk_xla


def numpy_maxsim(queries, q_lens, docs, d_lens):
    """Oracle: [B, N] raw maxsim scores with masking."""
    b, tq, _ = queries.shape
    n, td, _ = docs.shape
    out = np.zeros((b, n), np.float32)
    for bi in range(b):
        for ni in range(n):
            if d_lens[ni] == 0:
                out[bi, ni] = -np.inf
                continue
            s = queries[bi, : q_lens[bi]] @ docs[ni, : d_lens[ni]].T
            out[bi, ni] = s.max(axis=1).sum() if s.size else 0.0
    return out


@pytest.fixture(scope="module")
def ragged_data():
    rng = np.random.default_rng(5)
    docs = [rng.normal(size=(rng.integers(2, 9), 16)).astype(np.float32) for _ in range(37)]
    queries = [rng.normal(size=(rng.integers(2, 6), 16)).astype(np.float32) for _ in range(5)]
    return queries, docs


def _padded(queries, docs):
    q, ql = pad_ragged(queries)
    d, dl = pad_ragged(docs)
    return q, ql, d, dl


@pytest.mark.parametrize("method", ["xla", "pallas", "pallas_v2", "pallas_v3"])
def test_kernel_matches_oracle(ragged_data, method):
    import jax.numpy as jnp

    queries, docs = ragged_data
    q, ql, d, dl = _padded(queries, docs)
    oracle = numpy_maxsim(q, ql, d, dl)
    order = np.lexsort((np.arange(len(docs))[None].repeat(len(queries), 0), -oracle), axis=1)[:, :5]
    if method == "xla":
        s, ids = maxsim_topk_xla(jnp.asarray(q), jnp.asarray(ql), jnp.asarray(d), jnp.asarray(dl), 5, tile_n=8)
    elif method == "pallas":
        s, ids = maxsim_topk_pallas(
            jnp.asarray(q), jnp.asarray(ql), jnp.asarray(d), jnp.asarray(dl), 5,
            block_q=8, block_n=8, interpret=True,
        )
    else:
        from autorag_research_tpu.ops.maxsim import (
            maxsim_topk_pallas_v2,
            maxsim_topk_pallas_v3,
        )

        kern = maxsim_topk_pallas_v2 if method == "pallas_v2" else maxsim_topk_pallas_v3
        s, ids = kern(
            jnp.asarray(q), jnp.asarray(ql), jnp.asarray(d), jnp.asarray(dl), 5,
            block_q=8, block_n=16, interpret=True,
        )
    np.testing.assert_array_equal(np.asarray(ids), order)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(oracle, order, axis=1), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("mm_docs", [1, 2, 4])
def test_v2_chunked_matmul_matches_oracle(ragged_data, mm_docs):
    """mm_docs chunks the S matmul at page scale; any chunking must be
    score- and id-identical to the unchunked kernel."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.maxsim import maxsim_topk_pallas_v2

    queries, docs = ragged_data
    q, ql, d, dl = _padded(queries, docs)
    oracle = numpy_maxsim(q, ql, d, dl)
    order = np.lexsort((np.arange(len(docs))[None].repeat(len(queries), 0), -oracle), axis=1)[:, :5]
    s, ids = maxsim_topk_pallas_v2(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(d), jnp.asarray(dl), 5,
        block_q=8, block_n=8, mm_docs=mm_docs, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ids), order)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(oracle, order, axis=1), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("k", [5, 25])
def test_scores_kernel_and_topk_via_scores(ragged_data, k):
    """The scores variant returns the full [B, N] matrix; via_scores top-k
    supports k > block_n (the fused kernel's limit) with exact tie order."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.maxsim import (
        maxsim_scores_pallas_v2,
        maxsim_topk_via_scores,
    )

    queries, docs = ragged_data
    q, ql, d, dl = _padded(queries, docs)
    oracle = numpy_maxsim(q, ql, d, dl)
    s_full = maxsim_scores_pallas_v2(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(d), jnp.asarray(dl),
        block_q=8, block_n=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s_full), oracle, rtol=1e-4, atol=1e-5)
    order = np.lexsort(
        (np.arange(len(docs))[None].repeat(len(queries), 0), -oracle), axis=1
    )[:, :k]
    s, ids = maxsim_topk_via_scores(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(d), jnp.asarray(dl), k,
        block_n=8, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ids), order)


@pytest.mark.parametrize("b", [1, 3])
@pytest.mark.parametrize("method", ["pallas", "pallas_v2", "pallas_v3"])
def test_kernel_small_query_batches(ragged_data, method, b):
    """b < 8 rounds the query block up to the 8-sublane granularity (sub-8
    VMEM blocks are rejected by Mosaic on real TPUs); padded query rows must
    not leak into outputs."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.maxsim import (
        maxsim_topk_pallas_v2,
        maxsim_topk_pallas_v3,
    )

    queries, docs = ragged_data
    q, ql, d, dl = _padded(queries[:b], docs)
    oracle = numpy_maxsim(q, ql, d, dl)
    order = np.lexsort((np.arange(len(docs))[None].repeat(b, 0), -oracle), axis=1)[:, :5]
    kern = {
        "pallas": maxsim_topk_pallas,
        "pallas_v2": maxsim_topk_pallas_v2,
        "pallas_v3": maxsim_topk_pallas_v3,
    }[method]
    s, ids = kern(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(d), jnp.asarray(dl), 5,
        block_q=8, block_n=16, interpret=True,
    )
    assert s.shape == (b, 5) and ids.shape == (b, 5)
    np.testing.assert_array_equal(np.asarray(ids), order)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(oracle, order, axis=1), rtol=1e-4, atol=1e-5
    )


def test_empty_doc_masked(ragged_data):
    import jax.numpy as jnp

    queries, docs = ragged_data
    q, ql, d, dl = _padded(queries, docs)
    dl = dl.copy()
    dl[3] = 0  # empty doc must never be retrieved
    s, ids = maxsim_topk_xla(jnp.asarray(q), jnp.asarray(ql), jnp.asarray(d), jnp.asarray(dl), 37, tile_n=8)
    assert not (np.asarray(ids)[:, :36] == 3).any()


class TestMultiVectorIndex:
    def test_score_normalization_convention(self, ragged_data):
        queries, docs = ragged_data
        idx = MultiVectorIndex([f"d{i}" for i in range(len(docs))], docs)
        hits = idx.search(queries[:2], 3, method="xla")
        # normalized vectors + /n_query_vectors -> scores in [-1, 1]
        for row in hits:
            for h in row:
                assert -1.001 <= h.score <= 1.001

    def test_identical_doc_query_is_top(self):
        rng = np.random.default_rng(0)
        docs = [rng.normal(size=(4, 8)).astype(np.float32) for _ in range(10)]
        idx = MultiVectorIndex([f"d{i}" for i in range(10)], docs)
        hits = idx.search([docs[7]], 3, method="xla")
        assert hits[0][0].doc_id == "d7"
        assert hits[0][0].score == pytest.approx(1.0, abs=1e-5)

    def test_save_load(self, tmp_path, ragged_data):
        queries, docs = ragged_data
        idx = MultiVectorIndex([f"d{i}" for i in range(len(docs))], docs)
        before = idx.search(queries[:1], 4, method="xla")
        idx.save(tmp_path / "mv")
        idx2 = MultiVectorIndex.load(tmp_path / "mv")
        after = idx2.search(queries[:1], 4, method="xla")
        assert [h.doc_id for h in before[0]] == [h.doc_id for h in after[0]]

    def test_save_load_restores_prefilter_and_method(self, tmp_path, ragged_data):
        # load bypasses __init__: the prefilter proxies and the pinned
        # search_method must be rebuilt/restored (regression: AttributeError)
        queries, docs = ragged_data
        idx = MultiVectorIndex(
            [f"d{i}" for i in range(len(docs))], docs, search_method="xla"
        )
        before = idx.search(queries[:1], 3, prefilter=100)
        idx.save(tmp_path / "mvp")
        idx2 = MultiVectorIndex.load(tmp_path / "mvp")
        assert idx2.search_method == "xla"
        after = idx2.search(queries[:1], 3, prefilter=100)
        assert [h.doc_id for h in before[0]] == [h.doc_id for h in after[0]]

    def test_sharded_matches_single(self, ragged_data):
        from autorag_research_tpu.parallel.mesh import corpus_mesh

        queries, docs = ragged_data
        ids = [f"d{i}" for i in range(len(docs))]
        single = MultiVectorIndex(ids, docs).search(queries[:3], 5, method="xla")
        mesh = corpus_mesh(n_corpus=8)
        sharded = MultiVectorIndex(ids, docs).to_device(mesh).search(queries[:3], 5)
        for a, b in zip(single, sharded):
            assert [h.doc_id for h in a] == [h.doc_id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-4
            )

    @pytest.mark.parametrize("method", ["xla", "pallas_v2", "auto"])
    def test_sharded_method_agreement(self, ragged_data, method):
        """One dispatch rule on both paths (VERDICT r2 #4): every method,
        mesh or single-device, returns the same ranking."""
        from autorag_research_tpu.parallel.mesh import corpus_mesh

        queries, docs = ragged_data
        ids = [f"d{i}" for i in range(len(docs))]
        single = MultiVectorIndex(ids, docs).search(queries[:2], 5, method="xla")
        mesh = corpus_mesh(n_corpus=4)
        sharded = MultiVectorIndex(ids, docs).to_device(mesh).search(
            queries[:2], 5, method=method
        )
        for a, b in zip(single, sharded):
            assert [h.doc_id for h in a] == [h.doc_id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-4
            )

    def test_max_tokens_cap(self, ragged_data):
        _, docs = ragged_data
        idx = MultiVectorIndex([f"d{i}" for i in range(len(docs))], docs, max_tokens=3)
        assert idx.max_doc_tokens == 3


def test_multi_mode_pipeline(tmp_path):
    from autorag_research_tpu.config import BaseMetricConfig, ExecutorConfig
    from autorag_research_tpu.embeddings import MockMultiVectorEmbedding
    from autorag_research_tpu.executor import Executor
    from autorag_research_tpu.index import registry
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchConfig
    from autorag_research_tpu.store.catalog import Catalog

    registry.invalidate()
    emb = MockMultiVectorEmbedding(dim=16)
    docs = ["alpha beta", "gamma delta epsilon", "zeta eta"]
    cat = Catalog(tmp_path / "mv.db", embedding_dim=16)
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(docs)])
    cat.set_multi_embeddings("chunk", [(i, emb.embed_query_multi(d)) for i, d in enumerate(docs)])
    cat.add_queries([{"id": 0, "contents": "gamma delta"}])
    cat.set_multi_embeddings("query", [(0, emb.embed_query_multi("gamma delta epsilon"))])
    cat.add_retrieval_gt(0, 1)
    cfg = ExecutorConfig(
        pipelines=[VectorSearchConfig(name="mv", search_mode="multi", top_k=2)],
        metrics=[BaseMetricConfig(name="recall")],
        health_check=False,
    )
    result = Executor(cat, cfg).run()
    assert result.success, result.report()
    assert result.pipelines[0].metrics[0].average == 1.0
    registry.invalidate()


class TestPrefilter:
    def make_index(self, n=200, d=24, seed=0):
        from autorag_research_tpu.index.multi_vector import MultiVectorIndex

        rng = np.random.default_rng(seed)
        mats = [rng.normal(size=(rng.integers(2, 9), d)).astype(np.float32) for _ in range(n)]
        return MultiVectorIndex([f"d{i}" for i in range(n)], mats), mats

    def test_full_prefilter_matches_exact(self):
        """prefilter covering the whole corpus must reproduce the exact
        full-scan ranking (candidate stage loses nothing)."""
        idx, mats = self.make_index()
        rng = np.random.default_rng(1)
        queries = [rng.normal(size=(4, 24)).astype(np.float32) for _ in range(5)]
        exact = idx.search(queries, 7)
        two_stage = idx.search(queries, 7, prefilter=1000)  # k*M >= n
        for a, b in zip(exact, two_stage):
            assert [h.doc_id for h in a] == [h.doc_id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-4, atol=1e-6
            )

    def test_small_prefilter_recall(self):
        """Self-match queries: the proxy stage must keep the gold doc."""
        idx, mats = self.make_index()
        queries = [mats[i] for i in (3, 57, 123)]
        hits = idx.search(queries, 3, prefilter=8)
        for qi, i in enumerate((3, 57, 123)):
            assert hits[qi][0].doc_id == f"d{i}"

    def test_rerank_handles_pad_candidates(self):
        """Candidate lists shorter than requested (n < k*M) pad with INT_MAX
        rows — those must never surface as hits."""
        idx, mats = self.make_index(n=5)
        q = [mats[0]]
        hits = idx.search(q, 5, prefilter=100)
        assert len(hits[0]) == 5
        assert hits[0][0].doc_id == "d0"


class TestBucketized:
    """Bucketed ragged layout (bucketize>1): per-token-count buckets must
    reproduce the flat layout's results exactly in every mode, with less
    device memory on skewed corpora."""

    def make_mats(self, n=120, d=16, seed=3):
        # skewed token counts: most docs short, a few long (the regime the
        # bucketed layout exists for)
        rng = np.random.default_rng(seed)
        lens = np.clip(rng.lognormal(1.5, 0.9, size=n).astype(int), 2, 64)
        return [rng.normal(size=(t, d)).astype(np.float32) for t in lens]

    @pytest.mark.parametrize("mode", ["exact", "verified", "int8"])
    def test_bucketed_matches_flat(self, mode):
        mats = self.make_mats()
        ids = [f"d{i}" for i in range(len(mats))]
        queries = self.make_mats(n=4, seed=7)
        flat = MultiVectorIndex(ids, mats, mode=mode)
        bucketed = MultiVectorIndex(ids, mats, mode=mode, bucketize=3)
        h0 = flat.search(queries, 10)
        h1 = bucketed.search(queries, 10)
        assert bucketed._device_buckets is not None
        assert len(bucketed._device_buckets) > 1
        for a, b in zip(h0, h1):
            assert [x.doc_id for x in a] == [x.doc_id for x in b]
            np.testing.assert_allclose(
                [x.score for x in a], [x.score for x in b], rtol=1e-5, atol=1e-6
            )

    def test_device_bytes_shrink(self):
        mats = self.make_mats(n=300)
        ids = list(range(len(mats)))
        flat = MultiVectorIndex(ids, mats).to_device()
        bucketed = MultiVectorIndex(ids, mats, bucketize=4).to_device()
        assert bucketed.device_bytes() < 0.6 * flat.device_bytes()

    def test_k_exceeds_small_bucket(self):
        # k larger than some bucket's size: per-bucket k clamps, merge fills
        mats = self.make_mats(n=30)
        ids = list(range(len(mats)))
        flat = MultiVectorIndex(ids, mats)
        bucketed = MultiVectorIndex(ids, mats, bucketize=3)
        q = self.make_mats(n=2, seed=11)
        h0, h1 = flat.search(q, 25), bucketed.search(q, 25)
        for a, b in zip(h0, h1):
            assert [x.doc_id for x in a] == [x.doc_id for x in b]

    def test_prefilter_refused(self):
        mats = self.make_mats(n=20)
        idx = MultiVectorIndex(list(range(len(mats))), mats, bucketize=2)
        with pytest.raises(ValueError, match="bucketize"):
            idx.search([mats[0]], 5, prefilter=4)

    def test_save_load_roundtrip(self, tmp_path):
        mats = self.make_mats(n=40)
        ids = [f"d{i}" for i in range(len(mats))]
        idx = MultiVectorIndex(ids, mats, bucketize=3)
        q = self.make_mats(n=2, seed=9)
        before = idx.search(q, 8)
        idx.save(tmp_path / "mv")
        loaded = MultiVectorIndex.load(tmp_path / "mv")
        assert loaded.bucketize == 3
        after = loaded.search(q, 8)
        for a, b in zip(before, after):
            assert [x.doc_id for x in a] == [x.doc_id for x in b]

    def test_mesh_keeps_flat_layout(self):
        import jax
        from autorag_research_tpu.parallel.mesh import corpus_mesh

        mats = self.make_mats(n=32)
        ids = list(range(len(mats)))
        idx = MultiVectorIndex(ids, mats, bucketize=3)
        mesh = corpus_mesh(len(jax.devices()))
        idx.to_device(mesh=mesh)
        assert idx._device_buckets is None  # mesh shards bound memory already
        flat = MultiVectorIndex(ids, mats)
        q = self.make_mats(n=2, seed=13)
        h0, h1 = flat.search(q, 10), idx.search(q, 10)
        for a, b in zip(h0, h1):
            assert [x.doc_id for x in a] == [x.doc_id for x in b]
