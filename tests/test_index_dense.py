"""DenseIndex + sharded search tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from autorag_research_tpu.index.dense import DenseIndex, l2_normalize
from autorag_research_tpu.parallel.mesh import corpus_mesh


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    emb = rng.normal(size=(100, 32)).astype(np.float32)
    ids = [f"doc-{i}" for i in range(100)]
    return ids, emb


def brute_cosine(q, c, k):
    qn, cn = l2_normalize(q), l2_normalize(c)
    scores = qn @ cn.T
    order = np.lexsort((np.arange(c.shape[0])[None].repeat(len(q), 0), -scores), axis=1)
    return order[:, :k]


def test_search_matches_bruteforce(corpus):
    ids, emb = corpus
    idx = DenseIndex(ids, emb)
    rng = np.random.default_rng(1)
    q = rng.normal(size=(5, 32)).astype(np.float32)
    hits = idx.search(q, 10)
    expected = brute_cosine(q, emb, 10)
    for row, exp in zip(hits, expected):
        assert [h.doc_id for h in row] == [ids[e] for e in exp]
        # cosine similarity in [-1, 1]
        assert all(-1.001 <= h.score <= 1.001 for h in row)
        assert row[0].score >= row[-1].score


def test_sharded_matches_single_device(corpus):
    ids, emb = corpus
    rng = np.random.default_rng(2)
    q = rng.normal(size=(4, 32)).astype(np.float32)

    single = DenseIndex(ids, emb).search(q, 10)
    mesh = corpus_mesh(n_corpus=8)
    sharded = DenseIndex(ids, emb).to_device(mesh).search(q, 10)
    for a, b in zip(single, sharded):
        assert [h.doc_id for h in a] == [h.doc_id for h in b]
        np.testing.assert_allclose(
            [h.score for h in a], [h.score for h in b], rtol=1e-5, atol=1e-6
        )


def test_shard_count_invariance(corpus):
    ids, emb = corpus
    rng = np.random.default_rng(3)
    q = rng.normal(size=(3, 32)).astype(np.float32)
    results = []
    for p in (2, 4, 8):
        mesh = corpus_mesh(n_corpus=p)
        hits = DenseIndex(ids, emb).to_device(mesh).search(q, 7)
        results.append([[h.doc_id for h in row] for row in hits])
    assert results[0] == results[1] == results[2]


def test_k_exceeds_corpus(corpus):
    ids, emb = corpus
    idx = DenseIndex(ids[:3], emb[:3])
    hits = idx.search(emb[:1], 10)
    assert len(hits[0]) == 3


def test_zero_vector_query(corpus):
    ids, emb = corpus
    idx = DenseIndex(ids, emb)
    hits = idx.search(np.zeros((1, 32), np.float32), 5)
    assert all(h.score == 0.0 for h in hits[0])


def test_save_load_roundtrip(tmp_path, corpus):
    ids, emb = corpus
    idx = DenseIndex(ids, emb)
    rng = np.random.default_rng(4)
    q = rng.normal(size=(2, 32)).astype(np.float32)
    before = idx.search(q, 5)
    idx.save(tmp_path / "dense_idx")
    idx2 = DenseIndex.load(tmp_path / "dense_idx")
    after = idx2.search(q, 5)
    assert [[h.doc_id for h in r] for r in before] == [[h.doc_id for h in r] for r in after]


def test_from_catalog(catalog):
    idx = DenseIndex.from_catalog(catalog)
    assert idx.n_docs == 5 and idx.dim == 8
    # query 1's embedding == chunk 1's embedding -> top hit must be chunk 1
    qemb = catalog.get_embedding("query", 1)
    hits = idx.search(qemb[None, :], 3)
    assert hits[0][0].doc_id == 1
    assert hits[0][0].score == pytest.approx(1.0, abs=1e-5)


class TestHybridMesh:
    def test_single_slice_fallback_shape(self):
        from autorag_research_tpu.parallel.mesh import CORPUS_AXIS, DP_AXIS, hybrid_corpus_mesh

        # CPU virtual devices expose one slice -> falls back to all-corpus mesh
        mesh = hybrid_corpus_mesh()
        assert mesh.axis_names == (DP_AXIS, CORPUS_AXIS)
        assert mesh.shape[DP_AXIS] == 1
        assert mesh.shape[CORPUS_AXIS] == 8

    def test_requested_slices_on_single_slice_falls_back(self):
        from autorag_research_tpu.parallel.mesh import hybrid_corpus_mesh

        mesh = hybrid_corpus_mesh(n_slices=2)
        assert mesh.shape["corpus"] == 8  # single physical slice -> fallback

    def test_search_under_hybrid_mesh(self, corpus):
        from autorag_research_tpu.parallel.mesh import hybrid_corpus_mesh

        ids, emb = corpus
        rng = np.random.default_rng(11)
        q = rng.normal(size=(2, 32)).astype(np.float32)
        single = DenseIndex(ids, emb).search(q, 5)
        hybrid = DenseIndex(ids, emb).to_device(hybrid_corpus_mesh()).search(q, 5)
        for a, b in zip(single, hybrid):
            assert [h.doc_id for h in a] == [h.doc_id for h in b]


def test_dense_index_approx_mode_roundtrip(tmp_path):
    import numpy as np

    from autorag_research_tpu.index.dense import DenseIndex

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(64, 16)).astype(np.float32)
    ids = [f"d{i}" for i in range(64)]
    idx = DenseIndex(ids, emb, mode="approx")
    hits = idx.search(emb[:3], 5)
    # CPU lowering is exact: top-1 of a corpus row's own embedding is itself
    assert [h[0].doc_id for h in hits] == ["d0", "d1", "d2"]
    idx.save(tmp_path / "didx")
    idx2 = DenseIndex.load(tmp_path / "didx")
    assert idx2.mode == "approx"
    hits2 = idx2.search(emb[:3], 5)
    assert [(h.doc_id, round(h.score, 5)) for h in hits2[0]] == [
        (h.doc_id, round(h.score, 5)) for h in hits[0]
    ]


def test_dense_index_rejects_unknown_mode():
    import numpy as np
    import pytest

    from autorag_research_tpu.index.dense import DenseIndex

    with pytest.raises(ValueError):
        DenseIndex(["a"], np.ones((1, 4), np.float32), mode="fast")


def test_sharded_approx_mode_matches_single(corpus):
    # approx mode on a mesh: per-shard approx_max_k (exact on CPU lowering)
    # + deterministic global merge must equal the single-device result
    ids, emb = corpus
    rng = np.random.default_rng(4)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    single = DenseIndex(ids, emb, mode="approx").search(q, 10)
    mesh = corpus_mesh(n_corpus=8)
    sharded = DenseIndex(ids, emb, mode="approx").to_device(mesh).search(q, 10)
    for a, b in zip(single, sharded):
        assert [h.doc_id for h in a] == [h.doc_id for h in b]


def test_dense_index_int8_mode_roundtrip(tmp_path):
    # int8 mode: per-row quantized corpus + approx selection. Quantization
    # error on a row's own (normalized) embedding is ~1e-2, far below the
    # self-similarity gap, so top-1 of a corpus row is still itself.
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(64, 16)).astype(np.float32)
    ids = [f"d{i}" for i in range(64)]
    idx = DenseIndex(ids, emb, mode="int8")
    hits = idx.search(emb[:3], 5)
    assert [h[0].doc_id for h in hits] == ["d0", "d1", "d2"]
    # self-similarity ~1.0 within quantization error
    assert abs(hits[0][0].score - 1.0) < 0.05
    idx.save(tmp_path / "didx8")
    idx2 = DenseIndex.load(tmp_path / "didx8")
    assert idx2.mode == "int8"
    hits2 = idx2.search(emb[:3], 5)
    assert [(h.doc_id, round(h.score, 5)) for h in hits2[0]] == [
        (h.doc_id, round(h.score, 5)) for h in hits[0]
    ]


def test_sharded_int8_mode_matches_single(corpus):
    # int8 on a mesh: per-shard quantized scan (scales sharded alongside) +
    # deterministic global merge must equal the single-device int8 result —
    # quantization happens once on host, so shard boundaries cannot change
    # any score.
    ids, emb = corpus
    rng = np.random.default_rng(4)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    single = DenseIndex(ids, emb, mode="int8").search(q, 10)
    mesh = corpus_mesh(n_corpus=8)
    sharded = DenseIndex(ids, emb, mode="int8").to_device(mesh).search(q, 10)
    for a, b in zip(single, sharded):
        assert [h.doc_id for h in a] == [h.doc_id for h in b]
        assert [round(h.score, 5) for h in a] == [round(h.score, 5) for h in b]


def test_int8_quantization_agreement(corpus):
    # int8-exact ranking should agree closely with the f32 exact ranking on
    # normalized gaussian embeddings (quantization noise ~1e-3 per score)
    ids, emb = corpus
    rng = np.random.default_rng(9)
    q = rng.normal(size=(8, 32)).astype(np.float32)
    exact = DenseIndex(ids, emb).search(q, 10)
    quant = DenseIndex(ids, emb, mode="int8").search(q, 10)
    agree = np.mean([
        len({h.doc_id for h in a} & {h.doc_id for h in b}) / 10
        for a, b in zip(exact, quant)
    ])
    assert agree >= 0.9, agree


def test_verified_mode_matches_exact_mode():
    import numpy as np

    from autorag_research_tpu.index.dense import DenseIndex

    rng = np.random.default_rng(21)
    emb = rng.normal(size=(700, 32)).astype(np.float32)
    ids = [f"v{i:03d}" for i in range(700)]
    # duplicates force ties through the fallback machinery
    emb[13] = emb[600]
    q = rng.normal(size=(5, 32)).astype(np.float32)
    exact = DenseIndex(ids, emb, mode="exact").search(q, 7)
    verified = DenseIndex(ids, emb, mode="verified").search(q, 7)
    want = [[(h.doc_id, round(h.score, 5)) for h in row] for row in exact]
    got = [[(h.doc_id, round(h.score, 5)) for h in row] for row in verified]
    assert got == want


def test_verified_mode_capacity_refusal(monkeypatch):
    """At capacity scale the verified mode must refuse CLEARLY when the f32
    corpus + bf16 sidecar (6 bytes per doc-dim) cannot fit device HBM,
    pointing at mesh sharding / int8 — never OOM mid-transfer."""
    import autorag_research_tpu.index.dense as mod

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((4096, 64)).astype(np.float32)
    idx = DenseIndex(ids=list(range(4096)), embeddings=emb, mode="verified")
    # 4096 * 64 * 6 bytes = 1.5 MB "needs"; pretend a 1 MB device
    monkeypatch.setattr(mod, "_device_hbm_bytes", lambda: 1 << 20)
    monkeypatch.setattr(mod.jax, "default_backend", lambda: "tpu")
    from autorag_research_tpu.exceptions import IndexNotBuiltError

    with pytest.raises(IndexNotBuiltError, match="Shard over a larger mesh"):
        idx.to_device()
    # the same corpus fits when sharded 8-way under the same budget
    assert idx.verified_device_bytes() // 8 < 0.85 * (1 << 20)
