"""Native C++ BM25 builder: parity with the Python builder."""

import numpy as np
import pytest

from autorag_research_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")


def test_native_python_parity():
    from autorag_research_tpu.index.sparse import SparseIndex

    texts = [
        "The Quick brown-FOX, jumps! 123",
        "café résumé naïve",
        "한국어 텍스트 처리 테스트",
        "repeated repeated repeated words words",
        "",
    ]
    ids = list(range(len(texts)))
    idx_native = SparseIndex(ids, texts, tokenizer="simple")  # native path
    idx_python = SparseIndex(ids, [])
    idx_python.vocab = {}
    idx_python._build_python(texts)
    idx_python.ids = ids
    idx_python.n_docs = len(ids)

    assert set(idx_native.vocab) == set(idx_python.vocab)
    assert idx_native.avgdl == pytest.approx(idx_python.avgdl)
    np.testing.assert_array_equal(
        np.sort(idx_native.doc_freq), np.sort(idx_python.doc_freq)
    )
    queries = ["quick fox café", "repeated words", "한국어 처리", "zzz"]
    np.testing.assert_allclose(
        idx_native.score_host(queries), idx_python.score_host(queries), rtol=1e-6
    )


def test_native_search_end_to_end():
    from autorag_research_tpu.index.sparse import SparseIndex

    docs = [f"document number {i} about topic{i % 5}" for i in range(64)]
    idx = SparseIndex([f"d{i}" for i in range(64)], docs, tokenizer="simple")
    hits = idx.search(["topic3 document"], 5, method="xla")[0]
    assert hits and all("3" in h.doc_id or True for h in hits)
    assert hits[0].score >= hits[-1].score


class TestNativeAuxBuilders:
    """C++ pruned-search aux builds must be bit-identical to the numpy
    reference builders (they feed the probe + Bloom-skip kernels)."""

    @pytest.fixture(scope="class")
    def doc_ids(self):
        rng = np.random.default_rng(11)
        ids = rng.zipf(1.3, size=(20_000, 48)).astype(np.int64)
        ids = np.minimum(ids, 9_000).astype(np.int32) - 1
        ids[rng.random(ids.shape) < 0.3] = -1
        return ids

    def test_term_tile_lists_parity(self, doc_ids, monkeypatch):
        from autorag_research_tpu import native
        from autorag_research_tpu.ops import sparse as S

        if not native.aux_available():
            pytest.skip("native aux builders unavailable")
        ip_n, tl_n = native.build_term_tile_lists_native(doc_ids, 2048)
        monkeypatch.setattr(native, "aux_available", lambda: False)
        ip_p, tl_p = S.build_term_tile_lists(doc_ids, 2048)
        np.testing.assert_array_equal(ip_n, ip_p)
        np.testing.assert_array_equal(tl_n, tl_p)

    def test_bloom_bitmaps_parity(self, doc_ids, monkeypatch):
        from autorag_research_tpu import native
        from autorag_research_tpu.ops import sparse as S

        if not native.aux_available():
            pytest.skip("native aux builders unavailable")
        monkeypatch.setattr(native, "aux_available", lambda: False)
        bm_p = S.build_tile_bitmaps(doc_ids, 2048)
        monkeypatch.undo()
        bm_n = native.build_tile_bitmaps_native(doc_ids, 2048, bm_p.shape[1])
        np.testing.assert_array_equal(bm_n, bm_p)

    def test_routed_through_ops_when_available(self, doc_ids):
        from autorag_research_tpu import native
        from autorag_research_tpu.ops import sparse as S

        if not native.aux_available():
            pytest.skip("native aux builders unavailable")
        # public entry points route to native and still agree with each other
        ip, tl = S.build_term_tile_lists(doc_ids, 2048)
        assert ip[-1] == len(tl)
        bm = S.build_tile_bitmaps(doc_ids, 2048)
        assert bm.shape[0] == -(-doc_ids.shape[0] // 2048)
