"""Cluster-contiguous IVF: recall, determinism, persistence, host streaming."""

import numpy as np
import pytest

from autorag_research_tpu.index.dense import DenseIndex
from autorag_research_tpu.index.ivf_contiguous import IVFContiguousIndex


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(16, 64)).astype(np.float32)
    assign = rng.integers(0, 16, size=2000)
    emb = centers[assign] + 0.15 * rng.normal(size=(2000, 64)).astype(np.float32)
    q = centers[rng.integers(0, 16, size=12)] + 0.15 * rng.normal(size=(12, 64)).astype(
        np.float32
    )
    return list(range(2000)), emb, q


def _recall(approx_hits, exact_hits):
    scores = []
    for a, e in zip(approx_hits, exact_hits):
        ea = {h.doc_id for h in e}
        scores.append(len({h.doc_id for h in a} & ea) / max(len(ea), 1))
    return float(np.mean(scores))


def test_recall_vs_exact_and_probe_monotonicity(clustered):
    ids, emb, q = clustered
    exact = DenseIndex(ids, emb).search(q, 10)
    idx = IVFContiguousIndex(ids, emb, n_cells=32, block_rows=64, seed=1)
    lo = _recall(idx.search(q, 10, nprobe_blocks=2), exact)
    hi = _recall(idx.search(q, 10, nprobe_blocks=16), exact)
    assert hi >= lo
    assert hi >= 0.95  # 16 of ~32+ blocks on well-separated clusters
    # probing everything IS exact (every row lives in exactly one block)
    full = idx.search(q, 10, nprobe_blocks=idx.n_blocks)
    assert _recall(full, exact) == 1.0
    for f, e in zip(full, exact):
        assert [h.doc_id for h in f] == [h.doc_id for h in e]
        np.testing.assert_allclose(
            [h.score for h in f], [h.score for h in e], atol=1e-5
        )


def test_every_row_lands_in_exactly_one_block(clustered):
    ids, emb, _ = clustered
    idx = IVFContiguousIndex(ids, emb, n_cells=32, block_rows=64)
    real = idx._row_ids[idx._row_ids < len(ids)]
    assert len(real) == len(ids)
    assert len(np.unique(real)) == len(ids)


def test_host_streaming_matches_device(clustered):
    ids, emb, q = clustered
    dev = IVFContiguousIndex(ids, emb, n_cells=32, block_rows=64, seed=5)
    host = IVFContiguousIndex(ids, emb, n_cells=32, block_rows=64, seed=5, device="host")
    a = dev.search(q, 10, nprobe_blocks=8)
    b = host.search(q, 10, nprobe_blocks=8)
    for x, y in zip(a, b):
        assert [h.doc_id for h in x] == [h.doc_id for h in y]


def test_save_load_roundtrip(tmp_path, clustered):
    ids, emb, q = clustered
    idx = IVFContiguousIndex(ids, emb, n_cells=32, block_rows=64, seed=2)
    before = idx.search(q, 5)
    idx.save(tmp_path / "cc")
    loaded = IVFContiguousIndex.load(tmp_path / "cc")
    after = loaded.search(q, 5)
    for x, y in zip(before, after):
        assert [h.doc_id for h in x] == [h.doc_id for h in y]


def test_pipeline_index_type(tmp_path, clustered):
    from autorag_research_tpu.index import registry
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchPipeline
    from autorag_research_tpu.store.catalog import Catalog

    registry.invalidate()
    ids, emb, q = clustered
    cat = Catalog(tmp_path / "cc.db")
    cat.add_chunks(
        [{"id": i, "contents": f"doc {i}", "embedding": e} for i, e in zip(ids[:500], emb[:500])]
    )
    cat.add_queries([{"id": 0, "contents": "q", "embedding": q[0]}])
    pipe = VectorSearchPipeline(
        cat, "vs_cc", index_type="ivf_contiguous",
        index_options={"n_cells": 16, "block_rows": 64, "nprobe_blocks": 8},
    )
    res = pipe.run(top_k=5)
    assert res["total_results"] == 5
    registry.invalidate()
