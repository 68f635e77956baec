import numpy as np
import pytest

from autorag_research_tpu.store.catalog import Catalog


@pytest.fixture
def catalog(tmp_path):
    """A small known corpus, mirroring the reference's seed database
    (``postgresql/db/init/002-seed.sql``): 5 chunks + 3 queries + GT."""
    cat = Catalog(tmp_path / "test.db", embedding_dim=8)
    rng = np.random.default_rng(42)
    chunks = [
        {"id": i, "contents": f"chunk number {i} about topic {i % 3}",
         "embedding": rng.normal(size=8).astype(np.float32)}
        for i in range(1, 6)
    ]
    cat.add_chunks(chunks)
    cat.add_queries(
        [
            {"id": 1, "contents": "what is topic zero", "generation_gt": ["topic zero"]},
            {"id": 2, "contents": "tell me about topic one", "generation_gt": ["topic one"]},
            {"id": 3, "contents": "explain topic two", "generation_gt": ["topic two"]},
        ]
    )
    from autorag_research_tpu.store.gt import or_all, and_all

    cat.add_retrieval_gt(1, or_all([1, 4]))
    cat.add_retrieval_gt(2, and_all([2, 5]))
    cat.add_retrieval_gt(3, 3)
    # query embeddings: make query i closest to chunk i for determinism
    ids, mat = cat.get_embeddings_matrix("chunk")
    cat.set_embeddings("query", [(1, mat[0]), (2, mat[1]), (3, mat[2])])
    return cat
