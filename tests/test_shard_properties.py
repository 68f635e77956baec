"""Randomized shard-count invariance properties (VERDICT r2 weak #7).

The framework's core distributed claim: ANY shard count produces the exact
single-device ranking, including across score ties (the `(-score, doc_id)`
ordering invariant) and non-divisible corpus sizes (padding rows must never
surface). Randomized over corpus sizes, dims, duplicate rows, and k."""

import numpy as np
import pytest

from autorag_research_tpu.index.dense import DenseIndex, l2_normalize
from autorag_research_tpu.index.sparse import SparseIndex
from autorag_research_tpu.parallel.mesh import corpus_mesh


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dense_random_sizes_and_ties(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(17, 203))  # deliberately awkward sizes
    d = int(rng.choice([16, 24, 32]))
    emb = rng.normal(size=(n, d)).astype(np.float32)
    # inject exact duplicates -> guaranteed score ties across shards
    dup_src = rng.integers(0, n, size=max(2, n // 6))
    for i, src in enumerate(dup_src):
        emb[(src + i + 1) % n] = emb[src]
    emb = l2_normalize(emb)
    ids = [f"d{i:04d}" for i in range(n)]
    k = int(rng.integers(1, 16))
    q = l2_normalize(rng.normal(size=(4, d)).astype(np.float32))

    single = DenseIndex(ids, emb).search(q, k)
    want = [[(h.doc_id, round(h.score, 5)) for h in row] for row in single]
    for shards in (2, 4, 8):
        mesh = corpus_mesh(n_corpus=shards)
        got = DenseIndex(ids, emb).to_device(mesh).search(q, k)
        got = [[(h.doc_id, round(h.score, 5)) for h in row] for row in got]
        assert got == want, (n, d, k, shards)


@pytest.mark.parametrize("seed", [0, 1])
def test_bm25_random_sizes_and_duplicate_docs(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(15, 140))
    vocab = [f"term{i}" for i in range(30)]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in range(n)
    ]
    # duplicates -> identical BM25 scores -> tie order must hold
    for i in range(0, n // 5):
        docs[(i * 7 + 3) % n] = docs[i]
    ids = [f"s{i:04d}" for i in range(n)]
    queries = [" ".join(rng.choice(vocab, size=3)) for _ in range(3)]
    k = int(rng.integers(2, 12))

    single = SparseIndex(ids, docs, tokenizer="simple").search(queries, k, method="xla")
    want = [[(h.doc_id, round(h.score, 5)) for h in row] for row in single]
    for shards in (2, 4, 8):
        idx = SparseIndex(ids, docs, tokenizer="simple")
        idx.to_device(corpus_mesh(n_corpus=shards))
        got = idx.search(queries, k)
        got = [[(h.doc_id, round(h.score, 5)) for h in row] for row in got]
        assert got == want, (n, k, shards)
