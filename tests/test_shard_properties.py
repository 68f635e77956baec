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


def test_dense_negative_scores_pad_rows_never_displace():
    """Zero-padded shard rows score exactly 0; when every REAL doc scores
    negative, pads must not displace real docs from a shard's local top-k
    (regression: the last shard contributed k - n_pad candidates and the
    global merge lost real docs)."""
    n, d, k = 30, 16, 3  # 8 shards -> pad to 32, 2 pad rows, shard_rows=4 > k
    emb = np.zeros((n, d), dtype=np.float32)
    rng = np.random.default_rng(7)
    # every doc has a NEGATIVE x-component -> all scores vs q=[1,0..] < 0
    emb[:, 0] = -0.5
    emb[:, 1:] = rng.normal(size=(n, d - 1)) * 0.1
    # the two best docs live on the LAST (padded) shard: rows 28, 29
    emb[28, 0] = -0.01
    emb[29, 0] = -0.02
    emb = l2_normalize(emb)
    ids = [f"d{i:02d}" for i in range(n)]
    q = np.zeros((1, d), dtype=np.float32)
    q[0, 0] = 1.0

    single = DenseIndex(ids, emb).search(q, k)
    want = [(h.doc_id, round(h.score, 5)) for h in single[0]]
    assert [doc for doc, _ in want[:2]] == ["d28", "d29"]
    got = DenseIndex(ids, emb).to_device(corpus_mesh(n_corpus=8)).search(q, k)
    assert [(h.doc_id, round(h.score, 5)) for h in got[0]] == want


def test_dense_int8_sharded_negative_scores_pad_rows():
    """Same hazard for the int8 path: scale-0 pad rows score exactly 0."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import dense_topk_int8, quantize_int8
    from autorag_research_tpu.parallel.sharded import (
        shard_corpus_int8,
        sharded_dense_topk_int8,
    )

    n, d, k = 30, 16, 3
    emb = np.zeros((n, d), dtype=np.float32)
    rng = np.random.default_rng(11)
    emb[:, 0] = -0.5
    emb[:, 1:] = rng.normal(size=(n, d - 1)) * 0.1
    emb[28, 0] = -0.01
    emb[29, 0] = -0.02
    emb = l2_normalize(emb)
    q = np.zeros((1, d), dtype=np.float32)
    q[0, 0] = 1.0

    cq, cs = quantize_int8(jnp.asarray(emb))
    s_single, i_single = dense_topk_int8(jnp.asarray(q), cq, cs, k)
    mesh = corpus_mesh(n_corpus=8)
    cq_sh, cs_sh = shard_corpus_int8(cq, cs, mesh)
    s_mesh, i_mesh = sharded_dense_topk_int8(
        jnp.asarray(q), cq_sh, cs_sh, k, n_total=n, mesh=mesh
    )
    assert np.asarray(i_mesh).tolist() == np.asarray(i_single).tolist()
    np.testing.assert_allclose(np.asarray(s_mesh), np.asarray(s_single), rtol=1e-6)


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


@pytest.mark.parametrize("seed", [0, 1])
def test_maxsim_random_sizes_and_ties(seed):
    from autorag_research_tpu.index.multi_vector import MultiVectorIndex

    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(13, 90))  # awkward sizes -> pad rows on shards
    d = 16
    docs = [
        rng.normal(size=(int(rng.integers(2, 7)), d)).astype(np.float32)
        for _ in range(n)
    ]
    # duplicates -> exact MaxSim ties across shard boundaries
    for i in range(max(2, n // 6)):
        docs[(i * 5 + 2) % n] = docs[i % n]
    ids = [f"m{i:03d}" for i in range(n)]
    queries = [
        rng.normal(size=(int(rng.integers(2, 5)), d)).astype(np.float32)
        for _ in range(3)
    ]
    k = int(rng.integers(2, 9))

    single = MultiVectorIndex(ids, docs, search_method="xla").search(queries, k)
    want = [[(h.doc_id, round(h.score, 5)) for h in row] for row in single]
    for shards in (2, 4, 8):
        idx = MultiVectorIndex(ids, docs, search_method="xla")
        idx.to_device(corpus_mesh(n_corpus=shards))
        got = idx.search(queries, k)
        got = [[(h.doc_id, round(h.score, 5)) for h in row] for row in got]
        assert got == want, (n, k, shards)


@pytest.mark.parametrize("seed", [0, 1])
def test_verified_sharded_invariance(seed):
    """Sharded verified-exact must reproduce the single-device exact ranking
    for ANY shard count, including cross-shard exact ties and negative
    scores (the verified coverage proof runs per shard over masked pads)."""
    from autorag_research_tpu.index.dense import DenseIndex

    rng = np.random.default_rng(700 + seed)
    n = int(rng.integers(40, 400))
    d = 24
    emb = rng.normal(size=(n, d)).astype(np.float32)
    for _ in range(4):
        a, b = rng.integers(0, n, size=2)
        emb[b] = emb[a]  # exact ties across shard boundaries
    ids = [f"v{i:04d}" for i in range(n)]
    q = rng.normal(size=(4, d)).astype(np.float32)
    k = int(rng.integers(2, 9))
    want = DenseIndex(ids, emb, mode="exact").search(q, k)
    want = [[(h.doc_id, round(h.score, 5)) for h in row] for row in want]
    for shards in (2, 4, 8):
        idx = DenseIndex(ids, emb, mode="verified")
        idx.to_device(corpus_mesh(n_corpus=shards))
        got = idx.search(q, k)
        got = [[(h.doc_id, round(h.score, 5)) for h in row] for row in got]
        assert got == want, (n, k, shards)
