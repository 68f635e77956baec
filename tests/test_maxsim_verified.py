"""Verified-exact MaxSim: prescreen + bound-checked rescore vs the exact scan.

Same contract as the dense verified path (ops/dense.dense_topk_verified):
results ALWAYS equal the full exact scan — including (-score, id) tie order —
whether the per-query coverage proof passes or the query falls back. The
reference's MaxSim hot path is the VectorChord ``@#`` exact scan
(orm/repository/base.py:487-571); this is its fast exact replacement.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from autorag_research_tpu.index.multi_vector import MultiVectorIndex, pad_ragged
from autorag_research_tpu.ops.maxsim import (
    build_maxsim_sidecar,
    maxsim_topk_verified,
    maxsim_topk_xla,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    n, td, d = 600, 12, 32
    docs = rng.standard_normal((n, td, d)).astype(np.float32)
    lens = rng.integers(1, td + 1, n).astype(np.int32)
    tok = np.arange(td)[None, :] < lens[:, None]
    docs *= tok[:, :, None]
    docs /= np.maximum(np.linalg.norm(docs, axis=2, keepdims=True), 1e-9)
    docs *= tok[:, :, None]
    # exact ties: duplicate rows straddling the would-be shard boundaries
    for dup in (75, 301, 599):
        docs[dup] = docs[10]
        lens[dup] = lens[10]
    q = rng.standard_normal((8, 6, d)).astype(np.float32)
    q_lens = rng.integers(1, 7, 8).astype(np.int32)
    q /= np.maximum(np.linalg.norm(q, axis=2, keepdims=True), 1e-9)
    # planted query: exactly doc 10's first tokens -> the duplicate trio must
    # surface in id order
    take = min(int(lens[10]), 6)
    q[0, :take] = docs[10, :take]
    q_lens[0] = take
    return q, q_lens, docs, lens


def _exact(q, q_lens, docs, lens, k):
    return maxsim_topk_xla(
        jnp.asarray(q), jnp.asarray(q_lens), jnp.asarray(docs), jnp.asarray(lens), k
    )


def test_verified_matches_exact_including_ties(corpus):
    q, q_lens, docs, lens = corpus
    k = 10
    es, ei = _exact(q, q_lens, docs, lens, k)
    side = build_maxsim_sidecar(docs, lens)
    vs, vi, n_fail, covered = maxsim_topk_verified(
        jnp.asarray(q), jnp.asarray(q_lens), jnp.asarray(docs), jnp.asarray(lens),
        side, k, kprime=32, return_stats=True,
    )
    assert int(n_fail) == 0 and bool(covered)
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(ei))
    np.testing.assert_allclose(np.asarray(vs), np.asarray(es), rtol=1e-6, atol=1e-7)
    # the duplicate trio ranks by id for the planted query
    top = list(np.asarray(vi)[0][:4])
    assert top[:3] == [10, 75, 301]


def test_forced_failure_falls_back_exact(corpus):
    q, q_lens, docs, lens = corpus
    side = dict(build_maxsim_sidecar(docs, lens))
    side["r_max"] = 1e9  # absurd bound: every query fails the coverage proof
    es, ei = _exact(q, q_lens, docs, lens, 5)
    vs, vi, n_fail, covered = maxsim_topk_verified(
        jnp.asarray(q), jnp.asarray(q_lens), jnp.asarray(docs), jnp.asarray(lens),
        side, 5, kprime=16, return_stats=True,
    )
    assert int(n_fail) == len(q) and not bool(covered)
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(ei))


def test_second_chance_covers_failures(corpus):
    q, q_lens, docs, lens = corpus
    side = dict(build_maxsim_sidecar(docs, lens))
    side["r_max"] = 1e9
    es, ei = _exact(q, q_lens, docs, lens, 5)
    vs, vi, n_fail, covered = maxsim_topk_verified(
        jnp.asarray(q), jnp.asarray(q_lens), jnp.asarray(docs), jnp.asarray(lens),
        side, 5, kprime=16, second_chance=len(q), return_stats=True,
    )
    # per-query exact re-runs cover every failure without the batch fallback
    assert int(n_fail) == len(q) and bool(covered)
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(ei))


def test_tiny_corpus_smaller_than_kprime(corpus):
    q, q_lens, docs, lens = corpus
    docs5, lens5 = docs[:5], lens[:5]
    es, ei = _exact(q, q_lens, docs5, lens5, 10)
    side = build_maxsim_sidecar(docs5, lens5)
    vs, vi = maxsim_topk_verified(
        jnp.asarray(q), jnp.asarray(q_lens), jnp.asarray(docs5), jnp.asarray(lens5),
        side, 10, kprime=32,
    )
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(ei))


def test_kprime_below_k_is_clamped():
    # ADVICE r4 (medium): k > kprime used to pad e_k with NEG_INF, fail the
    # coverage proof on every query, and silently pay prescreen + rescore +
    # a full exact fallback. The wrapper now clamps kprime to max(kprime, k)
    # so the proof CAN pass — witnessed on a corpus with a wide gap at rank
    # k (48 strong docs, the rest scaled to ~5% norm).
    rng = np.random.default_rng(21)
    n, td, d, k = 600, 8, 32, 48
    docs = rng.standard_normal((n, td, d)).astype(np.float32)
    docs /= np.maximum(np.linalg.norm(docs, axis=2, keepdims=True), 1e-9)
    docs[k:] *= 0.05
    lens = np.full(n, td, np.int32)
    q = rng.standard_normal((6, 4, d)).astype(np.float32)
    q /= np.maximum(np.linalg.norm(q, axis=2, keepdims=True), 1e-9)
    q_lens = np.full(6, 4, np.int32)
    es, ei = _exact(q, q_lens, docs, lens, k)
    side = build_maxsim_sidecar(docs, lens)
    vs, vi, n_fail, covered = maxsim_topk_verified(
        jnp.asarray(q), jnp.asarray(q_lens), jnp.asarray(docs), jnp.asarray(lens),
        side, k, kprime=8, return_stats=True,
    )
    # pre-fix this was n_fail == len(q) unconditionally (proof cannot pass)
    assert int(n_fail) == 0 and bool(covered)
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(ei))


def test_empty_docs_never_surface(corpus):
    q, q_lens, docs, lens = corpus
    lens = lens.copy()
    lens[:300] = 0  # empty docs must not appear even though their rows exist
    side = build_maxsim_sidecar(docs, lens)
    _, vi, n_fail, _ = maxsim_topk_verified(
        jnp.asarray(q), jnp.asarray(q_lens), jnp.asarray(docs), jnp.asarray(lens),
        side, 10, kprime=32, return_stats=True,
    )
    assert int(n_fail) == 0
    assert (np.asarray(vi) >= 300).all()


class TestMultiVectorIndexVerified:
    def _ragged(self):
        rng = np.random.default_rng(3)
        docs = [
            rng.normal(size=(rng.integers(2, 9), 16)).astype(np.float32)
            for _ in range(41)
        ]
        docs[7] = docs[30].copy()  # exact tie across the id space
        queries = [
            rng.normal(size=(rng.integers(2, 6), 16)).astype(np.float32)
            for _ in range(4)
        ]
        return queries, docs

    def test_mode_verified_equals_exact(self):
        queries, docs = self._ragged()
        ids = [f"d{i}" for i in range(len(docs))]
        exact = MultiVectorIndex(ids, docs).search(queries, 7, method="xla")
        verified = MultiVectorIndex(ids, docs, mode="verified").search(queries, 7)
        for a, b in zip(exact, verified):
            assert [h.doc_id for h in a] == [h.doc_id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-5
            )

    def test_sharded_verified_matches_single(self):
        from autorag_research_tpu.parallel.mesh import corpus_mesh

        queries, docs = self._ragged()
        ids = [f"d{i}" for i in range(len(docs))]
        single = MultiVectorIndex(ids, docs).search(queries[:3], 5, method="xla")
        mesh = corpus_mesh(n_corpus=8)
        sharded = (
            MultiVectorIndex(ids, docs, mode="verified")
            .to_device(mesh)
            .search(queries[:3], 5)
        )
        for a, b in zip(single, sharded):
            assert [h.doc_id for h in a] == [h.doc_id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-4
            )

    def test_save_load_preserves_mode(self, tmp_path):
        queries, docs = self._ragged()
        ids = [f"d{i}" for i in range(len(docs))]
        idx = MultiVectorIndex(ids, docs, mode="verified")
        before = idx.search(queries[:2], 5)
        idx.save(tmp_path / "mv")
        restored = MultiVectorIndex.load(tmp_path / "mv")
        assert restored.mode == "verified"
        after = restored.search(queries[:2], 5)
        assert [h.doc_id for h in before[0]] == [h.doc_id for h in after[0]]

    def test_unknown_mode_rejected(self):
        with pytest.raises(ValueError, match="unknown mode"):
            MultiVectorIndex(["a"], [np.zeros((2, 4), np.float32)], mode="turbo")

    def test_prefilter_refused_with_verified(self):
        # ADVICE r4: prefilter used to short-circuit the mode dispatch and
        # silently run the approximate PLAID branch under mode='verified'
        queries, docs = self._ragged()
        ids = [f"d{i}" for i in range(len(docs))]
        idx = MultiVectorIndex(ids, docs, mode="verified")
        with pytest.raises(ValueError, match="prefilter.*verified"):
            idx.search(queries[:1], 5, prefilter=4)

    def test_prefilter_refused_with_int8_on_mesh(self):
        # ADVICE r4: the mesh path used to only warn for int8+prefilter
        # while the local path raised — same contract now
        from autorag_research_tpu.parallel.mesh import corpus_mesh

        queries, docs = self._ragged()
        ids = [f"d{i}" for i in range(len(docs))]
        idx = MultiVectorIndex(ids, docs, mode="int8").to_device(corpus_mesh(n_corpus=8))
        with pytest.raises(ValueError, match="prefilter.*int8"):
            idx.search(queries[:1], 5, prefilter=4)

    def test_kprime_plumbs_through_search(self):
        queries, docs = self._ragged()
        ids = [f"d{i}" for i in range(len(docs))]
        exact = MultiVectorIndex(ids, docs).search(queries, 7, method="xla")
        got = MultiVectorIndex(ids, docs, mode="verified").search(
            queries, 7, kprime=16
        )
        for a, b in zip(exact, got):
            assert [h.doc_id for h in a] == [h.doc_id for h in b]
