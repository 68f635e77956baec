"""Tile-WAND BM25: upper-bound two-pass pruning must reproduce the full
scan's positive hits exactly — including (-score, id) tie order — on every
query class (rare, common, mixed), on both the flat and lane-packed layouts,
and regardless of which internal branch fires (pass-2-empty, two-pass,
full-scan fallback).

Reference behavior: block-WAND inside vchord_bm25
(/root/reference/autorag_research/orm/repository/chunk.py:185-247)."""

import numpy as np
import pytest

import jax.numpy as jnp

from autorag_research_tpu.index.sparse import SparseIndex
from autorag_research_tpu.ops.sparse import (
    bm25_topk_pallas_v2,
    bm25_topk_wand,
    build_term_tile_lists,
    build_term_tile_maxw,
    wand_upper_bounds,
)


def _synthetic(n_docs=600, n_slots=24, vocab=5000, seed=0, common_frac=0.3):
    """Clustered corpus with a COMMON vocabulary band: terms [0, 50) appear
    across all regions (so their tile lists cover everything), the rest are
    region-local."""
    rng = np.random.default_rng(seed)
    ids = np.full((n_docs, n_slots), -1, np.int32)
    w = np.zeros((n_docs, n_slots), np.float32)
    for i in range(n_docs):
        region = (i * 10 // n_docs) * (vocab // 10)
        n_terms = int(rng.integers(4, n_slots))
        n_common = int(n_terms * common_frac)
        local = region + 50 + rng.choice(vocab // 10 - 50, size=n_terms - n_common, replace=False)
        common = rng.choice(50, size=n_common, replace=False)
        terms = np.concatenate([common, local])
        ids[i, : len(terms)] = terms
        w[i, : len(terms)] = rng.uniform(0.2, 2.0, size=len(terms)).astype(np.float32)
    return ids, w


def _oracle(q_ids, q_w, doc_ids, doc_w, k):
    s, i = bm25_topk_pallas_v2(
        jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
        jnp.asarray(doc_w), k=k, block_q=8, block_n=128, interpret=True,
    )
    return np.asarray(s), np.asarray(i)


def _assert_positive_hits_equal(s_w, i_w, s_o, i_o):
    s_w, i_w, s_o, i_o = map(np.asarray, (s_w, i_w, s_o, i_o))
    for b in range(s_o.shape[0]):
        pos = s_o[b] > 0
        np.testing.assert_array_equal(i_w[b][: pos.sum()], i_o[b][pos], err_msg=f"q{b}")
        np.testing.assert_allclose(s_w[b][: pos.sum()], s_o[b][pos], rtol=1e-6)


class TestMaxwBuilder:
    def test_matches_lists_and_bruteforce(self):
        doc_ids, doc_w = _synthetic()
        indptr_l, tiles_l = build_term_tile_lists(doc_ids, block_n=128)
        indptr, tiles, maxw = build_term_tile_maxw(doc_ids, doc_w, block_n=128)
        np.testing.assert_array_equal(indptr[: len(indptr_l)], indptr_l)
        np.testing.assert_array_equal(tiles, tiles_l)
        # brute-force the max weight for a few (term, tile) entries
        rng = np.random.default_rng(0)
        for idx in rng.choice(len(tiles), size=20, replace=False):
            t = int(np.searchsorted(indptr, idx, side="right")) - 1
            tile = int(tiles[idx])
            sl = doc_ids[tile * 128 : (tile + 1) * 128]
            wl = doc_w[tile * 128 : (tile + 1) * 128]
            # _synthetic draws terms without replacement within a doc, so
            # the per-doc total equals the per-slot max (up to the builder's
            # 1e-6 safety inflation)
            np.testing.assert_allclose(maxw[idx], wl[sl == t].max(), rtol=2e-6)

    def test_duplicate_slots_still_dominated(self):
        """A doc holding the same term in SEVERAL slots scores their SUM —
        the bound must dominate per-doc totals, not per-slot maxima (a
        per-slot-max bound silently drops true top-k docs)."""
        doc_ids = np.full((256, 4), -1, np.int32)
        doc_w = np.zeros((256, 4), np.float32)
        doc_ids[:, 0] = np.arange(256) % 97
        doc_w[:, 0] = 1.0
        # doc 7: term 3 in all four slots -> true score 4x the slot weight
        doc_ids[7] = 3
        doc_w[7] = 1.0
        indptr, tiles, maxw = build_term_tile_maxw(doc_ids, doc_w, block_n=128)
        q_ids = np.array([[3, -2, -2, -2]], np.int32)
        q_w = np.array([[1.0, 0.0, 0.0, 0.0]], np.float32)
        ub = wand_upper_bounds(q_ids, q_w, indptr, tiles, maxw, 2)
        s, i = _oracle(q_ids, q_w, doc_ids, doc_w, k=3)
        assert s[0, 0] == 4.0 and i[0, 0] == 7
        assert ub[0, 0] >= 4.0
        # end-to-end: wand must still return doc 7 first
        s_w, i_w = bm25_topk_wand(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
            jnp.asarray(doc_w), (indptr, tiles, maxw), 3,
            block_n=128, pass1_tiles=1, interpret=True,
        )
        _assert_positive_hits_equal(s_w, i_w, s, i)

    def test_upper_bounds_dominate_scores(self):
        doc_ids, doc_w = _synthetic(seed=3)
        trip = build_term_tile_maxw(doc_ids, doc_w, block_n=128)
        rng = np.random.default_rng(4)
        q_ids = rng.integers(0, 500, size=(4, 6)).astype(np.int32)
        q_w = rng.uniform(0.1, 2.0, size=(4, 6)).astype(np.float32)
        n_tiles = -(-doc_ids.shape[0] // 128)
        ub = wand_upper_bounds(q_ids, q_w, *trip, n_tiles)
        s, i = _oracle(q_ids, q_w, doc_ids, doc_w, k=10)
        for b in range(4):
            for score, doc in zip(s[b], i[b]):
                if score > 0:
                    assert ub[b, int(doc) // 128] >= score - 1e-5


class TestWandExactness:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("kind", ["rare", "common", "mixed"])
    def test_matches_full_scan(self, seed, kind):
        doc_ids, doc_w = _synthetic(seed=seed)
        trip = build_term_tile_maxw(doc_ids, doc_w, block_n=128)
        rng = np.random.default_rng(seed + 100)
        bsz = 3 if seed else 9  # exercise bsz % bq != 0 grouping
        q_ids = np.full((bsz, 6), -2, np.int32)
        q_w = np.zeros((bsz, 6), np.float32)
        for b in range(bsz):
            if kind == "rare":
                region = (b * 4 % 10) * 500
                terms = region + 50 + rng.choice(400, size=3, replace=False)
            elif kind == "common":
                terms = rng.choice(50, size=3, replace=False)
            else:
                region = (b * 3 % 10) * 500
                terms = np.concatenate(
                    [rng.choice(50, size=2, replace=False),
                     region + 50 + rng.choice(400, size=2, replace=False)]
                )
            q_ids[b, : len(terms)] = terms
            q_w[b, : len(terms)] = rng.uniform(0.5, 1.5, size=len(terms)).astype(np.float32)
        s_o, i_o = _oracle(q_ids, q_w, doc_ids, doc_w, k=7)
        s_w, i_w, stats = bm25_topk_wand(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
            jnp.asarray(doc_w), trip, k=7, block_n=128, interpret=True,
            return_stats=True,
        )
        _assert_positive_hits_equal(s_w, i_w, s_o, i_o)

    def test_pass2_fires_and_stays_exact(self):
        """pass1_tiles=1 starves pass 1, forcing a real second pass."""
        doc_ids, doc_w = _synthetic(seed=5)
        trip = build_term_tile_maxw(doc_ids, doc_w, block_n=128)
        rng = np.random.default_rng(7)
        q_ids = rng.choice(50, size=(2, 4), replace=False).astype(np.int32)
        q_w = rng.uniform(0.5, 1.5, size=(2, 4)).astype(np.float32)
        s_o, i_o = _oracle(q_ids, q_w, doc_ids, doc_w, k=5)
        s_w, i_w, stats = bm25_topk_wand(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
            jnp.asarray(doc_w), trip, k=5, block_n=128, pass1_tiles=1,
            scan_fraction=1.1, interpret=True, return_stats=True,
        )
        assert stats["pass2_tiles_max"] > 0 and not stats["fallback_full"]
        _assert_positive_hits_equal(s_w, i_w, s_o, i_o)

    def test_fallback_full_fires_and_stays_exact(self):
        doc_ids, doc_w = _synthetic(seed=6)
        trip = build_term_tile_maxw(doc_ids, doc_w, block_n=128)
        q_ids = np.arange(4, dtype=np.int32).reshape(1, 4)  # common terms
        q_w = np.ones((1, 4), np.float32)
        s_o, i_o = _oracle(q_ids, q_w, doc_ids, doc_w, k=5)
        called = []
        s_w, i_w, stats = bm25_topk_wand(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
            jnp.asarray(doc_w), trip, k=5, block_n=128,
            scan_fraction=0.0, interpret=True, return_stats=True,
            fallback=lambda: (called.append(1), _oracle(q_ids, q_w, doc_ids, doc_w, 5))[1],
        )
        assert stats["fallback_full"] and called
        _assert_positive_hits_equal(s_w, i_w, s_o, i_o)

    def test_theta_tie_boundary_included(self):
        """A pass-2 tile whose UB equals theta EXACTLY must still be
        scanned: its doc ties the pass-1 k-th score and wins the id
        tiebreak — a strict UB > theta exclusion would return the wrong
        id at rank 2."""
        n_slots = 8
        doc_ids = np.full((512, n_slots), -1, np.int32)
        doc_w = np.zeros((512, n_slots), np.float32)
        # tile 3 (pass 1, highest UB): doc 510 w=1.0, doc 511 w=0.5
        # tile 0 (pass 2 boundary): doc 0 w=0.5 -> UB == theta == 0.5,
        # and doc 0 beats doc 511 on the id tiebreak at equal score
        doc_ids[510, 0] = 0; doc_w[510, 0] = 1.0
        doc_ids[511, 0] = 0; doc_w[511, 0] = 0.5
        doc_ids[0, 0] = 0; doc_w[0, 0] = 0.5
        trip = build_term_tile_maxw(doc_ids, doc_w, block_n=128)
        q_ids = np.array([[0]], np.int32)
        q_w = np.array([[1.0]], np.float32)
        s_w, i_w, stats = bm25_topk_wand(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
            jnp.asarray(doc_w), trip, k=2, block_n=128, pass1_tiles=1,
            scan_fraction=1.1, interpret=True, return_stats=True,
        )
        assert stats["pass2_tiles_max"] >= 1
        s_w, i_w = np.asarray(s_w), np.asarray(i_w)
        assert list(i_w[0][:2]) == [510, 0], i_w[0]
        np.testing.assert_allclose(s_w[0][:2], [1.0, 0.5])


class TestWandPacked:
    def test_matches_full_scan_packed(self):
        from autorag_research_tpu.ops.sparse import pack_slots

        doc_ids, doc_w = _synthetic(n_slots=16, seed=8)
        packed_ids, packed_w, pack = pack_slots(doc_ids, doc_w, width=16)
        bn_rows = 16  # tile = 16 rows * pack docs
        trip = build_term_tile_maxw(doc_ids, doc_w, block_n=bn_rows * pack)
        rng = np.random.default_rng(9)
        q_ids = np.concatenate(
            [rng.choice(50, size=(3, 2), replace=False),
             2000 + rng.integers(0, 400, size=(3, 2))], axis=1
        ).astype(np.int32)
        q_w = rng.uniform(0.5, 1.5, size=(3, 4)).astype(np.float32)
        s_o, i_o = _oracle(q_ids, q_w, doc_ids, doc_w, k=6)
        s_w, i_w, stats = bm25_topk_wand(
            jnp.asarray(q_ids), jnp.asarray(q_w), None, None, trip, k=6,
            block_n=bn_rows, interpret=True, return_stats=True,
            packed=(jnp.asarray(packed_ids), jnp.asarray(packed_w),
                    doc_ids.shape[0], pack),
        )
        _assert_positive_hits_equal(s_w, i_w, s_o, i_o)


class TestIndexRouting:
    def test_explicit_wand_matches_xla(self):
        docs = [
            "the quick brown fox jumps over the lazy dog",
            "a fast auburn fox leaped over a sleepy canine",
            "postgres is a relational database system",
            "tpu systolic arrays multiply matrices quickly",
            "the dog sleeps all day long",
            "foxes are quick and dogs are lazy",
            "vector similarity search with embeddings",
            "bm25 ranks documents by term frequency and rarity",
        ]
        idx = SparseIndex([f"d{i}" for i in range(len(docs))], docs, tokenizer="simple")
        for q in ["quick fox", "the a over", "database search", "zzz nothing"]:
            a = idx.search([q], 4, method="xla")[0]
            b = idx.search([q], 4, method="pallas_wand")[0]
            assert [(h.doc_id, round(h.score, 5)) for h in a] == [
                (h.doc_id, round(h.score, 5)) for h in b
            ], q


class TestPredictorBranches:
    def test_single_pass_on_single_term_query(self):
        """A single-term query's est set (tiles whose bound reaches the
        k-th best single-term attained score) is ~k tiles — the single-pass
        shortcut must fire and match the oracle exactly."""
        doc_ids, doc_w = _synthetic(seed=11)
        trip = build_term_tile_maxw(doc_ids, doc_w, block_n=128)
        q_ids = np.full((2, 4), -2, np.int32)
        q_w = np.zeros((2, 4), np.float32)
        q_ids[0, 0], q_w[0, 0] = 7, 1.0   # common term
        q_ids[1, 0], q_w[1, 0] = 13, 0.8
        s_o, i_o = _oracle(q_ids, q_w, doc_ids, doc_w, k=5)
        s_w, i_w, stats = bm25_topk_wand(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
            jnp.asarray(doc_w), trip, k=5, block_n=128,
            scan_fraction=1.1, interpret=True, return_stats=True,
        )
        assert stats["single_pass"] and not stats["fallback_full"]
        _assert_positive_hits_equal(s_w, i_w, s_o, i_o)

    def test_early_fallback_pays_no_dispatch(self):
        """Uniform-weight corpus + many-term common query: the additive
        bound cannot prune, and the predictor must route to the fallback
        BEFORE any probe launch (fallback_early)."""
        rng = np.random.default_rng(21)
        n = 1024
        doc_ids = rng.integers(0, 8, size=(n, 6)).astype(np.int32)
        doc_w = np.ones((n, 6), np.float32)
        trip = build_term_tile_maxw(doc_ids, doc_w, block_n=128)
        q_ids = np.arange(6, dtype=np.int32).reshape(1, 6)
        q_w = np.ones((1, 6), np.float32)
        s_o, i_o = _oracle(q_ids, q_w, doc_ids, doc_w, k=5)
        probes = []
        s_w, i_w, stats = bm25_topk_wand(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
            jnp.asarray(doc_w), trip, k=5, block_n=128,
            interpret=True, return_stats=True,
            fallback=lambda: (probes.append(1), _oracle(q_ids, q_w, doc_ids, doc_w, 5))[1],
        )
        assert stats["fallback_early"] and probes
        _assert_positive_hits_equal(s_w, i_w, s_o, i_o)

    def test_theta_lower_bound_never_over_prunes(self):
        """Randomized: across seeds and query shapes, whatever branch fires,
        results equal the oracle (the theta_lb deflation must keep the
        pre-dispatch bound below every true attained score)."""
        for seed in range(6):
            doc_ids, doc_w = _synthetic(seed=30 + seed, n_docs=500)
            trip = build_term_tile_maxw(doc_ids, doc_w, block_n=128)
            rng = np.random.default_rng(seed)
            nt = int(rng.integers(1, 5))
            q_ids = np.full((4, 6), -2, np.int32)
            q_w = np.zeros((4, 6), np.float32)
            for b in range(4):
                q_ids[b, :nt] = rng.choice(50, size=nt, replace=False)
                q_w[b, :nt] = rng.uniform(0.5, 1.5, size=nt)
            s_o, i_o = _oracle(q_ids, q_w, doc_ids, doc_w, k=7)
            s_w, i_w = bm25_topk_wand(
                jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
                jnp.asarray(doc_w), trip, k=7, block_n=128,
                scan_fraction=1.1, interpret=True,
            )
            _assert_positive_hits_equal(s_w, i_w, s_o, i_o)
