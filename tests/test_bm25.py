"""BM25: tokenizers, index build math, kernel-vs-oracle parity, pipeline."""

import numpy as np
import pytest

from autorag_research_tpu.index.sparse import SparseIndex
from autorag_research_tpu.index.tokenize import get_tokenizer
from autorag_research_tpu.ops.sparse import bm25_topk_pallas, bm25_topk_xla

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped over a sleepy canine",
    "postgres is a relational database system",
    "tpu systolic arrays multiply matrices quickly",
    "the dog sleeps all day long",
    "foxes are quick and dogs are lazy",
    "vector similarity search with embeddings",
    "bm25 ranks documents by term frequency and rarity",
]
IDS = [f"d{i}" for i in range(len(DOCS))]


@pytest.fixture(scope="module")
def index():
    return SparseIndex(IDS, DOCS, tokenizer="simple")


class TestTokenizers:
    def test_simple(self):
        tok = get_tokenizer("simple")
        assert tok.tokenize("Hello, World! 123") == ["hello", "world", "123"]

    def test_english_stopwords_and_stem(self):
        tok = get_tokenizer("english")
        out = tok.tokenize("The foxes are running")
        assert "the" not in out and "are" not in out
        assert "fox" in out and "run" in out

    def test_wiki_alias(self):
        assert get_tokenizer("wiki_tocken").tokenize("a b") == ["a", "b"]

    def test_unknown_raises(self):
        from autorag_research_tpu.exceptions import TokenizerError

        with pytest.raises(TokenizerError):
            get_tokenizer("nope")


class TestBuild:
    def test_stats(self, index):
        assert index.n_docs == 8
        assert index.avgdl == pytest.approx(
            np.mean([len(d.split()) for d in DOCS]), abs=0.5
        )
        # 'the' appears in docs 0, 4, 5? -> df check
        the_id = index.vocab["the"]
        assert index.doc_freq[the_id] == sum("the" in d.split() for d in DOCS)

    def test_idf_monotone(self, index):
        # rare term has higher idf than common term
        rare = index.vocab["postgres"]
        common = index.vocab["the"]
        assert index.idf(rare) > index.idf(common)

    def test_weights_classic_bm25(self):
        idx = SparseIndex(["a", "b"], ["x x y", "y z z z"], tokenizer="simple")
        # doc a: tf(x)=2, dl=3, avgdl=3.5
        k1, b = 1.2, 0.75
        norm = k1 * (1 - b + b * 3 / 3.5)
        expected = 2 * (k1 + 1) / (2 + norm)
        x_id = idx.vocab["x"]
        slot = list(idx._slot_ids[0]).index(x_id)
        assert idx._slot_weights[0][slot] == pytest.approx(expected, rel=1e-6)


class TestKernelParity:
    def oracle_topk(self, index, queries, k):
        scores = index.score_host(queries)
        order = np.lexsort(
            (np.arange(index.n_docs)[None].repeat(len(queries), 0), -scores), axis=1
        )
        return scores, order[:, :k]

    @pytest.mark.parametrize("fn_name", ["xla", "pallas", "pallas_v2"])
    def test_matches_host_oracle(self, index, fn_name):
        import jax.numpy as jnp

        from autorag_research_tpu.ops.sparse import bm25_topk_pallas_v2

        queries = ["quick fox", "lazy dog sleeping", "database search", "zzz unknown"]
        k = 4
        q_ids, q_w = index.encode_queries(queries)
        args = (
            jnp.asarray(q_ids), jnp.asarray(q_w),
            jnp.asarray(index._slot_ids), jnp.asarray(index._slot_weights),
        )
        if fn_name == "xla":
            s, rows = bm25_topk_xla(*args, k=k, tile_n=128)
        elif fn_name == "pallas":
            s, rows = bm25_topk_pallas(*args, k=k, block_q=8, block_n=128, interpret=True)
        else:
            s, rows = bm25_topk_pallas_v2(*args, k=k, block_q=8, block_n=128, interpret=True)
        host_scores, host_rows = self.oracle_topk(index, queries, k)
        s, rows = np.asarray(s), np.asarray(rows)
        for b in range(len(queries)):
            # compare only strictly-positive hits (zero scores tie arbitrarily
            # between kernel NEG_INF masking and host zeros)
            pos = host_scores[b][host_rows[b]] > 0
            np.testing.assert_array_equal(rows[b][: pos.sum()], host_rows[b][pos])
            np.testing.assert_allclose(
                s[b][: pos.sum()], host_scores[b][host_rows[b]][pos], rtol=1e-5
            )

    def test_no_match_query(self, index):
        hits = index.search(["xylophone zebra"], 5, method="xla")
        assert hits[0] == []


class TestSearchAndPersistence:
    def test_relevance_ordering(self, index):
        hits = index.search(["quick brown fox"], 3, method="xla")[0]
        assert hits[0].doc_id == "d0"  # exact-phrase doc wins
        assert all(h.score > 0 for h in hits)

    def test_save_load(self, tmp_path, index):
        before = index.search(["lazy dog"], 3, method="xla")
        index.save(tmp_path / "bm25")
        idx2 = SparseIndex.load(tmp_path / "bm25")
        after = idx2.search(["lazy dog"], 3, method="xla")
        assert [(h.doc_id, round(h.score, 5)) for h in before[0]] == [
            (h.doc_id, round(h.score, 5)) for h in after[0]
        ]


class TestPipeline:
    def test_bm25_pipeline_end_to_end(self, tmp_path):
        from autorag_research_tpu.config import BaseMetricConfig, ExecutorConfig
        from autorag_research_tpu.executor import Executor
        from autorag_research_tpu.index import registry
        from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config
        from autorag_research_tpu.store.catalog import Catalog
        from autorag_research_tpu.store.gt import or_all

        registry.invalidate()
        cat = Catalog(tmp_path / "bm25.db")
        cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(DOCS)])
        cat.add_queries(
            [
                {"id": 0, "contents": "quick brown fox"},
                {"id": 1, "contents": "relational database"},
            ]
        )
        cat.add_retrieval_gt(0, or_all([0, 5]))
        cat.add_retrieval_gt(1, 2)
        cfg = ExecutorConfig(
            pipelines=[BM25Config(name="bm25", top_k=3)],
            metrics=[BaseMetricConfig(name="recall")],
            health_check=False,
        )
        result = Executor(cat, cfg).run()
        assert result.success, result.report()
        assert result.pipelines[0].metrics[0].average == 1.0
        registry.invalidate()


class TestShardedBM25:
    def test_sharded_matches_single(self, index):
        from autorag_research_tpu.parallel.mesh import corpus_mesh

        queries = ["quick fox", "lazy dog", "database"]
        single = index.search(queries, 4, method="xla")
        sharded_idx = SparseIndex(IDS, DOCS, tokenizer="simple")
        sharded_idx.to_device(corpus_mesh(n_corpus=8))
        sharded = sharded_idx.search(queries, 4, method="xla")
        for a, b in zip(single, sharded):
            assert [(h.doc_id, round(h.score, 5)) for h in a] == [
                (h.doc_id, round(h.score, 5)) for h in b
            ]


def test_non_ascii_corpus_matches_python_build():
    # native builder must NOT be used for non-ASCII text; query-time Python
    # tokenization has to agree with the build-time vocabulary
    docs = ["Éclair recipe with chocolate", "don’t panic guide", "plain ascii text"]
    idx = SparseIndex(["a", "b", "c"], docs, tokenizer="simple")
    assert "éclair" in idx.vocab  # lowercased unicode, python semantics
    hits = idx.search(["Éclair recipe"], 2, method="xla")[0]
    assert hits[0].doc_id == "a"
    hits = idx.search(["don’t panic"], 2, method="xla")[0]
    assert hits[0].doc_id == "b"


class TestBucketedLayout:
    def make_skewed(self, n_short=60, n_long=6):
        # short docs: 2-4 unique terms; long docs: ~40 unique terms
        docs = [f"alpha{i % 7} beta{i % 5} gamma{i % 3}" for i in range(n_short)]
        docs += [
            " ".join(f"term{j}_{i}" for j in range(40)) + " alpha0"
            for i in range(n_long)
        ]
        ids = [f"d{i}" for i in range(len(docs))]
        return ids, docs

    def test_plan_buckets_reduces_area(self):
        from autorag_research_tpu.index.sparse import _plan_buckets

        counts = np.array([3] * 60 + [41] * 6)
        bounds = _plan_buckets(counts, 2)
        assert bounds == [3, 41]
        # degenerate inputs
        assert _plan_buckets(np.array([5, 5, 5]), 3) == [5]
        assert _plan_buckets(np.array([2, 9]), 1) == [9]

    def test_bucketed_matches_flat(self):
        ids, docs = self.make_skewed()
        flat = SparseIndex(ids, docs, tokenizer="simple")
        bucketed = SparseIndex(ids, docs, tokenizer="simple", bucketize=2)
        queries = ["alpha0 beta1", "term3_2 term7_2", "gamma2 alpha3 nonexistent"]
        h_flat = flat.search(queries, 7, method="xla")
        h_bucket = bucketed.search(queries, 7, method="xla")
        for a, b in zip(h_flat, h_bucket):
            assert [(x.doc_id, round(x.score, 5)) for x in a] == [
                (x.doc_id, round(x.score, 5)) for x in b
            ]

    def test_explicit_pruned_method_falls_back_on_bucketed(self):
        """Pruned kernels exist only on the flat path; an explicit
        method='pallas_probe'/'pallas_v2_skip' on a bucketed (or mesh)
        index must fall back, not raise (ADVICE r2 #3)."""
        ids, docs = self.make_skewed()
        bucketed = SparseIndex(ids, docs, tokenizer="simple", bucketize=2)
        queries = ["alpha0 beta1", "term3_2 term7_2"]
        want = bucketed.search(queries, 5, method="auto")
        for m in ("pallas_probe", "pallas_v2_skip"):
            got = bucketed.search(queries, 5, method=m)
            for a, b in zip(want, got):
                assert [(x.doc_id, round(x.score, 5)) for x in a] == [
                    (x.doc_id, round(x.score, 5)) for x in b
                ]

    def test_bucketed_saves_device_memory(self):
        ids, docs = self.make_skewed()
        flat = SparseIndex(ids, docs, tokenizer="simple").to_device()
        bucketed = SparseIndex(ids, docs, tokenizer="simple", bucketize=2).to_device()
        assert bucketed.device_bytes() < flat.device_bytes() / 2

    def test_bucketize_one_keeps_flat_layout(self):
        ids, docs = self.make_skewed()
        idx = SparseIndex(ids, docs, tokenizer="simple", bucketize=1).to_device()
        assert idx._device_buckets is None
        assert idx._device is not None

    def test_bucketize_survives_save_load(self, tmp_path):
        ids, docs = self.make_skewed()
        idx = SparseIndex(ids, docs, tokenizer="simple", bucketize=2)
        idx.save(tmp_path / "bk")
        loaded = SparseIndex.load(tmp_path / "bk")
        assert loaded.bucketize == 2
        a = idx.search(["alpha0 beta1"], 5, method="xla")
        b = loaded.search(["alpha0 beta1"], 5, method="xla")
        assert [(h.doc_id, round(h.score, 5)) for h in a[0]] == [
            (h.doc_id, round(h.score, 5)) for h in b[0]
        ]

    def test_bm25_pipeline_with_bucketize(self, tmp_path):
        from autorag_research_tpu.config import BaseMetricConfig, ExecutorConfig
        from autorag_research_tpu.executor import Executor
        from autorag_research_tpu.index import registry
        from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config
        from autorag_research_tpu.store.catalog import Catalog
        from autorag_research_tpu.store.gt import or_all

        registry.invalidate()
        ids, docs = self.make_skewed()
        cat = Catalog(tmp_path / "bk.db")
        cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(docs)])
        cat.add_queries([{"id": 0, "contents": "term3_2 term7_2"}])
        cat.add_retrieval_gt(0, or_all([62]))  # long doc index 60+2
        cfg = ExecutorConfig(
            pipelines=[BM25Config(name="bm25_bk", top_k=3, bucketize=2)],
            metrics=[BaseMetricConfig(name="recall")],
            health_check=False,
        )
        result = Executor(cat, cfg).run()
        assert result.success, result.report()
        assert result.pipelines[0].metrics[0].average == 1.0
        registry.invalidate()


class TestPackedKernel:
    def test_pack_slots_layout(self):
        from autorag_research_tpu.ops.sparse import DOC_PAD, pack_slots

        ids = np.arange(10 * 16, dtype=np.int32).reshape(10, 16)
        w = np.ones((10, 16), np.float32)
        pids, pw, pack = pack_slots(ids, w, 16)
        assert pack == 8
        assert pids.shape == (2, 128)
        np.testing.assert_array_equal(pids[0, :16], ids[0])   # doc 0 -> row 0 group 0
        np.testing.assert_array_equal(pids[1, :16], ids[8])   # doc 8 -> row 1 group 0
        assert (pids[1, 32:] == DOC_PAD).all()  # pad docs beyond n

    def test_packed_matches_oracle(self, index):
        """Lane-packed kernel vs the host oracle on the shared tiny corpus
        (slot width padded up to a pack-friendly 16)."""
        import jax.numpy as jnp

        from autorag_research_tpu.ops.sparse import (
            DOC_PAD,
            bm25_topk_pallas_packed,
            bm25_topk_xla,
            pack_slots,
        )

        width = 16
        n, l = index._slot_ids.shape
        assert l <= width
        ids = np.full((n, width), DOC_PAD, np.int32)
        w = np.zeros((n, width), np.float32)
        ids[:, :l] = index._slot_ids
        w[:, :l] = index._slot_weights
        queries = ["quick fox", "lazy dog sleeping", "database search"]
        q_ids, q_w = index.encode_queries(queries)
        s0, i0 = bm25_topk_xla(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(ids), jnp.asarray(w), 4
        )
        pids, pw, pack = pack_slots(ids, w, width)
        s1, i1 = bm25_topk_pallas_packed(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(pids), jnp.asarray(pw),
            n, 4, pack, block_n=128, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)

    def test_packed_odd_width_tail_lanes_dead(self):
        """width 3 -> pack 42 covers 126 lanes; the 2 tail lanes must be dead
        (regression: pallas block-padding would alias them onto a real doc)."""
        import jax.numpy as jnp

        from autorag_research_tpu.ops.sparse import (
            bm25_topk_pallas_packed,
            bm25_topk_xla,
            pack_slots,
        )

        rng = np.random.default_rng(5)
        n, width, vocab = 301, 3, 120
        ids = rng.integers(0, vocab, (n, width)).astype(np.int32)
        w = rng.random((n, width)).astype(np.float32)
        q_ids = rng.integers(0, vocab, (4, 6)).astype(np.int32)
        q_w = rng.random((4, 6)).astype(np.float32)
        s0, i0 = bm25_topk_xla(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(ids), jnp.asarray(w), 5
        )
        pids, pw, pack = pack_slots(ids, w, width)
        assert pids.shape[1] == 128 and pack == 42
        s1, i1 = bm25_topk_pallas_packed(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(pids), jnp.asarray(pw),
            n, 5, pack, block_n=128, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)

    def test_flat_index_auto_packs_short_corpora(self):
        """A whole-corpus width <= 64 flat index should auto-pack (single
        launch) and return identical results to the unpacked kernels."""
        ids, docs = TestBucketedLayout().make_skewed(n_short=40, n_long=0)
        idx = SparseIndex(ids, docs, tokenizer="simple")
        idx.to_device()
        assert getattr(idx, "_device_pack", 1) > 1
        hits = idx.search(["alpha0 beta1"], 5)
        ref = SparseIndex(ids, docs, tokenizer="simple")
        ref._slot_ids = np.pad(ref._slot_ids, ((0, 0), (0, 128 - ref._slot_ids.shape[1])),
                               constant_values=-1)
        ref._slot_weights = np.pad(ref._slot_weights,
                                   ((0, 0), (0, 128 - ref._slot_weights.shape[1])))
        ref_hits = ref.search(["alpha0 beta1"], 5, method="xla")
        assert [(h.doc_id, round(h.score, 5)) for h in hits[0]] == [
            (h.doc_id, round(h.score, 5)) for h in ref_hits[0]
        ]


    def test_packed_index_honors_explicit_method(self):
        """An explicit method pin (the parity oracle's 'xla') on an auto-
        packed corpus must run the pinned kernel from a flat upload, not be
        silently swapped for the packed kernel (regression)."""
        ids, docs = TestBucketedLayout().make_skewed(n_short=40, n_long=0)
        idx = SparseIndex(ids, docs, tokenizer="simple")
        idx.to_device()
        assert getattr(idx, "_device_pack", 1) > 1
        auto_hits = idx.search(["alpha0 beta1"], 5)
        assert getattr(idx, "_device_flat", None) is None  # auto stayed packed
        xla_hits = idx.search(["alpha0 beta1"], 5, method="xla")
        assert idx._device_flat is not None  # the pin ran on the flat upload
        assert [(h.doc_id, round(h.score, 5)) for h in xla_hits[0]] == [
            (h.doc_id, round(h.score, 5)) for h in auto_hits[0]
        ]
        # explicit PRUNED methods fall back to auto on packed layouts
        pruned = idx.search(["alpha0 beta1"], 5, method="pallas_probe")
        assert [(h.doc_id, round(h.score, 5)) for h in pruned[0]] == [
            (h.doc_id, round(h.score, 5)) for h in auto_hits[0]
        ]


def test_probe_small_block_n_large_k_falls_back_to_skip_leg():
    """probe_block_n below k must not crash the pruned path: the probe leg
    is gated on k fitting one candidate tile and the Bloom skip leg (2048
    granularity) serves the request instead (regression: ValueError)."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    # long docs (> 64 unique slots) so the corpus does NOT auto-pack
    docs = [" ".join(rng.choice(vocab, size=90, replace=False)) for _ in range(300)]
    ids = [f"d{i}" for i in range(300)]
    idx = SparseIndex(ids, docs, tokenizer="simple", probe_block_n=64)
    idx.to_device()
    k = 128  # > probe_block_n, <= 2048
    want = idx.search(["w0 w1 w2"], k, method="xla")
    got = idx.search(["w0 w1 w2"], k, method="pallas_probe")
    assert [(h.doc_id, round(h.score, 5)) for h in got[0]] == [
        (h.doc_id, round(h.score, 5)) for h in want[0]
    ]


class TestTileSkip:
    """bm25_topk_pallas_v2_skip: term-driven tile pruning must be exact."""

    def _synthetic(self, n_docs=600, n_slots=24, vocab=5000, seed=0):
        rng = np.random.default_rng(seed)
        # cluster terms by doc range so whole tiles genuinely lack query terms
        ids = np.full((n_docs, n_slots), -1, np.int32)
        w = np.zeros((n_docs, n_slots), np.float32)
        for i in range(n_docs):
            region = (i * 10 // n_docs) * (vocab // 10)
            terms = rng.choice(vocab // 10, size=rng.integers(4, n_slots), replace=False)
            ids[i, : len(terms)] = region + terms
            w[i, : len(terms)] = rng.uniform(0.2, 2.0, size=len(terms)).astype(np.float32)
        return ids, w

    def test_bitmaps_have_no_false_negatives(self):
        from autorag_research_tpu.ops.sparse import (
            _bloom_positions,
            build_tile_bitmaps,
        )

        ids, _ = self._synthetic()
        bm = build_tile_bitmaps(ids, block_n=128, n_words=64)
        space = 64 * 32
        for t in range(bm.shape[0]):
            tile = ids[t * 128 : (t + 1) * 128].reshape(-1)
            terms = np.unique(tile[tile >= 0])
            for pos in _bloom_positions(terms, space):
                for term, h in zip(terms, pos):
                    assert (bm[t, int(h) // 32] >> (int(h) % 32)) & 1, (t, term)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_skip_matches_v2_exactly(self, seed):
        import jax.numpy as jnp

        from autorag_research_tpu.ops.sparse import (
            bm25_topk_pallas_v2,
            bm25_topk_pallas_v2_skip,
            build_tile_bitmaps,
        )

        doc_ids, doc_w = self._synthetic(seed=seed)
        rng = np.random.default_rng(seed + 10)
        # queries hitting only one term-region -> most tiles skippable
        q_ids = np.full((4, 6), -2, np.int32)
        q_w = np.zeros((4, 6), np.float32)
        for b in range(4):
            region = (b % 10) * 500
            q_ids[b, :4] = region + rng.choice(400, size=4, replace=False)
            q_w[b, :4] = rng.uniform(0.5, 1.5, size=4).astype(np.float32)
        bitmaps = build_tile_bitmaps(doc_ids, block_n=128, n_words=64)
        args = (jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids), jnp.asarray(doc_w))
        s0, i0 = bm25_topk_pallas_v2(*args, k=8, block_q=8, block_n=128, interpret=True)
        s1, i1 = bm25_topk_pallas_v2_skip(
            *args[:2], args[2], args[3], jnp.asarray(bitmaps),
            k=8, block_q=8, block_n=128, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)

    def test_skip_exact_when_fewer_than_k_positive_hits(self):
        """Zero-score fill: the warm guard must keep skipping sound when a
        query matches fewer than k docs (kth score stays 0)."""
        import jax.numpy as jnp

        from autorag_research_tpu.ops.sparse import (
            bm25_topk_pallas_v2,
            bm25_topk_pallas_v2_skip,
            build_tile_bitmaps,
        )

        doc_ids, doc_w = self._synthetic(seed=3)
        # one term that exists in exactly one doc (rare-term query)
        doc_ids[599, 0] = 4999
        doc_w[599, 0] = 1.0
        q_ids = np.full((2, 4), -2, np.int32)
        q_w = np.zeros((2, 4), np.float32)
        q_ids[0, 0] = 4999
        q_w[0, 0] = 1.0
        q_ids[1, 0] = 123456  # matches nothing at all
        q_w[1, 0] = 1.0
        bitmaps = build_tile_bitmaps(doc_ids, block_n=128, n_words=64)
        args = (jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids), jnp.asarray(doc_w))
        s0, i0 = bm25_topk_pallas_v2(*args, k=5, block_q=8, block_n=128, interpret=True)
        s1, i1 = bm25_topk_pallas_v2_skip(
            *args[:2], args[2], args[3], jnp.asarray(bitmaps),
            k=5, block_q=8, block_n=128, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)


class TestClusterLayout:
    def test_cluster_layout_same_results_modulo_ties(self):
        idx_plain = SparseIndex(IDS, DOCS, tokenizer="simple")
        idx_clust = SparseIndex(IDS, DOCS, tokenizer="simple", cluster_layout=True)
        for q in ["quick fox", "database search", "dog"]:
            a = idx_plain.search([q], 4, method="xla")[0]
            b = idx_clust.search([q], 4, method="xla")[0]
            # same (doc, score) multisets — tiny corpus has no boundary ties
            assert sorted((h.doc_id, round(h.score, 5)) for h in a) == sorted(
                (h.doc_id, round(h.score, 5)) for h in b
            )

    def test_cluster_layout_groups_rare_terms(self):
        import numpy as np

        from autorag_research_tpu.ops.sparse import cluster_doc_order

        rng = np.random.default_rng(0)
        n = 512
        ids = rng.integers(0, 50, size=(n, 8)).astype(np.int32)  # common terms
        # give 40 scattered docs the same rare term 999
        rare_rows = rng.choice(n, size=40, replace=False)
        ids[rare_rows, 0] = 999
        df = np.zeros(1000, np.int64)
        for t, c in zip(*np.unique(ids, return_counts=True)):
            df[t] = c
        order = cluster_doc_order(ids, df)
        pos = np.nonzero(np.isin(order, rare_rows))[0]
        assert pos.max() - pos.min() == len(rare_rows) - 1  # contiguous group

    def test_positive_only_matches_v2_positive_hits(self):
        import jax.numpy as jnp

        from autorag_research_tpu.ops.sparse import (
            bm25_topk_pallas_v2,
            bm25_topk_pallas_v2_skip,
            build_tile_bitmaps,
        )

        doc_ids, doc_w = TestTileSkip()._synthetic(seed=7)
        rng = np.random.default_rng(99)
        q_ids = np.full((3, 5), -2, np.int32)
        q_w = np.zeros((3, 5), np.float32)
        for b in range(3):
            region = (b * 3 % 10) * 500
            q_ids[b, :3] = region + rng.choice(400, size=3, replace=False)
            q_w[b, :3] = rng.uniform(0.5, 1.5, size=3).astype(np.float32)
        q_ids[2, :] = -2  # query with no real terms at all
        q_ids[2, 0] = 499999  # unknown term
        q_w[2, 0] = 1.0
        bitmaps = build_tile_bitmaps(doc_ids, block_n=128, n_words=64)
        args = (jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids), jnp.asarray(doc_w))
        s0, i0 = bm25_topk_pallas_v2(*args, k=7, block_q=8, block_n=128, interpret=True)
        s1, i1 = bm25_topk_pallas_v2_skip(
            *args[:2], args[2], args[3], jnp.asarray(bitmaps),
            k=7, block_q=8, block_n=128, positive_only=True, interpret=True,
        )
        s0, i0, s1, i1 = map(np.asarray, (s0, i0, s1, i1))
        for b in range(3):
            pos = s0[b] > 0
            np.testing.assert_array_equal(i1[b][: pos.sum()], i0[b][pos])
            np.testing.assert_allclose(s1[b][: pos.sum()], s0[b][pos], rtol=1e-6)
            # the rest is filler (score <= 0), never arbitrary zero-score docs
            assert (s1[b][pos.sum():] <= 0).all()


class TestProbeKernel:
    """bm25_topk_pallas_probe: candidate-tile grid must reproduce v2's
    positive hits exactly when fed the exact term->tile lists."""

    def _setup(self, seed=0):
        from autorag_research_tpu.ops.sparse import (
            build_term_tile_lists,
            probe_candidates,
        )

        doc_ids, doc_w = TestTileSkip()._synthetic(seed=seed)
        indptr, tiles = build_term_tile_lists(doc_ids, block_n=128)
        return doc_ids, doc_w, indptr, tiles

    def test_term_tile_lists_exact(self):
        doc_ids, _, indptr, tiles = self._setup()
        # every (term, tile) pairing present, nothing else
        for t in (0, 7, 100):
            expected = sorted(
                ti
                for ti in range(-(-doc_ids.shape[0] // 128))
                if (doc_ids[ti * 128 : (ti + 1) * 128] == t).any()
            )
            got = list(tiles[indptr[t] : indptr[t + 1]])
            assert got == expected, (t, got, expected)

    @pytest.mark.parametrize("seed", [0, 5])
    def test_probe_matches_v2_positive_hits(self, seed):
        import jax.numpy as jnp

        from autorag_research_tpu.ops.sparse import (
            bm25_topk_pallas_probe,
            bm25_topk_pallas_v2,
            probe_candidates,
        )

        doc_ids, doc_w, indptr, tiles = self._setup(seed)
        rng = np.random.default_rng(seed + 30)
        q_ids = np.full((3, 5), -2, np.int32)
        q_w = np.zeros((3, 5), np.float32)
        for b in range(3):
            region = (b * 4 % 10) * 500
            q_ids[b, :3] = region + rng.choice(400, size=3, replace=False)
            q_w[b, :3] = rng.uniform(0.5, 1.5, size=3).astype(np.float32)
        cand, count, maxc = probe_candidates(q_ids, indptr, tiles, bq=8, cap=8)
        assert maxc <= 8
        s0, i0 = bm25_topk_pallas_v2(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
            jnp.asarray(doc_w), k=7, block_q=8, block_n=128, interpret=True,
        )
        s1, i1 = bm25_topk_pallas_probe(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
            jnp.asarray(doc_w), jnp.asarray(cand), jnp.asarray(count),
            k=7, block_q=8, block_n=128, interpret=True,
        )
        s0, i0, s1, i1 = map(np.asarray, (s0, i0, s1, i1))
        for b in range(3):
            pos = s0[b] > 0
            np.testing.assert_array_equal(i1[b][: pos.sum()], i0[b][pos])
            np.testing.assert_allclose(s1[b][: pos.sum()], s0[b][pos], rtol=1e-6)

    def test_truncation_reported(self):
        from autorag_research_tpu.ops.sparse import probe_candidates

        doc_ids, _, indptr, tiles = self._setup()
        # a common-region query touching many tiles, cap tiny
        q_ids = np.array([[0, 1, 2, 3, 4]], np.int32)
        cand, count, maxc = probe_candidates(q_ids, indptr, tiles, bq=8, cap=1)
        assert count[0] == 1
        assert maxc >= 1  # true union size reported even when truncated

    def test_index_probe_path_matches_xla(self):
        idx = SparseIndex(IDS, DOCS, tokenizer="simple")
        for q in ["quick fox", "database search", "zzz nothing"]:
            a = idx.search([q], 4, method="xla")[0]
            b = idx.search([q], 4, method="pallas_probe")[0]
            assert [(h.doc_id, round(h.score, 5)) for h in a] == [
                (h.doc_id, round(h.score, 5)) for h in b
            ], q


def test_save_load_preserves_pruning_flags(tmp_path):
    idx = SparseIndex(IDS, DOCS, tokenizer="simple", cluster_layout=True)
    idx.save(tmp_path / "sp")
    idx2 = SparseIndex.load(tmp_path / "sp")
    assert idx2.tile_skip is True and idx2.cluster_layout is True
    # the cluster order is baked into the saved arrays: results identical
    a = idx.search(["quick fox"], 3, method="xla")[0]
    b = idx2.search(["quick fox"], 3, method="xla")[0]
    assert [(h.doc_id, round(h.score, 5)) for h in a] == [
        (h.doc_id, round(h.score, 5)) for h in b
    ]


def test_search_pruned_route_decision(monkeypatch):
    """_search_pruned routes selective queries to the probe kernel and
    tile-saturating queries to the full-grid skip fallback (auto mode)."""
    import autorag_research_tpu.index.sparse as sparse_mod

    # wide docs (>64 distinct terms) so the index keeps the FLAT layout —
    # short docs auto-pack and search() routes to the packed kernel before
    # the pruned path. One tile at block_n=2048: monkeypatch the candidate
    # verdict to pin each branch.
    docs = {
        f"d{i}": "shared unique%d " % i + " ".join(f"w{i}x{j}" for j in range(70))
        for i in range(60)
    }
    idx = SparseIndex(list(docs), list(docs.values()), tokenizer="simple")
    idx.to_device()

    routed = []

    import autorag_research_tpu.ops.sparse as ops_sparse

    real_probe = ops_sparse.bm25_topk_pallas_probe
    real_skip = ops_sparse.bm25_topk_pallas_v2_skip

    def spy_probe(*a, **k):
        routed.append("probe")
        return real_probe(*a, **k)

    def spy_skip(*a, **k):
        routed.append("skip")
        return real_skip(*a, **k)

    monkeypatch.setattr(ops_sparse, "bm25_topk_pallas_probe", spy_probe)
    monkeypatch.setattr(ops_sparse, "bm25_topk_pallas_v2_skip", spy_skip)

    q_ids, q_w = idx.encode_queries(["unique7"])
    doc_ids, doc_w = idx._device

    # force a multi-tile view: pretend the candidate union is selective
    real_pc = ops_sparse.probe_candidates

    def selective_pc(q, indptr, tiles, bq, cap):
        cand, count, maxc = real_pc(q, indptr, tiles, bq=bq, cap=cap)
        return cand, count, 0  # maxc=0 <= n_tiles//2 -> probe branch
    monkeypatch.setattr(ops_sparse, "probe_candidates", selective_pc)
    s, r = idx._search_pruned(q_ids, q_w, doc_ids, doc_w, 3, "auto")
    assert routed[-1] == "probe"
    # the true candidate list (not the spoofed maxc) still finds the doc
    hit_rows = np.asarray(r)[0]
    assert idx.ids.index("d7") in hit_rows

    # saturating verdict -> fallback branch
    def saturating_pc(q, indptr, tiles, bq, cap):
        cand, count, maxc = real_pc(q, indptr, tiles, bq=bq, cap=cap)
        return cand, count, 10**9
    monkeypatch.setattr(ops_sparse, "probe_candidates", saturating_pc)
    s2, r2 = idx._search_pruned(q_ids, q_w, doc_ids, doc_w, 3, "auto")
    assert routed[-1] == "skip"
    assert idx.ids.index("d7") in np.asarray(r2)[0]


def test_cluster_layout_applies_on_every_build_path():
    """cluster_layout must physically reorder docs whichever builder ran
    (the native C++ path previously skipped the reorder while still
    persisting cluster_layout=True)."""
    # ascii corpus -> native path when the lib is available; rare term on
    # scattered docs must come back contiguous
    docs = []
    for i in range(64):
        text = f"common{i % 4} filler word"
        if i % 7 == 0:
            text += " raregem"
        docs.append(text)
    ids = [f"d{i}" for i in range(64)]
    idx = SparseIndex(ids, docs, tokenizer="simple", cluster_layout=True)
    rare_rows = [j for j, d in enumerate(docs) if "raregem" in d]
    pos = [idx.ids.index(f"d{j}") for j in rare_rows]
    assert max(pos) - min(pos) == len(pos) - 1, (
        "docs sharing the rarest term must be contiguous after cluster_layout"
    )


def test_v2_skip_refuses_k_bump_past_bitmap_granularity():
    """A k that forces a bigger tile than the bitmaps were built at must
    raise — re-tiling silently past the Bloom granularity would drop hits
    even when the tile counts coincide (regression)."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.sparse import (
        bm25_topk_pallas_v2_skip,
        build_tile_bitmaps,
    )

    ids = np.zeros((4096, 8), np.int32)
    ids[:, 0] = np.arange(4096) % 97
    w = np.ones((4096, 8), np.float32)
    bitmaps = jnp.asarray(build_tile_bitmaps(ids, 2048))
    q_ids = jnp.asarray([[1, 2]], dtype=jnp.int32)
    q_w = jnp.ones((1, 2), jnp.float32)
    with pytest.raises(ValueError, match="bitmaps were built"):
        bm25_topk_pallas_v2_skip(
            q_ids, q_w, jnp.asarray(ids), jnp.asarray(w), bitmaps,
            k=2500, block_n=2048, interpret=True,
        )


def test_pack_slots_refuses_live_terms_beyond_width():
    from autorag_research_tpu.ops.sparse import DOC_PAD, pack_slots

    ids = np.full((4, 32), DOC_PAD, np.int32)
    ids[:, :20] = 7  # live terms out to slot 20
    w = np.ones((4, 32), np.float32)
    with pytest.raises(ValueError, match="beyond"):
        pack_slots(ids, w, width=16)
    packed, _, p = pack_slots(ids[:, :20], w[:, :20], width=20)
    assert p == 128 // 20 // 1 or p >= 1  # packs fine when terms fit


class TestProbePackedKernel:
    """bm25_topk_pallas_probe_packed: the probe x packed compose must
    reproduce the full packed scan's positive hits exactly when fed the
    exact term->tile lists built at block_n * pack doc granularity."""

    @pytest.mark.parametrize("seed", [0, 5])
    def test_probe_packed_matches_v2_positive_hits(self, seed):
        import jax.numpy as jnp

        from autorag_research_tpu.ops.sparse import (
            bm25_topk_pallas_probe_packed,
            bm25_topk_pallas_v2,
            build_term_tile_lists,
            pack_slots,
            probe_candidates,
        )

        doc_ids, doc_w = TestTileSkip()._synthetic(seed=seed)  # [600, 24]
        n = doc_ids.shape[0]
        pids, pw, pack = pack_slots(doc_ids, doc_w, doc_ids.shape[1])
        assert pack == 128 // 24  # 5 docs per 128-lane row
        block_n = 16  # packed rows per tile -> 80 docs per tile
        indptr, tiles = build_term_tile_lists(doc_ids, block_n * pack)
        rng = np.random.default_rng(seed + 30)
        q_ids = np.full((3, 5), -2, np.int32)
        q_w = np.zeros((3, 5), np.float32)
        for b in range(3):
            region = (b * 4 % 10) * 500
            q_ids[b, :3] = region + rng.choice(400, size=3, replace=False)
            q_w[b, :3] = rng.uniform(0.5, 1.5, size=3).astype(np.float32)
        p_tiles = -(-n // (block_n * pack))
        cand, count, maxc = probe_candidates(q_ids, indptr, tiles, bq=8, cap=p_tiles)
        s0, i0 = bm25_topk_pallas_v2(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(doc_ids),
            jnp.asarray(doc_w), k=7, block_q=8, block_n=128, interpret=True,
        )
        s1, i1 = bm25_topk_pallas_probe_packed(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(pids),
            jnp.asarray(pw), n, pack, jnp.asarray(cand), jnp.asarray(count),
            k=7, block_q=8, block_n=block_n, interpret=True,
        )
        s0, i0, s1, i1 = map(np.asarray, (s0, i0, s1, i1))
        for b in range(3):
            pos = s0[b] > 0
            np.testing.assert_array_equal(i1[b][: pos.sum()], i0[b][pos])
            np.testing.assert_allclose(s1[b][: pos.sum()], s0[b][pos], rtol=1e-5)

    def test_probe_packed_empty_candidates_no_hits(self):
        import jax.numpy as jnp

        from autorag_research_tpu.ops.sparse import (
            bm25_topk_pallas_probe_packed,
            pack_slots,
        )

        doc_ids, doc_w = TestTileSkip()._synthetic(seed=1)
        pids, pw, pack = pack_slots(doc_ids, doc_w, doc_ids.shape[1])
        q_ids = np.full((1, 5), -2, np.int32)
        q_ids[0, 0] = 499_999  # vocab miss
        q_w = np.ones((1, 5), np.float32)
        cand = np.zeros((1, 4), np.int32)
        count = np.zeros(1, np.int32)  # zero live candidates
        s, i = bm25_topk_pallas_probe_packed(
            jnp.asarray(q_ids), jnp.asarray(q_w), jnp.asarray(pids),
            jnp.asarray(pw), doc_ids.shape[0], pack, jnp.asarray(cand),
            jnp.asarray(count), k=5, block_q=8, block_n=16, interpret=True,
        )
        assert (np.asarray(s) <= 0.0).all()
