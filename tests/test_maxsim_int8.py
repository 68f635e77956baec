"""int8 MaxSim serving mode: kernel vs dequantized oracle, index wiring,
shard-count invariance (ops/maxsim.maxsim_topk_int8,
MultiVectorIndex(mode="int8"), parallel/sharded.sharded_maxsim_topk_int8)."""

import numpy as np
import pytest

from autorag_research_tpu.index.dense import l2_normalize
from autorag_research_tpu.index.multi_vector import MultiVectorIndex, pad_ragged
from autorag_research_tpu.ops.maxsim import (
    maxsim_topk_int8,
    maxsim_topk_xla,
    quantize_int8_tokens,
)
from autorag_research_tpu.parallel.mesh import corpus_mesh


def _jnp(*arrs):
    import jax.numpy as jnp

    return tuple(jnp.asarray(a) for a in arrs)


def dequant_maxsim_oracle(queries, q_lens, docs_q, d_scales, d_lens):
    """[B, N] maxsim scores of the DEQUANTIZED int8 corpus against the
    device-identically quantized queries — the exact value the kernel's
    s32 contraction + scale folding computes, in f64."""
    from autorag_research_tpu.ops.dense import quantize_int8

    b, tq, d = queries.shape
    qq, qs = quantize_int8(queries.reshape(b * tq, d).astype(np.float32))
    qd = qq.astype(np.float64).reshape(b, tq, d) * qs.reshape(b, tq, 1)
    dd = docs_q.astype(np.float64) * d_scales[..., None]
    n = docs_q.shape[0]
    out = np.full((b, n), -np.inf)
    for bi in range(b):
        for ni in range(n):
            if d_lens[ni] == 0:
                continue
            s = qd[bi, : q_lens[bi]] @ dd[ni, : d_lens[ni]].T
            out[bi, ni] = s.max(axis=1).sum() if s.size else 0.0
    return out


@pytest.fixture(scope="module")
def ragged():
    rng = np.random.default_rng(11)
    docs = [
        l2_normalize(rng.normal(size=(int(rng.integers(2, 9)), 16)).astype(np.float32))
        for _ in range(41)
    ]
    queries = [
        l2_normalize(rng.normal(size=(int(rng.integers(2, 6)), 16)).astype(np.float32))
        for _ in range(5)
    ]
    q, ql = pad_ragged(queries)
    d, dl = pad_ragged(docs)
    return q, ql, d, dl


def test_kernel_matches_dequantized_oracle(ragged):
    q, ql, d, dl = ragged
    dq, ds = quantize_int8_tokens(d)
    oracle = dequant_maxsim_oracle(q, ql, dq, ds, dl)
    want = np.lexsort((np.arange(d.shape[0])[None].repeat(len(q), 0), -oracle), axis=1)[:, :5]
    s, ids = maxsim_topk_int8(*_jnp(q, ql, dq, ds, dl), 5, tile_n=8)
    s, ids = np.asarray(s), np.asarray(ids)
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(s, np.take_along_axis(oracle, want, 1), rtol=2e-5, atol=1e-6)


def test_agreement_with_exact_f32(ragged):
    # quantization error ~1e-2: top-5 against the f32 scan should agree on
    # nearly everything for gaussian normalized tokens
    q, ql, d, dl = ragged
    dq, ds = quantize_int8_tokens(d)
    s8, i8 = maxsim_topk_int8(*_jnp(q, ql, dq, ds, dl), 5, tile_n=8)
    sf, if_ = maxsim_topk_xla(*_jnp(q, ql, d, dl), 5, tile_n=8)
    agree = np.mean(
        [len(set(map(int, a)) & set(map(int, b))) / 5 for a, b in zip(np.asarray(i8), np.asarray(if_))]
    )
    assert agree >= 0.8, agree
    # dequantized scores track the true scores
    np.testing.assert_allclose(np.asarray(s8), np.asarray(sf), rtol=0.05, atol=0.05)


def test_planted_top_is_found_exactly():
    # a doc containing the query tokens verbatim dominates by a margin far
    # beyond quantization error -> must rank first with ~exact score
    rng = np.random.default_rng(3)
    d = 32
    docs = [l2_normalize(rng.normal(size=(6, d)).astype(np.float32)) * 0.1 for _ in range(50)]
    q_mat = l2_normalize(rng.normal(size=(4, d)).astype(np.float32))
    docs[17] = q_mat.copy()
    q, ql = pad_ragged([q_mat])
    dpad, dl = pad_ragged(docs)
    dq, ds = quantize_int8_tokens(dpad)
    s, ids = maxsim_topk_int8(*_jnp(q, ql, dq, ds, dl), 3)
    assert int(np.asarray(ids)[0, 0]) == 17
    assert abs(float(np.asarray(s)[0, 0]) - 4.0) < 0.05


def test_empty_docs_never_surface():
    rng = np.random.default_rng(4)
    dpad = np.zeros((10, 4, 8), np.float32)
    dl = np.zeros(10, np.int32)
    for i in (1, 5, 8):
        dl[i] = 3
        dpad[i, :3] = l2_normalize(rng.normal(size=(3, 8)).astype(np.float32))
    q, ql = pad_ragged([l2_normalize(rng.normal(size=(2, 8)).astype(np.float32))])
    dq, ds = quantize_int8_tokens(dpad)
    s, ids = maxsim_topk_int8(*_jnp(q, ql, dq, ds, dl), 5)
    real = [int(i) for i, sc in zip(np.asarray(ids)[0], np.asarray(s)[0]) if sc > -1e37]
    assert set(real) <= {1, 5, 8} and len(real) == 3


def test_quantize_int8_tokens_zero_pad_rows():
    d = np.zeros((2, 3, 8), np.float32)
    d[0, 0] = 1.0
    dq, ds = quantize_int8_tokens(d)
    assert dq.shape == (2, 3, 8) and ds.shape == (2, 3)
    assert ds[0, 0] > 0 and ds[0, 1] == 0 and (dq[1] == 0).all()


class TestIndexInt8:
    def _build(self, mode="int8"):
        rng = np.random.default_rng(9)
        docs = [rng.normal(size=(int(rng.integers(2, 7)), 16)).astype(np.float32) for _ in range(30)]
        ids = [f"doc{i}" for i in range(30)]
        return MultiVectorIndex(ids, docs, mode=mode), docs, rng

    def test_search_and_score_convention(self):
        idx, docs, rng = self._build()
        q = [rng.normal(size=(3, 16)).astype(np.float32)]
        hits = idx.search(q, 5)[0]
        assert len(hits) == 5
        exact = MultiVectorIndex([f"doc{i}" for i in range(30)], docs).search(q, 5)[0]
        # same normalization convention (maxsim / n_query_vectors), close scores
        got = {h.doc_id: h.score for h in hits}
        want = {h.doc_id: h.score for h in exact}
        common = set(got) & set(want)
        assert len(common) >= 3
        for k in common:
            assert abs(got[k] - want[k]) < 0.05

    def test_f32_tokens_never_ship_to_device(self):
        idx, _, _ = self._build()
        idx.to_device()
        docs_dev, _ = idx._device
        assert str(docs_dev.dtype) == "int8"
        assert idx._scales_device is not None

    def test_prefilter_refused(self):
        idx, _, rng = self._build()
        with pytest.raises(ValueError, match="int8"):
            idx.search([rng.normal(size=(3, 16)).astype(np.float32)], 5, prefilter=4)

    def test_save_load_roundtrip(self, tmp_path):
        idx, _, rng = self._build()
        q = [rng.normal(size=(3, 16)).astype(np.float32)]
        want = [(h.doc_id, round(h.score, 5)) for h in idx.search(q, 5)[0]]
        idx.save(tmp_path / "mv")
        idx2 = MultiVectorIndex.load(tmp_path / "mv")
        assert idx2.mode == "int8"
        got = [(h.doc_id, round(h.score, 5)) for h in idx2.search(q, 5)[0]]
        assert got == want

    @pytest.mark.parametrize("shards", [2, 4, 8])
    def test_shard_count_invariance(self, shards):
        idx, docs, rng = self._build()
        q = [rng.normal(size=(3, 16)).astype(np.float32) for _ in range(4)]
        want = [
            [(h.doc_id, round(h.score, 5)) for h in row] for row in idx.search(q, 6)
        ]
        ids = [f"doc{i}" for i in range(30)]
        sharded = MultiVectorIndex(ids, docs, mode="int8").to_device(corpus_mesh(n_corpus=shards))
        got = [
            [(h.doc_id, round(h.score, 5)) for h in row] for row in sharded.search(q, 6)
        ]
        assert got == want, shards
