"""Dense top-k kernel correctness vs a numpy oracle, incl. determinism."""

import numpy as np
import pytest

from autorag_research_tpu.ops.dense import (
    dense_topk_pallas,
    dense_topk_xla,
    dense_topk_xla_two_stage,
)
from autorag_research_tpu.ops.topk import merge_topk, sort_topk


def numpy_topk(queries, corpus, k):
    # Score with the same backend/precision as the kernels, then select with a
    # numpy lexsort oracle — this isolates the selection logic under test from
    # accumulation-order float differences that can swap near-tied ranks.
    import jax
    import jax.numpy as jnp

    scores = np.asarray(
        jnp.dot(jnp.asarray(queries), jnp.asarray(corpus).T, precision=jax.lax.Precision.HIGHEST)
    )
    order = np.lexsort(
        (np.arange(corpus.shape[0])[None, :].repeat(len(queries), 0), -scores), axis=1
    )
    ids = order[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(7, 48)).astype(np.float32)
    c = rng.normal(size=(333, 48)).astype(np.float32)
    return q, c


def test_xla_matches_numpy(data):
    q, c = data
    s, i = dense_topk_xla(q, c, 10, tile_n=128)
    ns, ni = numpy_topk(q, c, 10)
    np.testing.assert_array_equal(np.asarray(i), ni)
    np.testing.assert_allclose(np.asarray(s), ns, rtol=1e-5)


def test_pallas_matches_numpy_interpret(data):
    q, c = data
    s, i = dense_topk_pallas(q, c, 10, block_q=8, block_n=128, interpret=True)
    ns, ni = numpy_topk(q, c, 10)
    np.testing.assert_array_equal(np.asarray(i), ni)
    np.testing.assert_allclose(np.asarray(s), ns, rtol=1e-5)


def test_tie_breaking_prefers_lower_id():
    # duplicate rows -> identical scores; ids must come back ascending
    c = np.tile(np.ones((1, 16), np.float32), (50, 1))
    q = np.ones((2, 16), np.float32)
    _, i_xla = dense_topk_xla(q, c, 5, tile_n=128)
    _, i_pal = dense_topk_pallas(q, c, 5, block_q=8, block_n=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_xla), [[0, 1, 2, 3, 4]] * 2)
    np.testing.assert_array_equal(np.asarray(i_pal), [[0, 1, 2, 3, 4]] * 2)


def test_tile_boundary_ties():
    # equal scores straddling tile boundaries must still order by id
    rng = np.random.default_rng(1)
    c = rng.normal(size=(40, 8)).astype(np.float32)
    c[5] = c[37]  # duplicate across different tiles (block_n=16)
    q = c[37][None, :]
    _, ids = dense_topk_xla(q, c, 3, tile_n=128)
    assert 5 in np.asarray(ids)[0] and 37 in np.asarray(ids)[0]
    s, _ = dense_topk_xla(q, c, 3, tile_n=128)
    arr = np.asarray(ids)[0]
    assert list(arr[:2]) == [5, 37]  # same score, lower id first


def test_two_stage_matches_numpy(data):
    q, c = data
    s, i = dense_topk_xla_two_stage(q, c, 10, tile=128)
    ns, ni = numpy_topk(q, c, 10)
    np.testing.assert_array_equal(np.asarray(i), ni)
    np.testing.assert_allclose(np.asarray(s), ns, rtol=1e-5)


def test_two_stage_cross_tile_ties_order_by_id():
    # duplicate rows scattered across segments: equal scores must come back
    # ordered by doc id even when the winners come from different segments
    rng = np.random.default_rng(3)
    base = rng.normal(size=(50, 16)).astype(np.float32)
    c = np.tile(base, (20, 1))  # 1000 rows; row r == row r%50
    q = base[7][None, :]
    _, ids = dense_topk_xla_two_stage(q, c, 10, tile=128)
    ids = np.asarray(ids)[0]
    assert list(ids) == sorted(ids)  # all top-10 are copies of row 7: ids ascend
    assert ids[0] == 7


def test_two_stage_k_larger_than_n_and_padding():
    rng = np.random.default_rng(4)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    c = rng.normal(size=(5, 8)).astype(np.float32)
    s, i = dense_topk_xla_two_stage(q, c, 10, tile=128)
    assert s.shape == (3, 10)
    ns, ni = numpy_topk(q, c, 5)
    np.testing.assert_array_equal(np.asarray(i)[:, :5], ni)


def test_k_larger_than_n():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    c = rng.normal(size=(4, 8)).astype(np.float32)
    s, i = dense_topk_xla(q, c, 10)
    assert s.shape == (3, 10)
    # first 4 valid, rest padded
    ns, ni = numpy_topk(q, c, 4)
    np.testing.assert_array_equal(np.asarray(i)[:, :4], ni)


def test_merge_topk_partition_invariance(data):
    q, c = data
    # split corpus in 3 uneven shards, compute per-shard topk, merge
    import jax.numpy as jnp

    splits = [0, 100, 150, 333]
    parts_s, parts_i = [], []
    for a, b in zip(splits[:-1], splits[1:]):
        s, i = dense_topk_xla(q, c[a:b], 10, tile_n=128)
        parts_s.append(np.asarray(s))
        parts_i.append(np.asarray(i) + a)
    ms, mi = merge_topk(
        jnp.stack(parts_s, axis=1), jnp.stack(parts_i, axis=1), 10
    )
    ns, ni = numpy_topk(q, c, 10)
    np.testing.assert_array_equal(np.asarray(mi), ni)
    np.testing.assert_allclose(np.asarray(ms), ns, rtol=1e-5)


def test_sort_topk_deterministic():
    import jax.numpy as jnp

    scores = jnp.array([[1.0, 2.0, 2.0, 0.5]])
    ids = jnp.array([[7, 9, 3, 1]])
    s, i = sort_topk(scores, ids, 3)
    np.testing.assert_array_equal(np.asarray(i), [[3, 9, 7]])


def test_approx_mode_cpu_exact(data):
    # approx_max_k lowers to exact top-k off-TPU: ids must match the oracle
    from autorag_research_tpu.ops.dense import dense_topk_approx

    q, c = data
    s, i = dense_topk_approx(q, c, 10)
    ns, ni = numpy_topk(q, c, 10)
    np.testing.assert_array_equal(np.asarray(i), ni)
    np.testing.assert_allclose(np.asarray(s), ns, rtol=1e-5)


def test_approx_mode_k_larger_than_n():
    from autorag_research_tpu.ops.dense import dense_topk_approx

    rng = np.random.default_rng(5)
    q = rng.normal(size=(2, 8)).astype(np.float32)
    c = rng.normal(size=(3, 8)).astype(np.float32)
    s, i = dense_topk_approx(q, c, 10)
    assert s.shape == (2, 10) and i.dtype == np.int32


def test_int8_per_row_vs_global_scale(data):
    # both quantization layouts must return near-exact rankings on gaussian
    # normalized data; the global-scale path selects on bare s32 converts
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import (
        dense_topk_int8,
        quantize_int8,
        quantize_int8_global,
    )

    q, c = data
    cq, cs = quantize_int8(np.asarray(c))
    s_r, i_r = dense_topk_int8(q, jnp.asarray(cq), jnp.asarray(cs), 10, exact=True)
    cg, gs = quantize_int8_global(np.asarray(c))
    s_g, i_g = dense_topk_int8(q, jnp.asarray(cg), jnp.float32(gs), 10, exact=True)
    _, ni = numpy_topk(q, c, 10)
    for ids in (np.asarray(i_r), np.asarray(i_g)):
        agree = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(ids, ni)])
        assert agree >= 0.9, agree
    # scores are dequantized to the true scale in both layouts
    ns, _ = numpy_topk(q, c, 10)
    np.testing.assert_allclose(np.asarray(s_r), ns, rtol=0.02, atol=0.05)
    np.testing.assert_allclose(np.asarray(s_g), ns, rtol=0.02, atol=0.05)


def test_int8_zero_rows():
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import dense_topk_int8, quantize_int8

    c = np.zeros((4, 8), np.float32)
    c[1] = 1.0
    cq, cs = quantize_int8(c)
    assert cs[0] == 0.0 and cq[0].max() == 0
    s, i = dense_topk_int8(jnp.zeros((1, 8)), jnp.asarray(cq), jnp.asarray(cs), 2, exact=True)
    assert float(np.asarray(s).max()) == 0.0


def test_sort_topk_pads_when_fewer_candidates_than_k():
    """sort_topk's [..., k] return-shape contract holds for M < k (regression:
    it returned [..., M] and downstream fixed-k consumers shape-erred)."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.topk import INT_MAX, NEG_INF, pad_to_k, sort_topk

    s = jnp.asarray([[0.5, 0.9]], jnp.float32)
    i = jnp.asarray([[3, 1]], jnp.int32)
    out_s, out_i = sort_topk(s, i, 5)
    assert out_s.shape == (1, 5) and out_i.shape == (1, 5)
    assert out_i[0, :2].tolist() == [1, 3]
    assert float(out_s[0, 2]) == np.float32(NEG_INF) and int(out_i[0, 4]) == INT_MAX
    # pad_to_k no-ops when k_eff >= k
    ps, pi = pad_to_k(out_s, out_i, 5, 5)
    assert ps is out_s and pi is out_i


def test_int8_scan_matches_flat_exact(data):
    # the bounded-memory scan path must be bit-identical to the flat fused
    # path in exact mode (same dequant folding, same (-score, id) ties)
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import (
        _dense_topk_int8_flat,
        _dense_topk_int8_scan,
        quantize_int8,
        quantize_int8_global,
    )

    q, c = data
    cq, cs = quantize_int8(np.asarray(c))
    s_f, i_f = _dense_topk_int8_flat(q, jnp.asarray(cq), jnp.asarray(cs), 10, True)
    # tile_n=128 forces 3 tiles with a ragged last tile (333 docs)
    s_t, i_t = _dense_topk_int8_scan(
        q, jnp.asarray(cq), jnp.asarray(cs), 10, True, 128
    )
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_t))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_t), rtol=1e-6)
    # global-scale layout: selection on bare s32 converts, scale post-merge
    cg, gs = quantize_int8_global(np.asarray(c))
    s_fg, i_fg = _dense_topk_int8_flat(q, jnp.asarray(cg), jnp.float32(gs), 10, True)
    s_tg, i_tg = _dense_topk_int8_scan(
        q, jnp.asarray(cg), jnp.float32(gs), 10, True, 128
    )
    np.testing.assert_array_equal(np.asarray(i_fg), np.asarray(i_tg))
    np.testing.assert_allclose(np.asarray(s_fg), np.asarray(s_tg), rtol=1e-6)


def test_int8_scan_cross_tile_ties_ascending():
    # duplicate docs across tile boundaries -> identical quantized scores;
    # the running sort_topk merge must order ties by ascending id like the
    # flat path's global lax.top_k
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import _dense_topk_int8_scan, quantize_int8

    c = np.tile(np.ones((1, 16), np.float32), (300, 1))
    q = np.ones((2, 16), np.float32)
    cq, cs = quantize_int8(c)
    _, ids = _dense_topk_int8_scan(
        jnp.asarray(q), jnp.asarray(cq), jnp.asarray(cs), 5, True, 128
    )
    np.testing.assert_array_equal(np.asarray(ids), [[0, 1, 2, 3, 4]] * 2)


def test_int8_dispatcher_routes_by_score_bytes(data, monkeypatch):
    # shrink the budget so the public entry point routes through the scan
    # path, and confirm it still agrees with the flat result
    import jax.numpy as jnp

    import autorag_research_tpu.ops.dense as dense_mod

    q, c = data
    cq, cs = dense_mod.quantize_int8(np.asarray(c))
    s_flat, i_flat = dense_mod.dense_topk_int8(
        q, jnp.asarray(cq), jnp.asarray(cs), 10, exact=True
    )
    monkeypatch.setattr(dense_mod, "FULL_MATERIALIZE_BUDGET", 1)
    s_scan, i_scan = dense_mod.dense_topk_int8(
        q, jnp.asarray(cq), jnp.asarray(cs), 10, exact=True, tile_n=128
    )
    np.testing.assert_array_equal(np.asarray(i_flat), np.asarray(i_scan))
    np.testing.assert_allclose(np.asarray(s_flat), np.asarray(s_scan), rtol=1e-6)


def test_int8_scan_k_larger_than_n():
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import _dense_topk_int8_scan, quantize_int8
    from autorag_research_tpu.ops.topk import INT_MAX

    rng = np.random.default_rng(7)
    c = rng.normal(size=(5, 8)).astype(np.float32)
    q = rng.normal(size=(2, 8)).astype(np.float32)
    cq, cs = quantize_int8(c)
    s, i = _dense_topk_int8_scan(
        jnp.asarray(q), jnp.asarray(cq), jnp.asarray(cs), 10, True, 128
    )
    assert s.shape == (2, 10)
    assert (np.asarray(i)[:, 5:] == INT_MAX).all()
    assert len(set(np.asarray(i)[0, :5])) == 5


# ---------------------------------------------------------- verified exact
class TestVerified:
    """dense_topk_verified must equal the full exact scan on EVERY input —
    the knobs (rep, m, j, seg, second_chance) only move the fast-path rate."""

    @staticmethod
    def _check(q, c, k, rep="int8", **kw):
        import jax.numpy as jnp

        from autorag_research_tpu.ops.dense import (
            build_verified_sidecar,
            dense_topk_verified,
            dense_topk_xla_full,
        )

        side = build_verified_sidecar(c, rep=rep)
        s, i, n_fail, covered = dense_topk_verified(
            jnp.asarray(q), jnp.asarray(c), side, k, return_stats=True, **kw
        )
        rs, ri = dense_topk_xla_full(jnp.asarray(q), jnp.asarray(c), k)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(rs), rtol=1e-6, atol=1e-7
        )
        return int(n_fail), bool(covered)

    def test_matches_full_exact_int8(self, data):
        q, c = data
        self._check(q, c, 10, rep="int8", seg=16, m=32, j=2)

    def test_matches_full_exact_bf16(self, data):
        q, c = data
        self._check(q, c, 10, rep="bf16", seg=16, m=32, j=2)

    def test_planted_top_docs_take_fast_path(self):
        # well-separated top-10 in distinct segments: verification must PASS
        # (n_fail == 0), proving the bound is tight enough for the fast path
        rng = np.random.default_rng(11)
        c = rng.normal(size=(2000, 64)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        qv = rng.normal(size=(64,)).astype(np.float32)
        qv /= np.linalg.norm(qv)
        planted = []
        for i in range(10):
            row = i * 160 + 5
            planted.append(row)
            noise = rng.normal(size=(64,)).astype(np.float32) * 0.05
            v = (1.0 - 0.03 * i) * qv + noise
            c[row] = v / np.linalg.norm(v)
        q = np.stack([qv, qv])  # duplicate query: identical verdicts
        for rep in ("int8", "bf16"):
            n_fail, covered = self._check(q, c, 10, rep=rep, seg=128, m=64, j=2)
            assert covered and n_fail == 0, (rep, n_fail)

    def test_adversarial_mass_ties_fall_back_exactly(self):
        # 300 identical rows spread over 3+ segments: more tied segments than
        # j can absorb, verification MUST fail, and the fallback still
        # returns ascending-id exact results
        c = np.tile(np.ones((1, 16), np.float32), (300, 1))
        c = np.concatenate([c, np.zeros((100, 16), np.float32)])
        q = np.ones((3, 16), np.float32)
        import jax.numpy as jnp

        from autorag_research_tpu.ops.dense import (
            build_verified_sidecar,
            dense_topk_verified,
        )

        side = build_verified_sidecar(c)
        s, i, n_fail, covered = dense_topk_verified(
            jnp.asarray(q), jnp.asarray(c), side, 5,
            seg=128, m=8, j=2, second_chance=1, return_stats=True,
        )
        assert int(n_fail) == 3 and not bool(covered)
        np.testing.assert_array_equal(np.asarray(i), [[0, 1, 2, 3, 4]] * 3)

    def test_second_chance_repairs_partial_failures(self):
        # query 0 hits tied PAIRS in 4 distinct segments (more runner-up
        # segments than j=2 covers -> forced fail); the rest are clean —
        # the fixed-size second chance must repair row 0 without a batch
        # fallback, and every row must match the exact scan
        rng = np.random.default_rng(12)
        d = 32
        c = rng.normal(size=(1000, d)).astype(np.float32)
        tied = rng.normal(size=(d,)).astype(np.float32) * 3.0
        for row in (0, 1, 150, 151, 300, 301, 450, 451):
            c[row] = tied
        q = rng.normal(size=(6, d)).astype(np.float32)
        q[0] = tied
        import jax.numpy as jnp

        from autorag_research_tpu.ops.dense import (
            build_verified_sidecar,
            dense_topk_verified,
            dense_topk_xla_full,
        )

        side = build_verified_sidecar(c)
        s, i, n_fail, covered = dense_topk_verified(
            jnp.asarray(q), jnp.asarray(c), side, 10,
            seg=8, m=32, j=2, second_chance=5, return_stats=True,
        )
        assert bool(covered) and int(n_fail) >= 1
        rs, ri = dense_topk_xla_full(jnp.asarray(q), jnp.asarray(c), 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-6)

    def test_negative_scores_and_unnormalized(self):
        rng = np.random.default_rng(13)
        c = (rng.normal(size=(500, 24)) * rng.lognormal(0, 2, size=(500, 1))).astype(
            np.float32
        )
        q = -np.abs(rng.normal(size=(5, 24))).astype(np.float32)
        self._check(q, c, 7, seg=16, m=32, j=2)

    def test_k_larger_than_n_pads(self):
        rng = np.random.default_rng(14)
        c = rng.normal(size=(6, 8)).astype(np.float32)
        q = rng.normal(size=(2, 8)).astype(np.float32)
        import jax.numpy as jnp

        from autorag_research_tpu.ops.dense import (
            build_verified_sidecar,
            dense_topk_verified,
        )
        from autorag_research_tpu.ops.topk import INT_MAX

        side = build_verified_sidecar(c)
        s, i = dense_topk_verified(jnp.asarray(q), jnp.asarray(c), side, 10)
        assert s.shape == (2, 10)
        assert (np.asarray(i)[:, 6:] == INT_MAX).all()
        ns, ni = numpy_topk(q, c, 6)
        np.testing.assert_array_equal(np.asarray(i)[:, :6], ni)

    def test_tiny_corpus_fully_rescored_is_always_fast(self):
        # s_cnt <= j: every doc lands in the rescore set -> always exact,
        # never falls back
        rng = np.random.default_rng(16)
        c = np.tile(rng.normal(size=(1, 16)).astype(np.float32), (40, 1))
        q = rng.normal(size=(3, 16)).astype(np.float32)
        n_fail, covered = self._check(q, c, 5, seg=32, m=8, j=2)
        assert covered and n_fail == 0

    def test_zero_query_falls_back(self):
        # all-zero query: every score is exactly 0, the runner-up bound
        # cannot be strictly below theta -> guaranteed fail, still exact
        rng = np.random.default_rng(15)
        c = rng.normal(size=(400, 16)).astype(np.float32)
        q = np.zeros((2, 16), np.float32)
        self._check(q, c, 5, seg=128, m=8, j=1, second_chance=2)

    def test_sidecar_rejects_empty_and_bad_rep(self):
        from autorag_research_tpu.ops.dense import build_verified_sidecar

        with pytest.raises(ValueError):
            build_verified_sidecar(np.zeros((0, 8), np.float32))
        with pytest.raises(ValueError):
            build_verified_sidecar(np.ones((2, 8), np.float32), rep="fp4")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_verified_randomized_property(seed):
    """Randomized shapes/dtypes/dups: verified == full scan for both engines
    and both prescreen reps, with whatever knobs the draw picks."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import (
        build_verified_sidecar,
        dense_topk_verified,
        dense_topk_xla_full,
    )

    rng = np.random.default_rng(900 + seed)
    n = int(rng.integers(50, 2500))
    d = int(rng.choice([8, 24, 48]))
    k = int(rng.integers(1, 12))
    c = rng.normal(size=(n, d)).astype(np.float32)
    if rng.random() < 0.5:
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-9)
    # duplicate blocks force exact ties across segments
    for _ in range(int(rng.integers(0, 4))):
        src, dst = rng.integers(0, n, size=2)
        c[dst] = c[src]
    q = rng.normal(size=(int(rng.integers(1, 9)), d)).astype(np.float32)
    rs, ri = dense_topk_xla_full(jnp.asarray(q), jnp.asarray(c), k)
    for rep in ("int8", "bf16"):
        side = build_verified_sidecar(c, rep=rep)
        for engine, interp in (("xla", False),) + (
            (("pallas", True),) if rep == "bf16" else ()
        ):
            s, i = dense_topk_verified(
                jnp.asarray(q), jnp.asarray(c), side, k,
                m=int(rng.integers(4, 40)), j=int(rng.integers(1, 3)),
                seg=int(rng.choice([8, 16, 32])),
                second_chance=int(rng.integers(0, 4)),
                engine=engine, interpret=interp,
            )
            np.testing.assert_array_equal(np.asarray(i), np.asarray(ri), err_msg=f"{rep}/{engine}")
            np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-6, atol=1e-7)


def test_exact_scan_masked_matches_flat():
    """The capacity-scale streaming fallback must equal the flat masked
    matmul + top_k exactly, including (-score, id) ties and the n_valid
    row mask."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import NEG_INF, _exact_scan_masked

    rng = np.random.default_rng(3)
    n, d, q, k, n_valid = 1000, 32, 7, 12, 900
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus[950:] = corpus[10]  # padded rows that MUST stay masked out
    corpus[100] = corpus[200]  # an exact tie inside the valid range
    queries = rng.standard_normal((q, d)).astype(np.float32)
    s, i = _exact_scan_masked(
        jnp.asarray(queries), jnp.asarray(corpus), jnp.int32(n_valid), k
    )
    flat = queries.astype(np.float64) @ corpus.T
    flat[:, n_valid:] = -np.inf
    for b in range(q):
        order = np.lexsort((np.arange(n), -flat[b]))[:k]
        np.testing.assert_array_equal(np.asarray(i)[b], order)
    assert (np.asarray(i) < n_valid).all()


def test_verified_batch_fallback_streams_at_capacity(monkeypatch):
    """Force the coverage proof to fail AND the flat fallback over budget:
    the streaming scan fallback must still return the exact top-k."""
    import jax.numpy as jnp

    import autorag_research_tpu.ops.dense as mod

    rng = np.random.default_rng(5)
    n, d, q, k = 4096, 32, 3, 10
    # near-identical rows: every segment max ties at the top, so the
    # (m+1)-th segment boundary can never clear theta -> n_fail = q
    base = rng.standard_normal(d).astype(np.float32)
    corpus = np.tile(base, (n, 1)) + 1e-4 * rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    side = mod.build_verified_sidecar(corpus, rep="bf16")
    monkeypatch.setattr(mod, "FULL_MATERIALIZE_BUDGET", 1024)
    s, i, n_fail, covered = mod.dense_topk_verified(
        jnp.asarray(queries), jnp.asarray(corpus), side, k,
        m=4, j=1, seg=128, second_chance=1, engine="xla",
        return_stats=True,
    )
    assert int(n_fail) == q and not bool(covered)
    exact = queries.astype(np.float64) @ corpus.T
    for b in range(q):
        order = np.lexsort((np.arange(n), -exact[b]))[:k]
        got = np.asarray(i)[b]
        # float32 sub-ulp near-ties aside: scores must match the f32 oracle
        np.testing.assert_allclose(
            np.asarray(s)[b], np.sort(exact[b])[::-1][:k], rtol=1e-5
        )
        assert set(got) == set(order) or np.allclose(
            exact[b][got], exact[b][order], rtol=1e-6
        )
