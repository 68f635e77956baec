"""Adversarial eps-boundary fuzz for the verified-exact modes (VERDICT r4 #9).

The verified paths' exactness rests on one strict scalar comparison per
query: ``boundary < theta = e_k - eps``. These tests PLANT a non-candidate
document whose prescreen score lands within a handful of f32 ulps of theta
— on both sides — and assert two properties over >1000 randomized trials:

1. EXACTNESS ALWAYS: whatever side the boundary lands on, the output equals
   the full exact scan (failures must re-run exactly, passes must be
   genuinely covered).
2. DIRECTION: outside a small replication band (device reduction order can
   shift scores a few ulps vs the host-side white-box replication), the
   proof must FAIL whenever boundary >= theta (the unsafe side — a strict
   ``<`` that passed here would be a soundness bug) and must PASS when the
   boundary sits clearly below theta (tightness — a proof that fails on the
   safe side silently degrades the fast path to full scans).

Construction (dense): S segments of ``seg`` docs; k strong docs collinear
with the query in distinct segments; one PLANTED doc (also collinear) in a
far segment whose segment max becomes the (m+1)-th largest — i.e. the
proof's ``boundary``. The k-th strong doc's scale is then solved so
e_k - eps sits delta ulps away from the planted doc's prescreen score.
Classification is POST-HOC from a bit-faithful white-box replication
(the same jnp subroutines the jitted path calls), so trials where bf16/int8
prescreen noise flips the segment selection still assert the right thing.

Reference exactness contract this guards:
/root/reference/autorag_research/orm/repository/base.py:404-426.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from autorag_research_tpu.ops.dense import (
    _prescreen_eps,
    _prescreen_query_side,
    _seg_stats_xla,
    build_verified_sidecar,
    dense_topk_verified,
    dense_topk_xla_full,
)
from autorag_research_tpu.ops.maxsim import (
    _maxsim_prescreen_eps,
    build_maxsim_sidecar,
    maxsim_topk,
    maxsim_topk_verified,
    maxsim_topk_xla,
)

# delta targets in f32 ulps of the boundary; the +/-1..4 cases probe the
# knife edge (no directional assertion inside the BAND), the larger ones
# pin the direction
DELTAS = (-4096, -1024, -256, -64, -16, -4, -1, 0, 1, 4, 16, 64, 256, 1024, 4096)
BAND = 8.0  # ulps: replication / reduction-order noise allowance
N_SEEDS = 34  # x len(DELTAS) = 510 trials per parametrization


# --------------------------------------------------------------- dense
SEG, S, D, K = 8, 48, 32, 4
M, J = 4, 1
N = SEG * S


def _dense_base(rng, qv):
    c = rng.normal(size=(N, D)).astype(np.float32) * 0.02
    # nd_max / r_max anchor: unit norm, orthogonal to q -> ~zero score
    anchor = rng.normal(size=D).astype(np.float32)
    anchor -= (anchor @ qv) * qv
    anchor /= np.linalg.norm(anchor)
    c[1 * SEG] = anchor
    # decoy runner-up pair: deterministically wins the j=1 full-rescore
    # slot so the planted segment is never fully rescored by accident
    c[2 * SEG] = np.float32(0.30) * qv
    c[2 * SEG + 1] = np.float32(0.29) * qv
    # strong docs 1..3 (well above the boundary region)
    for srow, sc in zip((20, 25, 30), (0.95, 0.85, 0.75)):
        c[srow * SEG + 3] = np.float32(sc) * qv
    return c


def _dense_replicate(q, side):
    """Bit-faithful proof inputs via the same jnp subroutines the jitted
    verified path calls: (eps, boundary=(m+1)-th max1, m2bound=(j+1)-th
    max2)."""
    qf = jnp.asarray(q, jnp.float32)
    corpus_lo = jnp.asarray(side["corpus_lo"])
    cs = side["corpus_scale"]
    cs = None if cs is None else jnp.asarray(cs)
    q_rep, q_hat = _prescreen_query_side(qf, corpus_lo, cs)
    eps = float(
        _prescreen_eps(
            qf, q_hat, jnp.float32(side["nd_max"]), jnp.float32(side["r_max"])
        )[0]
    )
    max1, _loc, max2 = _seg_stats_xla(q_rep, corpus_lo, cs, jnp.int32(N), SEG)
    m1 = np.sort(np.asarray(max1[0]))[::-1]
    m2 = np.sort(np.asarray(max2[0]))[::-1]
    return eps, float(m1[M]), float(m2[J])


def _dense_trial(rep, seed, delta):
    rng = np.random.default_rng(seed)
    qv = rng.normal(size=D).astype(np.float32)
    qv /= np.linalg.norm(qv)
    q = qv[None, :].astype(np.float32)
    c = _dense_base(rng, qv)
    c[10 * SEG + 5] = np.float32(0.5) * qv  # the planted boundary doc
    qq64 = float(qv.astype(np.float64) @ qv.astype(np.float64))
    s_val = 0.52
    # fixed point: strong-#4's scale feeds e_k, which feeds theta, which
    # names the target the planted prescreen must sit delta ulps from
    for _ in range(3):
        c[35 * SEG + 3] = np.float32(s_val) * qv
        side = build_verified_sidecar(c, rep=rep)
        eps, boundary, _m2b = _dense_replicate(q, side)
        ulp = float(np.spacing(np.float32(abs(boundary))))
        s_val = (boundary - delta * ulp + eps) / qq64
    c[35 * SEG + 3] = np.float32(s_val) * qv
    side = build_verified_sidecar(c, rep=rep)
    eps, boundary, m2b = _dense_replicate(q, side)

    rs, ri = dense_topk_xla_full(jnp.asarray(q), jnp.asarray(c), K)
    theta = float(rs[0, K - 1]) - eps
    s, i, n_fail, _cov = dense_topk_verified(
        jnp.asarray(q), jnp.asarray(c), side, K, m=M, j=J, seg=SEG,
        second_chance=0, engine="xla", return_stats=True,
    )
    # exactness ALWAYS, whichever side the boundary landed on
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-6, atol=1e-7)

    ulp = float(np.spacing(np.float32(max(abs(theta), abs(boundary)))))
    d_ulp = (boundary - theta) / ulp
    # the runner-up channel must stay far from theta or it, not the planted
    # boundary, decides the verdict — drop such trials from direction stats
    clean = m2b < theta - 32 * ulp
    return d_ulp, int(n_fail), clean


@pytest.mark.parametrize("rep", ["bf16", "int8"])
def test_dense_eps_boundary_fuzz(rep):
    trials = [
        _dense_trial(rep, 1000 * (di + 1) + sd, delta)
        for di, delta in enumerate(DELTAS)
        for sd in range(N_SEEDS)
    ]
    pos = [t for t in trials if t[0] >= BAND and t[2]]
    neg = [t for t in trials if t[0] <= -BAND and t[2]]
    knife = [t for t in trials if abs(t[0]) <= 4.0]
    # unsafe side: boundary >= theta must NEVER pass verification
    bad_pass = [t for t in pos if t[1] == 0]
    assert not bad_pass, f"proof passed on the unsafe side: {bad_pass[:5]}"
    # safe side: a clearly-covered query must take the fast path
    bad_fail = [t for t in neg if t[1] != 0]
    assert not bad_fail, f"proof failed despite clear coverage: {bad_fail[:5]}"
    assert len(trials) == len(DELTAS) * N_SEEDS
    assert len(pos) >= 100 and len(neg) >= 100, (len(pos), len(neg))
    # the knife edge was actually probed (bf16/int8 landing precision differs)
    assert len(knife) >= (25 if rep == "bf16" else 5), len(knife)


# --------------------------------------------------------------- maxsim
NM, TD, TQ, DM, KM = 256, 4, 2, 32, 4  # k == kprime: boundary = (k+1)-th


def _maxsim_trial(seed, delta):
    rng = np.random.default_rng(seed)
    qv = rng.normal(size=DM).astype(np.float32)
    qv /= np.linalg.norm(qv)
    q = np.broadcast_to(qv, (1, TQ, DM)).astype(np.float32).copy()
    qlens = np.array([TQ], np.int32)
    docs = rng.normal(size=(NM, TD, DM)).astype(np.float32) * 0.02
    dlens = np.full(NM, TD, np.int32)
    # strong docs 0..2 + planted doc 10, every token identical & collinear
    # with q so maxsim(q, doc_j) = TQ * s_j exactly in structure
    for row, sc in zip((0, 1, 2), (0.45, 0.35, 0.25)):
        docs[row] = np.float32(sc) * qv
    docs[10] = np.float32(0.16) * qv  # planted: the (k+1)-th prescreen
    qq64 = float(qv.astype(np.float64) @ qv.astype(np.float64))
    q_lo = jnp.asarray(q).astype(jnp.bfloat16)
    q_hat = q_lo.astype(jnp.float32)  # what the jitted path really uses
    s_val = 0.18
    for _ in range(3):
        docs[3] = np.float32(s_val) * qv  # strong #4 = e_k owner
        side = build_maxsim_sidecar(docs, dlens)
        q_mask = jnp.ones((1, TQ), bool)
        eps = float(
            _maxsim_prescreen_eps(
                jnp.asarray(q), q_hat, q_mask,
                jnp.float32(side["nd_max"]), jnp.float32(side["r_max"]),
            )[0]
        )
        ps, _pi = maxsim_topk(
            q_lo, jnp.asarray(qlens), jnp.asarray(side["docs_lo"]),
            jnp.asarray(dlens), KM + 1,
        )
        boundary = float(ps[0, KM])
        ulp = float(np.spacing(np.float32(abs(boundary))))
        s_val = (boundary - delta * ulp + eps) / (TQ * qq64)
    docs[3] = np.float32(s_val) * qv
    side = build_maxsim_sidecar(docs, dlens)
    eps = float(
        _maxsim_prescreen_eps(
            jnp.asarray(q), q_hat, jnp.ones((1, TQ), bool),
            jnp.float32(side["nd_max"]), jnp.float32(side["r_max"]),
        )[0]
    )
    ps, _pi = maxsim_topk(
        q_lo, jnp.asarray(qlens), jnp.asarray(side["docs_lo"]),
        jnp.asarray(dlens), KM + 1,
    )
    boundary = float(ps[0, KM])

    rs, ri = maxsim_topk_xla(
        jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(docs),
        jnp.asarray(dlens), KM,
    )
    theta = float(rs[0, KM - 1]) - eps
    s, i, n_fail, _cov = maxsim_topk_verified(
        jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(docs),
        jnp.asarray(dlens), side, KM, kprime=KM, second_chance=0,
        return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-6, atol=1e-7)
    ulp = float(np.spacing(np.float32(max(abs(theta), abs(boundary)))))
    return (boundary - theta) / ulp, int(n_fail)


def test_maxsim_eps_boundary_fuzz():
    trials = [
        _maxsim_trial(5000 + 100 * di + sd, delta)
        for di, delta in enumerate(DELTAS)
        for sd in range(N_SEEDS)
    ]
    pos = [t for t in trials if t[0] >= BAND]
    neg = [t for t in trials if t[0] <= -BAND]
    knife = [t for t in trials if abs(t[0]) <= 4.0]
    bad_pass = [t for t in pos if t[1] == 0]
    assert not bad_pass, f"proof passed on the unsafe side: {bad_pass[:5]}"
    bad_fail = [t for t in neg if t[1] != 0]
    assert not bad_fail, f"proof failed despite clear coverage: {bad_fail[:5]}"
    assert len(trials) == len(DELTAS) * N_SEEDS
    assert len(pos) >= 100 and len(neg) >= 100, (len(pos), len(neg))
    assert len(knife) >= 25, len(knife)
