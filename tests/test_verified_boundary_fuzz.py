"""Adversarial coverage-proof boundary fuzzing for the verified-exact modes.

The verified paths' correctness rests on the per-query eps bound
(``ops/dense._prescreen_eps``, ``ops/maxsim._maxsim_prescreen_eps``) and the
strict comparisons ``boundary < e_k - eps``. These tests plant contenders
*within a few f32 ulps of the decision threshold* on a chosen side and
assert (a) the device's pass/fail decision matches an independently
computed prediction — i.e. the fallback fires on the unsafe side — and
(b) results equal the exact oracle on BOTH sides (failures may only ever
cost speed, never exactness).

Construction that makes ulp-level placement possible:

- Every query/doc vector carries its score in ONE dimension, so every dot
  product on every path is a single f32 multiply by 1.0 — exact, with no
  reduction-order ambiguity between XLA, Pallas, and numpy.
- All score values are bf16-exact, so the bf16 prescreen residual of every
  scoring doc is exactly 0 and prescreen scores equal true scores.
- TWO eps knobs, coarse and fine, because eps is affine in both:
  * COARSE: a non-scoring "residual carrier" doc holds ``3.0 + R`` in an
    unused dim (R below the bf16 half-ulp at 3.0, so it rounds to 3.0 and
    the corpus-max residual ``r_max`` is exactly R). R is quantized at the
    f32 ulp of 3.0 (~2.4e-7 ~ 4 theta-ulps) — coarse.
  * FINE: the query holds ``0.125 + delta`` in another unused dim (all
    docs are zero there, so no score and no prescreen score moves). Its
    bf16 residual is exactly delta, entering eps linearly as
    ``eqn * nd_max`` — quantized at the f32 ulp of 0.125 (~1.5e-8), i.e.
    sub-ulp steps of ``theta = e_k - eps``.
  A 2-point secant on R (eps is exactly affine in the quantized R) lands
  theta a few coarse quanta ABOVE the planted boundary, then delta walks
  it down one fine step at a time across the crossing; the step straddling
  the boundary gives a tight case on each side.
"""

import ml_dtypes
import numpy as np
import pytest

import jax.numpy as jnp

from autorag_research_tpu.ops.dense import (
    _prescreen_eps,
    build_verified_sidecar,
    dense_topk_verified,
)
from autorag_research_tpu.ops.maxsim import (
    _maxsim_prescreen_eps,
    build_maxsim_sidecar,
    maxsim_topk_verified,
)

BF = ml_dtypes.bfloat16
# bf16 ulp in [2,4) is 2^-6; R below half-ulp rounds 3+R back to 3.0
R_HALF_ULP_AT_3 = 0.0078125
FINE_BASE = 0.125  # bf16-exact; bf16 ulp in [0.125,0.25) is 2^-10
FINE_HALF_ULP = 2.0**-11  # delta below this keeps bf16(0.125+delta)=0.125
FINE_Q = float(np.nextafter(np.float32(FINE_BASE), np.float32(np.inf)) - np.float32(FINE_BASE))


def bf_exact(x: float) -> np.float32:
    """Nearest bf16-representable value, as f32 (bf16 residual exactly 0)."""
    return np.float32(BF(np.float32(x)))


def sd(x, steps: int = 1) -> np.float32:
    """``steps`` bf16 grid steps below x."""
    v = BF(np.float32(x))
    for _ in range(steps):
        v = np.nextafter(v, BF(-np.inf))
    return np.float32(v)


def ulp(x: float) -> float:
    x32 = np.float32(abs(x))
    return float(np.nextafter(x32, np.float32(np.inf)) - x32)


def _rand_bf_fillers(rng, count, lo=0.30, hi=0.50):
    vals = set()
    while len(vals) < count:
        vals.add(float(bf_exact(rng.uniform(lo, hi))))
    return sorted(vals, reverse=True)


def _tune(eps_for, want_fail: bool, e_k: float, c_b: float):
    """Land ``theta = e_k - eps`` within ulps of the planted boundary
    ``c_b``, on the requested side. ``eps_for(r, delta)`` must return
    ``(eps, *extra)`` computed with the production helpers.

    Side semantics (mirrors the device): the proof PASSES iff
    ``c_b < theta`` strictly; want_fail means eps grew enough that
    ``theta <= c_b``. Returns ``(r, delta, eps_out, margin)``.
    """
    eps_target = float(np.float32(e_k) - np.float32(c_b))  # theta == c_b here
    # 2-point secant in R: eps is exactly affine in the f32-quantized R
    r_a, r_b = 1e-4, 3e-3
    e_a, e_b = eps_for(r_a, 0.0)[0], eps_for(r_b, 0.0)[0]
    slope = (e_b - e_a) / (r_b - r_a)
    coarse_q = ulp(3.0)
    # aim eps ~3 coarse quanta BELOW target so theta starts above c_b
    r = r_a + (eps_target - 4 * slope * coarse_q - e_a) / slope
    r = float(np.clip(r, 1e-8, R_HALF_ULP_AT_3 * 0.95))
    last_pass = first_fail = None
    for step_i in range(160):
        delta = step_i * FINE_Q
        if delta >= FINE_HALF_ULP * 0.95:
            break
        out = eps_for(r, delta)
        theta = np.float32(e_k) - np.float32(out[0])
        fails = not (np.float32(c_b) < theta)
        margin = abs(float(theta) - float(np.float32(c_b)))
        if fails:
            first_fail = (r, delta, out, margin)
            break
        last_pass = (r, delta, out, margin)
    best = first_fail if want_fail else last_pass
    assert best is not None, (
        f"could not land on the requested side (want_fail={want_fail}, "
        f"r={r:.3e}, target eps={eps_target:.6e})"
    )
    return best


class _DenseCase:
    """seg=8, S=6 segments, k=3, m=2, j=1, one query = e0 (+ fine knob).

    Layout (all score values bf16-exact, scores live in dim 0; dim 1 is
    the coarse carrier, dim 2 the query-side fine knob — zero in every
    doc):
      - segment 1 holds the global max ``v_s1`` (its argmax is a candidate)
      - segment 0 holds ranks 2-4 (``base, sd2, sd4``) and, as the top-j
        runner-up segment, is fully rescored
      - true top-3 = [v_s1, base, sd2]; e_k = sd2
      - probe="max1": planted doc c_b = sd3 is the (m+1)-th segment max ->
        sets the ``boundary`` proof term
      - probe="max2": c_b is segment 1's runner-up (not rescored; only the
        argmax of a top-m segment is) -> sets the ``m2bound`` proof term
    """

    D, SEG, S, K, M, J = 8, 8, 6, 3, 2, 1

    def __init__(self, rng, probe: str):
        self.probe = probe
        n = self.SEG * self.S
        base = bf_exact(rng.uniform(0.72, 0.97))
        v_s1 = bf_exact(float(base) + 0.06)
        assert v_s1 > base
        self.e_k = float(sd(base, 2))
        self.c_b = float(sd(base, 3))
        vals = np.array(_rand_bf_fillers(rng, n), np.float32)
        vals[0], vals[1], vals[2] = base, sd(base, 2), sd(base, 4)
        vals[self.SEG] = v_s1
        plant_seg = int(rng.integers(2, self.S))
        if probe == "max1":
            vals[plant_seg * self.SEG] = self.c_b
        else:
            vals[self.SEG + 1] = self.c_b
        self.vals = vals
        corpus = np.zeros((n, self.D), np.float32)
        corpus[:, 0] = vals
        self.carrier_row = plant_seg * self.SEG + self.SEG - 1
        assert vals[self.carrier_row] < 0.6
        self.corpus = corpus

    def apply(self, r: float, delta: float):
        c = self.corpus.copy()
        c[self.carrier_row, 1] = np.float64(3.0) + np.float64(r)
        q = np.zeros((1, self.D), np.float32)
        q[0, 0] = 1.0
        q[0, 2] = np.float64(FINE_BASE) + np.float64(delta)
        return c, q

    def eps_for(self, r: float, delta: float):
        corpus, query = self.apply(r, delta)
        sc = build_verified_sidecar(corpus, rep="bf16")
        q = jnp.asarray(query)
        eps = _prescreen_eps(
            q, q.astype(jnp.bfloat16).astype(jnp.float32),
            jnp.float32(sc["nd_max"]), jnp.float32(sc["r_max"]),
        )
        return float(eps[0]), sc


class _MaxSimCase:
    """n=32 single-token docs, kp=k=3, one single-token query = e0 (+ fine).

    Prescreen keeps the top-3 (``base, sd1, sd2``); the planted doc
    ``c_b = sd3`` is the (k'+1)-th prescreen score — the proof boundary.
    True top-3 = [base, sd1, sd2]; e_k = sd2; gap = 1 bf16 step.
    """

    D, N, K, KP = 8, 32, 3, 3

    def __init__(self, rng):
        base = bf_exact(rng.uniform(0.72, 0.97))
        self.e_k = float(sd(base, 2))
        self.c_b = float(sd(base, 3))
        vals = np.array(_rand_bf_fillers(rng, self.N), np.float32)
        vals[0], vals[1], vals[2] = base, sd(base, 1), sd(base, 2)
        plant = int(rng.integers(3, self.N - 1))
        vals[plant] = self.c_b
        self.vals = vals
        docs = np.zeros((self.N, 1, self.D), np.float32)
        docs[:, 0, 0] = vals
        self.carrier_row = self.N - 1
        assert vals[self.carrier_row] < 0.6 and self.carrier_row != plant
        self.docs = docs
        self.doc_lens = np.ones(self.N, np.int32)
        self.q_lens = np.ones(1, np.int32)

    def apply(self, r: float, delta: float):
        d = self.docs.copy()
        d[self.carrier_row, 0, 1] = np.float64(3.0) + np.float64(r)
        q = np.zeros((1, 1, self.D), np.float32)
        q[0, 0, 0] = 1.0
        q[0, 0, 2] = np.float64(FINE_BASE) + np.float64(delta)
        return d, q

    def eps_for(self, r: float, delta: float):
        docs, query = self.apply(r, delta)
        sc = build_maxsim_sidecar(docs, self.doc_lens)
        q = jnp.asarray(query)
        q_hat = q.astype(jnp.bfloat16).astype(jnp.float32)
        mask = jnp.ones((1, 1), bool)
        eps = _maxsim_prescreen_eps(
            q, q_hat, mask, jnp.float32(sc["nd_max"]), jnp.float32(sc["r_max"])
        )
        return float(eps[0]), sc, docs, query


def _oracle(vals: np.ndarray, k: int):
    order = np.lexsort((np.arange(len(vals)), -vals))[:k]
    return vals[order], order


N_DENSE_MAX1 = 400
N_DENSE_MAX2 = 300
N_MAXSIM = 320


@pytest.mark.parametrize(
    "probe,cases", [("max1", N_DENSE_MAX1), ("max2", N_DENSE_MAX2)]
)
def test_dense_boundary_fuzz(probe, cases):
    rng = np.random.default_rng(0xD15C0 + (probe == "max2"))
    fails_seen = passes_seen = tight = 0
    for trial in range(cases):
        case = _DenseCase(rng, probe)
        want_fail = bool(rng.integers(0, 2))
        r, delta, (eps, sc), margin = _tune(
            case.eps_for, want_fail, case.e_k, case.c_b
        )
        corpus, query = case.apply(r, delta)
        out_s, out_i, n_fail, covered = dense_topk_verified(
            jnp.asarray(query), jnp.asarray(corpus), sc, case.K,
            m=case.M, j=case.J, seg=case.SEG,
            second_chance=int(rng.integers(0, 2)), engine="xla",
            return_stats=True,
        )
        # host-side prediction using the device's own eps helper output
        theta = np.float32(case.e_k) - np.float32(eps)
        predicted_fail = not (np.float32(case.c_b) < theta)
        assert int(n_fail) == int(predicted_fail), (
            f"trial {trial}: device n_fail={int(n_fail)} but host predicts "
            f"{predicted_fail} (margin {margin:.3e}, eps {eps:.6e})"
        )
        fails_seen += int(predicted_fail)
        passes_seen += int(not predicted_fail)
        tight += margin <= 2 * ulp(case.e_k)
        # exactness holds on BOTH sides of the threshold
        os_, oi_ = _oracle(corpus[:, 0], case.K)
        np.testing.assert_array_equal(np.asarray(out_i)[0], oi_)
        np.testing.assert_array_equal(np.asarray(out_s)[0], os_)
    # both sides must actually be exercised, mostly at ulp-level margins
    assert fails_seen >= cases // 5 and passes_seen >= cases // 5, (
        fails_seen, passes_seen,
    )
    assert tight >= cases * 0.6, f"only {tight}/{cases} within 2 ulp"


def test_maxsim_boundary_fuzz():
    rng = np.random.default_rng(0x5EED)
    fails_seen = passes_seen = tight = 0
    for trial in range(N_MAXSIM):
        case = _MaxSimCase(rng)
        want_fail = bool(rng.integers(0, 2))
        r, delta, (eps, sc, docs, query), margin = _tune(
            case.eps_for, want_fail, case.e_k, case.c_b
        )
        out_s, out_i, n_fail, covered = maxsim_topk_verified(
            jnp.asarray(query), jnp.asarray(case.q_lens),
            jnp.asarray(docs), jnp.asarray(case.doc_lens),
            sc, case.K, kprime=case.KP,
            second_chance=int(rng.integers(0, 2)), return_stats=True,
        )
        theta = np.float32(case.e_k) - np.float32(eps)
        predicted_fail = not (np.float32(case.c_b) < theta)
        assert int(n_fail) == int(predicted_fail), (
            f"trial {trial}: device n_fail={int(n_fail)} vs predicted "
            f"{predicted_fail} (margin {margin:.3e}, eps {eps:.6e})"
        )
        fails_seen += int(predicted_fail)
        passes_seen += int(not predicted_fail)
        tight += margin <= 2 * ulp(case.e_k)
        os_, oi_ = _oracle(docs[:, 0, 0], case.K)
        np.testing.assert_array_equal(np.asarray(out_i)[0], oi_)
        np.testing.assert_array_equal(np.asarray(out_s)[0], os_)
    assert fails_seen >= N_MAXSIM // 5 and passes_seen >= N_MAXSIM // 5, (
        fails_seen, passes_seen,
    )
    assert tight >= N_MAXSIM * 0.6, f"only {tight}/{N_MAXSIM} within 2 ulp"
