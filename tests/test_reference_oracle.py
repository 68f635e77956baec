"""Fuzz-differential tests against the reference implementation (the oracle).

Loads the reference's metric / fusion / normalization modules standalone
(``reference_oracle.py``) and asserts equality with this repo's
implementations over thousands of randomized inputs. These tests convert
"parity" from a hand-derived claim into a checked theorem: any semantic
drift in

- the 7 retrieval metrics   (reference ``evaluation/metrics/retrieval.py:29-227``)
- RRF / CC fusion           (reference ``pipelines/retrieval/hybrid.py:46-177``)
- mm/tmm/z/dbsf normalizers (reference ``util.py:371-533``)

fails here.
"""

from __future__ import annotations

import math
import random

import pytest

from reference_oracle import load_reference_modules, reference_available

from autorag_research_tpu.evaluation.metrics import retrieval as repo_metrics
from autorag_research_tpu.ops.fusion import cc_fuse, rrf_fuse
from autorag_research_tpu.schema import MetricInput as RepoMetricInput
from autorag_research_tpu.utils import normalize as repo_norm

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)

ATOL = 1e-12


@pytest.fixture(scope="module")
def ref():
    return load_reference_modules()


# --------------------------------------------------------------------------
# random input generators
# --------------------------------------------------------------------------
def _random_gt(rng: random.Random, universe: list[str]) -> list[list[str]]:
    n_groups = rng.randint(1, 5)
    gt = []
    for _ in range(n_groups):
        roll = rng.random()
        if roll < 0.05:
            gt.append([])  # empty group (invalid input row)
        elif roll < 0.10:
            gt.append([""])  # the [""] sentinel ndcg filters
        else:
            size = rng.randint(1, 4)
            group = rng.sample(universe, min(size, len(universe)))
            if rng.random() < 0.1:
                group.append("")  # empty item inside a group
            gt.append(group)
    return gt


def _random_pred(rng: random.Random, universe: list[str]) -> list[str] | None:
    if rng.random() < 0.03:
        return None
    if rng.random() < 0.05:
        return []
    n = rng.randint(1, 15)
    pred = [rng.choice(universe + [f"miss{i}" for i in range(5)]) for _ in range(n)]
    if rng.random() < 0.2:  # duplicates
        pred += rng.sample(pred, min(3, len(pred)))
    return pred


def _random_relevance(
    rng: random.Random, gt: list[list[str]]
) -> dict[str, int] | None:
    if rng.random() < 0.4:
        return None
    items = {it for g in gt for it in g if it}
    # cover some but not necessarily all gt items, plus a stray id
    chosen = [it for it in items if rng.random() < 0.8]
    rel = {it: rng.randint(0, 3) for it in chosen}
    if rng.random() < 0.2:
        rel["unrelated_id"] = rng.randint(0, 3)
    return rel or None


METRIC_PAIRS = [
    ("retrieval_recall", "retrieval_recall"),
    ("retrieval_precision", "retrieval_precision"),
    ("retrieval_f1", "retrieval_f1"),
    ("retrieval_ndcg", "retrieval_ndcg"),
    ("retrieval_full_recall", "retrieval_full_recall"),
    ("retrieval_mrr", "retrieval_mrr"),
    ("retrieval_map", "retrieval_map"),
]


def test_retrieval_metrics_match_reference(ref):
    rng = random.Random(20260816)
    ref_mod = ref["retrieval_metrics"]
    ref_mi_cls = ref["schema"].MetricInput

    n_mismatch_checked = 0
    for case in range(1500):
        universe = [f"d{i}" for i in range(rng.randint(2, 12))]
        gt = _random_gt(rng, universe)
        pred = _random_pred(rng, universe)
        rel = _random_relevance(rng, gt)

        ref_mi = ref_mi_cls(retrieval_gt=gt, retrieved_ids=pred, relevance_scores=rel)
        repo_mi = RepoMetricInput(
            retrieval_gt=gt, retrieved_ids=pred, relevance_scores=rel
        )

        for ref_name, repo_name in METRIC_PAIRS:
            ref_out = getattr(ref_mod, ref_name)([ref_mi])[0]
            repo_out = getattr(repo_metrics, repo_name)([repo_mi])[0]
            ctx = f"case {case} metric {ref_name} gt={gt} pred={pred} rel={rel}"
            if ref_out is None:
                assert repo_out is None, ctx
            else:
                assert repo_out is not None, ctx
                assert math.isclose(
                    float(ref_out), float(repo_out), rel_tol=0, abs_tol=ATOL
                ), f"{ctx}: ref {ref_out} != repo {repo_out}"
                n_mismatch_checked += 1
    assert n_mismatch_checked > 3000  # most rows must be valid, not all-None


def test_retrieval_metrics_match_reference_unwrapped_edge_cases(ref):
    """Drive the inner functions directly on inputs the decorator would filter."""
    ref_mod = ref["retrieval_metrics"]
    ref_mi_cls = ref["schema"].MetricInput
    cases = [
        dict(retrieval_gt=[[""], ["a"]], retrieved_ids=["a", "b"]),
        dict(retrieval_gt=[[], ["a"]], retrieved_ids=["a"]),
        dict(retrieval_gt=[["a", ""], ["b"]], retrieved_ids=["", "a", "b"]),
        dict(retrieval_gt=[["a"]], retrieved_ids=[], relevance_scores={"a": 2}),
        dict(retrieval_gt=[["a"], ["a"]], retrieved_ids=["a"], relevance_scores={}),
        dict(retrieval_gt=[[""], [""]], retrieved_ids=["x"]),
    ]
    for kw in cases:
        ref_mi = ref_mi_cls(**kw)
        repo_mi = RepoMetricInput(**kw)
        for ref_name, repo_name in METRIC_PAIRS:
            ref_out = getattr(ref_mod, ref_name).__wrapped__(ref_mi)
            repo_out = getattr(repo_metrics, repo_name).__wrapped__(repo_mi)
            assert math.isclose(
                float(ref_out), float(repo_out), rel_tol=0, abs_tol=ATOL
            ), f"{kw} {ref_name}: ref {ref_out} != repo {repo_out}"


# --------------------------------------------------------------------------
# normalizations
# --------------------------------------------------------------------------
def _random_scores(rng: random.Random) -> list[float | None]:
    roll = rng.random()
    if roll < 0.04:
        return []
    if roll < 0.08:
        return [None] * rng.randint(1, 4)
    if roll < 0.16:  # all-equal valid scores (zero range / zero std branch)
        v = rng.uniform(-5, 5)
        return [v if rng.random() < 0.8 else None for _ in range(rng.randint(1, 8))]
    n = rng.randint(1, 12)
    return [
        None if rng.random() < 0.25 else rng.uniform(-100, 100) for _ in range(n)
    ]


def test_normalizations_match_reference(ref):
    rng = random.Random(7)
    ref_util = ref["util"]
    pairs = [
        (ref_util.normalize_minmax, repo_norm.normalize_minmax, ()),
        (ref_util.normalize_zscore, repo_norm.normalize_zscore, ()),
        (ref_util.normalize_dbsf, repo_norm.normalize_dbsf, ()),
    ]
    for case in range(1000):
        scores = _random_scores(rng)
        for ref_fn, repo_fn, extra in pairs:
            a = ref_fn(list(scores), *extra)
            b = repo_fn(list(scores), *extra)
            assert len(a) == len(b), (case, ref_fn.__name__)
            for x, y in zip(a, b):
                if x is None:
                    assert y is None, (case, ref_fn.__name__, scores)
                else:
                    assert math.isclose(x, y, rel_tol=0, abs_tol=1e-9), (
                        case,
                        ref_fn.__name__,
                        scores,
                        a,
                        b,
                    )
        # tmm with a random theoretical min at or below the data min
        valid = [s for s in scores if s is not None]
        tmin = (min(valid) if valid else 0.0) - rng.uniform(0, 10)
        a = ref_util.normalize_tmm(list(scores), tmin)
        b = repo_norm.normalize_tmm(list(scores), tmin)
        for x, y in zip(a, b):
            if x is None:
                assert y is None
            else:
                assert math.isclose(x, y, rel_tol=0, abs_tol=1e-9), (case, scores, tmin)


# --------------------------------------------------------------------------
# fusers
# --------------------------------------------------------------------------
def _random_results(
    rng: random.Random, ids: list[int], n: int, tie_prone: bool
) -> list[dict]:
    chosen = rng.sample(ids, min(n, len(ids)))
    out = []
    for d in chosen:
        s = rng.uniform(-10, 50)
        if tie_prone:
            s = round(s, 1)
        out.append({"doc_id": d, "score": s})
    # result lists arrive score-descending from the pipelines
    out.sort(key=lambda h: -h["score"])
    return out


def _as_map(hits: list[dict]) -> dict:
    return {h["doc_id"]: h["score"] for h in hits}


def _assert_score_maps_equal(a: dict, b: dict, ctx: str):
    assert set(a) == set(b), f"{ctx}: id sets differ {set(a) ^ set(b)}"
    for d in a:
        assert math.isclose(a[d], b[d], rel_tol=0, abs_tol=1e-9), (
            f"{ctx}: doc {d} ref {a[d]} != repo {b[d]}"
        )


def test_rrf_fusion_matches_reference(ref):
    rng = random.Random(99)
    ref_fuse = ref["hybrid"]._rrf_fuse
    for case in range(800):
        ids = list(range(rng.randint(1, 30)))
        fetch_k = rng.randint(1, 20)
        r1 = _random_results(rng, ids, rng.randint(0, fetch_k), tie_prone=False)
        r2 = _random_results(rng, ids, rng.randint(0, fetch_k), tie_prone=False)
        k = rng.choice([1, 10, 60])
        union_n = len({h["doc_id"] for h in r1} | {h["doc_id"] for h in r2})
        # full-map equality (top_k = union size) checks the fusion math exactly
        # and is insensitive to tie ordering at the cutoff
        a = _as_map(ref_fuse(r1, r2, k, union_n, fetch_k))
        b = _as_map(rrf_fuse(r1, r2, k=k, top_k=union_n, fetch_k=fetch_k))
        _assert_score_maps_equal(a, b, f"rrf case {case}")
        # truncated top_k: the selected score multiset must match
        top_k = rng.randint(1, max(union_n, 1))
        sa = sorted(h["score"] for h in ref_fuse(r1, r2, k, top_k, fetch_k))
        sb = sorted(h["score"] for h in rrf_fuse(r1, r2, k=k, top_k=top_k, fetch_k=fetch_k))
        assert len(sa) == len(sb)
        for x, y in zip(sa, sb):
            assert math.isclose(x, y, rel_tol=0, abs_tol=1e-9), f"rrf cutoff case {case}"


def test_cc_fusion_matches_reference(ref):
    rng = random.Random(123)
    ref_fuse = ref["hybrid"]._cc_fuse
    for case in range(600):
        ids = list(range(rng.randint(1, 25)))
        r1 = _random_results(rng, ids, rng.randint(0, 15), tie_prone=case % 3 == 0)
        r2 = _random_results(rng, ids, rng.randint(0, 15), tie_prone=case % 3 == 0)
        weight = rng.choice([0.0, 0.3, 0.5, 0.8, 1.0])
        method = rng.choice(["mm", "tmm", "z", "dbsf"])
        kwargs = {}
        if method == "tmm":
            v1 = [h["score"] for h in r1]
            v2 = [h["score"] for h in r2]
            kwargs["pipeline_1_min"] = (min(v1) if v1 else 0.0) - rng.uniform(0, 5)
            kwargs["pipeline_2_min"] = (min(v2) if v2 else 0.0) - rng.uniform(0, 5)
        union_n = len({h["doc_id"] for h in r1} | {h["doc_id"] for h in r2})
        a = _as_map(ref_fuse(r1, r2, weight, max(union_n, 1), method, **kwargs))
        b = _as_map(
            cc_fuse(
                r1, r2, weight=weight, top_k=max(union_n, 1),
                normalize_method=method, **kwargs,
            )
        )
        _assert_score_maps_equal(a, b, f"cc case {case} method {method} w {weight}")


def test_cc_fusion_tmm_requires_mins(ref):
    ref_fuse = ref["hybrid"]._cc_fuse
    r = [{"doc_id": 1, "score": 1.0}]
    with pytest.raises(ValueError):
        ref_fuse(r, r, 0.5, 5, "tmm")
    with pytest.raises(ValueError):
        cc_fuse(r, r, weight=0.5, top_k=5, normalize_method="tmm")
