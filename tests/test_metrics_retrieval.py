"""Retrieval metric parity tests.

Cases mirror the reference's semantics documented at
``evaluation/metrics/retrieval.py:71-144`` (AND/OR nDCG) and the basic
set-overlap metrics.
"""

import math

import pytest

from autorag_research_tpu.evaluation.metrics.retrieval import (
    retrieval_f1,
    retrieval_full_recall,
    retrieval_map,
    retrieval_mrr,
    retrieval_ndcg,
    retrieval_precision,
    retrieval_recall,
)
from autorag_research_tpu.schema import MetricInput


def mi(gt, pred, scores=None):
    return MetricInput(retrieval_gt=gt, retrieved_ids=pred, relevance_scores=scores)


def test_recall_group_semantics():
    # (A OR B) AND C
    inp = mi([["a", "b"], ["c"]], ["a", "x"])
    assert retrieval_recall([inp]) == [0.5]
    inp = mi([["a", "b"], ["c"]], ["b", "c"])
    assert retrieval_recall([inp]) == [1.0]
    # both a and b hit the same group -> still only 1 of 2 groups
    inp = mi([["a", "b"], ["c"]], ["a", "b"])
    assert retrieval_recall([inp]) == [0.5]


def test_precision_dedup_numerator():
    inp = mi([["a"]], ["a", "a", "x"])
    # reference counts hits over set(pred) but denominator len(pred)
    assert retrieval_precision([inp]) == [pytest.approx(1 / 3)]


def test_f1():
    inp = mi([["a", "b"], ["c"]], ["a", "x"])
    r, p = 0.5, 0.5
    assert retrieval_f1([inp]) == [pytest.approx(2 * r * p / (r + p))]
    inp = mi([["a"]], ["x"])
    assert retrieval_f1([inp]) == [0.0]


def test_full_recall_binary():
    assert retrieval_full_recall([mi([["a", "b"], ["c"]], ["b", "c"])]) == [1.0]
    assert retrieval_full_recall([mi([["a", "b"], ["c"]], ["a", "b"])]) == [0.0]


def test_mrr_per_group():
    # group1 first hit at rank 1, group2 at rank 3 -> (1 + 1/3) / 2
    inp = mi([["a"], ["c"]], ["a", "x", "c"])
    assert retrieval_mrr([inp]) == [pytest.approx((1 + 1 / 3) / 2)]
    assert retrieval_mrr([mi([["a"]], ["x", "y"])]) == [0.0]


def test_map_per_group():
    inp = mi([["a", "b"]], ["a", "x", "b"])
    # hits at ranks 1 and 3: AP = (1/1 + 2/3)/2
    assert retrieval_map([inp]) == [pytest.approx((1 + 2 / 3) / 2)]


def test_ndcg_first_satisfaction_only():
    # GT: (a OR b) AND c. Retrieved [a, b] -> b is redundant, dcg only from a.
    inp = mi([["a", "b"], ["c"]], ["a", "b"])
    dcg = 1 / math.log2(2)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert retrieval_ndcg([inp]) == [pytest.approx(dcg / idcg)]
    # Perfect: [a, c]
    inp = mi([["a", "b"], ["c"]], ["a", "c"])
    dcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert retrieval_ndcg([inp]) == [pytest.approx(1.0)]


def test_ndcg_graded_relevance():
    # a has grade 2 in group 0; c grade 1.
    scores = {"a": 2, "b": 1, "c": 1}
    inp = mi([["a", "b"], ["c"]], ["c", "a"], scores)
    dcg = (2**1 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3)
    idcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(3)
    assert retrieval_ndcg([inp]) == [pytest.approx(dcg / idcg)]


def test_ndcg_empty_groups():
    # the decorator rejects this input (None); the inner filter returns 0.0
    assert retrieval_ndcg([mi([[""], []], ["a"])]) == [None]
    assert retrieval_ndcg.__wrapped__(mi([[""], []], ["a"])) == 0.0


def test_invalid_inputs_give_none():
    out = retrieval_recall([MetricInput(retrieval_gt=None, retrieved_ids=["a"])])
    assert out == [None]
    out = retrieval_recall([MetricInput(retrieval_gt=[], retrieved_ids=["a"])])
    assert out == [None]


def test_item_in_multiple_groups_counts_once_in_dcg():
    # a satisfies both groups when first seen -> one dcg term, both satisfied
    inp = mi([["a"], ["a", "c"]], ["a", "c"])
    dcg = 1 / math.log2(2)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert retrieval_ndcg([inp]) == [pytest.approx(dcg / idcg)]
