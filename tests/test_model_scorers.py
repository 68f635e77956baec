"""Execute the model-backed generation scorers end-to-end with tiny local models.

Replaces the round-1 raise-only coverage: every scorer's forced-decode /
embedding-similarity / yes-no-softmax / windowing math actually runs here
(reference behavior: ``evaluation/metrics/generation.py:885-1003`` BARTScore,
``:1179-1220`` BERTScore, ``unieval.py:18-116`` UniEval, ``:401-493`` AlignScore
windowing). Random-init weights mean absolute values are meaningless; the
assertions target shape, range, determinism, and ordering/selection invariants
that hold for any weights.
"""

from __future__ import annotations

import math

import pytest

from tiny_models import (
    build_encoder_checkpoint,
    build_seq2seq_checkpoint,
    build_seqcls_checkpoint,
)

from autorag_research_tpu.evaluation.metrics import generation as gen
from autorag_research_tpu.evaluation.metrics.model_scorers import (
    align_score_batch,
    bart_score_batch,
    bert_score_batch,
    mini_check_batch,
    unieval_batch,
)
from autorag_research_tpu.schema import MetricInput


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_ckpts")
    return {
        "seq2seq": build_seq2seq_checkpoint(str(root / "bart")),
        "encoder": build_encoder_checkpoint(str(root / "bert")),
        "seqcls": build_seqcls_checkpoint(str(root / "cls")),
    }


def mi(text: str, gts: list[str] | None = None, contents: list[str] | None = None):
    return MetricInput(
        generated_texts=text,
        generation_gt=gts,
        retrieved_contents=contents,
        query="the question",
    )


# ---------------------------------------------------------------- BARTScore
def test_bart_score_faithfulness_runs_and_is_deterministic(checkpoints):
    inputs = [
        mi("paris is the capital of france", contents=["france capital paris city"]),
        mi("cats sit on mats", contents=["entirely unrelated gibberish"]),
    ]
    a = bart_score_batch(inputs, direction="faithfulness", checkpoint=checkpoints["seq2seq"])
    b = bart_score_batch(inputs, direction="faithfulness", checkpoint=checkpoints["seq2seq"])
    assert len(a) == 2
    # mean per-token log-likelihoods: finite and strictly negative
    for v in a:
        assert math.isfinite(v) and v < 0.0
    assert a == b  # forced decode is deterministic


def test_bart_score_precision_takes_best_reference(checkpoints):
    pred = "paris is the capital"
    refs = ["paris is the capital", "quantum flux capacitors"]
    one = bart_score_batch(
        [mi(pred, gts=[refs[0]])], direction="precision", checkpoint=checkpoints["seq2seq"]
    )[0]
    two = bart_score_batch(
        [mi(pred, gts=[refs[1]])], direction="precision", checkpoint=checkpoints["seq2seq"]
    )[0]
    both = bart_score_batch(
        [mi(pred, gts=refs)], direction="precision", checkpoint=checkpoints["seq2seq"]
    )[0]
    assert both == pytest.approx(max(one, two))
    # reference order must not matter
    both_rev = bart_score_batch(
        [mi(pred, gts=refs[::-1])], direction="precision", checkpoint=checkpoints["seq2seq"]
    )[0]
    assert both == pytest.approx(both_rev)


def test_bart_score_f1_is_mean_of_directions_single_ref(checkpoints):
    inp = [mi("paris is the capital", gts=["france capital city"])]
    p = bart_score_batch(inp, direction="precision", checkpoint=checkpoints["seq2seq"])[0]
    r = bart_score_batch(inp, direction="recall", checkpoint=checkpoints["seq2seq"])[0]
    f1 = bart_score_batch(inp, direction="f1", checkpoint=checkpoints["seq2seq"])[0]
    assert f1 == pytest.approx((p + r) / 2)


def test_bart_score_unknown_direction_raises(checkpoints):
    with pytest.raises(ValueError):
        bart_score_batch(
            [mi("x", gts=["y"])], direction="bogus", checkpoint=checkpoints["seq2seq"]
        )


# ---------------------------------------------------------------- BERTScore
def test_bert_score_identical_text_is_one_and_beats_unrelated(checkpoints):
    identical = bert_score_batch(
        [mi("paris is the capital of france", gts=["paris is the capital of france"])],
        checkpoint=checkpoints["encoder"],
    )[0]
    unrelated = bert_score_batch(
        [mi("paris is the capital of france", gts=["quantum flux capacitors reverse polarity"])],
        checkpoint=checkpoints["encoder"],
    )[0]
    assert identical == pytest.approx(1.0, abs=1e-4)
    assert unrelated < identical


def test_bert_score_best_reference_selection(checkpoints):
    pred = "cats sit on mats"
    score = bert_score_batch(
        [mi(pred, gts=["entirely unrelated gibberish", pred])],
        checkpoint=checkpoints["encoder"],
    )[0]
    assert score == pytest.approx(1.0, abs=1e-4)  # the identical ref wins the max


# ------------------------------------------------------------------ UniEval
def test_unieval_runs_in_unit_range(checkpoints):
    inputs = [
        mi("paris is the capital", gts=["paris"], contents=["france capital paris"]),
        mi("cats sit", gts=["mats"], contents=["cats sit on mats"]),
    ]
    for dim in ("coherence", "consistency", "fluency", "relevance"):
        out = unieval_batch(inputs, dimension=dim, checkpoint=checkpoints["seq2seq"])
        assert len(out) == 2
        for v in out:
            assert 0.0 <= v <= 1.0
        assert out == unieval_batch(inputs, dimension=dim, checkpoint=checkpoints["seq2seq"])


def test_unieval_relevance_keeps_best_reference(checkpoints):
    pred = "the answer"
    a = unieval_batch([mi(pred, gts=["reference"])], dimension="relevance",
                      checkpoint=checkpoints["seq2seq"])[0]
    b = unieval_batch([mi(pred, gts=["entirely unrelated gibberish"])],
                      dimension="relevance", checkpoint=checkpoints["seq2seq"])[0]
    both = unieval_batch([mi(pred, gts=["reference", "entirely unrelated gibberish"])],
                         dimension="relevance", checkpoint=checkpoints["seq2seq"])[0]
    assert both == pytest.approx(max(a, b))


def test_unieval_consistency_averages_per_sentence(checkpoints):
    ctx = ["france capital paris city"]
    one = unieval_batch([mi("paris is the capital.", contents=ctx)],
                        dimension="consistency", checkpoint=checkpoints["seq2seq"])[0]
    two = unieval_batch([mi("cats sit on mats.", contents=ctx)],
                        dimension="consistency", checkpoint=checkpoints["seq2seq"])[0]
    both = unieval_batch(
        [mi("paris is the capital. cats sit on mats.", contents=ctx)],
        dimension="consistency", checkpoint=checkpoints["seq2seq"],
    )[0]
    assert both == pytest.approx((one + two) / 2, abs=1e-6)


def test_unieval_missing_fields_yield_none(checkpoints):
    out = unieval_batch([mi("text", gts=None, contents=None)],
                        dimension="consistency", checkpoint=checkpoints["seq2seq"])
    assert out == [None]


# --------------------------------------------------------------- AlignScore
def test_align_score_unit_range_and_window_max_monotonicity(checkpoints):
    base_ctx = "france capital paris city europe grounded evidence."
    score_base = align_score_batch(
        [mi("paris is the capital", contents=[base_ctx])],
        checkpoint=checkpoints["seqcls"],
    )[0]
    assert 0.0 <= score_base <= 1.0
    # an extra PASSAGE adds windows: a max-over-windows claim score can only rise
    score_more = align_score_batch(
        [mi("paris is the capital", contents=[base_ctx, "extra filler tokens alpha beta."])],
        checkpoint=checkpoints["seqcls"],
    )[0]
    assert score_more >= score_base - 1e-12


def test_align_score_claim_aggregation_mean_vs_min(checkpoints):
    ctx = ["cats sit on mats in europe."]
    text = "cats sit. quantum flux capacitors."
    mean_v = align_score_batch([mi(text, contents=ctx)],
                               checkpoint=checkpoints["seqcls"], aggregation="mean")[0]
    min_v = align_score_batch([mi(text, contents=ctx)],
                              checkpoint=checkpoints["seqcls"], aggregation="min")[0]
    assert min_v <= mean_v
    c1 = align_score_batch([mi("cats sit.", contents=ctx)], checkpoint=checkpoints["seqcls"])[0]
    c2 = align_score_batch([mi("quantum flux capacitors.", contents=ctx)],
                           checkpoint=checkpoints["seqcls"])[0]
    assert mean_v == pytest.approx((c1 + c2) / 2, abs=1e-6)
    assert min_v == pytest.approx(min(c1, c2), abs=1e-6)


def test_align_score_overlong_claim_raises(checkpoints):
    long_claim = " ".join(["document"] * 600)
    with pytest.raises(ValueError):
        align_score_batch([mi(long_claim, contents=["ctx"])],
                          checkpoint=checkpoints["seqcls"], max_length=16)


# ---------------------------------------------------------------- MiniCheck
MINI_IDS = {"support_token_id": 4, "unsupported_token_id": 5}  # tiny vocab Yes/No


def test_mini_check_unit_range_and_determinism(checkpoints):
    inputs = [
        mi("paris is the capital", contents=["france capital paris"]),
        mi("quantum flux", contents=["cats sit on mats"]),
    ]
    out = mini_check_batch(inputs, checkpoint=checkpoints["seq2seq"], **MINI_IDS)
    assert len(out) == 2
    for v in out:
        assert 0.0 <= v <= 1.0
    assert out == mini_check_batch(inputs, checkpoint=checkpoints["seq2seq"], **MINI_IDS)


def test_mini_check_max_over_contexts_and_concat(checkpoints):
    claim = "paris is the capital."
    ctxs = ["france capital paris.", "cats sit on mats."]
    per = [
        mini_check_batch([mi(claim, contents=[c])], checkpoint=checkpoints["seq2seq"],
                         **MINI_IDS)[0]
        for c in ctxs
    ]
    best = mini_check_batch([mi(claim, contents=ctxs)], checkpoint=checkpoints["seq2seq"],
                            **MINI_IDS)[0]
    assert best == pytest.approx(max(per), abs=1e-6)
    concat = mini_check_batch([mi(claim, contents=ctxs)], checkpoint=checkpoints["seq2seq"],
                              context_strategy="concat", **MINI_IDS)[0]
    single = mini_check_batch([mi(claim, contents=["\n\n".join(ctxs)])],
                              checkpoint=checkpoints["seq2seq"], **MINI_IDS)[0]
    assert concat == pytest.approx(single, abs=1e-6)


# ----------------------------------------------- registry (decorated) surface
def test_registry_wrappers_execute_and_scatter_none(checkpoints):
    valid = mi("paris is the capital", gts=["paris"], contents=["france capital paris"])
    invalid = MetricInput()  # no fields -> decorator emits None
    cases = [
        ("bert_score", {"checkpoint": checkpoints["encoder"]}),
        ("bart_score_faithfulness", {"checkpoint": checkpoints["seq2seq"]}),
        ("bart_score_f1", {"checkpoint": checkpoints["seq2seq"]}),
        ("unieval", {"checkpoint": checkpoints["seq2seq"]}),
        ("align_score", {"checkpoint": checkpoints["seqcls"]}),
        ("mini_check", {"checkpoint": checkpoints["seq2seq"],
                        "support_token_id": 4, "unsupported_token_id": 5}),
    ]
    for name, kwargs in cases:
        out = gen.GENERATION_METRICS[name]([valid, invalid], **kwargs)
        assert len(out) == 2, name
        assert isinstance(out[0], float) and math.isfinite(out[0]), name
        assert out[1] is None, name
