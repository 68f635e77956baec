import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from trust_align_metrics_plugin.metric import (
    is_refusal,
    trust_align_answer_correctness_f1,
    trust_align_grounded_refusal_f1,
)
from autorag_research_tpu.schema import MetricInput


def test_refusal_detection():
    assert is_refusal("I apologize, but I couldn't find an answer to that.")
    assert not is_refusal("The answer is Paris.")


def test_answer_correctness():
    good = MetricInput(generated_texts="The answer is Paris.", generation_gt=["Paris"])
    refused = MetricInput(
        generated_texts="I apologize, but I couldn't find an answer.",
        generation_gt=["Paris"],
    )
    out = trust_align_answer_correctness_f1([good, refused])
    assert out[0] > 0.9 and out[1] == 0.0


def test_grounded_refusal():
    right_refuse = MetricInput(
        generated_texts="I apologize, but I couldn't find an answer.", generation_gt=None
    )
    wrong_refuse = MetricInput(
        generated_texts="I apologize, but I couldn't find an answer.", generation_gt=["Paris"]
    )
    out = trust_align_grounded_refusal_f1([right_refuse, wrong_refuse])
    assert out == [1.0, 0.0]


def test_registered_in_registry():
    from autorag_research_tpu.evaluation.metrics.generation import GENERATION_METRICS

    assert "trust_align_answer_correctness_f1" in GENERATION_METRICS
