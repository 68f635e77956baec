from trust_align_metrics_plugin.metric import (
    trust_align_answer_correctness_f1,
    trust_align_grounded_refusal_f1,
)

__all__ = [
    "trust_align_answer_correctness_f1",
    "trust_align_grounded_refusal_f1",
]
