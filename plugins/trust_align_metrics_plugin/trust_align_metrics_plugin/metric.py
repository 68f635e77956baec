"""TRUST-Align generation metrics (example third-party plugin).

Demonstrates the plugin surface the reference ships as its example plugin
(``plugins/trust_align_metrics_plugin``): two calibrated generation metrics
from "TRUST-Align: Teaching LLMs to Refuse Unanswerable Questions":

- ``trust_align_answer_correctness_f1``: F1 over the ground-truth claims an
  *answerable* query's response actually states (claims matched by normalized
  containment / fuzzy partial ratio); refused answerable queries score 0.
- ``trust_align_grounded_refusal_f1``: macro F1 of the refuse/answer decision
  itself — a query SHOULD be refused when it has no ground-truth answer, and
  refusal is detected with a fuzzy match against the refusal flag phrase.

Registering the batch functions into the generation metric registry happens
at import (the ``autorag_research_tpu.metrics`` entry point loads this
module), after which experiment YAMLs reference them by name.
"""

from __future__ import annotations

from difflib import SequenceMatcher

from autorag_research_tpu.evaluation.metrics.generation import normalize_string
from autorag_research_tpu.evaluation.metrics.util import metric_loop
from autorag_research_tpu.plugin_registry import register_metric
from autorag_research_tpu.schema import MetricInput

DEFAULT_REFUSAL_FLAG = "I apologize, but I couldn't find an answer"
DEFAULT_REFUSAL_THRESHOLD = 85


def _partial_ratio(a: str, b: str) -> int:
    """Best window similarity of the shorter string inside the longer (the
    fuzzywuzzy partial_ratio fallback the reference also ships)."""
    if not a or not b:
        return 0
    short, long = (a, b) if len(a) <= len(b) else (b, a)
    window = len(short)
    best = 0.0
    for idx in range(len(long) - window + 1):
        ratio = SequenceMatcher(None, short, long[idx : idx + window]).ratio()
        best = max(best, ratio)
    return round(best * 100)


def is_refusal(
    output: str,
    refusal_flag: str = DEFAULT_REFUSAL_FLAG,
    refusal_threshold: int = DEFAULT_REFUSAL_THRESHOLD,
) -> bool:
    return _partial_ratio(normalize_string(refusal_flag), normalize_string(output)) > refusal_threshold


def _claim_stated(claim: str, answer_norm: str) -> bool:
    claim_norm = normalize_string(claim)
    if not claim_norm:
        return False
    if claim_norm in answer_norm:
        return True
    return _partial_ratio(claim_norm, answer_norm) > 90


@metric_loop(fields_to_check=["generated_texts", "generation_gt"])
def trust_align_answer_correctness_f1(
    metric_inputs: list[MetricInput],
    refusal_flag: str = DEFAULT_REFUSAL_FLAG,
    refusal_threshold: int = DEFAULT_REFUSAL_THRESHOLD,
) -> list[float]:
    out = []
    for mi in metric_inputs:
        answer = mi.generated_texts or ""
        claims = [c for c in (mi.generation_gt or []) if c and c.strip()]
        if is_refusal(answer, refusal_flag, refusal_threshold):
            out.append(0.0)  # refused an answerable query
            continue
        if not claims:
            out.append(0.0)
            continue
        answer_norm = normalize_string(answer)
        stated = sum(_claim_stated(c, answer_norm) for c in claims)
        recall = stated / len(claims)
        # precision proxy: fraction of the answer's sentences that state a claim
        sentences = [s for s in answer.replace("!", ".").replace("?", ".").split(".") if s.strip()]
        if sentences:
            supported = sum(
                any(_claim_stated(c, normalize_string(s)) or _claim_stated(s, normalize_string(c)) for c in claims)
                for s in sentences
            )
            precision = supported / len(sentences)
        else:
            precision = 1.0 if stated else 0.0
        denom = precision + recall
        out.append(2 * precision * recall / denom if denom else 0.0)
    return out


@metric_loop(fields_to_check=["generated_texts"])
def trust_align_grounded_refusal_f1(
    metric_inputs: list[MetricInput],
    refusal_flag: str = DEFAULT_REFUSAL_FLAG,
    refusal_threshold: int = DEFAULT_REFUSAL_THRESHOLD,
) -> list[float]:
    """Per-query correctness of the refuse/answer decision; averaging over the
    dataset yields the macro refusal accuracy (the batch-level macro F1 is
    derivable from the persisted per-query values)."""
    out = []
    for mi in metric_inputs:
        should_refuse = not (mi.generation_gt and any(g.strip() for g in mi.generation_gt))
        refused = is_refusal(mi.generated_texts or "", refusal_flag, refusal_threshold)
        out.append(1.0 if refused == should_refuse else 0.0)
    return out


register_metric("trust_align_answer_correctness_f1", "generation", trust_align_answer_correctness_f1)
register_metric("trust_align_grounded_refusal_f1", "generation", trust_align_grounded_refusal_f1)
