"""Generation metrics.

Capability parity with the reference ``evaluation/metrics/generation.py``
(1 981 LoC), re-implemented natively where the reference shells out to
sacrebleu / rouge-score / evaluate (not available in this image):

- ``bleu``: sentence BLEU with sacrebleu semantics — 13a-style tokenization,
  exp smoothing, effective order, multi-reference clipped counts, closest
  reference length, 0-100 scale (reference ``generation.py:1004-1044``).
- ``rouge``: rouge1/rouge2/rougeL f-measure, non-alphanumeric tokenization,
  optional Porter stemmer, max over references (reference ``:1079-1121``).
- ``meteor``: native alignment-based METEOR (exact + stem + WordNet-synonym
  stages; the synonym stage degrades gracefully when wordnet data is absent
  in this offline image) with the standard alpha/beta/gamma parameters
  (reference ``:1046-1077`` delegates to HF evaluate).
- ``exact_match`` / ``token_f1``: SQuAD normalization (lowercase, strip
  punctuation/articles, whitespace), best score across references
  (reference ``:103-150, 1123-1133``).
- ``sem_score``: max cosine between generated-text embedding and each GT
  embedding via this framework's embedding adapters (reference ``:1135-1177``).
- ``response_relevancy``: RAGAS-style — LLM writes questions from the answer,
  mean cosine to the actual query (reference ``:1312-1360``).
- model-backed metrics (``bert_score``, ``bart_score_*``, ``unieval``,
  ``align_score``, ``mini_check``): implemented against local HF checkpoints
  in ``evaluation/metrics/model_scorers.py``; they raise ``ModelLoadError``
  with guidance when no local checkpoint is available (zero-egress image).
"""

from __future__ import annotations

import math
import re
import string
from collections import Counter
from typing import Any, Callable, Sequence

import numpy as np

from autorag_research_tpu.evaluation.metrics.util import (
    calculate_cosine_similarity,
    metric_loop,
)
from autorag_research_tpu.exceptions import ModelLoadError
from autorag_research_tpu.schema import MetricInput
from autorag_research_tpu.utils.concurrency import run_async

# --------------------------------------------------------------- SQuAD utils

_ARTICLES_RE = re.compile(r"\b(a|an|the)\b")


def normalize_string(text: str) -> str:
    """SQuAD answer normalization: lowercase, drop punctuation, drop
    articles, collapse whitespace."""
    text = text.lower()
    text = "".join(ch for ch in text if ch not in string.punctuation)
    text = _ARTICLES_RE.sub(" ", text)
    return " ".join(text.split())


def _best_over_references(
    inputs: list[MetricInput], scorer: Callable[[str, str], float]
) -> list[float]:
    return [
        max(scorer(mi.generated_texts or "", ref) for ref in (mi.generation_gt or [""]))
        for mi in inputs
    ]


@metric_loop(fields_to_check=["generation_gt"])
def exact_match(metric_inputs: list[MetricInput]) -> list[float]:
    return _best_over_references(
        metric_inputs,
        lambda pred, ref: float(normalize_string(pred) == normalize_string(ref)),
    )


def _token_f1_one(pred: str, ref: str) -> float:
    p_tokens = normalize_string(pred).split()
    r_tokens = normalize_string(ref).split()
    if not p_tokens or not r_tokens:
        return float(p_tokens == r_tokens)
    overlap = sum((Counter(p_tokens) & Counter(r_tokens)).values())
    if overlap == 0:
        return 0.0
    precision = overlap / len(p_tokens)
    recall = overlap / len(r_tokens)
    return 2 * precision * recall / (precision + recall)


@metric_loop(fields_to_check=["generation_gt"])
def token_f1(metric_inputs: list[MetricInput]) -> list[float]:
    return _best_over_references(metric_inputs, _token_f1_one)


# ----------------------------------------------------------------------- BLEU

_13A_RE = [
    (re.compile(r"([\{-\~\[-\` -\&\(-\+\:-\@\/])"), r" \1 "),  # punctuation
    (re.compile(r"([^0-9])([\.,])"), r"\1 \2 "),  # period/comma not after digit
    (re.compile(r"([\.,])([^0-9])"), r" \1 \2"),  # period/comma not before digit
    (re.compile(r"([0-9])(-)"), r"\1 \2 "),
]


def _tokenize_13a(text: str) -> list[str]:
    """sacrebleu '13a' (mteval-v13a) tokenization, simplified: normalize
    whitespace then split out punctuation."""
    text = text.replace("<skipped>", "").replace("-\n", "").replace("\n", " ")
    if "&" in text:
        text = text.replace("&quot;", '"').replace("&amp;", "&")
        text = text.replace("&lt;", "<").replace("&gt;", ">")
    text = f" {text} "
    for pattern, repl in _13A_RE:
        text = pattern.sub(repl, text)
    return text.split()


def _ngram_counts(tokens: Sequence[str], max_order: int) -> list[Counter]:
    return [
        Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))
        for n in range(1, max_order + 1)
    ]


def sentence_bleu(
    hypothesis: str,
    references: list[str],
    max_ngram_order: int = 4,
    smooth_method: str = "exp",
    smooth_value: float | None = None,
    effective_order: bool = True,
) -> float:
    """Sentence BLEU on the sacrebleu model: clipped n-gram precision against
    the union-max of references, brevity penalty vs the closest reference
    length, 'exp'/'floor'/'add-k'/'none' smoothing, 0-100 scale."""
    hyp = _tokenize_13a(hypothesis)
    refs = [_tokenize_13a(r) for r in references if r is not None]
    if not refs:
        return 0.0
    hyp_len = len(hyp)
    ref_len = min((abs(len(r) - hyp_len), len(r)) for r in refs)[1] if hyp_len else min(len(r) for r in refs)

    hyp_counts = _ngram_counts(hyp, max_ngram_order)
    max_ref_counts: list[Counter] = [Counter() for _ in range(max_ngram_order)]
    for r in refs:
        for n, counts in enumerate(_ngram_counts(r, max_ngram_order)):
            for ng, c in counts.items():
                if c > max_ref_counts[n][ng]:
                    max_ref_counts[n][ng] = c

    log_precisions = []
    smooth_mult = 1.0
    orders_used = 0
    for n in range(max_ngram_order):
        total = max(hyp_len - n, 0)
        if total == 0:
            if effective_order:
                break
            log_precisions.append(math.log(1e-16))
            continue
        orders_used += 1
        match = sum(min(c, max_ref_counts[n][ng]) for ng, c in hyp_counts[n].items())
        if match == 0:
            if smooth_method == "exp":
                smooth_mult *= 2.0
                precision = 100.0 / (smooth_mult * total)
            elif smooth_method == "floor":
                precision = 100.0 * (smooth_value if smooth_value is not None else 0.1) / total
            elif smooth_method == "add-k":
                k = smooth_value if smooth_value is not None else 1.0
                precision = 100.0 * (match + k) / (total + k)
            else:  # "none"
                return 0.0
        else:
            if smooth_method == "add-k":
                k = smooth_value if smooth_value is not None else 1.0
                precision = 100.0 * (match + k) / (total + k)
            else:
                precision = 100.0 * match / total
        log_precisions.append(math.log(precision))

    if not log_precisions or hyp_len == 0:
        return 0.0
    score = math.exp(sum(log_precisions) / len(log_precisions))
    if hyp_len < ref_len:
        score *= math.exp(1 - ref_len / hyp_len) if hyp_len > 0 else 0.0
    return score


@metric_loop(fields_to_check=["generation_gt", "generated_texts"])
def bleu(
    metric_inputs: list[MetricInput],
    max_ngram_order: int = 4,
    smooth_method: str = "exp",
    smooth_value: float | None = None,
    effective_order: bool = True,
    **_: Any,
) -> list[float]:
    return [
        sentence_bleu(
            mi.generated_texts or "",
            list(mi.generation_gt or []),
            max_ngram_order=max_ngram_order,
            smooth_method=smooth_method,
            smooth_value=smooth_value,
            effective_order=effective_order,
        )
        for mi in metric_inputs
    ]


# ---------------------------------------------------------------------- ROUGE

_ROUGE_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _rouge_tokens(text: str, use_stemmer: bool) -> list[str]:
    tokens = _ROUGE_TOKEN_RE.findall(text.lower())
    if use_stemmer:
        from nltk.stem.porter import PorterStemmer

        stemmer = PorterStemmer()
        tokens = [stemmer.stem(t) if len(t) > 3 else t for t in tokens]
    return tokens


def _f_measure(matches: int, p_total: int, r_total: int) -> float:
    if p_total == 0 or r_total == 0 or matches == 0:
        return 0.0
    p = matches / p_total
    r = matches / r_total
    return 2 * p * r / (p + r)


def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_score_single(
    target: str, prediction: str, rouge_type: str = "rougeL", use_stemmer: bool = False
) -> float:
    t = _rouge_tokens(target, use_stemmer)
    p = _rouge_tokens(prediction, use_stemmer)
    if rouge_type == "rouge1" or rouge_type == "rouge2":
        n = 1 if rouge_type == "rouge1" else 2
        t_ngrams = Counter(tuple(t[i : i + n]) for i in range(len(t) - n + 1))
        p_ngrams = Counter(tuple(p[i : i + n]) for i in range(len(p) - n + 1))
        matches = sum(min(c, t_ngrams[ng]) for ng, c in p_ngrams.items())
        return _f_measure(matches, sum(p_ngrams.values()), sum(t_ngrams.values()))
    if rouge_type in ("rougeL", "rougeLsum", "rougeLSum"):
        if rouge_type != "rougeL":
            # sentence-split variant: union LCS over newline-separated sentences
            t_sents = [s for s in target.split("\n") if s.strip()]
            p_sents = [s for s in prediction.split("\n") if s.strip()]
            if not t_sents or not p_sents:
                return 0.0
            # token-level union LCS (rouge_score's rougeLsum approximation)
            matches = sum(
                _lcs_len(_rouge_tokens(ts, use_stemmer), p) for ts in t_sents
            )
            t_total = sum(len(_rouge_tokens(ts, use_stemmer)) for ts in t_sents)
            return _f_measure(min(matches, len(p)), len(p), t_total)
        matches = _lcs_len(t, p)
        return _f_measure(matches, len(p), len(t))
    raise ValueError(f"unknown rouge_type: {rouge_type}")


@metric_loop(fields_to_check=["generation_gt"])
def rouge(
    metric_inputs: list[MetricInput],
    rouge_type: str | None = "rougeL",
    use_stemmer: bool = False,
    **_: Any,
) -> list[float]:
    rt = rouge_type or "rougeL"
    return [
        max(
            rouge_score_single(ref, mi.generated_texts or "", rt, use_stemmer)
            for ref in (mi.generation_gt or [""])
        )
        for mi in metric_inputs
    ]


# --------------------------------------------------------------------- METEOR


import functools as _functools


@_functools.lru_cache(maxsize=65536)
def _stem(token: str) -> str:
    # module-level stemmer + memoized stems: meteor's alignment loop compares
    # O(|hyp| x |ref|) token pairs
    global _PORTER_STEMMER
    try:
        stemmer = _PORTER_STEMMER
    except NameError:
        from nltk.stem.porter import PorterStemmer

        stemmer = _PORTER_STEMMER = PorterStemmer()
    return stemmer.stem(token)


def _wordnet_synsets(token: str) -> set[str]:
    try:
        from nltk.corpus import wordnet

        return {lemma.name() for syn in wordnet.synsets(token) for lemma in syn.lemmas()}
    except LookupError:
        return set()


def meteor_single(
    prediction: str,
    reference: str,
    alpha: float = 0.9,
    beta: float = 3.0,
    gamma: float = 0.5,
) -> float:
    """Alignment-based METEOR: greedy stage-wise matching (exact, stem,
    wordnet-synonym when data available), fragmentation penalty."""
    hyp = prediction.lower().split()
    ref = reference.lower().split()
    if not hyp or not ref:
        return 0.0

    matched_pairs: list[tuple[int, int]] = []
    hyp_used = [False] * len(hyp)
    ref_used = [False] * len(ref)

    def stage(match_fn):
        for i, h in enumerate(hyp):
            if hyp_used[i]:
                continue
            for j, r in enumerate(ref):
                if ref_used[j]:
                    continue
                if match_fn(h, r):
                    matched_pairs.append((i, j))
                    hyp_used[i] = True
                    ref_used[j] = True
                    break

    stage(lambda h, r: h == r)
    stage(lambda h, r: _stem(h) == _stem(r))
    stage(lambda h, r: r in _wordnet_synsets(h) or h in _wordnet_synsets(r))

    m = len(matched_pairs)
    if m == 0:
        return 0.0
    precision = m / len(hyp)
    recall = m / len(ref)
    f_mean = precision * recall / (alpha * precision + (1 - alpha) * recall)

    # chunks: maximal runs contiguous in both hyp and ref order
    matched_pairs.sort()
    chunks = 1
    for (i0, j0), (i1, j1) in zip(matched_pairs, matched_pairs[1:]):
        if i1 != i0 + 1 or j1 != j0 + 1:
            chunks += 1
    penalty = gamma * (chunks / m) ** beta
    return f_mean * (1 - penalty)


@metric_loop(fields_to_check=["generation_gt", "generated_texts"])
def meteor(
    metric_inputs: list[MetricInput],
    alpha: float = 0.9,
    beta: float = 3.0,
    gamma: float = 0.5,
) -> list[float]:
    return [
        max(
            meteor_single(mi.generated_texts or "", ref, alpha, beta, gamma)
            for ref in (mi.generation_gt or [""])
        )
        for mi in metric_inputs
    ]


# ----------------------------------------------------------- embedding-based


@metric_loop(fields_to_check=["generation_gt"])
def sem_score(
    metric_inputs: list[MetricInput],
    embedding_model=None,
    truncate_length: int = 4096,
) -> list[float]:
    """Max cosine(generated, gt_i) using an embedding adapter."""
    if embedding_model is None:
        raise ModelLoadError("sem_score requires embedding_model")
    preds = [(mi.generated_texts or "")[: truncate_length * 4] for mi in metric_inputs]
    pred_embs = embedding_model.embed_texts(preds)
    out = []
    for mi, pe in zip(metric_inputs, pred_embs):
        gts = [g[: truncate_length * 4] for g in (mi.generation_gt or [])]
        gt_embs = embedding_model.embed_texts(gts)
        out.append(max(calculate_cosine_similarity(ge, pe) for ge in gt_embs))
    return out


_RELEVANCY_PROMPT = (
    "Generate {n} short questions that the following answer would directly "
    "answer. Output one question per line with no numbering.\n\nAnswer:\n{answer}"
)


@metric_loop(fields_to_check=["query", "generated_texts"])
def response_relevancy(
    metric_inputs: list[MetricInput],
    llm=None,
    embedding_model=None,
    question_count: int = 3,
) -> list[float]:
    """RAGAS-style answer relevancy: LLM infers questions from the answer;
    score = mean cosine(inferred question, actual query)."""
    if llm is None or embedding_model is None:
        raise ModelLoadError("response_relevancy requires llm and embedding_model")

    async def one(mi: MetricInput) -> float:
        res = await llm.agenerate(
            _RELEVANCY_PROMPT.format(n=question_count, answer=mi.generated_texts)
        )
        questions = [q.strip() for q in res.text.splitlines() if q.strip()][:question_count]
        if not questions:
            return 0.0
        q_embs = embedding_model.embed_texts(questions)
        actual = embedding_model.embed_query(mi.query or "")
        sims = [calculate_cosine_similarity(qe, actual) for qe in q_embs]
        return float(np.mean(sims))

    async def runner():
        import asyncio

        return await asyncio.gather(*[one(mi) for mi in metric_inputs])

    return list(run_async(runner()))


# ----------------------------------------------------- model-backed (gated)


def _model_scorer(name: str):
    from autorag_research_tpu.evaluation.metrics import model_scorers

    return getattr(model_scorers, name)


@metric_loop(fields_to_check=["generation_gt"])
def bert_score(metric_inputs, **kwargs):
    return _model_scorer("bert_score_batch")(metric_inputs, **kwargs)


@metric_loop(fields_to_check=["retrieved_contents", "generated_texts"])
def bart_score_faithfulness(metric_inputs, **kwargs):
    return _model_scorer("bart_score_batch")(metric_inputs, direction="faithfulness", **kwargs)


@metric_loop(fields_to_check=["generation_gt", "generated_texts"])
def bart_score_precision(metric_inputs, **kwargs):
    return _model_scorer("bart_score_batch")(metric_inputs, direction="precision", **kwargs)


@metric_loop(fields_to_check=["generation_gt", "generated_texts"])
def bart_score_recall(metric_inputs, **kwargs):
    return _model_scorer("bart_score_batch")(metric_inputs, direction="recall", **kwargs)


@metric_loop(fields_to_check=["generation_gt", "generated_texts"])
def bart_score_f1(metric_inputs, **kwargs):
    return _model_scorer("bart_score_batch")(metric_inputs, direction="f1", **kwargs)


@metric_loop(fields_to_check=["generated_texts"])
def unieval(metric_inputs, **kwargs):
    return _model_scorer("unieval_batch")(metric_inputs, **kwargs)


@metric_loop(fields_to_check=["retrieved_contents", "generated_texts"])
def align_score(metric_inputs, **kwargs):
    return _model_scorer("align_score_batch")(metric_inputs, **kwargs)


@metric_loop(fields_to_check=["retrieved_contents", "generated_texts"])
def mini_check(metric_inputs, **kwargs):
    return _model_scorer("mini_check_batch")(metric_inputs, **kwargs)


@metric_loop(fields_to_check=["generation_gt", "generated_texts"])
def huggingface_evaluate(
    metric_inputs: list[MetricInput],
    metric_name: str = "meteor",
    **kwargs: Any,
) -> list[float]:
    """Generic bridge to any ``evaluate``-hub metric (reference
    ``generation.py:832``): loads the metric by name and scores each
    (prediction, best-reference) pair. Requires the ``evaluate`` package and,
    for most metrics, network access on first load."""
    try:
        import evaluate as hf_evaluate
    except ImportError as exc:
        raise ModelLoadError(
            "huggingface_evaluate requires the 'evaluate' package"
        ) from exc
    scorer = hf_evaluate.load(metric_name)
    out = []
    for mi in metric_inputs:
        refs = list(mi.generation_gt or [""])
        best: float | None = None
        for ref in refs:
            result = scorer.compute(
                predictions=[mi.generated_texts or ""], references=[ref], **kwargs
            )
            # explicit key lookup: a legitimate 0.0 must not fall through to an
            # arbitrary other stat, and signed metrics keep their sign
            value = result[metric_name] if metric_name in result else next(iter(result.values()))
            if isinstance(value, list):
                value = value[0]
            value = float(value)
            best = value if best is None else max(best, value)
        out.append(best if best is not None else 0.0)
    return out


# -------------------------------------------------------------------- registry

GENERATION_METRICS: dict[str, Callable] = {
    "bleu": bleu,
    "meteor": meteor,
    "rouge": rouge,
    "exact_match": exact_match,
    "token_f1": token_f1,
    "sem_score": sem_score,
    "response_relevancy": response_relevancy,
    "bert_score": bert_score,
    "bart_score_faithfulness": bart_score_faithfulness,
    "bart_score_precision": bart_score_precision,
    "bart_score_recall": bart_score_recall,
    "bart_score_f1": bart_score_f1,
    "unieval": unieval,
    "align_score": align_score,
    "mini_check": mini_check,
    "huggingface_evaluate": huggingface_evaluate,
}
