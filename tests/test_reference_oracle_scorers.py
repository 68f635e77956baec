"""Fuzz-differential oracle: repo MODEL-BACKED scorers vs the reference's.

The reference implements BARTScore forced-decode scoring, the UniEval T5
yes/no scorer, AlignScore claim/window orchestration, and MiniCheck label-token
scoring in its own code (``evaluation/metrics/generation.py:885-1003`` BART,
``unieval.py:18-116`` + ``generation.py:1363-1440`` UniEval,
``generation.py:401-493,617-710,1443-1523`` AlignScore,
``generation.py:713-775,1525-1612`` MiniCheck) — all runnable here with torch
and tiny random-init local checkpoints (``tests/tiny_models.py``). Both sides
load the SAME checkpoints, so weights cancel and the scoring math + prompt
orchestration is what gets compared.

Substitutions (documented in docs/PARITY.md): the reference's BARTScore
backend hard-codes ``BartTokenizer`` (slow BPE); the tiny checkpoint ships a
word-level fast tokenizer, so ``_import_bartscore_runtime`` is patched to hand
back ``AutoTokenizer`` — BOTH sides then tokenize identically and the
forced-decode math is the quantity under test. ``bert_score`` has no oracle:
the reference delegates to the unavailable ``bert_score`` pip package.
"""

from __future__ import annotations

import importlib.util
import random

import pytest

from reference_oracle import load_reference_generation, reference_available
from tiny_models import build_seq2seq_checkpoint, build_seqcls_checkpoint

from autorag_research_tpu.evaluation.metrics.model_scorers import (
    align_score_batch,
    bart_score_batch,
    mini_check_batch,
    unieval_batch,
)
from autorag_research_tpu.schema import MetricInput as RepoMI

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)

REF_UNIEVAL_PATH = "/root/reference/autorag_research/evaluation/metrics/unieval.py"


@pytest.fixture(scope="module")
def ref_gen():
    return load_reference_generation()


@pytest.fixture(scope="module")
def ref_unieval_real():
    spec = importlib.util.spec_from_file_location("ref_unieval_real", REF_UNIEVAL_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mi_cls(ref_gen):
    import sys

    return sys.modules["autorag_research.schema"].MetricInput


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    root = tmp_path_factory.mktemp("oracle_ckpts")
    return {
        "seq2seq": build_seq2seq_checkpoint(str(root / "bart")),
        "seqcls": build_seqcls_checkpoint(str(root / "cls")),
    }


VOCAB = (
    "the capital of france is paris a city in europe cats sit on mats "
    "quantum flux capacitors reverse polarity entirely unrelated gibberish "
    "document claim answer question response reference supported by "
    "coherent consistent fluent relevant grounded evidence retrieval"
).split()


def _sentencey_text(rng: random.Random, max_sentences: int = 3) -> str:
    sentences = []
    for _ in range(rng.randint(1, max_sentences)):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(1, 8))]
        sentences.append(" ".join(words) + rng.choice([".", "!", "?"]))
    return " ".join(sentences)


def _cases(seed: int, n: int):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        pred = _sentencey_text(rng)
        refs = [_sentencey_text(rng, 1) for _ in range(rng.randint(1, 3))]
        contents = [_sentencey_text(rng, 2) for _ in range(rng.randint(1, 3))]
        out.append((pred, refs, contents))
    return out


def _pair_inputs(cases, ref_mi_cls):
    ours = [
        RepoMI(generated_texts=p, generation_gt=r, retrieved_contents=c)
        for p, r, c in cases
    ]
    theirs = [
        ref_mi_cls(generated_texts=p, generation_gt=r, retrieved_contents=c)
        for p, r, c in cases
    ]
    return ours, theirs


def _assert_close(ours, theirs, tag, tol=1e-5):
    assert len(ours) == len(theirs), tag
    for i, (a, b) in enumerate(zip(ours, theirs)):
        if b is None:
            assert a is None, (tag, i)
        else:
            assert a == pytest.approx(b, abs=tol), (tag, i, a, b)


# ---------------------------------------------------------------- BARTScore
@pytest.fixture(scope="module")
def patched_bart_runtime(ref_gen, checkpoints):
    import torch
    from transformers import AutoTokenizer, BartForConditionalGeneration

    orig = ref_gen._import_bartscore_runtime
    ref_gen._import_bartscore_runtime = lambda: (
        torch,
        BartForConditionalGeneration,
        AutoTokenizer,
    )
    yield
    ref_gen._import_bartscore_runtime = orig


@pytest.mark.parametrize("direction", ["faithfulness", "precision", "recall", "f1"])
def test_bart_score_matches_reference(
    ref_gen, ref_mi_cls, checkpoints, patched_bart_runtime, direction
):
    cases = _cases(100, 12)
    ours_in, theirs_in = _pair_inputs(cases, ref_mi_cls)
    ref_fn = getattr(ref_gen, f"bart_score_{direction}")
    theirs = ref_fn(
        theirs_in, checkpoint=checkpoints["seq2seq"], batch_size=3, device="cpu"
    )
    ours = bart_score_batch(
        ours_in, direction=direction, checkpoint=checkpoints["seq2seq"], batch_size=3
    )
    _assert_close(ours, theirs, f"bart_{direction}")


# ------------------------------------------------------------------ UniEval
@pytest.mark.parametrize("dimension", ["coherence", "consistency", "fluency", "relevance"])
def test_unieval_matches_reference(
    ref_gen, ref_unieval_real, ref_mi_cls, checkpoints, dimension
):
    scorer = ref_unieval_real.HuggingFaceUniEvalScorer(
        model_name_or_path=checkpoints["seq2seq"], device="cpu"
    )
    cases = _cases(200 + hash(dimension) % 50, 10)
    ours_in, theirs_in = _pair_inputs(cases, ref_mi_cls)
    theirs = ref_gen.unieval(theirs_in, dimension=dimension, scorer=scorer)
    ours = unieval_batch(ours_in, dimension=dimension, checkpoint=checkpoints["seq2seq"])
    _assert_close(ours, theirs, f"unieval_{dimension}")


def test_unieval_missing_fields_match_reference(ref_gen, ref_unieval_real, ref_mi_cls, checkpoints):
    scorer = ref_unieval_real.HuggingFaceUniEvalScorer(
        model_name_or_path=checkpoints["seq2seq"], device="cpu"
    )
    ours_in = [RepoMI(generated_texts="text only")]
    theirs_in = [ref_mi_cls(generated_texts="text only")]
    theirs = ref_gen.unieval(theirs_in, dimension="consistency", scorer=scorer)
    ours = unieval_batch(ours_in, dimension="consistency", checkpoint=checkpoints["seq2seq"])
    assert theirs == [None] and ours == [None]


# --------------------------------------------------------------- AlignScore
@pytest.mark.parametrize("aggregation", ["mean", "min"])
def test_align_score_matches_reference(ref_gen, ref_mi_cls, checkpoints, aggregation):
    scorer = ref_gen.HuggingFaceAlignScoreScorer(
        model_name_or_path=checkpoints["seqcls"], device="cpu", max_length=64
    )
    cases = _cases(300, 10)
    ours_in, theirs_in = _pair_inputs(cases, ref_mi_cls)
    theirs = ref_gen.align_score(theirs_in, scorer=scorer, aggregation=aggregation)
    ours = align_score_batch(
        ours_in,
        checkpoint=checkpoints["seqcls"],
        max_length=64,
        aggregation=aggregation,
    )
    _assert_close(ours, theirs, f"align_{aggregation}")


def test_align_score_overlong_sentence_windowing_matches_reference(
    ref_gen, ref_mi_cls, checkpoints
):
    # one 80-word sentence with a tiny max_length forces the token-window
    # splitter (budget + 32-token overlap) on both sides
    rng = random.Random(7)
    long_sentence = " ".join(rng.choice(VOCAB) for _ in range(80)) + "."
    cases = [("cats sit on mats.", ["ref."], [long_sentence])]
    ours_in, theirs_in = _pair_inputs(cases, ref_mi_cls)
    scorer = ref_gen.HuggingFaceAlignScoreScorer(
        model_name_or_path=checkpoints["seqcls"], device="cpu", max_length=48
    )
    theirs = ref_gen.align_score(theirs_in, scorer=scorer)
    ours = align_score_batch(ours_in, checkpoint=checkpoints["seqcls"], max_length=48)
    _assert_close(ours, theirs, "align_overlong")


# ---------------------------------------------------------------- MiniCheck
@pytest.mark.parametrize("strategy,aggregation", [("max", "mean"), ("concat", "min")])
def test_mini_check_matches_reference(ref_gen, ref_mi_cls, checkpoints, strategy, aggregation):
    # tiny vocab: Yes=4 / No=5 stand in for the production 209/3 label ids
    scorer = ref_gen.HuggingFaceMiniCheckScorer(
        model_name_or_path=checkpoints["seq2seq"],
        device="cpu",
        support_token_id=4,
        unsupported_token_id=5,
    )
    cases = _cases(400, 10)
    ours_in, theirs_in = _pair_inputs(cases, ref_mi_cls)
    theirs = ref_gen.mini_check(
        theirs_in, scorer=scorer, context_strategy=strategy, aggregation=aggregation
    )
    ours = mini_check_batch(
        ours_in,
        checkpoint=checkpoints["seq2seq"],
        context_strategy=strategy,
        aggregation=aggregation,
        support_token_id=4,
        unsupported_token_id=5,
    )
    _assert_close(ours, theirs, f"minicheck_{strategy}_{aggregation}")
