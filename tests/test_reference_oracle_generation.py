"""Fuzz-differential oracle: repo generation TEXT metrics vs the reference's.

The reference (`evaluation/metrics/generation.py:1004-1364`) scores with
sacrebleu / rouge_score / nltk-meteor(+HF-evaluate) / pure-Python SQuAD
helpers — all executable in this image (see ``reference_oracle.py`` for the
two offline substitutions: evaluate.load → nltk meteor shim, word_tokenize →
Treebank). The repo reimplements each natively. ≥1500 randomized cases per
metric must agree to float precision, converting "parity" from a claim into
a fuzz theorem — these metrics are the leaderboard's y-axis.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from reference_oracle import load_reference_generation, reference_available

import autorag_research_tpu.evaluation.metrics.generation as repo_gen
from autorag_research_tpu.schema import MetricInput as RepoMI

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


@pytest.fixture(scope="module")
def ref_gen():
    return load_reference_generation()


@pytest.fixture(scope="module")
def ref_mi_cls(ref_gen):
    import sys

    return sys.modules["autorag_research.schema"].MetricInput


# ------------------------------------------------------------ case generator

VOCAB = [
    "the", "cat", "cats", "sat", "sitting", "on", "mat", "a", "an", "dog",
    "dogs", "ran", "running", "runs", "fast", "quickly", "blue", "sky",
    "42", "3.14", "it's", "well-known", "don't", "co-op", "hello,",
    "world!", "<tag>", "&amp;", "&quot;q&quot;", "1-2", "a.b", "x,y",
    "(paren)", "semi;colon", "q:r", "slash/em", "100.", "[brack]",
    "über", "naïve", "happiness", "played", "playing", "--", "...", "!?",
]


def _rand_text(rng: random.Random, maxlen: int = 14, newlines: bool = False) -> str:
    out = []
    for _ in range(rng.randint(0, maxlen)):
        out.append(rng.choice(VOCAB))
        if newlines and rng.random() < 0.15:
            out.append("\n")
    return " ".join(out)


def _cases(seed: int, n: int, *, newlines: bool = False, allow_empty_gt: bool = False):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        pred = _rand_text(rng, newlines=newlines)
        n_refs = rng.randint(0 if allow_empty_gt else 1, 3)
        refs = [_rand_text(rng, newlines=newlines) for _ in range(n_refs)]
        out.append((pred, refs))
    return out


def _pair_inputs(cases, ref_mi_cls):
    repo_inputs = [RepoMI(generated_texts=p, generation_gt=r or None) for p, r in cases]
    ref_inputs = [
        ref_mi_cls(generated_texts=p, generation_gt=r or None) for p, r in cases
    ]
    return repo_inputs, ref_inputs


def _assert_rows_match(repo_rows, ref_rows, cases, label, rtol=1e-9, atol=1e-9):
    assert len(repo_rows) == len(ref_rows)
    for i, (mine, ref) in enumerate(zip(repo_rows, ref_rows)):
        if ref is None or mine is None:
            assert ref is None and mine is None, (label, i, cases[i], mine, ref)
            continue
        assert mine == pytest.approx(ref, rel=rtol, abs=atol), (
            label,
            i,
            cases[i],
            mine,
            ref,
        )


# -------------------------------------------------------------------- BLEU


def test_bleu_fuzz_parity(ref_gen, ref_mi_cls):
    rng = random.Random(100)
    cases = _cases(101, 1500, allow_empty_gt=True)
    # batch by random param set so each config covers many inputs
    for start in range(0, len(cases), 100):
        chunk = cases[start : start + 100]
        sm = rng.choice(["exp", "floor", "add-k", "none"])
        sv = rng.choice([None, 0.05, 1.0, 2.0])
        order = rng.choice([1, 2, 3, 4, 6])
        eo = rng.choice([True, False])
        repo_in, ref_in = _pair_inputs(chunk, ref_mi_cls)
        mine = repo_gen.bleu(
            repo_in, max_ngram_order=order, smooth_method=sm,
            smooth_value=sv, effective_order=eo,
        )
        ref = ref_gen.bleu(
            ref_in, max_ngram_order=order, smooth_method=sm,
            smooth_value=sv, effective_order=eo,
        )
        _assert_rows_match(mine, ref, chunk, f"bleu[{sm},{sv},{order},{eo}]")


# -------------------------------------------------------------------- ROUGE


@pytest.mark.parametrize("rouge_type", ["rouge1", "rouge2", "rougeL", "rougeLsum"])
@pytest.mark.parametrize("use_stemmer", [False, True])
def test_rouge_fuzz_parity(ref_gen, ref_mi_cls, rouge_type, use_stemmer):
    cases = _cases(
        200 + hash((rouge_type, use_stemmer)) % 1000, 400,
        newlines=(rouge_type == "rougeLsum"), allow_empty_gt=True,
    )
    repo_in, ref_in = _pair_inputs(cases, ref_mi_cls)
    mine = repo_gen.rouge(repo_in, rouge_type=rouge_type, use_stemmer=use_stemmer)
    ref = ref_gen.rouge(ref_in, rouge_type=rouge_type, use_stemmer=use_stemmer)
    _assert_rows_match(mine, ref, cases, f"rouge[{rouge_type},{use_stemmer}]", atol=1e-12)


# ------------------------------------------------------------------- METEOR


def test_meteor_fuzz_parity(ref_gen, ref_mi_cls):
    rng = random.Random(300)
    cases = _cases(301, 1500, allow_empty_gt=True)
    for start in range(0, len(cases), 250):
        chunk = cases[start : start + 250]
        a = rng.choice([0.9, 0.5, 0.85])
        b = rng.choice([3.0, 1.0, 2.5])
        g = rng.choice([0.5, 0.0, 0.3])
        repo_in, ref_in = _pair_inputs(chunk, ref_mi_cls)
        mine = repo_gen.meteor(repo_in, alpha=a, beta=b, gamma=g)
        ref = ref_gen.meteor(ref_in, alpha=a, beta=b, gamma=g)
        _assert_rows_match(mine, ref, chunk, f"meteor[{a},{b},{g}]", atol=1e-12)


def test_meteor_native_mirror_matches_nltk():
    """The no-nltk fallback implements nltk's alignment exactly (same
    reverse-scan highest-position pairing → same chunk counts)."""
    from nltk.translate.meteor_score import single_meteor_score

    from autorag_research_tpu.evaluation.metrics.generation import (
        _meteor_native,
        _meteor_tokenize,
        _NoWordnet,
    )

    rng = random.Random(310)
    wn = _NoWordnet()
    for _ in range(600):
        pred, ref = _rand_text(rng), _rand_text(rng)
        hyp_t, ref_t = _meteor_tokenize(pred), _meteor_tokenize(ref)
        want = float(single_meteor_score(ref_t, hyp_t, wordnet=wn))
        got = _meteor_native(hyp_t, ref_t, 0.9, 3.0, 0.5)
        assert got == pytest.approx(want, abs=1e-12), (pred, ref)


# ------------------------------------------------------- exact_match / token_f1


def test_exact_match_and_token_f1_fuzz_parity(ref_gen, ref_mi_cls):
    cases = _cases(400, 1500, allow_empty_gt=True)
    repo_in, ref_in = _pair_inputs(cases, ref_mi_cls)
    _assert_rows_match(
        repo_gen.exact_match(repo_in), ref_gen.exact_match(ref_in), cases,
        "exact_match", atol=0,
    )
    _assert_rows_match(
        repo_gen.token_f1(repo_in), ref_gen.token_f1(ref_in), cases,
        "token_f1", atol=1e-12,
    )


def test_metric_loop_missing_fields_none_parity(ref_gen, ref_mi_cls):
    """Rows with missing/empty required fields must be None on both sides."""
    degenerate = [
        (None, ["ref"]),
        ("", ["ref"]),
        ("   ", ["ref"]),
        ("pred", []),
        ("pred", [""]),
        ("pred", None),
        (None, None),
    ]
    repo_in = [RepoMI(generated_texts=p, generation_gt=r) for p, r in degenerate]
    ref_in = [ref_mi_cls(generated_texts=p, generation_gt=r) for p, r in degenerate]
    for name in ("bleu", "meteor", "exact_match", "token_f1"):
        mine = getattr(repo_gen, name)(repo_in)
        ref = getattr(ref_gen, name)(ref_in)
        assert [m is None for m in mine] == [r is None for r in ref], (name, mine, ref)


# ---------------------------------------------------------------- sem_score


class _SharedEmbedder:
    """One deterministic embedder exposing BOTH interfaces: the reference's
    langchain ``Embeddings`` (embed_documents/embed_query) and the repo's
    adapter (embed_texts/embed_query)."""

    dim = 24

    def _vec(self, text: str) -> list[float]:
        seed = abs(hash(("emb", text))) % (2**32)
        rng = np.random.default_rng(seed)
        v = rng.normal(size=self.dim)
        return [float(x) for x in v]

    def embed_documents(self, texts):
        return [self._vec(t) for t in texts]

    def embed_texts(self, texts):
        return [self._vec(t) for t in texts]

    def embed_query(self, text):
        return self._vec(text)


def test_sem_score_fuzz_parity(ref_gen, ref_mi_cls):
    # the reference type-gates on the (stubbed) langchain Embeddings base
    import sys

    Embeddings = sys.modules["langchain_core.embeddings"].Embeddings
    shared_cls = type("SharedEmb", (_SharedEmbedder, Embeddings), {})
    emb = shared_cls()
    cases = _cases(500, 300)
    repo_in, ref_in = _pair_inputs(cases, ref_mi_cls)
    mine = repo_gen.sem_score(repo_in, embedding_model=emb)
    ref = ref_gen.sem_score(ref_in, embedding_model=emb)
    _assert_rows_match(mine, ref, cases, "sem_score", atol=1e-9)


# --------------------------------------------------------- response_relevancy


class _SharedLLM:
    """Deterministic question generator exposing both the reference's
    langchain ``invoke`` and the repo's async ``agenerate``."""

    def __init__(self):
        self.counts: dict[str, int] = {}

    def _answer_for(self, prompt: str) -> str:
        n = self.counts.get(prompt, 0)
        self.counts[prompt] = n + 1
        # derive a stable question from the prompt content + call index; the
        # reference invokes `strictness` times and both sides must see the
        # same sequence, so key on (prompt, per-prompt call count % 3)
        seed = abs(hash(("q", prompt, n % 3))) % 997
        noncommittal = 1 if seed % 7 == 0 else 0
        return (
            '{"question": "generated question %d about topic %d", "noncommittal": %d}'
            % (seed, seed % 13, noncommittal)
        )

    # reference side (BaseLanguageModel stub has no behavior)
    def invoke(self, prompt):
        class _Resp:
            def __init__(self, content):
                self.content = content

        return _Resp(self._answer_for(prompt))

    # repo side
    async def agenerate(self, prompt, **kwargs):
        from autorag_research_tpu.llm.base import LLMResult

        return LLMResult(text=self._answer_for(prompt))


def test_response_relevancy_fuzz_parity(ref_gen, ref_mi_cls):
    import sys

    Embeddings = sys.modules["langchain_core.embeddings"].Embeddings
    BaseLM = sys.modules["langchain_core.language_models"].BaseLanguageModel
    emb = type("SharedEmb", (_SharedEmbedder, Embeddings), {})()
    rng = random.Random(600)
    cases = []
    for i in range(120):
        # answers made unique per case: the mock LLM keys its per-prompt call
        # counter on the prompt text, and a duplicated answer would let the
        # repo's async interleaving draw a different question multiset than
        # the reference's sequential invokes
        cases.append((f"{_rand_text(rng, 10)} case{i}", _rand_text(rng, 6) or "a query"))
    repo_in = [RepoMI(generated_texts=p, query=q, generation_gt=["x"]) for p, q in cases]
    ref_in = [
        ref_mi_cls(generated_texts=p, query=q, generation_gt=["x"]) for p, q in cases
    ]
    # separate stateful LLMs with identical deterministic behavior
    repo_llm = _SharedLLM()
    ref_llm_cls = type("SharedLLM", (_SharedLLM, BaseLM), {})
    ref_llm = ref_llm_cls()
    mine = repo_gen.response_relevancy(repo_in, llm=repo_llm, embedding_model=emb)
    ref = ref_gen.response_relevancy(ref_in, llm=ref_llm, embedding_model=emb)
    _assert_rows_match(mine, ref, cases, "response_relevancy", atol=1e-9)
