import pytest

from autorag_research_tpu.embeddings import MockEmbedding
from autorag_research_tpu.evaluation.metrics.generation import (
    bleu,
    exact_match,
    meteor,
    normalize_string,
    response_relevancy,
    rouge,
    sem_score,
    sentence_bleu,
    token_f1,
)
from autorag_research_tpu.llm import MockLLM
from autorag_research_tpu.schema import MetricInput


def mi(gen, gt, query=None, contents=None):
    return MetricInput(
        generated_texts=gen, generation_gt=gt, query=query, retrieved_contents=contents
    )


def test_normalize_string_squad_rules():
    assert normalize_string("The  Quick, Brown Fox!") == "quick brown fox"
    assert normalize_string("An apple a day") == "apple day"


def test_exact_match_best_of_references():
    assert exact_match([mi("Paris", ["paris.", "London"])]) == [1.0]
    assert exact_match([mi("Paris", ["Berlin"])]) == [0.0]


def test_token_f1():
    out = token_f1([mi("the cat sat", ["a cat sat down"])])
    # normalized: "cat sat" vs "cat sat down": overlap 2, P=1, R=2/3
    assert out[0] == pytest.approx(2 * 1 * (2 / 3) / (1 + 2 / 3))
    assert token_f1([mi("", [""])]) == [None]  # invalid input -> None


def test_bleu_scale_and_identity():
    assert sentence_bleu("the cat sat on the mat", ["the cat sat on the mat"]) == pytest.approx(100.0)
    low = sentence_bleu("dog", ["the cat sat on the mat"])
    assert 0.0 <= low < 10.0
    out = bleu([mi("the cat sat on the mat", ["the cat sat on the mat"])])
    assert out[0] == pytest.approx(100.0)


def test_bleu_partial_overlap_ordering():
    good = sentence_bleu("the cat sat on a mat", ["the cat sat on the mat"])
    bad = sentence_bleu("mat the on sat cat a", ["the cat sat on the mat"])
    assert good > bad > 0


def test_rouge_types():
    assert rouge([mi("the cat sat", ["the cat sat"])], rouge_type="rouge1") == [1.0]
    r2 = rouge([mi("the cat sat", ["the cat ran"])], rouge_type="rouge2")[0]
    assert r2 == pytest.approx(0.5)  # bigrams: {the cat, cat sat} vs {the cat, cat ran}
    rl = rouge([mi("the cat sat", ["the dog cat sat"])], rouge_type="rougeL")[0]
    # LCS = 3, P = 3/3, R = 3/4
    assert rl == pytest.approx(2 * 1 * 0.75 / 1.75)


def test_meteor_perfect_and_partial():
    perfect = meteor([mi("the cat sat", ["the cat sat"])])[0]
    # perfect match: m=3, chunks=1 -> 1 - 0.5*(1/3)^3 = 0.98148 (standard METEOR)
    assert perfect == pytest.approx(0.98148, abs=1e-4)
    partial = meteor([mi("a cat running", ["the cat runs"])])[0]
    assert 0 < partial < perfect


def test_sem_score_with_mock_embedding():
    emb = MockEmbedding(dim=32)
    out = sem_score([mi("identical text", ["identical text", "other"])], embedding_model=emb)
    assert out[0] == pytest.approx(1.0, abs=1e-5)


def test_response_relevancy_with_mocks():
    emb = MockEmbedding(dim=32)
    llm = MockLLM(
        responder=lambda p: '{"question": "what is the capital of france", "noncommittal": 0}'
    )
    out = response_relevancy(
        [mi("Paris is the capital", ["x"], query="what is the capital of france")],
        llm=llm,
        embedding_model=emb,
        strictness=2,
    )
    # every generated question == query -> mean cosine 1.0
    assert out[0] == pytest.approx(1.0, abs=1e-5)


def test_response_relevancy_noncommittal_zeroes():
    emb = MockEmbedding(dim=32)
    llm = MockLLM(
        responder=lambda p: '{"question": "what is the capital", "noncommittal": 1}'
    )
    out = response_relevancy(
        [mi("I don't know", ["x"], query="what is the capital")],
        llm=llm,
        embedding_model=emb,
    )
    assert out[0] == 0.0


def test_response_relevancy_malformed_json_zeroes():
    emb = MockEmbedding(dim=32)
    llm = MockLLM(responder=lambda p: "not json at all")
    out = response_relevancy(
        [mi("Paris", ["x"], query="q")], llm=llm, embedding_model=emb
    )
    assert out[0] == 0.0


def test_model_backed_metrics_raise_cleanly():
    from autorag_research_tpu.evaluation.metrics.generation import bart_score_faithfulness
    from autorag_research_tpu.exceptions import ModelLoadError

    with pytest.raises(ModelLoadError):
        bart_score_faithfulness([mi("x", ["y"], contents=["ctx"])])


def test_response_relevancy_partial_parse_failure_no_nan():
    """One unparseable sample among strictness=3 yields question "" which can
    embed to a ZERO vector — the metric must degrade (that sample scores 0),
    not return NaN (regression: 0/0 in the cosine poisoned the average)."""
    import math

    from autorag_research_tpu.data.synthetic import BagOfTokensEmbedding

    emb = BagOfTokensEmbedding(dim=32)  # embeds "" to the zero vector
    calls = {"n": 0}

    def responder(p):
        calls["n"] += 1
        if calls["n"] == 2:
            return "totally not json"
        return '{"question": "what is the capital of france", "noncommittal": 0}'

    out = response_relevancy(
        [mi("Paris", ["x"], query="what is the capital of france")],
        llm=MockLLM(responder=responder),
        embedding_model=emb,
        strictness=3,
    )
    assert not math.isnan(out[0])
    # 2 of 3 samples match the query exactly, 1 contributes 0
    assert out[0] == pytest.approx(2.0 / 3.0, abs=1e-5)
