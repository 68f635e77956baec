"""Adversarial edge cases for the agentic generation pipelines.

Covers the failure modes the happy-path suite (test_generation_agents.py)
leaves unexercised: malformed LLM output, empty retrieval, budget/turn
exhaustion, and loop-termination guarantees — the reference hardens these
paths with ~35k LoC of tests (SURVEY §4); this is the equivalent discipline
for rag_critic, interact_rag, hybrid_deep_searcher, search_r1 and friends.
"""

from __future__ import annotations

import pytest

from autorag_research_tpu.index import registry
from autorag_research_tpu.llm import MockLLM, ScriptedLLM
from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Pipeline
from autorag_research_tpu.store.catalog import Catalog
from autorag_research_tpu.utils.concurrency import run_async

DOCS = [
    "Paris is the capital of France.",
    "Berlin is the capital of Germany.",
    "The Seine river flows through Paris.",
    "Germany borders France to the east.",
]


@pytest.fixture
def acat(tmp_path):
    registry.invalidate()
    cat = Catalog(tmp_path / "edge.db")
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(DOCS)])
    cat.add_queries(
        [{"id": 0, "contents": "What is the capital of France?", "generation_gt": ["Paris"]}]
    )
    cat.add_retrieval_gt(0, 0)
    yield cat
    registry.invalidate()


@pytest.fixture
def bm25(acat):
    return BM25Pipeline(acat, "bm25_sub")


class NullRetrieval:
    """Retrieval pipeline stub that finds nothing (empty corpus regime)."""

    def __init__(self):
        self.calls: list[tuple[str, int]] = []

    async def _retrieve_by_text(self, text, top_k):
        self.calls.append((text, top_k))
        return []


class CountingRetrieval:
    """Records every (query, k) and returns one fixed hit."""

    def __init__(self, doc_id=0, score=1.0):
        self.calls: list[tuple[str, int]] = []
        self.doc_id = doc_id
        self.score = score

    async def _retrieve_by_text(self, text, top_k):
        self.calls.append((text, top_k))
        return [{"doc_id": self.doc_id, "score": self.score}]


def generate(pipeline, top_k=3):
    return run_async(pipeline._generate(0, top_k))


# =========================================================== RAG-Critic
def test_rag_critic_malformed_critic_output_terminates(acat, bm25):
    """Garbage critiques (no JSON at all / broken JSON) must not loop or crash."""
    from autorag_research_tpu.pipelines.generation.rag_critic import RAGCriticPipeline

    for garbage in ["utter nonsense with no braces", '{"verdict": "revise", busted', "{}"]:
        llm = ScriptedLLM(responses=["draft answer"])
        critic = ScriptedLLM(responses=[garbage] * 5)
        out = generate(
            RAGCriticPipeline(
                acat, f"rc_mal_{hash(garbage) % 1000}", retrieval_pipeline=bm25,
                llm=llm, critic_llm=critic, max_rounds=3,
            )
        )
        # unparseable critique -> no actions -> loop exits after one critique
        assert out.text == "draft answer"
        assert len(out.metadata["critiques"]) == 1
        assert len(critic.calls) == 1


def test_rag_critic_never_approving_critic_stops_at_max_rounds(acat, bm25):
    from autorag_research_tpu.pipelines.generation.rag_critic import RAGCriticPipeline

    revise = '{"verdict": "revise", "feedback": "bad", "recommended_actions": ["generate_answer"]}'
    llm = ScriptedLLM(responses=["draft"] + [f"revision {i}" for i in range(10)])
    critic = ScriptedLLM(responses=[revise] * 10)
    out = generate(
        RAGCriticPipeline(
            acat, "rc_loop", retrieval_pipeline=bm25, llm=llm, critic_llm=critic,
            max_rounds=3,
        )
    )
    assert len(out.metadata["critiques"]) == 3  # hard round budget
    assert len(critic.calls) == 3
    assert out.text == "revision 2"  # one regeneration per round


def test_rag_critic_unknown_actions_are_filtered(acat, bm25):
    from autorag_research_tpu.pipelines.generation.rag_critic import parse_critique

    c = parse_critique(
        '{"verdict": "revise", "recommended_actions": ["summon_demon", "RETRIEVAL", 42]}',
        "json_actions",
    )
    assert c["actions"] == ["retrieval"]  # unknown dropped, case-folded kept
    # revise with only-unknown actions falls back to generate_answer
    c2 = parse_critique(
        '{"verdict": "revise", "recommended_actions": ["summon_demon"]}', "json_actions"
    )
    assert c2["actions"] == ["generate_answer"]


def test_rag_critic_tags_unknown_tag_falls_back_to_regenerate(acat, bm25):
    from autorag_research_tpu.pipelines.generation.rag_critic import parse_critique

    c = parse_critique(
        '{"Judgement": "Error", "Error_analysis": "x", "tag2": ["not a real tag"]}',
        "rag_critic_tags",
    )
    assert c["approved"] is False
    assert c["actions"] == ["generate_answer"]
    # tag2 given as a bare string instead of a list
    c2 = parse_critique(
        '{"Judgement": "Error", "tag2": "relevance gaps in retrieval"}',
        "rag_critic_tags",
    )
    assert c2["actions"] == ["retrieval"]


def test_rag_critic_refine_with_no_numbers_keeps_evidence(acat, bm25):
    """refine_documents reply without digits must never empty the working set."""
    from autorag_research_tpu.pipelines.generation.rag_critic import RAGCriticPipeline

    revise = '{"verdict": "revise", "feedback": "junk", "recommended_actions": ["refine_documents"]}'
    approved = '{"verdict": "approved"}'
    llm = ScriptedLLM(responses=["draft", "none of them seem useful", "better answer"])
    critic = ScriptedLLM(responses=[revise, approved])
    out = generate(
        RAGCriticPipeline(
            acat, "rc_refine", retrieval_pipeline=bm25, llm=llm, critic_llm=critic,
        )
    )
    assert out.metadata["context_chunk_ids"]  # evidence survived
    assert out.text == "better answer"


def test_rag_critic_empty_retrieval_still_answers(acat):
    from autorag_research_tpu.pipelines.generation.rag_critic import RAGCriticPipeline

    null = NullRetrieval()
    llm = ScriptedLLM(responses=["best-effort answer"])
    critic = ScriptedLLM(responses=['{"verdict": "approved"}'])
    out = generate(
        RAGCriticPipeline(acat, "rc_empty", retrieval_pipeline=null, llm=llm, critic_llm=critic)
    )
    assert out.text == "best-effort answer"
    assert out.metadata["context_chunk_ids"] == []
    assert out.retrieved == []


# =========================================================== Search-R1
def test_search_r1_unclosed_tags_budget_fallback(acat, bm25):
    from autorag_research_tpu.pipelines.generation.search_r1 import SearchR1Pipeline

    llm = ScriptedLLM(
        responses=["<think>...</think> <answer>Paris", "<search>capital", "no tags at all",
                   "fallback: Paris"]
    )
    out = generate(
        SearchR1Pipeline(acat, "sr1_unclosed", retrieval_pipeline=bm25, llm=llm, max_actions=3)
    )
    assert out.text == "fallback: Paris"
    assert out.metadata["terminated_by"] == "budget_exhausted_fallback"
    assert len(llm.calls) == 4  # 3 budgeted steps + final fallback prompt


def test_search_r1_answer_after_search_in_same_segment_is_dropped(acat, bm25):
    """Only the earliest completed action of a segment may execute."""
    from autorag_research_tpu.pipelines.generation.search_r1 import SearchR1Pipeline

    llm = ScriptedLLM(
        responses=[
            "<search>capital of France</search><answer>premature</answer>",
            "<answer>Paris</answer>",
        ]
    )
    out = generate(
        SearchR1Pipeline(acat, "sr1_order", retrieval_pipeline=bm25, llm=llm, max_actions=4)
    )
    assert out.text == "Paris"  # NOT "premature"
    assert out.metadata["terminated_by"] == "answer"
    assert "<information>" in out.metadata["rollout"]  # the search did run


def test_search_r1_answer_before_search_skips_retrieval(acat):
    from autorag_research_tpu.pipelines.generation.search_r1 import SearchR1Pipeline

    counting = CountingRetrieval()
    llm = ScriptedLLM(responses=["<answer>Paris</answer><search>never runs</search>"])
    out = generate(
        SearchR1Pipeline(acat, "sr1_ans_first", retrieval_pipeline=counting, llm=llm)
    )
    assert out.text == "Paris"
    assert counting.calls == []  # truncation removed the trailing search


def test_search_r1_empty_retrieval_injects_empty_information(acat):
    from autorag_research_tpu.pipelines.generation.search_r1 import SearchR1Pipeline

    null = NullRetrieval()
    llm = ScriptedLLM(
        responses=["<search>anything</search>", "<answer>unknown</answer>"]
    )
    out = generate(SearchR1Pipeline(acat, "sr1_empty", retrieval_pipeline=null, llm=llm))
    assert out.text == "unknown"
    assert out.metadata["context_chunk_ids"] == []
    assert "<information>" in out.metadata["rollout"]


# =================================================== HybridDeepSearcher
def test_hds_search_budget_caps_parallel_queries(acat, bm25):
    from autorag_research_tpu.pipelines.generation.hybrid_deep_searcher import (
        HybridDeepSearcherPipeline,
    )

    three_searches = (
        "<search>capital France</search><search>Paris Seine</search>"
        "<search>Germany border</search>"
    )
    llm = ScriptedLLM(responses=[three_searches, three_searches, "final: Paris"])
    out = generate(
        HybridDeepSearcherPipeline(
            acat, "hds_budget", retrieval_pipeline=bm25, llm=llm,
            max_turns=5, search_budget=4,
        )
    )
    # turn 1 spends 3; turn 2 is capped to the remaining 1, hits the budget,
    # and the loop breaks into the fallback answer prompt
    assert out.metadata["searches_used"] == 4
    assert out.text == "final: Paris"
    assert len(llm.calls) == 3


def test_hds_no_action_turns_terminate_at_max_turns(acat, bm25):
    from autorag_research_tpu.pipelines.generation.hybrid_deep_searcher import (
        HybridDeepSearcherPipeline,
    )

    llm = ScriptedLLM(responses=["rambling", "more rambling", "final answer"])
    out = generate(
        HybridDeepSearcherPipeline(
            acat, "hds_noact", retrieval_pipeline=bm25, llm=llm, max_turns=2,
        )
    )
    assert out.text == "final answer"
    assert out.metadata["searches_used"] == 0
    assert sum("(no action)" in line for line in out.metadata["interaction_log"]) == 2


def test_hds_empty_token_block_is_no_action(acat, bm25):
    from autorag_research_tpu.pipelines.generation.hybrid_deep_searcher import (
        parse_hds_action,
    )

    final, searches = parse_hds_action(
        "<|begin search queries|> ; ;\n <|end search queries|>", max_queries=8
    )
    assert final is None and searches == []
    # budget already exhausted -> zero queries even when the model emits some
    final, searches = parse_hds_action("<search>q1</search>", max_queries=0)
    assert final is None and searches == []


def test_hds_boxed_answer_first_turn_skips_all_search(acat):
    from autorag_research_tpu.pipelines.generation.hybrid_deep_searcher import (
        HybridDeepSearcherPipeline,
    )

    counting = CountingRetrieval()
    llm = ScriptedLLM(responses=[r"reasoning... \boxed{Paris}"])
    out = generate(
        HybridDeepSearcherPipeline(acat, "hds_boxed", retrieval_pipeline=counting, llm=llm)
    )
    assert out.text == "Paris"
    assert counting.calls == []
    assert out.metadata["searches_used"] == 0


# ========================================================= InteractRAG
def test_interact_rag_unparseable_commands_fall_back(acat, bm25):
    from autorag_research_tpu.pipelines.generation.interact_rag import InteractRAGPipeline

    llm = ScriptedLLM(
        responses=["I think we should search", "fetch(paris", "final fallback answer"]
    )
    out = generate(
        InteractRAGPipeline(acat, "ir_unparsed", retrieval_pipeline=bm25, llm=llm, max_turns=2)
    )
    assert out.text == "final fallback answer"
    assert all(line.startswith("unparsed:") for line in out.metadata["interaction_log"])
    assert out.metadata["context_chunk_ids"] == []


def test_interact_rag_scale_clamps_and_ignores_garbage(acat):
    from autorag_research_tpu.pipelines.generation.interact_rag import InteractRAGPipeline

    counting = CountingRetrieval(doc_id=0)
    llm = ScriptedLLM(
        responses=["scale(9999)", "dense(capital)", "scale(no digits here)",
                   "dense(again)", "answer(done)"]
    )
    out = generate(
        InteractRAGPipeline(
            acat, "ir_scale", retrieval_pipeline=counting, llm=llm,
            max_turns=5, max_scale=7,
        )
    )
    assert out.text == "done"
    ks = [k for _, k in counting.calls]
    assert ks == [7, 7]  # clamped to max_scale; garbage scale left k unchanged


def test_interact_rag_include_filters_working_set_by_substring(acat, bm25):
    from autorag_research_tpu.pipelines.generation.interact_rag import InteractRAGPipeline

    llm = ScriptedLLM(
        responses=["sparse(capital)", "include(Germany)", "answer(Berlin)"]
    )
    out = generate(
        InteractRAGPipeline(acat, "ir_incl", retrieval_pipeline=bm25, llm=llm, max_turns=4),
        top_k=4,
    )
    assert out.text == "Berlin"
    kept = out.metadata["context_chunk_ids"]
    texts = acat.get_chunk_contents(kept)
    assert kept and all("Germany" in texts[d] for d in kept)


def test_interact_rag_exclude_unknown_term_keeps_everything(acat, bm25):
    from autorag_research_tpu.pipelines.generation.interact_rag import InteractRAGPipeline

    llm = ScriptedLLM(responses=["sparse(capital)", "exclude(zebra)", "answer(ok)"])
    out = generate(
        InteractRAGPipeline(acat, "ir_excl", retrieval_pipeline=bm25, llm=llm, max_turns=4),
        top_k=4,
    )
    assert out.text == "ok"
    assert out.metadata["context_chunk_ids"]  # nothing contained 'zebra' -> all kept


def test_interact_rag_entity_without_matches_is_noop(acat, bm25):
    from autorag_research_tpu.pipelines.generation.interact_rag import InteractRAGPipeline

    llm = ScriptedLLM(responses=["entity(xylophone)", "answer(nothing found)"])
    out = generate(
        InteractRAGPipeline(acat, "ir_ent", retrieval_pipeline=bm25, llm=llm, max_turns=3)
    )
    assert out.text == "nothing found"
    assert out.metadata["context_chunk_ids"] == []


# ==================================================== other agentic loops
def test_ircot_empty_retrieval_still_terminates(acat):
    from autorag_research_tpu.pipelines.generation.ircot import IRCoTPipeline

    null = NullRetrieval()
    llm = ScriptedLLM(responses=["thinking", "thinking more", "Paris (from memory)"])
    out = generate(IRCoTPipeline(acat, "ircot_empty", retrieval_pipeline=null, llm=llm, max_steps=2))
    assert out.text
    assert out.metadata["context_chunk_ids"] == []


def test_deep_rag_malformed_decision_terminates(acat, bm25):
    from autorag_research_tpu.pipelines.generation.deep_rag import DeepRAGPipeline

    llm = ScriptedLLM(
        responses=["completely unstructured rambling"] * 5 + ["final answer"]
    )
    out = generate(
        DeepRAGPipeline(acat, "dr_mal", retrieval_pipeline=bm25, llm=llm, max_steps=3)
    )
    assert out.text  # never hangs, always produces an answer


def test_ras_malformed_plan_and_triples(acat, bm25):
    from autorag_research_tpu.pipelines.generation.ras import parse_plan_action, parse_triples

    # plan output with no recognizable action tokens -> explicit invalid kind,
    # which the loop degrades to retrieving on the main question
    action, arg = parse_plan_action("no tokens here at all")
    assert (action, arg) == ("invalid", "")
    assert parse_triples("not a triple; (lonely") == []
    assert parse_triples("(a; b)") == []  # 2-field garbage is not a triple

    # and the full loop with an always-invalid planner still terminates
    from autorag_research_tpu.pipelines.generation.ras import RASPipeline

    llm = ScriptedLLM(responses=["gibberish plan", "<none/>"] * 3 + ["graph answer"])
    out = generate(
        RASPipeline(acat, "ras_mal", retrieval_pipeline=bm25, llm=llm, max_iterations=3)
    )
    assert out.text == "graph answer"
    assert out.metadata["context_chunk_ids"]  # degraded subquery still retrieved


def test_et2rag_all_votes_distinct_falls_back_deterministically(acat, bm25):
    """No majority: every subset answers differently -> a defined winner, no crash."""
    from autorag_research_tpu.pipelines.generation.et2rag import ET2RAGPipeline

    llm = ScriptedLLM(
        responses=[f"unique answer {i}" for i in range(12)]
    )
    out = generate(
        ET2RAGPipeline(acat, "et2_split", retrieval_pipeline=bm25, llm=llm, num_subsets=3)
    )
    assert out.text.startswith("unique answer")


def test_rag_critic_incorrect_judgement_is_not_approved(acat, bm25):
    """Reference semantics (rag_critic.py:682-704): only an explicit
    'Correct' judgement approves — 'Incorrect' (or unparseable prose) must
    revise, not silently approve the flagged answer (regression)."""
    from autorag_research_tpu.pipelines.generation.rag_critic import RAGCriticPipeline

    llm = ScriptedLLM(responses=[
        "draft answer",
        '{"Judgement": "Incorrect", "Error_analysis": "contradicts passage"}',
        "revised answer",  # regenerate action consumes this
        '{"Judgement": "Correct"}',
    ])
    pipe = RAGCriticPipeline(
        acat, "critic_incorrect", retrieval_pipeline=bm25, llm=llm,
        critic_output_format="rag_critic_tags", max_rounds=3,
    )
    out = generate(pipe)
    assert out.text == "revised answer"
    history = out.metadata["critiques"]
    assert history[0]["approved"] is False
    assert "contradicts passage" in history[0]["feedback"]


def test_autothinkrag_simple_tier_sends_images(acat):
    """Image evidence must reach the LLM on the simple/moderate tiers via a
    visual-interpretation call (reference runs it for EVERY tier) — not as
    '(image chunk N)' placeholder text (regression)."""
    from autorag_research_tpu.llm import LLMResult
    from autorag_research_tpu.pipelines.generation.autothinkrag import (
        AutoThinkRAGPipeline,
    )

    class FakeImagePipeline:
        retrieval_unit = "image_chunk"

        async def _retrieve_by_id(self, qid, k):
            return [{"doc_id": "img1", "score": 1.0}]

    acat.add_image_chunks([{"id": "img1", "image": b"\x89PNG-bytes", "mimetype": "image/png"}])
    seen = {"images": None}

    class VLM(MockLLM):
        async def agenerate(self, prompt, images=None, **kw):
            if images is not None:
                seen["images"] = images
                return LLMResult(text="a chart of capitals")
            if "simple" in prompt or "complexity" in prompt.lower():
                return LLMResult(text="simple")
            return LLMResult(text="Paris")

    pipe = AutoThinkRAGPipeline(
        acat, "atr_img", retrieval_pipeline=FakeImagePipeline(), llm=VLM()
    )
    out = generate(pipe)
    assert out.metadata["complexity"] == "simple"
    assert seen["images"] == [b"\x89PNG-bytes"]  # the bytes reached the LLM
    assert out.text == "Paris"


def test_basic_rag_batched_length_mismatch_fails_fast(acat, bm25):
    from autorag_research_tpu.pipelines.generation.basic_rag import BasicRAGPipeline

    class ShortBatchLLM(MockLLM):
        def generate_batch(self, prompts):
            return ["only one"]  # fewer than prompts

    pipe = BasicRAGPipeline(acat, "rag_short", retrieval_pipeline=bm25, llm=ShortBatchLLM())
    with pytest.raises(RuntimeError, match="returned 1 results for 2"):
        pipe.generate_batch_by_texts(["q one", "q two"], top_k=2)


def test_select_top_evidence_breaks_ties_by_doc_id():
    from autorag_research_tpu.pipelines.generation.base import select_top_evidence

    # insertion order deliberately reversed vs id order on the tied scores
    evidence = {"z9": 0.5, "a1": 0.5, "m5": 0.9}
    assert select_top_evidence(evidence, 3) == ["m5", "a1", "z9"]
    assert select_top_evidence(evidence, 2) == ["m5", "a1"]
