"""All 17 generation pipelines driven with scripted/mocked LLMs."""

import pytest

from autorag_research_tpu.embeddings import MockEmbedding
from autorag_research_tpu.index import registry
from autorag_research_tpu.llm import LLMResult, MockLLM, ScriptedLLM
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
    cat = Catalog(tmp_path / "a.db")
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(DOCS)])
    cat.add_queries([{"id": 0, "contents": "What is the capital of France?",
                      "generation_gt": ["Paris"]}])
    cat.add_retrieval_gt(0, 0)
    yield cat
    registry.invalidate()


@pytest.fixture
def bm25(acat):
    return BM25Pipeline(acat, "bm25_sub")


def generate(pipeline, top_k=3):
    return run_async(pipeline._generate(0, top_k))


def test_ircot_terminates_on_answer(acat, bm25):
    from autorag_research_tpu.pipelines.generation.ircot import IRCoTPipeline

    llm = ScriptedLLM(
        responses=["The question asks about France's capital.", "answer is: Paris"]
    )
    out = generate(IRCoTPipeline(acat, retrieval_pipeline=bm25, llm=llm, max_steps=4))
    assert out.text == "Paris"
    assert out.metadata["steps"] == 2
    assert out.metadata["context_chunk_ids"]


def test_ircot_budget_fallback(acat, bm25):
    from autorag_research_tpu.pipelines.generation.ircot import IRCoTPipeline

    llm = ScriptedLLM(responses=["thinking...", "still thinking...", "Paris"])
    out = generate(IRCoTPipeline(acat, "ircot2", retrieval_pipeline=bm25, llm=llm, max_steps=2))
    assert out.text == "Paris"  # QA fallback prompt consumed the last response


def test_search_r1_protocol(acat, bm25):
    from autorag_research_tpu.pipelines.generation.search_r1 import SearchR1Pipeline

    llm = ScriptedLLM(
        responses=[
            "<think>need info</think><search>capital of France</search>trailing junk",
            "<think>got it</think><answer>Paris</answer>",
        ]
    )
    out = generate(SearchR1Pipeline(acat, retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert out.metadata["terminated_by"] == "answer"
    assert "<information>" in out.metadata["rollout"]
    assert "trailing junk" not in out.metadata["rollout"]  # truncated at action


def test_search_r1_budget_fallback(acat, bm25):
    from autorag_research_tpu.pipelines.generation.search_r1 import SearchR1Pipeline

    llm = ScriptedLLM(
        responses=["<search>France</search>", "<search>capital</search>", "Paris"]
    )
    out = generate(SearchR1Pipeline(acat, "sr2", retrieval_pipeline=bm25, llm=llm, max_actions=2))
    assert out.text == "Paris"
    assert out.metadata["terminated_by"] == "budget_exhausted_fallback"


def test_self_rag_loop(acat, bm25):
    from autorag_research_tpu.pipelines.generation.self_rag import SelfRAGPipeline

    llm = ScriptedLLM(
        responses=[
            "Maybe Lyon",  # initial
            '{"should_retrieve": true, "is_supported": false, "retrieval_query": "capital of France", "critique": "unsupported"}',
            "Paris",  # revision
            '{"should_retrieve": false, "is_supported": true, "retrieval_query": "", "critique": "ok"}',
        ]
    )
    out = generate(SelfRAGPipeline(acat, retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert len(out.metadata["critiques"]) == 2


def test_adaptive_rag_routes(acat, bm25):
    from autorag_research_tpu.pipelines.generation.adaptive_rag import AdaptiveRAGPipeline

    # zero route
    llm = ScriptedLLM(responses=["simple", "Paris"])
    out = generate(AdaptiveRAGPipeline(acat, "ar0", retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris" and out.metadata["route"] == "zero"
    assert out.metadata["context_chunk_ids"] == []
    # single route
    llm = ScriptedLLM(responses=["moderate", "Paris"])
    out = generate(AdaptiveRAGPipeline(acat, "ar1", retrieval_pipeline=bm25, llm=llm))
    assert out.metadata["route"] == "single" and out.metadata["context_chunk_ids"]
    # multi route with early answer (case preserved)
    llm = ScriptedLLM(responses=["complex", "answer is: Paris"])
    out = generate(AdaptiveRAGPipeline(acat, "ar2", retrieval_pipeline=bm25, llm=llm))
    assert out.metadata["route"] == "multi" and out.text == "Paris"


def test_question_decomposition_gen(acat, bm25):
    from autorag_research_tpu.pipelines.generation.question_decomposition import (
        QuestionDecompositionGenerationPipeline,
    )

    llm = ScriptedLLM(responses=["Which country?\nWhat is its capital?", "Paris"])
    out = generate(
        QuestionDecompositionGenerationPipeline(acat, retrieval_pipeline=bm25, llm=llm)
    )
    assert out.text == "Paris"
    assert len(out.metadata["subquestions"]) == 2


def test_dynamic_rag_selection(acat, bm25):
    from autorag_research_tpu.pipelines.generation.dynamic_rag import DynamicRAGPipeline

    llm = ScriptedLLM(responses=["1, 2", "Paris"])
    out = generate(DynamicRAGPipeline(acat, retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert len(out.metadata["selected_chunk_ids"]) == 2


def test_dynamic_rag_empty_selection(acat, bm25):
    from autorag_research_tpu.pipelines.generation.dynamic_rag import DynamicRAGPipeline

    llm = ScriptedLLM(responses=["none", "Paris from memory"])
    out = generate(DynamicRAGPipeline(acat, "dr2", retrieval_pipeline=bm25, llm=llm))
    assert out.metadata["selected_chunk_ids"] == []


def test_dynamic_rag_mid_text_none_keeps_selection(acat, bm25):
    """Reference semantics (rerankers/dynamic_rag.py:74-91): only a LEADING
    'None' is a zero-doc decision; digits survive a mid-sentence 'none'."""
    from autorag_research_tpu.pipelines.generation.dynamic_rag import DynamicRAGPipeline

    llm = ScriptedLLM(responses=["1, 2 are useful; none of the others help.", "Paris"])
    out = generate(DynamicRAGPipeline(acat, "dr3", retrieval_pipeline=bm25, llm=llm))
    assert len(out.metadata["selected_chunk_ids"]) == 2
    # leading None with illustrative digits stays a zero-doc decision
    llm = ScriptedLLM(responses=["None of the documents 1, 2 are useful.", "memory"])
    out = generate(DynamicRAGPipeline(acat, "dr4", retrieval_pipeline=bm25, llm=llm))
    assert out.metadata["selected_chunk_ids"] == []


def test_et2rag_majority_vote(acat, bm25):
    """String-vote fallback (no embedding model): partial answers vote, the
    winning subset generates the FULL answer (reference's two-phase flow)."""
    from autorag_research_tpu.pipelines.generation.et2rag import ET2RAGPipeline

    calls = []

    def responder(prompt):
        calls.append(prompt)
        if "Be complete" in prompt:  # the FULL prompt
            return "Paris is the capital of France."
        return ["Paris", "Paris!", "Lyon", "paris", "Lyon"][len(calls) - 1]

    llm = MockLLM(responder=responder)
    pipe = ET2RAGPipeline(
        acat, retrieval_pipeline=bm25, llm=llm,
        organization_strategy="random", num_subsets=5, seed=42,
    )
    out = generate(pipe)
    assert "paris" in out.text.lower()
    assert out.metadata["votes"]["paris"] == 3
    assert out.metadata["num_subsets"] == 5
    assert out.metadata["selected_subset_index"] == 0  # first 'Paris' answer
    assert sum("Be complete" in c for c in calls) == 1  # exactly one FULL call


def test_et2rag_subset_schedules():
    """Reference organization strategies (qa/recipe/image schedules)."""
    import random

    from autorag_research_tpu.pipelines.generation.et2rag import make_subsets

    docs = [(i, f"doc {i}") for i in range(8)]
    rng = random.Random(0)
    qa = make_subsets(docs, "qa", 4, None, rng)
    assert qa[0] == [docs[0]]
    assert qa[1] == [docs[0], docs[1]] and qa[3] == [docs[0], docs[3]]
    recipe = make_subsets(docs, "recipe", 3, None, rng)
    assert recipe == [[docs[0]], [docs[1]], [docs[2]]]
    image = make_subsets(docs, "image", 3, None, rng)
    # pairs P0={0,1}, P1={2,3}, ... subsets = two-pair combos
    assert image[0] == [docs[0], docs[1], docs[2], docs[3]]
    assert len(image) == 3
    assert make_subsets([], "qa", 5, None, rng) == []


def test_et2rag_embedding_vote(acat, bm25):
    """Semantic-consistency vote: the odd answer out must lose even when
    string counts tie."""
    from autorag_research_tpu.embeddings.base import MockEmbedding
    from autorag_research_tpu.pipelines.generation.et2rag import ET2RAGPipeline

    calls = []

    def responder(prompt):
        calls.append(prompt)
        if "Be complete" in prompt:
            return "final answer"
        # two identical answers + one different: embedding vote picks 'Paris'
        return ["Paris", "Paris", "Lyon"][len(calls) - 1]

    pipe = ET2RAGPipeline(
        acat, retrieval_pipeline=bm25, llm=MockLLM(responder=responder),
        embedding_model=MockEmbedding(dim=32),
        organization_strategy="recipe", num_subsets=3,
    )
    out = generate(pipe)
    assert out.metadata["selected_subset_index"] in (0, 1)  # a 'Paris' subset
    assert out.text == "final answer"


def test_spd_rag_aggregates(acat, bm25):
    """Three-role protocol: sub-agent per doc -> coordinator Yes/No ->
    synthesis; the Berlin doc is filtered by the sub-agent, and a useless
    partial is filtered by the coordinator."""
    from autorag_research_tpu.pipelines.generation.spd_rag import SPDRAGPipeline

    def responder(prompt):
        if "Finding:" in prompt:  # sub-agent
            if "Berlin" in prompt:
                return "IRRELEVANT"
            if "Seine" in prompt:
                return "Talks about a river only"
            return "Mentions Paris as capital"
        if "Partial answer:" in prompt:  # coordinator
            return "No" if "river" in prompt else "Yes"
        return "Paris"  # synthesis

    out = generate(SPDRAGPipeline(acat, retrieval_pipeline=bm25, llm=MockLLM(responder=responder)))
    assert out.text == "Paris"
    assert 1 not in out.metadata["context_chunk_ids"]  # Berlin doc: sub-agent filter
    assert 2 not in out.metadata["context_chunk_ids"]  # river doc: coordinator filter
    assert 0 in out.metadata["context_chunk_ids"]


def test_deep_rag_trace(acat, bm25):
    from autorag_research_tpu.pipelines.generation.deep_rag import DeepRAGPipeline

    llm = ScriptedLLM(
        responses=[
            '{"action": "subquery", "subquery": "capital of France", "use_retrieval": true}',
            "Paris",  # sub-answer
            '{"action": "terminate", "final_answer": "Paris"}',
        ]
    )
    out = generate(DeepRAGPipeline(acat, retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert "[retrieval]" in out.metadata["trace"][0]


def test_main_rag_filters(acat, bm25):
    from autorag_research_tpu.pipelines.generation.main_rag import MainRAGPipeline

    def responder(prompt):
        if "Reply:" in prompt:
            return "Yes" if "France" in prompt or "Paris" in prompt else "No"
        return "Paris"

    out = generate(
        MainRAGPipeline(acat, retrieval_pipeline=bm25, llm=MockLLM(responder=responder), tau=0.0)
    )
    assert out.text == "Paris"
    assert out.metadata["filter_scores"]


def test_rag_critic_corrective_loop(acat, bm25):
    """json_actions critic: revise -> regenerate -> approved."""
    from autorag_research_tpu.pipelines.generation.rag_critic import RAGCriticPipeline

    llm = ScriptedLLM(
        responses=[
            "Lyon",  # draft
            '{"verdict": "revise", "feedback": "Lyon is wrong", '
            '"recommended_actions": ["generate_answer"]}',
            "Paris",  # regeneration
            '{"verdict": "approved", "feedback": "", "recommended_actions": []}',
        ]
    )
    out = generate(RAGCriticPipeline(acat, retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert out.metadata["critiques"][0]["actions"] == ["generate_answer"]
    assert out.metadata["critiques"][1]["approved"] is True


def test_rag_critic_rewrite_action_changes_search_query(acat, bm25):
    from autorag_research_tpu.pipelines.generation.rag_critic import RAGCriticPipeline

    llm = ScriptedLLM(
        responses=[
            "vague",  # draft
            '{"verdict": "revise", "feedback": "bad evidence", '
            '"recommended_actions": ["rewrite_query"]}',
            "capital of France",  # rewritten search query
            "Paris",  # regeneration
            '{"verdict": "approved"}',
        ]
    )
    out = generate(RAGCriticPipeline(acat, retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert out.metadata["final_search_query"] == "capital of France"


def test_rag_critic_trained_tag_taxonomy(acat, bm25):
    """rag_critic_tags format: tag2 values map to the reference action set."""
    from autorag_research_tpu.pipelines.generation.rag_critic import (
        RAGCriticPipeline,
        parse_critique,
    )

    c = parse_critique(
        '{"Judgement": "Error", "Error_analysis": "missed entity", '
        '"tag2": ["Entity and Concept Confusion"]}',
        "rag_critic_tags",
    )
    assert c["actions"] == ["rewrite_query", "decompose_query"]
    assert parse_critique('{"Judgement": "Correct"}', "rag_critic_tags")["approved"]

    llm = ScriptedLLM(
        responses=[
            "Lyon",  # draft
            '{"Judgement": "Error", "Error_analysis": "wrong fact", '
            '"tag2": ["Factual Inaccuracies"]}',
            "Paris",  # regeneration (generate_answer action)
            '{"Judgement": "Correct"}',
        ]
    )
    out = generate(
        RAGCriticPipeline(
            acat, retrieval_pipeline=bm25, llm=llm,
            critic_output_format="rag_critic_tags",
        )
    )
    assert out.text == "Paris"
    assert out.metadata["critiques"][0]["actions"] == ["generate_answer"]


def test_interact_rag_commands(acat, bm25):
    from autorag_research_tpu.pipelines.generation.interact_rag import InteractRAGPipeline

    llm = ScriptedLLM(
        responses=[
            "sparse(capital of France)",
            "include(Paris)",
            "answer(Paris)",
        ]
    )
    out = generate(
        InteractRAGPipeline(acat, retrieval_pipeline=bm25, sparse_retrieval_pipeline=bm25, llm=llm)
    )
    assert out.text == "Paris"
    assert out.metadata["interaction_log"][0].startswith("sparse")
    # include(Paris) filtered to docs mentioning Paris
    assert set(out.metadata["context_chunk_ids"]) <= {0, 2}


def test_hybrid_deep_searcher_parallel(acat, bm25):
    from autorag_research_tpu.pipelines.generation.hybrid_deep_searcher import (
        HybridDeepSearcherPipeline,
    )

    llm = ScriptedLLM(
        responses=[
            "<search>capital France</search><search>Seine river</search>",
            "<answer>Paris</answer>",
        ]
    )
    out = generate(HybridDeepSearcherPipeline(acat, retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert out.metadata["searches_used"] == 2
    assert len(out.metadata["interaction_log"]) == 2


def test_ras_triples(acat, bm25):
    """Paper-protocol planner: [SUBQ] -> retrieve + extract -> [SUFFICIENT]."""
    from autorag_research_tpu.pipelines.generation.ras import RASPipeline

    llm = ScriptedLLM(
        responses=[
            "[SUBQ] capital of France",  # plan round 1
            "<triple>Paris | is capital of | France</triple>",  # triples
            "[SUFFICIENT]",  # plan round 2
            "Paris",  # final from graph + history
        ]
    )
    out = generate(RASPipeline(acat, retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert out.metadata["triples"] == [["Paris", "is capital of", "France"]]
    assert out.metadata["subquery_history"][0].startswith("capital of France ->")


def test_ras_no_retrieval_first_action(acat, bm25):
    from autorag_research_tpu.pipelines.generation.ras import RASPipeline

    llm = ScriptedLLM(responses=["[NO_RETRIEVAL]", "Paris from memory"])
    out = generate(RASPipeline(acat, "ras_nr", retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris from memory"
    assert out.metadata["triples"] == []
    assert out.metadata["context_chunk_ids"] == []


def test_ras_plan_parsing():
    from autorag_research_tpu.pipelines.generation.ras import parse_plan_action, parse_triples

    assert parse_plan_action("[SUBQ] who founded Paris") == ("subquery", "who founded Paris")
    assert parse_plan_action("...[SUFFICIENT]") == ("sufficient", "")
    assert parse_plan_action("[NO_RETRIEVAL]") == ("no_retrieval", "")
    assert parse_plan_action("garbage")[0] == "invalid"
    # both triple formats accepted
    got = parse_triples("<triple>a | b | c</triple> and (x; y; z)")
    assert got == [("a", "b", "c"), ("x", "y", "z")]


def test_autothinkrag_routes(acat, bm25):
    from autorag_research_tpu.pipelines.generation.autothinkrag import AutoThinkRAGPipeline

    llm = ScriptedLLM(responses=["simple", "Paris"])
    out = generate(AutoThinkRAGPipeline(acat, retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris" and out.metadata["complexity"] == "simple"

    def responder(prompt):
        if "Item:" in prompt:  # perception phase
            return "Paris is the capital" if "Paris" in prompt else "NONE"
        if "Reasoning chain so far" in prompt:  # iterative reasoning
            if "(start)" in prompt:
                return "THOUGHT: the facts point to Paris"
            return "ANSWER: Paris"
        return "complex"

    out = generate(AutoThinkRAGPipeline(acat, "atr2", retrieval_pipeline=bm25, llm=MockLLM(responder=responder)))
    assert out.text == "Paris" and out.metadata["complexity"] == "complex"
    assert out.metadata["perceived_facts"]
    assert out.metadata["reasoning_chain"] == ["THOUGHT: the facts point to Paris"]

    # moderate tier: synthesis prompt
    llm = ScriptedLLM(responses=["moderate", "Synthesis: therefore Paris"])
    out = generate(AutoThinkRAGPipeline(acat, "atr3", retrieval_pipeline=bm25, llm=llm))
    assert out.metadata["complexity"] == "moderate"
    assert "Paris" in out.text


def test_visrag_gen_passes_images(tmp_path):
    from autorag_research_tpu.embeddings import MockEmbedding
    from autorag_research_tpu.pipelines.generation.visrag_gen import VisRAGGenerationPipeline
    from autorag_research_tpu.pipelines.retrieval.image_vector_search import (
        ImageVectorSearchPipeline,
    )

    registry.invalidate()
    emb = MockEmbedding(dim=16)
    cat = Catalog(tmp_path / "v.db", embedding_dim=16)
    imgs = [b"img-a", b"img-b"]
    cat.add_image_chunks(
        [{"id": i, "image": img, "mimetype": "image/png",
          "embedding": emb.embed_images([img])[0]} for i, img in enumerate(imgs)]
    )
    cat.add_queries([{"id": 0, "contents": "what is on page a"}])
    cat.set_embeddings("query", [(0, emb.embed_images([imgs[0]])[0])])

    received = {}

    class VLM(MockLLM):
        async def agenerate(self, prompt, **kwargs):
            received["images"] = kwargs.get("images")
            return LLMResult(text="The page shows A", token_usage={"total_tokens": 1})

    ivs = ImageVectorSearchPipeline(cat, "ivs_sub")
    pipe = VisRAGGenerationPipeline(cat, retrieval_pipeline=ivs, llm=VLM(), max_images=1)
    out = run_async(pipe._generate(0, 2))
    assert out.text == "The page shows A"
    assert received["images"] == [b"img-a"]
    registry.invalidate()


def test_interact_rag_weighted_fusion_and_id_controls(acat, bm25):
    """Reference primitives: weighted fusion (normalized weighted sum),
    include/exclude by chunk id, scale cap."""
    from autorag_research_tpu.pipelines.generation.interact_rag import (
        InteractRAGPipeline,
        _coerce_id,
        _parse_fusion_arg,
    )

    assert _parse_fusion_arg("capital, semantic=0.7, exact=0.3") == ("capital", 0.7, 0.3)
    assert _parse_fusion_arg("plain query") == ("plain query", 0.5, 0.5)
    assert _coerce_id("0", {}, acat) == 0          # corpus id
    assert _coerce_id("paris", {}, acat) is None   # term fallback

    llm = ScriptedLLM(
        responses=[
            "scale(500)",  # capped to max_scale
            "fusion(capital of France, semantic=0.8, exact=0.2)",
            "exclude(1)",  # drop the Berlin doc by id
            "answer(Paris)",
        ]
    )
    pipe = InteractRAGPipeline(
        acat, retrieval_pipeline=bm25, llm=llm, max_turns=6, max_scale=20
    )
    out = generate(pipe)
    assert out.text == "Paris"
    assert 1 not in out.metadata["context_chunk_ids"]
    assert any(log.startswith("fusion") for log in out.metadata["interaction_log"])


def test_interact_rag_entity_top3(acat, bm25):
    from autorag_research_tpu.pipelines.generation.interact_rag import InteractRAGPipeline

    llm = ScriptedLLM(responses=["entity(capital)", "answer(Paris)"])
    out = generate(InteractRAGPipeline(acat, "ir3", retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert 0 < len(out.metadata["context_chunk_ids"]) <= 3


def test_deep_rag_tag_protocol(acat, bm25):
    """Trained-controller tag protocol (reference parse_deeprag_action)."""
    from autorag_research_tpu.pipelines.generation.deep_rag import DeepRAGPipeline

    llm = ScriptedLLM(
        responses=[
            "<retrieve>capital of France</retrieve>",
            "Paris",  # intermediate answer (retrieval)
            "<parametric>is Paris in Europe</parametric>",
            "yes",  # intermediate answer (parametric)
            "<answer>Paris</answer>",
        ]
    )
    out = generate(DeepRAGPipeline(acat, "dr_tags", retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert "[retrieval]" in out.metadata["trace"][0]
    assert "[parametric]" in out.metadata["trace"][1]
    assert out.metadata["context_chunk_ids"]


def test_hds_paper_token_protocol(acat, bm25):
    """The trained-model protocol: <|begin search queries|> blocks with
    semicolon-separated queries, \\boxed{} answers."""
    from autorag_research_tpu.pipelines.generation.hybrid_deep_searcher import (
        HybridDeepSearcherPipeline,
        parse_hds_action,
    )

    final, qs = parse_hds_action(
        "thinking <|begin search queries|>capital of France; Seine river\n"
        "Germany borders<|end search queries|>", 8,
    )
    assert final is None
    assert qs == ["capital of France", "Seine river", "Germany borders"]
    final, qs = parse_hds_action(r"so the answer is \boxed{Paris}", 8)
    assert final == "Paris" and qs == []

    llm = ScriptedLLM(
        responses=[
            "<|begin search queries|>capital of France; river in Paris<|end search queries|>",
            r"\boxed{Paris}",
        ]
    )
    out = generate(HybridDeepSearcherPipeline(acat, "hds_tok", retrieval_pipeline=bm25, llm=llm))
    assert out.text == "Paris"
    assert out.metadata["searches_used"] == 2


def test_visrag_concatenate_mode(tmp_path):
    """concatenate mode merges pages into ONE composite for single-image VLMs
    (reference image_processing_mode)."""
    import io

    from PIL import Image

    from autorag_research_tpu.embeddings import MockEmbedding
    from autorag_research_tpu.pipelines.generation.visrag_gen import VisRAGGenerationPipeline
    from autorag_research_tpu.pipelines.retrieval.image_vector_search import (
        ImageVectorSearchPipeline,
    )
    from autorag_research_tpu.utils.images import concatenate_images

    def png(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), "red").save(buf, format="PNG")
        return buf.getvalue()

    # unit: composite dimensions
    combo = concatenate_images([png(10, 20), png(30, 15)], "horizontal")
    im = Image.open(io.BytesIO(combo))
    assert (im.width, im.height) == (40, 20)
    combo = concatenate_images([png(10, 20), png(30, 15)], "vertical")
    im = Image.open(io.BytesIO(combo))
    assert (im.width, im.height) == (30, 35)

    # pipeline: the VLM must receive exactly one image
    registry.invalidate()
    emb = MockEmbedding(dim=16)
    cat = Catalog(tmp_path / "vr.db", embedding_dim=16)
    imgs = [png(8, 8), png(8, 8)]
    cat.add_image_chunks(
        [{"id": i, "image": b, "mimetype": "image/png",
          "embedding": emb.embed_images([b])[0]} for i, b in enumerate(imgs)]
    )
    cat.add_queries([{"id": 0, "contents": "what is on the pages",
                      "embedding": emb.embed_images([imgs[0]])[0]}])
    seen = {}

    class VLM(MockLLM):
        async def agenerate(self, prompt, images=None, **kw):
            seen["n_images"] = len(images or [])
            return LLMResult(text="red pages")

    retr = ImageVectorSearchPipeline(cat, "ivs_cc", embedding_model=emb)
    pipe = VisRAGGenerationPipeline(
        cat, "vr_cc", retrieval_pipeline=retr, llm=VLM(),
        image_processing_mode="concatenate",
    )
    out = generate(pipe, top_k=2)
    assert out.text == "red pages"
    assert seen["n_images"] == 1
    registry.invalidate()
