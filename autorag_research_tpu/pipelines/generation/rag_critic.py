"""RAG-Critic: critic-guided corrective loop with an error taxonomy.

Capability parity with the reference ``pipelines/generation/rag_critic.py:376``:
draft an answer, then loop — a critic classifies the dominant error
(no_error / insufficient_evidence / unsupported_claim / wrong_focus /
incomplete_answer) and prescribes a fix action (accept / re-retrieve with a
refined query / revise the answer / decompose the question); the loop applies
the action until the critic accepts or the budget is exhausted.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Any

from autorag_research_tpu.config import BasePipelineConfig
from autorag_research_tpu.pipelines.generation.base import BaseGenerationPipeline, GenerationResult
from autorag_research_tpu.schema import GENERATION_CONTEXT_CHUNK_ID_KEY
from autorag_research_tpu.utils.tokens import TokenUsageTracker

ERROR_TYPES = (
    "no_error",
    "insufficient_evidence",
    "unsupported_claim",
    "wrong_focus",
    "incomplete_answer",
)

DRAFT_PROMPT = (
    "Answer the question using the context.\n\nContext:\n{context}\n\n"
    "Question: {query}\nAnswer:"
)

CRITIC_PROMPT = (
    "You are a RAG critic. Identify the dominant error in the answer.\n"
    "Error taxonomy: no_error, insufficient_evidence, unsupported_claim, "
    "wrong_focus, incomplete_answer.\n"
    "Return JSON only: {{\"error_type\": \"...\", \"fix_query\": \"...\", "
    "\"note\": \"...\"}}\n\n"
    "Question: {query}\nContext:\n{context}\nAnswer: {answer}\nCritique:"
)

REVISE_PROMPT = (
    "Revise the answer to fix this problem: {note}\n\nContext:\n{context}\n\n"
    "Question: {query}\nCurrent answer: {answer}\nRevised answer:"
)


def _parse_critique(text: str) -> dict:
    m = re.search(r"\{.*\}", text, re.DOTALL)
    if m:
        try:
            data = json.loads(m.group(0))
            if data.get("error_type") in ERROR_TYPES:
                return data
        except json.JSONDecodeError:
            pass
    lowered = text.lower()
    for et in ERROR_TYPES:
        if et in lowered:
            return {"error_type": et, "fix_query": "", "note": text.strip()[:200]}
    return {"error_type": "no_error", "fix_query": "", "note": ""}


class RAGCriticPipeline(BaseGenerationPipeline):
    def __init__(
        self,
        catalog,
        name: str = "rag_critic",
        retrieval_pipeline=None,
        llm=None,
        critic_llm=None,
        max_rounds: int = 3,
    ):
        self.critic_llm = critic_llm
        self.max_rounds = max_rounds
        super().__init__(catalog, name, retrieval_pipeline, llm)

    def _get_pipeline_config(self) -> dict[str, Any]:
        return {"type": "rag_critic", "max_rounds": self.max_rounds}

    async def _generate(self, query_id, top_k) -> GenerationResult:
        query = self.get_query_text(query_id)
        critic = self.critic_llm or self.llm
        tracker = TokenUsageTracker()
        evidence: dict[Any, float] = {}

        async def expand(q):
            for h in await self.retrieval_pipeline._retrieve_by_text(q, top_k):
                evidence[h["doc_id"]] = max(evidence.get(h["doc_id"], -1e30), float(h["score"]))

        await expand(query)

        def context():
            ids = sorted(evidence, key=lambda d: -evidence[d])[: top_k * 2]
            return "\n".join(self.get_chunk_contents(ids))

        response = await self.llm.agenerate(DRAFT_PROMPT.format(context=context(), query=query))
        tracker.record(response)
        answer = response.text.strip()
        history = []

        for _ in range(self.max_rounds):
            response = await critic.agenerate(
                CRITIC_PROMPT.format(query=query, context=context(), answer=answer)
            )
            tracker.record(response)
            critique = _parse_critique(response.text)
            history.append(critique)
            error = critique["error_type"]
            if error == "no_error":
                break
            if error in ("insufficient_evidence", "wrong_focus"):
                await expand(str(critique.get("fix_query") or query))
            response = await self.llm.agenerate(
                REVISE_PROMPT.format(
                    note=critique.get("note", error),
                    context=context(),
                    query=query,
                    answer=answer,
                )
            )
            tracker.record(response)
            answer = response.text.strip()

        final_ids = sorted(evidence, key=lambda d: -evidence[d])[:top_k]
        return GenerationResult(
            text=answer,
            token_usage=tracker.total,
            metadata={
                GENERATION_CONTEXT_CHUNK_ID_KEY: final_ids,
                "critiques": history,
            },
            retrieved=[{"doc_id": d, "score": evidence[d]} for d in final_ids],
        )


@dataclass(kw_only=True)
class RAGCriticConfig(BasePipelineConfig):
    config_type = "rag_critic"
    kind = "generation"

    retrieval_pipeline_name: str
    llm: Any = None
    critic_llm: Any = None
    max_rounds: int = 3

    def build(self, catalog, context):
        return RAGCriticPipeline(
            catalog,
            name=self.name,
            retrieval_pipeline=context.load_pipeline(self.retrieval_pipeline_name),
            llm=context.load_llm(self.llm),
            critic_llm=context.load_llm(self.critic_llm),
            max_rounds=self.max_rounds,
        )
