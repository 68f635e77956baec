"""RAS: plan -> iterative retrieve -> knowledge-triple graph -> answer.

Capability parity with the reference ``pipelines/generation/ras.py:202``:
an initial plan lists information needs; each round retrieves for the next
need, extracts (subject, relation, object) triples from the evidence into a
growing graph, and decides whether the graph suffices; the final answer is
generated from the accumulated triples.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from autorag_research_tpu.config import BasePipelineConfig
from autorag_research_tpu.pipelines.generation.base import BaseGenerationPipeline, GenerationResult
from autorag_research_tpu.schema import GENERATION_CONTEXT_CHUNK_ID_KEY
from autorag_research_tpu.utils.tokens import TokenUsageTracker

PLAN_PROMPT = (
    "List the pieces of information needed to answer the question, one per "
    "line (max {max_needs}).\n\nQuestion: {query}\nNeeds:"
)
TRIPLE_PROMPT = (
    "Extract factual knowledge triples from the passages as lines of the form "
    "(subject; relation; object). Only include facts relevant to: {need}\n\n"
    "Passages:\n{passages}\n\nTriples:"
)
SUFFICIENT_PROMPT = (
    "Given the knowledge graph, can the question be answered? Reply Yes or No.\n\n"
    "Question: {query}\nGraph:\n{graph}\nReply:"
)
ANSWER_PROMPT = (
    "Answer the question from the knowledge graph triples.\n\nGraph:\n{graph}\n\n"
    "Question: {query}\nAnswer:"
)

_TRIPLE_RE = re.compile(r"\(([^;()]+);([^;()]+);([^;()]+)\)")


class RASPipeline(BaseGenerationPipeline):
    def __init__(
        self,
        catalog,
        name: str = "ras",
        retrieval_pipeline=None,
        llm=None,
        max_needs: int = 3,
        per_need_k: int = 3,
    ):
        self.max_needs = max_needs
        self.per_need_k = per_need_k
        super().__init__(catalog, name, retrieval_pipeline, llm)

    def _get_pipeline_config(self) -> dict[str, Any]:
        return {"type": "ras", "max_needs": self.max_needs}

    async def _generate(self, query_id, top_k) -> GenerationResult:
        query = self.get_query_text(query_id)
        tracker = TokenUsageTracker()
        response = await self.llm.agenerate(
            PLAN_PROMPT.format(query=query, max_needs=self.max_needs)
        )
        tracker.record(response)
        needs = [n.strip("-• \t") for n in response.text.splitlines() if n.strip()][: self.max_needs]
        triples: list[tuple[str, str, str]] = []
        evidence: dict[Any, float] = {}

        def graph_text():
            return "\n".join(f"({s}; {r}; {o})" for s, r, o in triples) or "(empty)"

        for need in needs or [query]:
            hits = await self.retrieval_pipeline._retrieve_by_text(need, self.per_need_k)
            for h in hits:
                evidence[h["doc_id"]] = max(evidence.get(h["doc_id"], -1e30), float(h["score"]))
            passages = "\n".join(self.get_chunk_contents([h["doc_id"] for h in hits]))
            response = await self.llm.agenerate(
                TRIPLE_PROMPT.format(need=need, passages=passages)
            )
            tracker.record(response)
            for m in _TRIPLE_RE.finditer(response.text):
                triple = tuple(part.strip() for part in m.groups())
                if triple not in triples:
                    triples.append(triple)  # type: ignore[arg-type]
            response = await self.llm.agenerate(
                SUFFICIENT_PROMPT.format(query=query, graph=graph_text())
            )
            tracker.record(response)
            if response.text.strip().lower().startswith("yes"):
                break

        response = await self.llm.agenerate(
            ANSWER_PROMPT.format(graph=graph_text(), query=query)
        )
        tracker.record(response)
        final_ids = sorted(evidence, key=lambda d: -evidence[d])[:top_k]
        return GenerationResult(
            text=response.text.strip(),
            token_usage=tracker.total,
            metadata={
                GENERATION_CONTEXT_CHUNK_ID_KEY: final_ids,
                "plan": needs,
                "triples": [list(t) for t in triples],
            },
            retrieved=[{"doc_id": d, "score": evidence[d]} for d in final_ids],
        )


@dataclass(kw_only=True)
class RASConfig(BasePipelineConfig):
    config_type = "ras"
    kind = "generation"

    retrieval_pipeline_name: str
    llm: Any = None
    max_needs: int = 3
    per_need_k: int = 3

    def build(self, catalog, context):
        return RASPipeline(
            catalog,
            name=self.name,
            retrieval_pipeline=context.load_pipeline(self.retrieval_pipeline_name),
            llm=context.load_llm(self.llm),
            max_needs=self.max_needs,
            per_need_k=self.per_need_k,
        )
