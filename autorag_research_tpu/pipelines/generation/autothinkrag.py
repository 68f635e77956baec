"""AutoThinkRAG: complexity router + perception/reasoning decomposition.

Capability parity with the reference ``pipelines/generation/autothinkrag.py:147``
(multimodal-capable): simple queries answer directly from retrieved context;
complex queries run a two-phase loop — *perception* (extract query-relevant
facts from each retrieved item, including image chunks via a vision-capable
LLM) then *reasoning* (compose the answer from the perceived facts).
"""

from __future__ import annotations

import asyncio
from dataclasses import dataclass
from typing import Any

from autorag_research_tpu.config import BasePipelineConfig
from autorag_research_tpu.pipelines.generation.base import BaseGenerationPipeline, GenerationResult
from autorag_research_tpu.schema import GENERATION_CONTEXT_CHUNK_ID_KEY
from autorag_research_tpu.utils.tokens import TokenUsageTracker

ROUTE_PROMPT = (
    "Is this question simple (single fact lookup) or complex (requires "
    "combining multiple pieces of information)? Reply 'simple' or 'complex'.\n\n"
    "Question: {query}\nReply:"
)
DIRECT_PROMPT = (
    "Answer using the context.\n\nContext:\n{context}\n\nQuestion: {query}\nAnswer:"
)
PERCEIVE_PROMPT = (
    "Extract the facts from this item that are relevant to the question. "
    "Reply 'NONE' if nothing is relevant.\n\nQuestion: {query}\n\nItem:\n{item}\n\nFacts:"
)
REASON_PROMPT = (
    "Reason over the perceived facts to answer the question.\n\nFacts:\n{facts}\n\n"
    "Question: {query}\nAnswer:"
)


class AutoThinkRAGPipeline(BaseGenerationPipeline):
    def __init__(
        self,
        catalog,
        name: str = "autothinkrag",
        retrieval_pipeline=None,
        llm=None,
        max_perception_concurrency: int = 8,
    ):
        self.max_perception_concurrency = max_perception_concurrency
        super().__init__(catalog, name, retrieval_pipeline, llm)

    def _get_pipeline_config(self) -> dict[str, Any]:
        return {"type": "autothinkrag"}

    def _resolve_items(self, hits) -> list[tuple[Any, str, bytes | None]]:
        """(doc_id, text, image_bytes) per hit — image chunks resolve to their
        bytes for vision-capable LLMs."""
        unit = getattr(self.retrieval_pipeline, "retrieval_unit", "chunk")
        ids = [h["doc_id"] for h in hits]
        if unit == "image_chunk":
            rows = self.catalog.get_image_chunks(ids)
            return [
                (did, f"(image chunk {did})", rows[did]["image"] if did in rows else None)
                for did in ids
            ]
        lookup = self.catalog.get_chunk_contents(ids)
        return [(did, lookup.get(did, ""), None) for did in ids]

    async def _generate(self, query_id, top_k) -> GenerationResult:
        query = self.get_query_text(query_id)
        tracker = TokenUsageTracker()
        response = await self.llm.agenerate(ROUTE_PROMPT.format(query=query))
        tracker.record(response)
        complexity = "complex" if "complex" in response.text.lower() else "simple"

        hits = await self.retrieve_for(query_id, top_k)
        items = self._resolve_items(hits)
        final_ids = [d for d, _, _ in items]

        if complexity == "simple":
            context = "\n".join(text for _, text, _ in items)
            response = await self.llm.agenerate(
                DIRECT_PROMPT.format(context=context, query=query)
            )
            tracker.record(response)
            answer = response.text.strip()
            facts: list[str] = []
        else:
            semaphore = asyncio.Semaphore(self.max_perception_concurrency)

            async def perceive(did, text, image):
                kwargs = {"images": [image]} if image is not None else {}
                async with semaphore:
                    response = await self.llm.agenerate(
                        PERCEIVE_PROMPT.format(query=query, item=text), **kwargs
                    )
                tracker.record(response)
                return response.text.strip()

            perceived = await asyncio.gather(*[perceive(*item) for item in items])
            facts = [f for f in perceived if f and "none" != f.lower().strip()]
            response = await self.llm.agenerate(
                REASON_PROMPT.format(facts="\n".join(f"- {f}" for f in facts) or "(none)", query=query)
            )
            tracker.record(response)
            answer = response.text.strip()

        return GenerationResult(
            text=answer,
            token_usage=tracker.total,
            metadata={
                GENERATION_CONTEXT_CHUNK_ID_KEY: final_ids,
                "complexity": complexity,
                "perceived_facts": facts,
            },
            retrieved=hits,
        )


@dataclass(kw_only=True)
class AutoThinkRAGConfig(BasePipelineConfig):
    config_type = "autothinkrag"
    kind = "generation"

    retrieval_pipeline_name: str
    llm: Any = None
    max_perception_concurrency: int = 8

    def build(self, catalog, context):
        return AutoThinkRAGPipeline(
            catalog,
            name=self.name,
            retrieval_pipeline=context.load_pipeline(self.retrieval_pipeline_name),
            llm=context.load_llm(self.llm),
            max_perception_concurrency=self.max_perception_concurrency,
        )
