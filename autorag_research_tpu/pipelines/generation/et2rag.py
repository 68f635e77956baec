"""ET2RAG: test-time majority voting over context subsets.

Capability parity with the reference ``pipelines/generation/et2rag.py:111``:
sample several subsets of the retrieved context, answer from each subset in
parallel, and return the majority answer (normalized-vote; ties break toward
the answer from the highest-ranked subset).
"""

from __future__ import annotations

import asyncio
import random
from collections import Counter
from dataclasses import dataclass
from typing import Any

from autorag_research_tpu.config import BasePipelineConfig
from autorag_research_tpu.evaluation.metrics.generation import normalize_string
from autorag_research_tpu.pipelines.generation.base import BaseGenerationPipeline, GenerationResult
from autorag_research_tpu.schema import GENERATION_CONTEXT_CHUNK_ID_KEY
from autorag_research_tpu.utils.tokens import TokenUsageTracker

SUBSET_PROMPT = (
    "Answer the question using only this context.\n\nContext:\n{context}\n\n"
    "Question: {query}\nGive a short, direct answer.\nAnswer:"
)


class ET2RAGPipeline(BaseGenerationPipeline):
    def __init__(
        self,
        catalog,
        name: str = "et2rag",
        retrieval_pipeline=None,
        llm=None,
        num_subsets: int = 5,
        subset_size: int | None = None,
        seed: int = 42,
    ):
        self.num_subsets = num_subsets
        self.subset_size = subset_size
        self.seed = seed
        super().__init__(catalog, name, retrieval_pipeline, llm)

    def _get_pipeline_config(self) -> dict[str, Any]:
        return {
            "type": "et2rag",
            "num_subsets": self.num_subsets,
            "subset_size": self.subset_size,
        }

    async def _generate(self, query_id, top_k) -> GenerationResult:
        query = self.get_query_text(query_id)
        tracker = TokenUsageTracker()
        hits = await self.retrieve_for(query_id, top_k)
        ids = [h["doc_id"] for h in hits]
        lookup = self.catalog.get_chunk_contents(ids)
        docs = [(h["doc_id"], lookup[h["doc_id"]]) for h in hits if h["doc_id"] in lookup]
        if not docs:
            response = await self.llm.agenerate(
                SUBSET_PROMPT.format(context="(none)", query=query)
            )
            tracker.record(response)
            return GenerationResult(
                response.text.strip(), tracker.total, {GENERATION_CONTEXT_CHUNK_ID_KEY: []}
            )

        size = self.subset_size or max(1, len(docs) // 2)
        rng = random.Random(f"{self.seed}:{query_id}")
        subsets = [docs[:size]]  # top-ranked subset always included
        for _ in range(self.num_subsets - 1):
            subsets.append(rng.sample(docs, min(size, len(docs))))

        async def answer(subset):
            context = "\n".join(text for _, text in subset)
            response = await self.llm.agenerate(
                SUBSET_PROMPT.format(context=context, query=query)
            )
            tracker.record(response)
            return response.text.strip()

        answers = await asyncio.gather(*[answer(s) for s in subsets])
        votes = Counter(normalize_string(a) for a in answers)
        top_norm, _ = max(votes.items(), key=lambda kv: kv[1])
        # tie/selection: first answer (from the top-ranked subset) matching the vote
        final = next(a for a in answers if normalize_string(a) == top_norm)
        return GenerationResult(
            text=final,
            token_usage=tracker.total,
            metadata={
                GENERATION_CONTEXT_CHUNK_ID_KEY: [d for d, _ in docs],
                "votes": dict(votes),
                "candidate_answers": list(answers),
            },
            retrieved=hits,
        )


@dataclass(kw_only=True)
class ET2RAGConfig(BasePipelineConfig):
    config_type = "et2rag"
    kind = "generation"

    retrieval_pipeline_name: str
    llm: Any = None
    num_subsets: int = 5
    subset_size: int | None = None

    def build(self, catalog, context):
        return ET2RAGPipeline(
            catalog,
            name=self.name,
            retrieval_pipeline=context.load_pipeline(self.retrieval_pipeline_name),
            llm=context.load_llm(self.llm),
            num_subsets=self.num_subsets,
            subset_size=self.subset_size,
        )
