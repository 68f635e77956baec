"""Basic RAG: retrieve once -> prompt -> one LLM call.

Capability parity with the reference ``pipelines/generation/basic_rag.py:78``.
"""

from __future__ import annotations

from dataclasses import dataclass

from autorag_research_tpu.config import BasePipelineConfig
from autorag_research_tpu.pipelines.generation.base import BaseGenerationPipeline, GenerationResult
from autorag_research_tpu.schema import GENERATION_CONTEXT_CHUNK_ID_KEY
from autorag_research_tpu.utils.tokens import TokenUsageTracker

DEFAULT_PROMPT = (
    "Answer the question using only the provided context.\n\n"
    "Context:\n{context}\n\nQuestion: {query}\n\nAnswer:"
)


class BasicRAGPipeline(BaseGenerationPipeline):
    def __init__(
        self,
        catalog,
        name: str = "basic_rag",
        retrieval_pipeline=None,
        llm=None,
        prompt_template: str = DEFAULT_PROMPT,
    ):
        self.prompt_template = prompt_template
        super().__init__(catalog, name, retrieval_pipeline, llm)

    def _get_pipeline_config(self):
        return {"type": "basic_rag", "prompt_template": self.prompt_template}

    async def _generate(self, query_id, top_k) -> GenerationResult:
        query = self.get_query_text(query_id)
        hits = await self.retrieve_for(query_id, top_k)
        chunk_ids = [h["doc_id"] for h in hits]
        contents = self.get_chunk_contents(chunk_ids)
        context = "\n\n".join(contents) if contents else "(no context retrieved)"
        tracker = TokenUsageTracker()
        response = await self.llm.agenerate(
            self.prompt_template.format(context=context, query=query)
        )
        tracker.record(response)
        return GenerationResult(
            text=response.text,
            token_usage=tracker.total,
            metadata={
                GENERATION_CONTEXT_CHUNK_ID_KEY: chunk_ids,
                "retrieved_chunk_ids": chunk_ids,
            },
            retrieved=hits,
        )


@dataclass(kw_only=True)
class BasicRAGConfig(BasePipelineConfig):
    config_type = "basic_rag"
    kind = "generation"

    retrieval_pipeline_name: str
    llm: object = None
    prompt_template: str = DEFAULT_PROMPT

    def build(self, catalog, context):
        return BasicRAGPipeline(
            catalog,
            name=self.name,
            retrieval_pipeline=context.load_pipeline(self.retrieval_pipeline_name),
            llm=context.load_llm(self.llm),
            prompt_template=self.prompt_template,
        )
