"""HyDE: Hypothetical Document Embeddings retrieval.

Capability parity with the reference ``pipelines/retrieval/hyde.py:89``
("Precise Zero-Shot Dense Retrieval without Relevance Labels",
arXiv:2212.10496): the LLM writes a hypothetical answer passage, the passage
is embedded, and dense search runs on that embedding (the reference's
``vector_search_by_embedding`` path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from autorag_research_tpu.config import BasePipelineConfig
from autorag_research_tpu.pipelines.retrieval.base import BaseRetrievalPipeline
from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchPipeline

DEFAULT_HYDE_PROMPT = (
    "Please write a passage to answer the question.\nQuestion: {query}\nPassage:"
)


class HyDEPipeline(BaseRetrievalPipeline):
    retrieval_unit = "chunk"

    def __init__(
        self,
        catalog,
        name: str = "hyde",
        llm=None,
        embedding_model=None,
        prompt_template: str = DEFAULT_HYDE_PROMPT,
        mesh=None,
    ):
        if "{query}" not in prompt_template:
            raise ValueError("prompt_template must contain '{query}'")
        self.llm = llm
        self.embedding_model = embedding_model
        self.prompt_template = prompt_template
        self._dense = VectorSearchPipeline(
            catalog, name=f"{name}__dense", embedding_model=embedding_model, mesh=mesh
        )
        super().__init__(catalog, name)

    def _get_pipeline_config(self) -> dict[str, Any]:
        return {"type": "hyde", "prompt_template": self.prompt_template}

    async def _hyde_search(self, query_text: str, top_k: int):
        response = await self.llm.agenerate(self.prompt_template.format(query=query_text))
        hypothetical_doc = response.text.strip() or query_text
        embedding = await self.embedding_model.aembed_query(hypothetical_doc)
        return self._dense.search_by_embedding(embedding, top_k)

    async def _retrieve_by_id(self, query_id, top_k):
        text = self.catalog.get_query_text(query_id)
        if text is None:
            raise ValueError(f"query {query_id} not found")
        return await self._hyde_search(text, top_k)

    async def _retrieve_by_text(self, query_text, top_k):
        return await self._hyde_search(query_text, top_k)


@dataclass(kw_only=True)
class HyDEConfig(BasePipelineConfig):
    config_type = "hyde"
    kind = "retrieval"

    llm: Any = None
    embedding_model: Any = None
    prompt_template: str = DEFAULT_HYDE_PROMPT

    def build(self, catalog, context):
        return HyDEPipeline(
            catalog,
            name=self.name,
            llm=context.load_llm(self.llm),
            embedding_model=context.load_embedding(self.embedding_model),
            prompt_template=self.prompt_template,
            mesh=context.mesh,
        )
