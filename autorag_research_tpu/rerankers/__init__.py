from autorag_research_tpu.rerankers.base import BaseReranker, RerankResult
from autorag_research_tpu.rerankers.local import (
    EmbeddingSimilarityReranker,
    MockReranker,
)
from autorag_research_tpu.rerankers.llm import LLMListwiseReranker

__all__ = [
    "BaseReranker",
    "RerankResult",
    "EmbeddingSimilarityReranker",
    "MockReranker",
    "LLMListwiseReranker",
]
