from autorag_research_tpu.pipelines.retrieval.base import BaseRetrievalPipeline
from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchPipeline

__all__ = ["BaseRetrievalPipeline", "VectorSearchPipeline"]
