from autorag_research_tpu.pipelines.generation.base import (
    BaseGenerationPipeline,
    GenerationResult,
)
from autorag_research_tpu.pipelines.generation.basic_rag import BasicRAGPipeline

__all__ = ["BaseGenerationPipeline", "GenerationResult", "BasicRAGPipeline"]
