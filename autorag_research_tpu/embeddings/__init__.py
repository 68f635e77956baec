from autorag_research_tpu.embeddings.base import (
    BaseEmbedding,
    MultiVectorEmbedding,
    MockEmbedding,
    MockMultiVectorEmbedding,
)

__all__ = [
    "BaseEmbedding",
    "MultiVectorEmbedding",
    "MockEmbedding",
    "MockMultiVectorEmbedding",
]
