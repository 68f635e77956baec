from autorag_research_tpu.index.base import SearchHit
from autorag_research_tpu.index.dense import DenseIndex

__all__ = ["SearchHit", "DenseIndex"]
