from autorag_research_tpu.data.base import DataIngestor, TextDataIngestor
from autorag_research_tpu.data.registry import get_ingestor, list_ingestors, register_ingestor

__all__ = [
    "DataIngestor",
    "TextDataIngestor",
    "get_ingestor",
    "list_ingestors",
    "register_ingestor",
]
