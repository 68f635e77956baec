from autorag_research_tpu.parallel.mesh import (
    corpus_mesh,
    get_default_mesh,
    hybrid_corpus_mesh,
    set_default_mesh,
)
from autorag_research_tpu.parallel.sharded import sharded_dense_topk, shard_corpus

__all__ = [
    "corpus_mesh",
    "get_default_mesh",
    "hybrid_corpus_mesh",
    "set_default_mesh",
    "sharded_dense_topk",
    "shard_corpus",
]
