from autorag_research_tpu.ops.topk import merge_topk, sort_topk
from autorag_research_tpu.ops.dense import (
    dense_topk,
    dense_topk_pallas,
    dense_topk_xla,
    dense_topk_xla_full,
)

__all__ = [
    "merge_topk",
    "sort_topk",
    "dense_topk",
    "dense_topk_pallas",
    "dense_topk_xla",
    "dense_topk_xla_full",
]
