from autorag_research_tpu.utils.normalize import (
    MISSING_SCORE_FLOORS,
    normalize_dbsf,
    normalize_minmax,
    normalize_tmm,
    normalize_zscore,
)
from autorag_research_tpu.utils.concurrency import run_with_concurrency_limit
from autorag_research_tpu.utils.tokens import TokenUsageTracker, aggregate_token_usage

__all__ = [
    "MISSING_SCORE_FLOORS",
    "normalize_dbsf",
    "normalize_minmax",
    "normalize_tmm",
    "normalize_zscore",
    "run_with_concurrency_limit",
    "TokenUsageTracker",
    "aggregate_token_usage",
]
