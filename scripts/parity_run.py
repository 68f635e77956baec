"""BEIR-recipe parity harness: ingest -> retrieve -> evaluate -> leaderboard.

Mirrors the reference's headline evaluation recipe (SURVEY.md §6: BEIR
dataset -> vector_search / bm25 / hybrid pipelines -> recall/ndcg/mrr/map)
end-to-end on this framework. Runs fully offline with the deterministic
MockEmbedding by default; pass ``--ingestor beir --extra dataset_name=scifact``
plus a real ``--embedding-model`` when network/HF data is available.

Examples:
    # offline smoke on a local JSONL dataset
    python scripts/parity_run.py --ingestor local --extra data_dir=/tmp/ds \
        --workspace /tmp/ws

    # BEIR scifact, 100 queries (needs HF cache)
    python scripts/parity_run.py --ingestor beir --extra dataset_name=scifact \
        --query-limit 100 --workspace /tmp/ws_scifact

Prints the per-pipeline metric leaderboard and one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workspace", required=True, help="workspace dir (catalog + indexes)")
    ap.add_argument("--ingestor", default="local", help="registered ingestor name")
    ap.add_argument(
        "--extra", action="append", default=[], help="ingestor kwarg key=value (repeatable)"
    )
    ap.add_argument("--query-limit", type=int, default=None)
    ap.add_argument("--subset", default="test")
    ap.add_argument("--embedding-dim", type=int, default=256, help="MockEmbedding dim")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument(
        "--pipelines",
        default="dense,bm25,hybrid_rrf,hybrid_cc",
        help="comma list from {dense,bm25,hybrid_rrf,hybrid_cc,maxsim}",
    )
    ap.add_argument(
        "--metrics", default="recall,precision,ndcg,mrr,map", help="retrieval metric names"
    )
    ap.add_argument("--skip-ingest", action="store_true", help="reuse existing workspace data")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from autorag_research_tpu.config import BaseMetricConfig, BuildContext, ExecutorConfig
    from autorag_research_tpu.data.registry import get_ingestor
    from autorag_research_tpu.embeddings.base import MockEmbedding, MockMultiVectorEmbedding
    from autorag_research_tpu.executor import Executor
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config
    from autorag_research_tpu.pipelines.retrieval.hybrid import HybridCCConfig, HybridRRFConfig
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchConfig
    from autorag_research_tpu.reporting.service import ReportingService
    from autorag_research_tpu.store.catalog import Catalog
    from autorag_research_tpu.store.ingestion import IngestionService

    ws = Path(args.workspace)
    ws.mkdir(parents=True, exist_ok=True)
    catalog = Catalog(ws / "catalog.db")

    embedding = MockEmbedding(dim=args.embedding_dim)
    wanted = [p.strip() for p in args.pipelines.split(",") if p.strip()]
    mv_embedding = (
        MockMultiVectorEmbedding(dim=args.embedding_dim) if "maxsim" in wanted else None
    )

    t0 = time.perf_counter()
    if not args.skip_ingest:
        info = get_ingestor(args.ingestor)
        extra = {}
        for kv in args.extra:
            key, _, value = kv.partition("=")
            key = key.replace("-", "_")
            for p in info.params:
                if p.name == key and p.annotation in (int, float):
                    value = p.annotation(value)
            extra[key] = value
        ingestor = info.cls(embedding_model=embedding, **extra)
        ingestor.set_service(IngestionService(catalog))
        ingestor.ingest(subset=args.subset, query_limit=args.query_limit)
        stats = ingestor.embed_all()
        for table, s in stats.items():
            print(f"embedded {table}: {s.embedded}/{s.total}", file=sys.stderr)
        if mv_embedding is not None:
            mv_stats = IngestionService(catalog).embed_all_late_interaction(mv_embedding)
            for table, s in mv_stats.items():
                print(f"late-interaction {table}: {s.embedded}/{s.total}", file=sys.stderr)
    ingest_s = time.perf_counter() - t0

    k = args.top_k
    pipeline_configs = {
        "dense": VectorSearchConfig(name="dense", top_k=k, embedding_model=embedding),
        "bm25": BM25Config(name="bm25", top_k=k),
        "hybrid_rrf": HybridRRFConfig(
            name="hybrid_rrf",
            top_k=k,
            retrieval_pipeline_1_name="dense",
            retrieval_pipeline_2_name="bm25",
        ),
        "hybrid_cc": HybridCCConfig(
            name="hybrid_cc",
            top_k=k,
            retrieval_pipeline_1_name="dense",
            retrieval_pipeline_2_name="bm25",
            normalize_method="tmm",
        ),
        "maxsim": VectorSearchConfig(
            name="maxsim", top_k=k, search_mode="multi", embedding_model=mv_embedding
        ),
    }
    unknown = set(wanted) - set(pipeline_configs)
    if unknown:
        print(f"unknown pipelines: {sorted(unknown)}", file=sys.stderr)
        return 2
    # hybrids resolve their legs by name through the loader context
    extra_cfgs = {n: c for n, c in pipeline_configs.items() if n in ("dense", "bm25")}

    config = ExecutorConfig(
        pipelines=[pipeline_configs[p] for p in wanted],
        metrics=[
            BaseMetricConfig(name=m.strip(), metric_type="retrieval")
            for m in args.metrics.split(",")
            if m.strip()
        ],
    )
    context = BuildContext(pipeline_configs=extra_cfgs)

    t0 = time.perf_counter()
    result = Executor(catalog, config, context).run()
    run_s = time.perf_counter() - t0
    print(result.report())

    board = ReportingService([ws]).leaderboard()
    if not board.empty:
        print(board.to_string(index=False))

    summary = {
        "workspace": str(ws),
        "success": result.success,
        "pipelines": wanted,
        "ingest_seconds": round(ingest_s, 2),
        "run_seconds": round(run_s, 2),
        "metrics": {
            p.name: {
                m.metric_name: round(m.average, 4) if m.average is not None else None
                for m in p.metrics
            }
            for p in result.pipelines
        },
    }
    print(json.dumps(summary))
    return 0 if result.success else 1


if __name__ == "__main__":
    sys.exit(main())
