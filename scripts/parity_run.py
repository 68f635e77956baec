"""BEIR-recipe parity harness: ingest -> retrieve -> evaluate -> leaderboard.

Mirrors the reference's headline evaluation recipe (SURVEY.md §6: BEIR
dataset -> vector_search / bm25 / hybrid pipelines -> recall/ndcg/mrr/map)
end-to-end on this framework. Runs fully offline: the default ``synthetic``
ingestor generates a deterministic zipfian corpus with graded AND/OR GT
(``data/synthetic.py``), so the same command produces byte-identical
leaderboards on any device — the cross-device invariance check the
egress-blocked BEIR configs stand in for. Pass ``--ingestor beir --extra
dataset_name=scifact`` plus a real ``--embedding-model`` when network/HF data
is available.

Examples:
    # large offline parity fixture (5k docs / 250 queries), all pipelines
    python scripts/parity_run.py --workspace /tmp/ws --scale large --pipelines all

    # device invariance: run on TPU, then compare a CPU-mesh run against it
    python scripts/parity_run.py --workspace /tmp/ws_tpu --scale large \
        --leaderboard-out /tmp/lb_tpu.json
    JAX_PLATFORMS=cpu python scripts/parity_run.py --workspace /tmp/ws_cpu \
        --scale large --expect-leaderboard /tmp/lb_tpu.json

    # resume: interrupt-and-continue semantics (runs half, then completes)
    python scripts/parity_run.py --workspace /tmp/ws --scale smoke --resume-test

(image_vector_search is exercised by the multimodal fixture in
``tests/test_multimodal_e2e.py``; the synthetic corpus is text-only.)

Prints the per-pipeline metric leaderboard and one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCALES = {
    "smoke": {"n_docs": 300, "n_queries": 20},
    "large": {"n_docs": 5000, "n_queries": 250},
}

# every TEXT retrieval pipeline; the two image_chunk-unit pipelines
# (image_vector_search, heaven) are exercised by the multimodal fixture in
# tests/test_multimodal_e2e.py — the synthetic corpus is text-only
ALL_PIPELINES = (
    "dense,bm25,maxsim,hybrid_rrf,hybrid_cc,gqr_hybrid,hyde,"
    "power_of_noise,query_rewrite,question_decomposition,rerank,retro_star"
)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workspace", required=True, help="workspace dir (catalog + indexes)")
    ap.add_argument("--ingestor", default="synthetic", help="registered ingestor name")
    ap.add_argument(
        "--extra", action="append", default=[], help="ingestor kwarg key=value (repeatable)"
    )
    ap.add_argument("--scale", choices=sorted(SCALES), default=None,
                    help="synthetic fixture size preset")
    ap.add_argument("--query-limit", type=int, default=None)
    ap.add_argument("--subset", default="test")
    ap.add_argument("--embedding-dim", type=int, default=256)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument(
        "--pipelines",
        default="dense,bm25,hybrid_rrf,hybrid_cc",
        help=f"comma list or 'all' (= {ALL_PIPELINES})",
    )
    ap.add_argument(
        "--metrics", default="recall,precision,ndcg,mrr,map", help="retrieval metric names"
    )
    ap.add_argument("--skip-ingest", action="store_true", help="reuse existing workspace data")
    ap.add_argument("--mesh", action="store_true", help="shard indexes over all devices")
    ap.add_argument("--leaderboard-out", default=None,
                    help="write the canonical leaderboard JSON here")
    ap.add_argument("--expect-leaderboard", default=None,
                    help="fail unless this run's leaderboard equals the given JSON"
                         " (cross-device invariance check)")
    ap.add_argument("--tie-tolerant", default="maxsim",
                    help="comma list of pipelines compared with a small absolute"
                         " tolerance instead of exact equality. MaxSim on the"
                         " token-identity fixture has many EXACTLY-tied true"
                         " scores; TPU and CPU arithmetic round the tied"
                         " per-doc sums differently (TPU collapses them to the"
                         " same float, CPU does not), so tied docs can swap"
                         " across BACKENDS — while within one backend results"
                         " stay bit-identical across shard counts and kernels"
                         " (measured 2026-08-17). '' = exact everywhere")
    ap.add_argument("--tie-tolerance", type=float, default=5e-3,
                    help="absolute metric tolerance for --tie-tolerant pipelines")
    ap.add_argument("--resume-test", action="store_true",
                    help="run half the queries first, then the full set; assert the"
                         " second pass resumes instead of recomputing")
    return ap


def _canonical_leaderboard(result) -> dict:
    """Pipeline -> metric -> score, rounded to parity precision (1e-9: exact
    kernels are deterministic; float assembly order may differ off/on mesh)."""
    return {
        p.name: {
            m.metric_name: (round(m.average, 9) if m.average is not None else None)
            for m in sorted(p.metrics, key=lambda m: m.metric_name)
        }
        for p in result.pipelines
    }


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize pins the remote-TPU platform at interpreter
        # start; honoring the env var needs an explicit config override
        import jax

        jax.config.update("jax_platforms", "cpu")

    from autorag_research_tpu.config import BaseMetricConfig, BuildContext, ExecutorConfig
    from autorag_research_tpu.data.registry import get_ingestor
    from autorag_research_tpu.data.synthetic import (
        BagOfTokensEmbedding,
        BagOfTokensMultiVectorEmbedding,
    )
    from autorag_research_tpu.embeddings.base import MockEmbedding, MockMultiVectorEmbedding
    from autorag_research_tpu.executor import Executor
    from autorag_research_tpu.llm import MockLLM
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config
    from autorag_research_tpu.pipelines.retrieval.gqr_hybrid import GQRHybridConfig
    from autorag_research_tpu.pipelines.retrieval.hybrid import HybridCCConfig, HybridRRFConfig
    from autorag_research_tpu.pipelines.retrieval.hyde import HyDEConfig
    from autorag_research_tpu.pipelines.retrieval.power_of_noise import PowerOfNoiseConfig
    from autorag_research_tpu.pipelines.retrieval.query_rewrite import QueryRewriteConfig
    from autorag_research_tpu.pipelines.retrieval.question_decomposition import (
        QuestionDecompositionConfig,
    )
    from autorag_research_tpu.pipelines.retrieval.rerank import RerankConfig
    from autorag_research_tpu.pipelines.retrieval.retro_star import RetroStarConfig
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchConfig
    from autorag_research_tpu.reporting.service import ReportingService
    from autorag_research_tpu.rerankers.local import MockReranker
    from autorag_research_tpu.store.catalog import Catalog
    from autorag_research_tpu.store.ingestion import IngestionService

    ws = Path(args.workspace)
    ws.mkdir(parents=True, exist_ok=True)
    catalog = Catalog(ws / "catalog.db")

    # bag-of-tokens embeddings give the synthetic fixture real (imperfect)
    # dense recall; other ingestors keep the whole-text hash mock
    if args.ingestor == "synthetic":
        embedding = BagOfTokensEmbedding(dim=args.embedding_dim)
    else:
        embedding = MockEmbedding(dim=args.embedding_dim)
    if args.pipelines.strip() == "all":
        args.pipelines = ALL_PIPELINES
    wanted = [p.strip() for p in args.pipelines.split(",") if p.strip()]
    if "maxsim" not in wanted:
        mv_embedding = None
    elif args.ingestor == "synthetic":
        # token-identity vectors: maxsim expresses real lexical overlap
        mv_embedding = BagOfTokensMultiVectorEmbedding(dim=args.embedding_dim)
    else:
        mv_embedding = MockMultiVectorEmbedding(dim=args.embedding_dim)

    t0 = time.perf_counter()
    if not args.skip_ingest:
        info = get_ingestor(args.ingestor)
        extra = {}
        if args.scale and args.ingestor == "synthetic":
            extra.update(SCALES[args.scale])
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

    # deterministic mock LLM for the agentic wrappers: echoes the salient
    # tail of the prompt, so rewrites/decompositions stay query-correlated
    llm = MockLLM(responder=lambda p: " ".join(p.replace("\n", " ").split()[-12:]))

    k = args.top_k
    pipeline_configs = {
        "dense": VectorSearchConfig(name="dense", top_k=k, embedding_model=embedding),
        "bm25": BM25Config(name="bm25", top_k=k),
        "hybrid_rrf": HybridRRFConfig(
            name="hybrid_rrf", top_k=k,
            retrieval_pipeline_1_name="dense", retrieval_pipeline_2_name="bm25",
        ),
        "hybrid_cc": HybridCCConfig(
            name="hybrid_cc", top_k=k,
            retrieval_pipeline_1_name="dense", retrieval_pipeline_2_name="bm25",
            normalize_method="tmm",
        ),
        # search_method pinned to the XLA scan so the cross-device comparison
        # has ONE variable: backend arithmetic. Measured 2026-08-17: on TPU,
        # pallas_v2 and xla produce identical leaderboards; the residual
        # TPU-vs-CPU maxsim diff (2 metrics, ~1 rank swap) is exact-tie
        # splitting by backend float rounding — see --tie-tolerant
        "maxsim": VectorSearchConfig(
            name="maxsim", top_k=k, search_mode="multi", embedding_model=mv_embedding,
            index_options={"search_method": "xla"},
        ),
        "gqr_hybrid": GQRHybridConfig(
            name="gqr_hybrid", top_k=k,
            retrieval_pipeline_1_name="dense", retrieval_pipeline_2_name="bm25",
        ),
        "hyde": HyDEConfig(
            name="hyde", top_k=k, llm=llm, embedding_model=embedding,
        ),
        "power_of_noise": PowerOfNoiseConfig(
            name="power_of_noise", top_k=k, base_retrieval_pipeline_name="dense",
            noise_ratio=0.2,
        ),
        "query_rewrite": QueryRewriteConfig(
            name="query_rewrite", top_k=k, llm=llm,
            inner_retrieval_pipeline_name="bm25",
        ),
        "question_decomposition": QuestionDecompositionConfig(
            name="question_decomposition", top_k=k, llm=llm,
            inner_retrieval_pipeline_name="bm25",
        ),
        "rerank": RerankConfig(
            name="rerank", top_k=k, inner_retrieval_pipeline_name="bm25",
            reranker=MockReranker(),
        ),
        "retro_star": RetroStarConfig(
            name="retro_star", top_k=k, llm=llm, retrieval_pipeline_name="bm25",
        ),
    }
    unknown = set(wanted) - set(pipeline_configs)
    if unknown:
        print(f"unknown pipelines: {sorted(unknown)}", file=sys.stderr)
        return 2
    # wrapped legs resolve by name through the loader context
    extra_cfgs = {n: c for n, c in pipeline_configs.items() if n in ("dense", "bm25")}

    metric_cfgs = [
        BaseMetricConfig(name=m.strip(), metric_type="retrieval")
        for m in args.metrics.split(",")
        if m.strip()
    ]

    mesh = None
    if args.mesh:
        import jax

        from autorag_research_tpu.parallel.mesh import corpus_mesh

        mesh = corpus_mesh(n_corpus=len(jax.devices()))
        print(f"mesh: {mesh}", file=sys.stderr)

    def run_executor(query_limit=None, pipelines=None):
        cfgs = []
        for p in pipelines or wanted:
            c = pipeline_configs[p]
            if query_limit is not None:
                from dataclasses import replace

                c = replace(c, query_limit=query_limit)
            cfgs.append(c)
        config = ExecutorConfig(pipelines=cfgs, metrics=metric_cfgs)
        context = BuildContext(pipeline_configs=extra_cfgs, mesh=mesh)
        return Executor(catalog, config, context).run()

    resume_stats = None
    if args.resume_test:
        n_q = catalog.count("query")
        half = max(1, n_q // 2)
        t0 = time.perf_counter()
        first = run_executor(query_limit=half)
        assert first.success, first.report()
        first_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        second = run_executor()
        second_s = time.perf_counter() - t0
        assert second.success, second.report()
        resume_stats = {
            "half_queries": half,
            "first_pass_s": round(first_s, 2),
            "second_pass_s": round(second_s, 2),
        }
        print(
            f"resume: pass1 ({half}/{n_q} queries) {first_s:.1f}s; "
            f"pass2 completed remaining in {second_s:.1f}s",
            file=sys.stderr,
        )
        result = second
        run_s = first_s + second_s
    else:
        t0 = time.perf_counter()
        result = run_executor()
        run_s = time.perf_counter() - t0
    print(result.report())

    board = ReportingService([ws]).leaderboard()
    if not board.empty:
        print(board.to_string(index=False))

    canon = _canonical_leaderboard(result)
    if args.leaderboard_out:
        Path(args.leaderboard_out).write_text(json.dumps(canon, indent=1, sort_keys=True))
        print(f"leaderboard written to {args.leaderboard_out}", file=sys.stderr)
    if args.expect_leaderboard:
        expected = json.loads(Path(args.expect_leaderboard).read_text())
        tolerant = {p.strip() for p in args.tie_tolerant.split(",") if p.strip()}
        diffs = []
        soft = []
        for p in sorted(set(expected) | set(canon)):
            tol = args.tie_tolerance if p in tolerant else 0.0
            for m in sorted(set(expected.get(p, {})) | set(canon.get(p, {}))):
                a, b = expected.get(p, {}).get(m), canon.get(p, {}).get(m)
                if a == b:
                    continue
                if a is not None and b is not None and abs(a - b) <= tol:
                    soft.append(f"{p}.{m}: {a} vs {b} (within tie tolerance)")
                    continue
                diffs.append(f"{p}.{m}: expected {a} got {b}")
        if diffs:
            print("LEADERBOARD MISMATCH:\n" + "\n".join(diffs), file=sys.stderr)
            return 3
        for line in soft:
            print(line, file=sys.stderr)
        print(
            "leaderboard matches expected (device invariance holds"
            + (f"; {len(soft)} tie-tolerant diffs)" if soft else ")"),
            file=sys.stderr,
        )

    summary = {
        "workspace": str(ws),
        "success": result.success,
        "pipelines": wanted,
        "n_docs": catalog.count("chunk"),
        "n_queries": catalog.count("query"),
        "ingest_seconds": round(ingest_s, 2),
        "run_seconds": round(run_s, 2),
        "resume": resume_stats,
        "metrics": canon,
    }
    print(json.dumps(summary))
    return 0 if result.success else 1


if __name__ == "__main__":
    sys.exit(main())
