"""End-to-end on-device generation experiment (VERDICT r2 #3).

The loop the framework exists for, with ZERO egress: build a workspace ->
TRAIN the native LM on its QA ground truth -> index -> run basic_rag with
the trained JaxLM -> evaluate exact_match/token_f1 -> compare against the
no-retrieval ablation (same LM, context withheld). Also measures batched
/generate throughput through the serving micro-batcher.

Run on the real chip: python scripts/exp_jaxlm_e2e.py [--facts 64] [--epochs 300]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_workspace(db_path: str, n_facts: int, n_distractors: int):
    from autorag_research_tpu.store.catalog import Catalog

    rng = np.random.default_rng(7)
    subjects = [
        "river", "mountain", "library", "museum", "bridge", "harbor", "tower",
        "garden", "market", "stadium", "temple", "castle", "canal", "forest",
    ]
    places = [
        "aldoria", "brimhaven", "cardell", "durnmoor", "eastvale", "farrowick",
        "glenport", "harkness", "ironside", "jutemere", "kelvane", "lormont",
    ]
    names = [
        "veridian", "solmara", "querenth", "tallowbrook", "umbrafane", "wrexley",
        "yarrowgate", "zephyrine", "ostwelle", "pellmere", "nim", "marrowell",
    ]
    cat = Catalog(db_path)
    chunks, queries, facts = [], [], []
    cid = 0
    for i in range(n_facts):
        subj = subjects[i % len(subjects)]
        place = places[(i // len(subjects)) % len(places)]
        answer = f"{names[i % len(names)]} {names[(i * 7 + 3) % len(names)]}"
        fact = f"the great {subj} of {place} is named {answer}."
        chunks.append({"id": cid, "contents": fact})
        queries.append(
            {
                "id": i,
                "contents": f"what is the name of the great {subj} of {place}?",
                "generation_gt": [answer],
            }
        )
        facts.append((i, cid, answer))
        cid += 1
    for j in range(n_distractors):
        chunks.append(
            {
                "id": cid,
                "contents": (
                    f"distractor passage {j}: the weather in region {j % 31} was "
                    f"mild and the {subjects[j % len(subjects)]} committee met twice."
                ),
            }
        )
        cid += 1
    cat.add_chunks(chunks)
    cat.add_queries(queries)
    for qid, gold_cid, _ in facts:
        cat.add_retrieval_gt(qid, gold_cid)
    return cat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--facts", type=int, default=64)
    ap.add_argument("--distractors", type=int, default=448)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=288)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--serve-clients", type=int, default=16)
    ap.add_argument("--serve-requests", type=int, default=96)
    args = ap.parse_args()

    import jax

    from autorag_research_tpu.config import BaseMetricConfig, BuildContext, ExecutorConfig
    from autorag_research_tpu.evaluation.metrics.generation import exact_match, token_f1
    from autorag_research_tpu.executor import Executor
    from autorag_research_tpu.models.decoder import DecoderConfig
    from autorag_research_tpu.models.lm_trainer import (
        DEFAULT_LM_PROMPT,
        LMTrainer,
        build_lm_examples,
    )
    from autorag_research_tpu.pipelines.generation.basic_rag import BasicRAGConfig
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config
    from autorag_research_tpu.schema import MetricInput

    print(f"devices: {jax.devices()}", file=sys.stderr)
    tmp = tempfile.mkdtemp(prefix="jaxlm_e2e_")
    cat = build_workspace(f"{tmp}/ws.db", args.facts, args.distractors)
    print(
        f"workspace: {args.facts} QA facts + {args.distractors} distractors",
        file=sys.stderr,
    )

    # ---------------------------------------------------------------- train
    cfg = DecoderConfig(hidden=256, layers=4, heads=4, max_len=512)
    trainer = LMTrainer(
        cfg, lr=args.lr, batch_size=args.batch_size, seq_len=args.seq_len
    )
    examples = build_lm_examples(cat)
    n_tokens = sum(len(p.encode()) + len(a.encode()) + 2 for p, a in examples)
    t0 = time.time()
    report = trainer.train(examples, epochs=args.epochs)
    train_s = time.time() - t0
    tok_per_s = report.steps * args.batch_size * args.seq_len / train_s
    print(
        f"train: {report.steps} steps in {train_s:.1f}s "
        f"({tok_per_s:,.0f} tok/s incl compile; loss {report.losses[0]:.3f} "
        f"-> {report.final_loss:.4f}; corpus {n_tokens} answer+prompt bytes)",
        file=sys.stderr,
    )

    llm = trainer.to_llm(max_prompt_len=cfg.max_len - 64, max_new_tokens=48)

    # ------------------------------------------------------------- evaluate
    config = ExecutorConfig(
        pipelines=[
            BasicRAGConfig(
                name="rag_jaxlm", retrieval_pipeline_name="bm25", llm=llm, top_k=1
            )
        ],
        metrics=[
            BaseMetricConfig(name="exact_match", metric_type="generation"),
            BaseMetricConfig(name="token_f1", metric_type="generation"),
            BaseMetricConfig(name="recall", metric_type="retrieval"),
        ],
        health_check=False,
    )
    ctx = BuildContext(pipeline_configs={"bm25": BM25Config(name="bm25")})
    t0 = time.time()
    result = Executor(cat, config, ctx).run()
    eval_s = time.time() - t0
    assert result.success, result.report()
    metrics = {m.metric_name: m.average for m in result.pipelines[0].metrics}
    print(f"basic_rag + trained JaxLM ({eval_s:.1f}s): {metrics}", file=sys.stderr)

    # ------------------------------------------------------------- ablation
    rows = [cat.get_query(i) for i in range(args.facts)]
    prompts = [
        DEFAULT_LM_PROMPT.format(context="(no context retrieved)", query=r["contents"])
        for r in rows
    ]
    outs = llm.generate_batch(prompts)
    import json

    gts = [json.loads(r["generation_gt"]) for r in rows]
    mis = [
        MetricInput(generated_texts=o, generation_gt=g) for o, g in zip(outs, gts)
    ]
    em_abl = float(np.mean(exact_match(mis)))
    f1_abl = float(np.mean(token_f1(mis)))
    print(f"no-retrieval ablation: exact_match {em_abl:.3f} token_f1 {f1_abl:.3f}", file=sys.stderr)

    # -------------------------------------------------- batched /generate QPS
    import threading

    from autorag_research_tpu.pipelines.generation.basic_rag import BasicRAGPipeline
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Pipeline
    from autorag_research_tpu.serving.server import ServingHandle

    bm25 = BM25Pipeline(cat, "bm25_serve")
    rag = BasicRAGPipeline(cat, "rag_serve", retrieval_pipeline=bm25, llm=llm)
    handle = ServingHandle(cat, {"bm25": bm25}, {"rag": rag}, batch_window_ms=5.0)
    q_texts = [cat.get_query_text(i % args.facts) for i in range(args.serve_requests)]
    # warm: one batch through each bucket the run will hit
    handle.generate_batch(q_texts[: args.serve_clients], top_k=1)
    handle.generate_batch(q_texts[:1], top_k=1)

    lat: list[float] = []
    lock = threading.Lock()
    idx = {"n": 0}

    def client():
        while True:
            with lock:
                i = idx["n"]
                if i >= len(q_texts):
                    return
                idx["n"] += 1
            t = time.time()
            handle.generate_batch([q_texts[i]], top_k=1)
            with lock:
                lat.append(time.time() - t)

    t0 = time.time()
    threads = [threading.Thread(target=client) for _ in range(args.serve_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    qps = len(q_texts) / wall
    p50 = float(np.percentile(lat, 50)) * 1000
    p99 = float(np.percentile(lat, 99)) * 1000
    print(
        f"batched /generate: {qps:.1f} QPS @ {args.serve_clients} clients "
        f"(p50 {p50:.0f} ms, p99 {p99:.0f} ms, {len(q_texts)} requests)",
        file=sys.stderr,
    )
    handle.stop()

    import json as _json

    print(
        _json.dumps(
            {
                "train_steps": report.steps,
                "train_seconds": round(train_s, 2),
                "train_tok_per_s": round(tok_per_s),
                "final_loss": round(report.final_loss, 5),
                "rag_exact_match": metrics.get("exact_match"),
                "rag_token_f1": metrics.get("token_f1"),
                "rag_recall": metrics.get("recall"),
                "ablation_exact_match": em_abl,
                "ablation_token_f1": f1_abl,
                "generate_qps": round(qps, 1),
                "generate_p50_ms": round(p50),
                "generate_p99_ms": round(p99),
            }
        )
    )


if __name__ == "__main__":
    main()
