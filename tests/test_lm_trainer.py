"""LM SFT trainer: catalog example building, SFT encoding invariants,
memorization training, and the full ingest->train->retrieve->generate->
evaluate loop with a TRAINED on-device LM (VERDICT r2 #3)."""

import numpy as np
import pytest

from autorag_research_tpu.models.decoder import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    DecoderConfig,
)
from autorag_research_tpu.models.lm_trainer import (
    LMTrainer,
    build_lm_examples,
    encode_sft,
)
from autorag_research_tpu.store.catalog import Catalog

QA = [
    ("Q: capital of france? A:", " paris"),
    ("Q: color of the sky? A:", " blue"),
    ("Q: legs on a cat? A:", " four"),
    ("Q: two plus two? A:", " four"),
]

TINY = DecoderConfig(hidden=128, layers=2, heads=4, max_len=160)


def test_encode_sft_layout():
    data = encode_sft(QA[:2], seq_len=48)
    ids, mask, loss = data["ids"], data["mask"], data["loss_mask"]
    assert ids.shape == (2, 48)
    # right-padded: row starts with BOS, ends with EOS then pads
    assert ids[0, 0] == BOS_ID
    row_len = int(mask[0].sum())
    assert ids[0, row_len - 1] == EOS_ID
    assert (ids[0, row_len:] == PAD_ID).all()
    # loss positions: only predictions of answer bytes + EOS
    n_answer = len(QA[0][1].encode()) + 1  # + EOS
    assert int(loss[0].sum()) == n_answer
    # the last loss position predicts EOS (target of position p is ids[p+1])
    last_loss_pos = np.where(loss[0])[0][-1]
    assert ids[0, last_loss_pos + 1] == EOS_ID
    # no loss position outside the real row
    assert not (loss[0] & ~mask[0]).any()


def test_encode_sft_truncates_prompt_head():
    long_prompt = "x" * 500
    data = encode_sft([(long_prompt, "yes")], seq_len=32)
    assert int(data["mask"][0].sum()) == 32
    assert data["ids"][0, 0] == BOS_ID
    # answer survives intact at the tail
    n_answer = len(b"yes") + 1
    assert int(data["loss_mask"][0].sum()) == n_answer


def test_lm_trainer_memorizes_and_generates():
    trainer = LMTrainer(TINY, lr=3e-3, batch_size=4, seq_len=96)
    report = trainer.train(list(QA), epochs=200)
    # the schedule pads up to a fixed scan-chunk multiple (equal chunk
    # shapes compile once on the remote-TPU stack)
    assert 200 <= report.steps <= 200 + 128
    assert report.final_loss < 0.05, report.losses[-5:]
    llm = trainer.to_llm(max_prompt_len=96, max_new_tokens=16)
    outs = llm.generate_batch([p for p, _ in QA])
    assert outs == [a for _, a in QA]


def test_lm_trainer_save_load_roundtrip(tmp_path):
    trainer = LMTrainer(TINY, batch_size=2, seq_len=64)
    trainer.train(QA[:2], epochs=5)
    path = str(tmp_path / "lm.npz")
    trainer.save(path)
    from autorag_research_tpu.llm.jax_lm import JaxLM

    llm = JaxLM(config=TINY, max_prompt_len=64, max_new_tokens=8, checkpoint=path)
    a = llm.generate_batch([QA[0][0]])
    b = trainer.to_llm(max_prompt_len=64, max_new_tokens=8).generate_batch([QA[0][0]])
    assert a == b


@pytest.fixture
def lm_catalog(tmp_path):
    from autorag_research_tpu.index import registry

    registry.invalidate()
    cat = Catalog(tmp_path / "lm.db")
    cat.add_chunks(
        [
            {"id": 0, "contents": "paris is the capital of france"},
            {"id": 1, "contents": "berlin is the capital of germany"},
            {"id": 2, "contents": "the sky is blue on clear days"},
        ]
    )
    cat.add_queries(
        [
            {"id": 0, "contents": "capital of france", "generation_gt": ["paris"]},
            {"id": 1, "contents": "capital of germany", "generation_gt": ["berlin"]},
            {"id": 2, "contents": "color of the sky", "generation_gt": ["blue"]},
            {"id": 3, "contents": "no gt query"},  # skipped: no generation_gt
        ]
    )
    cat.add_retrieval_gt(0, 0)
    cat.add_retrieval_gt(1, 1)
    cat.add_retrieval_gt(2, 2)
    yield cat
    registry.invalidate()


def test_build_lm_examples_from_catalog(lm_catalog):
    examples = build_lm_examples(lm_catalog)
    assert len(examples) == 3  # the GT-less query is skipped
    prompts = {p for p, _ in examples}
    answers = {a for _, a in examples}
    assert answers == {"paris", "berlin", "blue"}
    # prompt carries the gold chunk as context in the basic_rag format
    p = next(p for p, a in examples if a == "paris")
    assert "paris is the capital of france" in p
    assert "Question: capital of france" in p
    assert p.rstrip().endswith("Answer:")


def test_full_loop_trained_lm_beats_no_retrieval(lm_catalog):
    """ingest -> train -> index -> generate -> evaluate, 100% on-device LM:
    basic_rag with the trained JaxLM answers from retrieved context; the
    no-retrieval ablation (same LM, context withheld) scores worse."""
    from autorag_research_tpu.config import BaseMetricConfig, BuildContext, ExecutorConfig
    from autorag_research_tpu.executor import Executor
    from autorag_research_tpu.pipelines.generation.basic_rag import BasicRAGConfig
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config

    cfg = DecoderConfig(hidden=128, layers=2, heads=4, max_len=384)
    trainer = LMTrainer(cfg, lr=3e-3, batch_size=3, seq_len=192)
    report = trainer.train(lm_catalog, epochs=250)
    assert report.final_loss < 0.05, report.losses[-5:]
    llm = trainer.to_llm(max_prompt_len=320, max_new_tokens=16)

    config = ExecutorConfig(
        pipelines=[
            BasicRAGConfig(
                name="rag_jaxlm", retrieval_pipeline_name="bm25", llm=llm, top_k=1
            )
        ],
        metrics=[
            BaseMetricConfig(name="exact_match", metric_type="generation"),
            BaseMetricConfig(name="token_f1", metric_type="generation"),
        ],
        health_check=False,
    )
    ctx = BuildContext(pipeline_configs={"bm25": BM25Config(name="bm25")})
    result = Executor(lm_catalog, config, ctx).run()
    assert result.success, result.report()
    metrics = {m.metric_name: m for m in result.pipelines[0].metrics}
    em_rag = metrics["exact_match"].average

    # ablation: identical LM + prompt shape, context withheld
    from autorag_research_tpu.evaluation.metrics.generation import exact_match
    from autorag_research_tpu.models.lm_trainer import DEFAULT_LM_PROMPT
    from autorag_research_tpu.schema import MetricInput

    queries = [("capital of france", "paris"), ("capital of germany", "berlin"), ("color of the sky", "blue")]
    prompts = [
        DEFAULT_LM_PROMPT.format(context="(no context retrieved)", query=q)
        for q, _ in queries
    ]
    outs = llm.generate_batch(prompts)
    em_ablation = np.mean(
        exact_match(
            [
                MetricInput(generated_texts=o, generation_gt=[a])
                for o, (_, a) in zip(outs, queries)
            ]
        )
    )
    assert em_rag >= 2 / 3, (em_rag, outs)
    assert em_rag > em_ablation, (em_rag, em_ablation, outs)


def test_basic_rag_generate_batch_by_texts(lm_catalog):
    """The serving micro-batch path returns per-query results with evidence
    ids; with a batch-capable LLM it uses one batched decode."""
    from autorag_research_tpu.config import BuildContext
    from autorag_research_tpu.llm import MockLLM
    from autorag_research_tpu.pipelines.generation.basic_rag import BasicRAGPipeline
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config

    ctx = BuildContext(pipeline_configs={})
    retr = BM25Config(name="bm25").build(lm_catalog, ctx)

    calls = []

    class BatchLLM(MockLLM):
        def generate_batch(self, prompts):
            calls.append(len(prompts))
            return [f"batched answer {i}" for i in range(len(prompts))]

    pipe = BasicRAGPipeline(lm_catalog, retrieval_pipeline=retr, llm=BatchLLM())
    out = pipe.generate_batch_by_texts(["capital of france", "color of the sky"], top_k=1)
    assert [r.text for r in out] == ["batched answer 0", "batched answer 1"]
    assert calls == [2]  # ONE batched decode
    assert all(r.metadata["context_chunk_ids"] for r in out)
