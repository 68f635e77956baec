"""TPU-native cross-encoder: forward, pairwise training, reranker adapter.

The on-device counterpart of the reference's torch cross-encoder rerankers
(reference rerankers/ listing, SURVEY.md §2.6)."""

import numpy as np
import pytest

from autorag_research_tpu.models.cross_encoder import (
    CrossEncoder,
    CrossEncoderTrainer,
    pair_tokenize,
    pairwise_train_step,
)
from autorag_research_tpu.models.encoder import EncoderConfig

CFG = EncoderConfig(vocab_size=512, hidden=32, layers=2, heads=2, max_len=16, out_dim=16)


def test_forward_scalar_scores():
    import jax.numpy as jnp

    enc = CrossEncoder(CFG)
    params = enc.init(0)
    ids, mask = pair_tokenize(["what is x", "who is y"], ["x is a thing", "y is a person"], 512, 16)
    scores = enc(params, jnp.asarray(ids), jnp.asarray(mask))
    assert scores.shape == (2,)
    assert np.isfinite(np.asarray(scores)).all()


def test_pair_tokenize_layout():
    ids, mask = pair_tokenize(["a b"], ["c d e"], 512, 16)
    assert mask[0].sum() == 2 + 1 + 3  # query + SEP + doc
    assert ids[0, 2] == 1  # SEP between the legs
    # swapping the doc changes the sequence (joint encoding, not bi-encoder)
    ids2, _ = pair_tokenize(["a b"], ["z"], 512, 16)
    assert not np.array_equal(ids, ids2)


def test_pairwise_training_separates(tmp_path):
    import jax.numpy as jnp

    enc = CrossEncoder(CFG)
    params = enc.init(0)
    queries = [f"find topic {chr(97 + i)}" for i in range(8)]
    pos = [f"topic {chr(97 + i)} document body" for i in range(8)]
    neg = [pos[(i + 3) % 8] for i in range(8)]
    pos_ids, pos_mask = pair_tokenize(queries, pos, 512, 16)
    neg_ids, neg_mask = pair_tokenize(queries, neg, 512, 16)
    batch = {
        "pos_ids": jnp.asarray(pos_ids), "pos_mask": jnp.asarray(pos_mask),
        "neg_ids": jnp.asarray(neg_ids), "neg_mask": jnp.asarray(neg_mask),
    }
    import jax

    step = jax.jit(lambda p, b: pairwise_train_step(enc, p, b, lr=0.01))
    losses = []
    for _ in range(300):
        params, loss = step(params, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    s_pos = np.asarray(enc(params, batch["pos_ids"], batch["pos_mask"]))
    s_neg = np.asarray(enc(params, batch["neg_ids"], batch["neg_mask"]))
    assert (s_pos > s_neg).mean() >= 0.75  # trained separation


def test_trainer_and_reranker_roundtrip(tmp_path):
    from autorag_research_tpu.rerankers.jax_cross import JaxCrossEncoderReranker
    from autorag_research_tpu.store.catalog import Catalog
    from autorag_research_tpu.store.gt import or_all

    cat = Catalog(tmp_path / "ce.db")
    docs = [f"topic {chr(97 + i)} document body {i}" for i in range(8)]
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(docs)])
    cat.add_queries([{"id": i, "contents": f"find topic {chr(97 + i)}"} for i in range(8)])
    for i in range(8):
        cat.add_retrieval_gt(i, or_all([i]))

    def mean_gold_rank(reranker):
        ranks = []
        for i in range(8):
            hits = reranker.rerank(f"find topic {chr(97 + i)}", docs)
            ranks.append(next(r for r, h in enumerate(hits) if h.text == docs[i]))
        return sum(ranks) / len(ranks)

    untrained = JaxCrossEncoderReranker(CFG, seed=0)
    baseline = mean_gold_rank(untrained)

    trainer = CrossEncoderTrainer(CFG, lr=0.01, batch_size=8)
    report = trainer.train(cat, epochs=600)
    assert report.final_loss < report.losses[0]

    reranker = trainer.as_reranker()
    trained = mean_gold_rank(reranker)
    assert trained < baseline  # training moved gold docs up the ranking

    # save -> load through the checkpoint path: identical ordering
    trainer.save(tmp_path / "ce_params.npz")
    loaded = JaxCrossEncoderReranker(CFG, params_path=tmp_path / "ce_params.npz")
    hits = reranker.rerank("find topic c", docs, top_k=3)
    hits2 = loaded.rerank("find topic c", docs, top_k=3)
    assert [h.text for h in hits2] == [h.text for h in hits]


def test_injection_preset():
    from autorag_research_tpu.injection import ModelRegistry

    registry = ModelRegistry(health_check=False)
    r = registry._instantiate(
        "reranker",
        {"type": "jax_cross_encoder", "vocab_size": 256, "hidden": 32,
         "layers": 1, "heads": 2, "max_len": 16, "out_dim": 16},
    )
    out = r.rerank("query", ["a doc", "another doc"])
    assert len(out) == 2
    # and the bare builtin name resolves
    assert registry._resolve_spec("reranker", "jax_cross_encoder") == {
        "type": "jax_cross_encoder"
    }


def test_rerank_pipeline_with_jax_cross_encoder(tmp_path):
    """End-to-end: BM25 candidates reranked by the TPU-native cross-encoder
    through the executor (the rerank wrapper + injection preset path)."""
    from autorag_research_tpu.config import BaseMetricConfig, BuildContext, ExecutorConfig
    from autorag_research_tpu.executor import Executor
    from autorag_research_tpu.index import registry
    from autorag_research_tpu.injection import ModelRegistry
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Config
    from autorag_research_tpu.pipelines.retrieval.rerank import RerankConfig
    from autorag_research_tpu.store.catalog import Catalog

    registry.invalidate()
    cat = Catalog(tmp_path / "rr.db")
    docs = ["Paris is the capital of France", "Berlin is in Germany", "dogs are pets"]
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(docs)])
    cat.add_queries([{"id": 0, "contents": "capital of France"}])
    cat.add_retrieval_gt(0, 0)
    cfg = ExecutorConfig(
        pipelines=[
            RerankConfig(
                name="rr", inner_retrieval_pipeline_name="bm25_leg",
                reranker="jax_cross_encoder", top_k=2,
            )
        ],
        metrics=[BaseMetricConfig(name="recall")],
        health_check=False,
    )
    context = BuildContext(
        models=ModelRegistry(health_check=False),
        pipeline_configs={"bm25_leg": BM25Config(name="bm25_leg", top_k=3)},
    )
    result = Executor(cat, cfg, context).run()
    assert result.success, result.report()
    registry.invalidate()


class TestFormatSpecificRerankers:
    """The reference's reranker long tail: flag-LLM, TART, flashrank, openvino."""

    def test_flag_llm_reranker_runs(self, tmp_path):
        from tiny_models import build_causal_checkpoint

        from autorag_research_tpu.rerankers.hf import FlagLLMReranker

        ckpt = build_causal_checkpoint(str(tmp_path / "gpt"))
        rr = FlagLLMReranker(ckpt, batch_size=2)
        out = rr.rerank("the capital of france", ["paris city", "cats sit on mats", "europe"])
        assert len(out) == 3
        # FlagEmbedding convention: raw Yes-token logits (unbounded, finite)
        assert all(np.isfinite(r.score) for r in out)
        # sorted descending, deterministic
        assert [r.score for r in out] == sorted((r.score for r in out), reverse=True)
        again = rr.rerank("the capital of france", ["paris city", "cats sit on mats", "europe"])
        assert [r.index for r in again] == [r.index for r in out]

    def test_tart_reranker_instruction_changes_scores(self, tmp_path):
        from tiny_models import build_seqcls_checkpoint

        from autorag_research_tpu.rerankers.hf import TARTReranker

        ckpt = build_seqcls_checkpoint(str(tmp_path / "cls"))
        a = TARTReranker(ckpt, instruction="retrieval question answer")
        b = TARTReranker(ckpt, instruction="entirely unrelated gibberish alpha beta")
        texts = ["paris is the capital", "cats sit on mats"]
        sa = {r.index: r.score for r in a.rerank("capital of france", texts)}
        sb = {r.index: r.score for r in b.rerank("capital of france", texts)}
        assert sa != sb  # the instruction is part of the model input
        assert len(sa) == len(sb) == 2

    def test_flashrank_and_openvino_raise_cleanly(self, tmp_path):
        import pytest as _pytest

        from autorag_research_tpu.exceptions import ModelLoadError
        from autorag_research_tpu.rerankers.hf import FlashRankReranker, OpenVINOReranker

        with _pytest.raises(ModelLoadError, match="onnxruntime"):
            FlashRankReranker(str(tmp_path)).rerank("q", ["a"])
        with _pytest.raises(ModelLoadError, match="optimum-intel"):
            OpenVINOReranker(str(tmp_path)).rerank("q", ["a"])

    def test_injection_names_resolve(self):
        from autorag_research_tpu.injection import _FACTORIES

        for name in ("flag_embedding_llm", "tart", "flashrank", "openvino",
                     "koreranker", "sentence_transformer", "flag_embedding"):
            assert name in _FACTORIES["reranker"], name
