"""Encoder model: forward shapes/norms, training step, sharded step, adapter."""

import numpy as np
import pytest

from autorag_research_tpu.models.encoder import (
    EncoderConfig,
    RetrievalEncoder,
    contrastive_train_step,
    hash_tokenize,
    param_specs,
)


@pytest.fixture(scope="module")
def tiny_config():
    return EncoderConfig(vocab_size=512, hidden=32, layers=2, heads=2, max_len=8, out_dim=16)


def test_forward_single_vector(tiny_config):
    import jax.numpy as jnp

    enc = RetrievalEncoder(tiny_config)
    params = enc.init(0)
    ids, mask = hash_tokenize(["hello world", "a"], 512, 8)
    out = enc(params, jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-5)


def test_forward_multi_vector(tiny_config):
    import dataclasses

    import jax.numpy as jnp

    cfg = dataclasses.replace(tiny_config, multi_vector=True)
    enc = RetrievalEncoder(cfg)
    params = enc.init(0)
    ids, mask = hash_tokenize(["one two three"], 512, 8)
    out = np.asarray(enc(params, jnp.asarray(ids), jnp.asarray(mask)))
    assert out.shape == (1, 8, 16)
    # masked (pad) token rows are zero, real rows unit-norm
    norms = np.linalg.norm(out[0], axis=-1)
    np.testing.assert_allclose(norms[:3], 1.0, rtol=1e-5)
    np.testing.assert_allclose(norms[3:], 0.0, atol=1e-6)


def test_train_step_reduces_loss(tiny_config):
    import jax.numpy as jnp

    enc = RetrievalEncoder(tiny_config)
    params = enc.init(0)
    rng = np.random.default_rng(0)
    batch = {
        "q_ids": jnp.asarray(rng.integers(1, 512, size=(8, 8), dtype=np.int32)),
        "q_mask": jnp.ones((8, 8), dtype=bool),
        "d_ids": jnp.asarray(rng.integers(1, 512, size=(8, 8), dtype=np.int32)),
        "d_mask": jnp.ones((8, 8), dtype=bool),
    }
    losses = []
    for _ in range(5):
        params, loss = contrastive_train_step(enc, params, batch, lr=0.05)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_sharded_train_step(tiny_config):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dp", "tp"))
    enc = RetrievalEncoder(tiny_config)
    params = enc.init(0)
    specs = param_specs(tiny_config)
    params = jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )
    rng = np.random.default_rng(1)
    bspec = NamedSharding(mesh, P("dp", None))
    batch = {
        "q_ids": jax.device_put(jnp.asarray(rng.integers(1, 512, size=(8, 8), dtype=np.int32)), bspec),
        "q_mask": jax.device_put(jnp.ones((8, 8), dtype=bool), bspec),
        "d_ids": jax.device_put(jnp.asarray(rng.integers(1, 512, size=(8, 8), dtype=np.int32)), bspec),
        "d_mask": jax.device_put(jnp.ones((8, 8), dtype=bool), bspec),
    }
    step = jax.jit(lambda p, b: contrastive_train_step(enc, p, b, lr=0.05))
    new_params, loss = step(params, batch)
    assert np.isfinite(float(loss))
    # parity with unsharded step
    params_local = enc.init(0)
    _, loss_local = contrastive_train_step(enc, params_local, jax.device_get(batch), lr=0.05)
    assert float(loss) == pytest.approx(float(loss_local), rel=1e-4)


def test_jax_embedding_adapter_roundtrip(tmp_path, tiny_config):
    from autorag_research_tpu.embeddings.jax_encoder import (
        JaxEncoderEmbedding,
        load_params,
        save_params,
    )

    emb = JaxEncoderEmbedding(tiny_config, batch_size=4)
    out = emb.embed_texts(["alpha beta", "gamma", "alpha beta"])
    assert out.shape == (3, 16)
    np.testing.assert_allclose(out[0], out[2], rtol=1e-6)  # deterministic
    save_params(emb.params, tmp_path / "params.npz")
    emb2 = JaxEncoderEmbedding(tiny_config, params_path=tmp_path / "params.npz")
    # atol floor: emb2 (default batch_size) compiles a different padded batch
    # shape than emb, and XLA's per-shape fusion reassociates float reductions
    # at the 1e-7 level — identical params, not identical rounding
    np.testing.assert_allclose(
        emb2.embed_texts(["alpha beta"])[0], out[0], rtol=1e-5, atol=1e-6
    )


def test_multi_vector_adapter(tiny_config):
    import dataclasses

    from autorag_research_tpu.embeddings.jax_encoder import JaxEncoderMultiVectorEmbedding

    cfg = dataclasses.replace(tiny_config, multi_vector=True)
    emb = JaxEncoderMultiVectorEmbedding(cfg)
    mats = emb.embed_texts_multi(["one two three", "four"])
    assert mats[0].shape == (3, 16)
    assert mats[1].shape == (1, 16)


class TestTrainer:
    def test_train_on_catalog_improves_retrieval(self, tmp_path):
        import dataclasses

        from autorag_research_tpu.index.dense import DenseIndex
        from autorag_research_tpu.models.trainer import BiEncoderTrainer, build_pairs
        from autorag_research_tpu.store.catalog import Catalog
        from autorag_research_tpu.store.gt import or_all

        cat = Catalog(tmp_path / "t.db")
        docs = [f"topic {chr(97 + i)} document body {i}" for i in range(8)]
        cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(docs)])
        cat.add_queries(
            [{"id": i, "contents": f"find topic {chr(97 + i)}"} for i in range(8)]
        )
        for i in range(8):
            cat.add_retrieval_gt(i, or_all([i]))

        assert len(build_pairs(cat)) == 8
        cfg = EncoderConfig(vocab_size=512, hidden=32, layers=2, heads=2, max_len=8, out_dim=16)
        trainer = BiEncoderTrainer(cfg, lr=0.005, batch_size=8)
        report = trainer.train(cat, epochs=60)
        assert report.steps == 60
        assert report.final_loss < report.losses[0]

        # trained encoder should retrieve its own gold docs well
        emb = trainer.as_embedding()
        ids, _ = cat.get_embeddings_matrix("chunk")
        mat = emb.embed_texts(docs)
        idx = DenseIndex(list(range(8)), mat)
        hits = idx.search(emb.embed_texts([f"find topic {chr(97 + i)}" for i in range(8)]), 3)
        top1 = sum(1 for i, row in enumerate(hits) if row[0].doc_id == i)
        assert top1 >= 5  # contrastive training aligned queries to gold docs

    def test_trainer_sharded_mesh(self, tmp_path):
        import jax
        import numpy as np
        from jax.sharding import Mesh

        from autorag_research_tpu.models.trainer import BiEncoderTrainer
        from autorag_research_tpu.store.catalog import Catalog

        cat = Catalog(tmp_path / "tm.db")
        cat.add_chunks([{"id": i, "contents": f"doc {i}"} for i in range(8)])
        cat.add_queries([{"id": i, "contents": f"query {i}"} for i in range(8)])
        for i in range(8):
            cat.add_retrieval_gt(i, i)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))
        cfg = EncoderConfig(vocab_size=256, hidden=32, layers=1, heads=2, max_len=8, out_dim=16)
        trainer = BiEncoderTrainer(cfg, batch_size=8, mesh=mesh)
        report = trainer.train(cat, epochs=2)
        assert report.steps == 2
        assert all(np.isfinite(report.losses))

    def test_save_and_serve(self, tmp_path):
        from autorag_research_tpu.embeddings.jax_encoder import JaxEncoderEmbedding
        from autorag_research_tpu.models.trainer import BiEncoderTrainer
        from autorag_research_tpu.store.catalog import Catalog

        cat = Catalog(tmp_path / "ts.db")
        cat.add_chunks([{"id": 0, "contents": "a"}, {"id": 1, "contents": "b"}])
        cat.add_queries([{"id": 0, "contents": "qa"}, {"id": 1, "contents": "qb"}])
        cat.add_retrieval_gt(0, 0)
        cat.add_retrieval_gt(1, 1)
        cfg = EncoderConfig(vocab_size=256, hidden=32, layers=1, heads=2, max_len=8, out_dim=16)
        trainer = BiEncoderTrainer(cfg, batch_size=2)
        trainer.train(cat, epochs=1)
        trainer.save(tmp_path / "params.npz")
        served = JaxEncoderEmbedding(cfg, params_path=tmp_path / "params.npz")
        import numpy as np

        np.testing.assert_allclose(
            served.embed_texts(["hello"])[0],
            trainer.as_embedding().embed_texts(["hello"])[0],
            rtol=1e-6,
        )


def test_trainer_adamw(tmp_path):
    from autorag_research_tpu.models.trainer import BiEncoderTrainer
    from autorag_research_tpu.store.catalog import Catalog
    from autorag_research_tpu.store.gt import or_all

    cat = Catalog(tmp_path / "aw.db")
    docs = [f"topic {chr(97 + i)} document" for i in range(8)]
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(docs)])
    cat.add_queries([{"id": i, "contents": f"find topic {chr(97 + i)}"} for i in range(8)])
    for i in range(8):
        cat.add_retrieval_gt(i, or_all([i]))
    cfg = EncoderConfig(vocab_size=512, hidden=32, layers=2, heads=2, max_len=8, out_dim=16)
    trainer = BiEncoderTrainer(cfg, lr=1e-3, batch_size=8, optimizer="adamw")
    report = trainer.train(cat, epochs=40)
    assert report.final_loss < report.losses[0]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        BiEncoderTrainer(cfg, optimizer="nope")


def test_distributed_helper_single_host():
    from autorag_research_tpu.parallel.distributed import initialize_distributed

    # single-host environment: must be a safe no-op returning False
    assert initialize_distributed() is False
