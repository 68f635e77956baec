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
    np.testing.assert_allclose(emb2.embed_texts(["alpha beta"])[0], out[0], rtol=1e-6)


def test_multi_vector_adapter(tiny_config):
    import dataclasses

    from autorag_research_tpu.embeddings.jax_encoder import JaxEncoderMultiVectorEmbedding

    cfg = dataclasses.replace(tiny_config, multi_vector=True)
    emb = JaxEncoderMultiVectorEmbedding(cfg)
    mats = emb.embed_texts_multi(["one two three", "four"])
    assert mats[0].shape == (3, 16)
    assert mats[1].shape == (1, 16)
