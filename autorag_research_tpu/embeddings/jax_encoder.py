"""On-TPU embedding adapter backed by the native JAX encoder.

Bridges ``models/encoder.py`` into the embedding protocol so index builds run
batched TPU inference (the reference's only local path is per-batch torch
ColPali, ``embeddings/colpali.py:106-147``). Works offline with hash-bucket
tokenization and random-init or loaded params; production checkpoints load
via ``params_path`` (.npz of the param pytree).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autorag_research_tpu.embeddings.base import BaseEmbedding, MultiVectorEmbedding
from autorag_research_tpu.models.encoder import (
    EncoderConfig,
    RetrievalEncoder,
    hash_tokenize,
)


def _flatten_params(params, prefix=""):
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten_params(v, f"{prefix}{k}."))
    elif isinstance(params, list):
        for i, v in enumerate(params):
            flat.update(_flatten_params(v, f"{prefix}{i}."))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def save_params(params, path: str | Path) -> None:
    np.savez_compressed(path, **_flatten_params(params))


def load_params(template, path: str | Path):
    data = np.load(path)

    def restore(node, prefix=""):
        if isinstance(node, dict):
            return {k: restore(v, f"{prefix}{k}.") for k, v in node.items()}
        if isinstance(node, list):
            return [restore(v, f"{prefix}{i}.") for i, v in enumerate(node)]
        return jnp.asarray(data[prefix[:-1]])

    return restore(template)


class _EncoderBase:
    def __init__(
        self,
        config: EncoderConfig | None = None,
        params_path: str | Path | None = None,
        seed: int = 0,
        batch_size: int = 256,
    ):
        self.config = config or EncoderConfig()
        self.encoder = RetrievalEncoder(self.config)
        self.params = self.encoder.init(seed)
        if params_path is not None:
            self.params = load_params(self.params, params_path)
        self.batch_size = batch_size
        self.dim = self.config.out_dim
        self._forward = jax.jit(self.encoder.__call__)

    def _encode(self, texts: Sequence[str]) -> np.ndarray | list[np.ndarray]:
        outs = []
        for start in range(0, len(texts), self.batch_size):
            chunk = list(texts[start : start + self.batch_size])
            # pad the tail chunk to ONE compiled shape per instance: every
            # distinct batch size is a distinct jit shape, and a remote-TPU
            # compile costs tens of seconds (same fix as JaxCrossEncoder)
            n_real = len(chunk)
            pad = self.batch_size - n_real if n_real < self.batch_size else 0
            if pad:
                chunk = chunk + [""] * pad
            ids, mask = hash_tokenize(chunk, self.config.vocab_size, self.config.max_len)
            emb = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))
            outs.append(
                (np.asarray(emb, dtype=np.float32)[:n_real], mask[:n_real])
            )
        if self.config.multi_vector:
            result = []
            for emb, mask in outs:
                for row_emb, row_mask in zip(emb, mask):
                    result.append(row_emb[row_mask])
            return result
        return np.concatenate([o[0] for o in outs])


class JaxEncoderEmbedding(_EncoderBase, BaseEmbedding):
    """Single-vector on-TPU embedder."""

    def __init__(self, config: EncoderConfig | None = None, **kw):
        config = config or EncoderConfig(multi_vector=False)
        assert not config.multi_vector
        super().__init__(config, **kw)

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        return self._encode(texts)  # type: ignore[return-value]

    def embed_texts_device(self, texts: Sequence[str]):
        """Serving hot path: embeddings stay ON DEVICE (a jax.Array), so the
        caller can chain the retrieval kernel without an intermediate
        device->host readback — through the axon tunnel a chained dispatch
        costs ~8 ms vs ~34 ms for a readback round-trip
        (scripts/profile_query_floor.py)."""
        import jax.numpy as jnp

        outs = []
        for start in range(0, len(texts), self.batch_size):
            chunk = list(texts[start : start + self.batch_size])
            n_real = len(chunk)
            pad = self.batch_size - n_real if n_real < self.batch_size else 0
            if pad:
                chunk = chunk + [""] * pad
            ids, mask = hash_tokenize(chunk, self.config.vocab_size, self.config.max_len)
            emb = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))
            outs.append(emb[:n_real])
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


class JaxEncoderMultiVectorEmbedding(_EncoderBase, MultiVectorEmbedding):
    """Token-level (late interaction) on-TPU embedder."""

    def __init__(self, config: EncoderConfig | None = None, **kw):
        config = config or EncoderConfig(multi_vector=True)
        assert config.multi_vector
        super().__init__(config, **kw)

    def embed_texts_multi(self, texts: Sequence[str]) -> list[np.ndarray]:
        return self._encode(texts)  # type: ignore[return-value]
