"""JAX retrieval encoder: the framework's native embedding model family.

The reference performs *no local model math of its own* — its only local
inference path is torch ColPali/BiPali adapters (``embeddings/colpali.py:56-245``,
``embeddings/bipali.py:53-255``); everything else is remote APIs. A TPU-native
framework needs an on-device encoder for (a) index-build embedding throughput
at TPU speed and (b) training/fine-tuning bi-encoders on the mesh. This module
implements a BERT-style transformer bi-encoder in pure JAX (explicit pytree
params + PartitionSpecs, no framework metadata):

- single-vector mode: masked mean pool -> projection -> L2 norm (dense index);
- multi-vector mode: per-token projection -> L2 norm (ColBERT/ColPali-style
  late interaction, feeds the MaxSim index);
- ``contrastive_train_step``: InfoNCE with in-batch negatives — the standard
  dense-retrieval objective — with gradient application inline (SGD or the
  caller's optax optimizer).

Sharding: params carry a PartitionSpec tree over mesh axes ("dp", "tp") —
attention/MLP hidden dims shard over "tp", batch shards over "dp"; XLA inserts
the collectives.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 32768
    hidden: int = 256
    layers: int = 4
    heads: int = 4
    mlp_ratio: int = 4
    max_len: int = 128
    out_dim: int = 128
    multi_vector: bool = False
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


def _init_dense(key, shape, scale=0.02):
    return jax.random.normal(key, shape) * scale


def init_params(config: EncoderConfig, key: jax.Array) -> dict:
    keys = jax.random.split(key, 4 + config.layers)
    params = {
        "embed": _init_dense(keys[0], (config.vocab_size, config.hidden)),
        "pos": _init_dense(keys[1], (config.max_len, config.hidden)),
        "out_proj": _init_dense(keys[2], (config.hidden, config.out_dim)),
        "final_ln": {"scale": jnp.ones(config.hidden), "bias": jnp.zeros(config.hidden)},
        "blocks": [],
    }
    h, m = config.hidden, config.hidden * config.mlp_ratio
    for i in range(config.layers):
        bk = jax.random.split(keys[4 + i], 6)
        params["blocks"].append(
            {
                "ln1": {"scale": jnp.ones(h), "bias": jnp.zeros(h)},
                "qkv": _init_dense(bk[0], (h, 3 * h)),
                "attn_out": _init_dense(bk[1], (h, h)),
                "ln2": {"scale": jnp.ones(h), "bias": jnp.zeros(h)},
                "mlp_in": _init_dense(bk[2], (h, m)),
                "mlp_bias": jnp.zeros(m),
                "mlp_out": _init_dense(bk[3], (m, h)),
            }
        )
    return params


def param_specs(config: EncoderConfig) -> dict:
    """PartitionSpec tree: hidden-dim tensor parallelism over axis 'tp'."""
    block = {
        "ln1": {"scale": P(None), "bias": P(None)},
        "qkv": P(None, "tp"),
        "attn_out": P("tp", None),
        "ln2": {"scale": P(None), "bias": P(None)},
        "mlp_in": P(None, "tp"),
        "mlp_bias": P("tp"),
        "mlp_out": P("tp", None),
    }
    return {
        "embed": P(None, "tp"),
        "pos": P(None, "tp"),
        "out_proj": P(None, None),
        "final_ln": {"scale": P(None), "bias": P(None)},
        "blocks": [block for _ in range(config.layers)],
    }


def _layer_norm(x, scale, bias, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _attention(x, qkv_w, out_w, mask, config: EncoderConfig):
    b, t, h = x.shape
    qkv = jnp.einsum("bth,hk->btk", x, qkv_w)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(a):
        return a.reshape(b, t, config.heads, config.head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(config.head_dim)
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, h)
    return jnp.einsum("bth,ho->bto", ctx, out_w)


class RetrievalEncoder:
    """Functional transformer encoder; all state in an explicit params dict."""

    def __init__(self, config: EncoderConfig):
        self.config = config

    def init(self, seed: int = 0) -> dict:
        return init_params(self.config, jax.random.PRNGKey(seed))

    def __call__(self, params: dict, token_ids: jax.Array, mask: jax.Array) -> jax.Array:
        """token_ids/mask: [B, T]. Returns [B, out_dim] (single-vector) or
        [B, T, out_dim] (multi-vector), L2-normalized."""
        cfg = self.config
        x = params["embed"][token_ids] + params["pos"][: token_ids.shape[1]][None]
        x = x.astype(cfg.dtype)
        for blk in params["blocks"]:
            y = _layer_norm(x, blk["ln1"]["scale"], blk["ln1"]["bias"])
            x = x + _attention(y, blk["qkv"], blk["attn_out"], mask, cfg)
            y = _layer_norm(x, blk["ln2"]["scale"], blk["ln2"]["bias"])
            y = jax.nn.gelu(jnp.einsum("bth,hm->btm", y, blk["mlp_in"]) + blk["mlp_bias"])
            x = x + jnp.einsum("btm,mh->bth", y, blk["mlp_out"])
        x = _layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"])
        tokens = jnp.einsum("bth,ho->bto", x, params["out_proj"])
        if cfg.multi_vector:
            tokens = tokens * mask[..., None]
            norms = jnp.linalg.norm(tokens, axis=-1, keepdims=True)
            return tokens / jnp.where(norms == 0, 1.0, norms)
        maskf = mask.astype(tokens.dtype)[..., None]
        pooled = (tokens * maskf).sum(1) / jnp.maximum(maskf.sum(1), 1.0)
        norms = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        return pooled / jnp.where(norms == 0, 1.0, norms)


def info_nce_loss(q_emb: jax.Array, d_emb: jax.Array, temperature: float = 0.05):
    """In-batch-negative contrastive loss; positives on the diagonal."""
    logits = q_emb @ d_emb.T / temperature
    labels = jnp.arange(q_emb.shape[0])
    return jnp.mean(
        -jax.nn.log_softmax(logits, axis=-1)[labels, labels]
    )


def contrastive_train_step(
    encoder: RetrievalEncoder,
    params: dict,
    batch: dict,
    lr: float = 1e-3,
    temperature: float = 0.05,
):
    """One SGD step of bi-encoder training. batch: q_ids/q_mask/d_ids/d_mask
    [B, T]. Returns (new_params, loss). Jit this under a mesh with params
    sharded by :func:`param_specs` and batch rows over 'dp'."""

    def loss_fn(p):
        q = encoder(p, batch["q_ids"], batch["q_mask"])
        d = encoder(p, batch["d_ids"], batch["d_mask"])
        if encoder.config.multi_vector:
            # late-interaction training: MaxSim as the similarity. Doc pad
            # positions are zero VECTORS, so an unmasked max(-1) floors every
            # per-token maxsim at 0 and erases the gradient of anti-correlated
            # negatives — exclude pads with a NEG_INF bias exactly like the
            # serving kernel (ops/maxsim), then mask pad QUERY tokens out of
            # the sum
            sim = jnp.einsum("qtd,nsd->qnts", q, d)
            d_bias = jnp.where(batch["d_mask"][None, :, None, :] > 0, 0.0, -1e9)
            per_tok = (sim + d_bias).max(-1)  # [Q, N, Tq]
            per_tok = per_tok * batch["q_mask"][:, None, :]
            scores = per_tok.sum(-1) / jnp.maximum(
                batch["q_mask"].sum(-1)[:, None], 1
            )
            labels = jnp.arange(q.shape[0])
            return jnp.mean(-jax.nn.log_softmax(scores / temperature, -1)[labels, labels])
        return info_nce_loss(q, d, temperature)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


# ----------------------------------------------------------- tokenization
def hash_tokenize(
    texts: list[str], vocab_size: int, max_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic hash-bucket tokenizer (feature hashing) so the encoder
    runs fully offline; swap in an HF tokenizer for trained checkpoints."""
    import hashlib

    ids = np.zeros((len(texts), max_len), dtype=np.int32)
    mask = np.zeros((len(texts), max_len), dtype=np.bool_)
    for i, text in enumerate(texts):
        toks = text.lower().split()[:max_len]
        for j, t in enumerate(toks):
            digest = hashlib.md5(t.encode()).digest()
            ids[i, j] = 1 + int.from_bytes(digest[:4], "little") % (vocab_size - 1)
            mask[i, j] = True
        if not toks:
            mask[i, 0] = True
    return ids, mask
