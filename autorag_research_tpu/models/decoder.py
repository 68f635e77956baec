"""JAX causal decoder LM: the framework's native on-device generation model.

The reference reaches LLMs only through LangChain API adapters
(``injection.py:226-342``, ``configs/llm/*.yaml``) — it has no local
generation path at all. This module gives the TPU framework one: a causal
transformer with KV-cache greedy/temperature decoding whose ENTIRE
prefill+decode loop runs inside a single jit (``lax.scan`` over decode steps,
static shapes) — one device dispatch per generate call, which matters when
per-call dispatch costs ~30ms through the axon tunnel.

Design notes (TPU-first):
- prompts are LEFT-padded to a static prompt bucket so every row decodes at
  the same slot index; real token positions come from cumsum(mask) so
  position embeddings stay correct for short prompts;
- the KV cache is a preallocated [B, H, T_total, D] buffer per layer filled
  by the batched prefill and extended in-place (dynamic_update_slice) by the
  scan — no recompilation across steps, no growing shapes;
- eos handling is branch-free: finished rows keep emitting pad and the mask
  freezes, so the scan length is static and XLA fuses the whole loop;
- weights are tied (logits = x @ embed.T); params carry PartitionSpecs over
  ("dp", "tp") like the encoder so the same mesh trains/serves both.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from autorag_research_tpu.models.encoder import _init_dense, _layer_norm

PAD_ID = 0
BOS_ID = 1
EOS_ID = 2
_BYTE_OFFSET = 3


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 259  # 256 bytes + pad/bos/eos
    hidden: int = 256
    layers: int = 4
    heads: int = 4
    mlp_ratio: int = 4
    max_len: int = 512  # prompt + generation budget
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


def init_params(config: DecoderConfig, key: jax.Array) -> dict:
    keys = jax.random.split(key, 2 + config.layers)
    params = {
        "embed": _init_dense(keys[0], (config.vocab_size, config.hidden)),
        "pos": _init_dense(keys[1], (config.max_len, config.hidden)),
        "final_ln": {"scale": jnp.ones(config.hidden), "bias": jnp.zeros(config.hidden)},
        "blocks": [],
    }
    h, m = config.hidden, config.hidden * config.mlp_ratio
    for i in range(config.layers):
        bk = jax.random.split(keys[2 + i], 4)
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


def param_specs(config: DecoderConfig) -> dict:
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
        "final_ln": {"scale": P(None), "bias": P(None)},
        "blocks": [block for _ in range(config.layers)],
    }


def _split_heads(a, b, t, cfg: DecoderConfig):
    return a.reshape(b, t, cfg.heads, cfg.head_dim).transpose(0, 2, 1, 3)


class CausalDecoder:
    """Functional causal transformer; all state in an explicit params dict."""

    def __init__(self, config: DecoderConfig):
        self.config = config

    def init(self, seed: int = 0) -> dict:
        return init_params(self.config, jax.random.PRNGKey(seed))

    # ---------------------------------------------------------------- prefill
    def __call__(self, params, token_ids, mask, return_cache: bool = False):
        """Batched causal forward. token_ids/mask: [B, T].

        Returns logits [B, T, V]; with ``return_cache=True`` also returns the
        per-layer KV cache padded to ``max_len`` slots for decode extension.
        """
        cfg = self.config
        b, t = token_ids.shape
        # real positions for left-padded rows: pads get 0, tokens 0..len-1
        pos_ids = jnp.maximum(jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0)
        x = params["embed"][token_ids] + params["pos"][pos_ids]
        x = x.astype(cfg.dtype)
        causal = jnp.tril(jnp.ones((t, t), dtype=bool))
        attn_mask = causal[None] & mask[:, None, :]  # [B, Tq, Tk]
        cache = []
        for blk in params["blocks"]:
            y = _layer_norm(x, blk["ln1"]["scale"], blk["ln1"]["bias"])
            qkv = jnp.einsum("bth,hk->btk", y, blk["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (_split_heads(a, b, t, cfg) for a in (q, k, v))
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(cfg.head_dim)
            scores = jnp.where(attn_mask[:, None], scores, -1e30)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden)
            x = x + jnp.einsum("bth,ho->bto", ctx, blk["attn_out"])
            y = _layer_norm(x, blk["ln2"]["scale"], blk["ln2"]["bias"])
            y = jax.nn.gelu(jnp.einsum("bth,hm->btm", y, blk["mlp_in"]) + blk["mlp_bias"])
            x = x + jnp.einsum("btm,mh->bth", y, blk["mlp_out"])
            if return_cache:
                pad = cfg.max_len - t
                cache.append(
                    {
                        "k": jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0))),
                        "v": jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0))),
                    }
                )
        x = _layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"])
        logits = jnp.einsum("bth,vh->btv", x, params["embed"])
        return (logits, cache) if return_cache else logits

    # ------------------------------------------------------------ decode step
    def _step(self, params, cache, token, pos_id, slot, kv_mask):
        """Single-token forward against the cache.

        token [B], pos_id [B] real position, slot scalar cache write index,
        kv_mask [B, max_len] valid cache slots AFTER this write.
        Returns (logits [B, V], new cache).
        """
        cfg = self.config
        b = token.shape[0]
        x = params["embed"][token] + params["pos"][pos_id]
        x = x.astype(cfg.dtype)[:, None, :]  # [B, 1, H]
        new_cache = []
        for blk, layer in zip(params["blocks"], cache):
            y = _layer_norm(x, blk["ln1"]["scale"], blk["ln1"]["bias"])
            qkv = jnp.einsum("bth,hk->btk", y, blk["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (_split_heads(a, b, 1, cfg) for a in (q, k, v))
            ck = jax.lax.dynamic_update_slice_in_dim(layer["k"], k, slot, axis=2)
            cv = jax.lax.dynamic_update_slice_in_dim(layer["v"], v, slot, axis=2)
            new_cache.append({"k": ck, "v": cv})
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, ck) / np.sqrt(cfg.head_dim)
            scores = jnp.where(kv_mask[:, None, None, :], scores, -1e30)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), cv)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, 1, cfg.hidden)
            x = x + jnp.einsum("bth,ho->bto", ctx, blk["attn_out"])
            y = _layer_norm(x, blk["ln2"]["scale"], blk["ln2"]["bias"])
            y = jax.nn.gelu(jnp.einsum("bth,hm->btm", y, blk["mlp_in"]) + blk["mlp_bias"])
            x = x + jnp.einsum("btm,mh->bth", y, blk["mlp_out"])
        x = _layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"])
        return jnp.einsum("bh,vh->bv", x[:, 0], params["embed"]), new_cache

    # --------------------------------------------------------------- generate
    def generate(
        self,
        params,
        token_ids,
        mask,
        max_new_tokens: int,
        temperature: float = 0.0,
        rng: jax.Array | None = None,
    ):
        """Greedy (or temperature-sampled) decode. token_ids/mask [B, Tp]
        LEFT-padded. Returns (tokens [B, max_new_tokens], n_generated [B]).

        Jit-friendly end to end: callers wrap this in one jit with static
        ``max_new_tokens``; the decode loop is a ``lax.scan``.
        """
        cfg = self.config
        b, tp = token_ids.shape
        if tp + max_new_tokens > cfg.max_len:
            raise ValueError(
                f"prompt {tp} + max_new_tokens {max_new_tokens} exceeds max_len {cfg.max_len}"
            )
        logits, cache = self(params, token_ids, mask, return_cache=True)
        last_logits = logits[:, -1]  # left-padded: last slot is the real tail
        prompt_len = mask.sum(1).astype(jnp.int32)  # [B]
        kv_prompt_mask = jnp.pad(mask, ((0, 0), (0, cfg.max_len - tp)))
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def pick(lg, key):
            if temperature > 0.0:
                return jax.random.categorical(key, lg / temperature, axis=-1)
            return jnp.argmax(lg, axis=-1)

        def step(carry, i):
            last_logits, cache, done, rng = carry
            rng, key = jax.random.split(rng)
            token = pick(last_logits, key)
            token = jnp.where(done, PAD_ID, token)
            done = done | (token == EOS_ID)
            pos_id = prompt_len + i  # real position per row
            slot = tp + i  # uniform cache slot (left-padded prompts)
            # static-shape cache validity: prompt slots per row + generated
            # slots written so far (i is a traced scan counter, so this must
            # be a comparison mask, not a dynamic slice)
            slots = jnp.arange(cfg.max_len)
            kv_mask = kv_prompt_mask | ((slots >= tp) & (slots <= tp + i))[None, :]
            lg, cache = self._step(
                params, cache, token, pos_id, slot, kv_mask
            )
            return (lg, cache, done, rng), token

        done0 = jnp.zeros((b,), dtype=bool)
        (_, _, done, _), tokens = jax.lax.scan(
            step, (last_logits, cache, done0, rng), jnp.arange(max_new_tokens)
        )
        tokens = tokens.T  # [B, max_new]
        produced = (tokens != PAD_ID) & (tokens != EOS_ID)
        return tokens, produced.sum(1)


def lm_train_step(decoder: CausalDecoder, params, batch, lr: float = 1e-3):
    """One next-token cross-entropy SGD step. batch: ids/mask [B, T]."""

    def loss_fn(p):
        logits = decoder(p, batch["ids"], batch["mask"])
        targets = jnp.roll(batch["ids"], -1, axis=1)
        valid = batch["mask"] & jnp.roll(batch["mask"], -1, axis=1)
        valid = valid.at[:, -1].set(False)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return jax.tree.map(lambda p, g: p - lr * g, params, grads), loss


# ------------------------------------------------------------- tokenization
def byte_tokenize(
    texts: list[str], max_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """Reversible byte-level tokenizer: LEFT-padded [B, max_len] ids + mask.
    BOS + utf-8 bytes (+3 offset), tail-truncated to keep the most recent
    context (prompts carry the question at the end)."""
    ids = np.full((len(texts), max_len), PAD_ID, dtype=np.int32)
    mask = np.zeros((len(texts), max_len), dtype=np.bool_)
    for i, text in enumerate(texts):
        raw = [BOS_ID] + [b + _BYTE_OFFSET for b in text.encode("utf-8")]
        raw = raw[-max_len:]
        ids[i, max_len - len(raw):] = raw
        mask[i, max_len - len(raw):] = True
    return ids, mask


def byte_detokenize(tokens: np.ndarray) -> list[str]:
    """Inverse of :func:`byte_tokenize` for generated token rows."""
    out = []
    for row in np.asarray(tokens):
        data = bytes(int(t) - _BYTE_OFFSET for t in row if int(t) >= _BYTE_OFFSET)
        out.append(data.decode("utf-8", errors="replace"))
    return out
