"""JAX cross-encoder: TPU-native (query, doc) joint scoring.

The reference's local cross-encoder rerankers are torch checkpoints
(``rerankers/{flag_embedding,koreranker,monot5,...}.py`` — see
``rerankers/hf.py`` here for the gated equivalents); this module adds a
cross-encoder that runs and TRAINS on TPU with no torch dependency: the
``models/encoder.py`` transformer body over the concatenated
``query [SEP] doc`` token sequence, masked mean pool, and a scalar score
head. Trained with pairwise logistic loss on catalog GT (gold chunk vs
in-corpus random negative) — the standard cross-encoder objective.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from autorag_research_tpu.models.encoder import (
    EncoderConfig,
    _layer_norm,
    _attention,
    _init_dense,
    hash_tokenize,
    init_params,
)

SEP_TOKEN = 1  # reserved by hash_tokenize (ids start at 1; collisions harmless)


def init_cross_params(config: EncoderConfig, key: jax.Array) -> dict:
    k1, k2 = jax.random.split(key)
    params = init_params(config, k1)
    del params["out_proj"]  # replaced by the scalar score head
    params["score"] = {
        "w": _init_dense(k2, (config.hidden, 1)),
        "b": jnp.zeros(1),
    }
    return params


class CrossEncoder:
    """Functional cross-encoder; ``__call__ -> [B] relevance scores``."""

    def __init__(self, config: EncoderConfig):
        self.config = config

    def init(self, seed: int = 0) -> dict:
        return init_cross_params(self.config, jax.random.PRNGKey(seed))

    def __call__(self, params: dict, token_ids: jax.Array, mask: jax.Array) -> jax.Array:
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
        maskf = mask.astype(x.dtype)[..., None]
        pooled = (x * maskf).sum(1) / jnp.maximum(maskf.sum(1), 1.0)
        return (pooled @ params["score"]["w"]).squeeze(-1) + params["score"]["b"][0]


def pair_tokenize(
    queries: list[str], docs: list[str], vocab_size: int, max_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """``query [SEP] doc`` token sequences, each leg budgeted half the window."""
    half = max(1, (max_len - 1) // 2)
    q_ids, q_mask = hash_tokenize(list(queries), vocab_size, half)
    d_ids, d_mask = hash_tokenize(list(docs), vocab_size, max_len - half - 1)
    n = len(queries)
    ids = np.zeros((n, max_len), dtype=np.int32)
    mask = np.zeros((n, max_len), dtype=np.bool_)
    for i in range(n):
        ql = int(q_mask[i].sum())
        dl = int(d_mask[i].sum())
        ids[i, :ql] = q_ids[i, :ql]
        ids[i, ql] = SEP_TOKEN
        ids[i, ql + 1 : ql + 1 + dl] = d_ids[i, :dl]
        mask[i, : ql + 1 + dl] = True
    return ids, mask


def pairwise_train_step(
    encoder: CrossEncoder, params: dict, batch: dict, lr: float = 1e-3
):
    """Pairwise logistic loss: softplus(score_neg - score_pos). batch keys:
    pos_ids/pos_mask/neg_ids/neg_mask [B, T]."""

    def loss_fn(p):
        pos = encoder(p, batch["pos_ids"], batch["pos_mask"])
        neg = encoder(p, batch["neg_ids"], batch["neg_mask"])
        return jnp.mean(jax.nn.softplus(neg - pos))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return jax.tree.map(lambda p, g: p - lr * g, params, grads), loss


@dataclass
class CrossTrainReport:
    steps: int = 0
    losses: list[float] = field(default_factory=list)
    seconds: float = 0.0

    @property
    def final_loss(self) -> float | None:
        return self.losses[-1] if self.losses else None


class CrossEncoderTrainer:
    """Pairwise training on catalog GT: (query, gold chunk) positives with
    seeded random in-corpus negatives."""

    def __init__(
        self,
        config: EncoderConfig | None = None,
        lr: float = 1e-3,
        batch_size: int = 16,
        seed: int = 0,
        negative_strategy: str = "random",
    ):
        if negative_strategy not in ("random", "cycle"):
            raise ValueError("negative_strategy must be 'random' or 'cycle'")
        self.config = config or EncoderConfig()
        self.encoder = CrossEncoder(self.config)
        self.lr = lr
        self.batch_size = batch_size
        self.seed = seed
        self.negative_strategy = negative_strategy
        self.params = self.encoder.init(seed)

    def train(self, catalog, epochs: int = 1, max_steps: int | None = None) -> CrossTrainReport:
        from autorag_research_tpu.models.trainer import build_pairs

        pairs = build_pairs(catalog)  # (query text, gold chunk text)
        if len(pairs) < 2:
            raise ValueError("need at least 2 (query, gold chunk) pairs to train")
        all_docs = [d for _, d in pairs]
        rng = np.random.default_rng(self.seed)
        step_fn = jax.jit(
            lambda p, b: pairwise_train_step(self.encoder, p, b, lr=self.lr)
        )
        report = CrossTrainReport()
        start = time.perf_counter()
        bsz = min(self.batch_size, len(pairs))
        cfg = self.config
        for _ in range(epochs):
            order = rng.permutation(len(pairs))
            for lo in range(0, len(pairs) - bsz + 1, bsz):
                chosen = [pairs[i] for i in order[lo : lo + bsz]]
                queries = [q for q, _ in chosen]
                pos_docs = [d for _, d in chosen]
                # negative: a different doc from the corpus pool. "cycle"
                # pairs each positive with a FIXED offset negative — a
                # stationary signal that converges much faster on tiny
                # corpora than per-step random draws.
                neg_docs = []
                for j, (_, pos) in enumerate(chosen):
                    if self.negative_strategy == "cycle":
                        cand = all_docs[(order[lo + j] + 1) % len(all_docs)]
                        if cand == pos and len(all_docs) > 1:
                            cand = all_docs[(order[lo + j] + 2) % len(all_docs)]
                    else:
                        while True:
                            cand = all_docs[rng.integers(len(all_docs))]
                            if cand != pos or len(set(all_docs)) == 1:
                                break
                    neg_docs.append(cand)
                pos_ids, pos_mask = pair_tokenize(queries, pos_docs, cfg.vocab_size, cfg.max_len)
                neg_ids, neg_mask = pair_tokenize(queries, neg_docs, cfg.vocab_size, cfg.max_len)
                batch = {
                    "pos_ids": jnp.asarray(pos_ids), "pos_mask": jnp.asarray(pos_mask),
                    "neg_ids": jnp.asarray(neg_ids), "neg_mask": jnp.asarray(neg_mask),
                }
                self.params, loss = step_fn(self.params, batch)
                report.losses.append(float(loss))
                report.steps += 1
                if max_steps is not None and report.steps >= max_steps:
                    break
            if max_steps is not None and report.steps >= max_steps:
                break
        report.seconds = time.perf_counter() - start
        return report

    def save(self, path: str | Path) -> None:
        from autorag_research_tpu.embeddings.jax_encoder import save_params

        save_params(self.params, path)

    def as_reranker(self, batch_size: int = 64):
        from autorag_research_tpu.rerankers.jax_cross import JaxCrossEncoderReranker

        r = JaxCrossEncoderReranker(self.config, batch_size=batch_size)
        r.params = self.params
        return r
