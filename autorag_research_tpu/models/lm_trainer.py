"""On-device LM SFT: teach ``JaxLM`` a workspace's QA behavior.

The reference consumes externally-trained LLMs through API adapters
(``injection.py:226-342``); it has no train path. This framework's on-device
decoder (``models/decoder.py``) makes the full loop possible with zero
egress: ingest -> build retrieval GT -> TRAIN the LM on (context, question,
answer) sequences -> serve/evaluate generation pipelines against it.

TPU-first design:
- examples are byte-tokenized to ONE static [B, T] shape, right-padded, with
  a per-position loss mask selecting only answer(+EOS) targets (standard SFT
  masking);
- a whole epoch of optimizer steps runs inside one jit via ``lax.scan`` over
  stacked minibatches [S, B, T] — one device dispatch per epoch, which is the
  difference between ~30 ms/step tunnel dispatch and full-speed training;
- adamw (optax) on the same tied-weight decoder the serving path uses; the
  checkpoint is the flat .npz ``JaxLM.save``/``load`` format so a trained
  file drops straight into the ``jax_lm`` preset's ``checkpoint:`` knob.
"""

from __future__ import annotations

import time
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autorag_research_tpu.models.decoder import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    _BYTE_OFFSET,
    CausalDecoder,
    DecoderConfig,
)
from autorag_research_tpu.models.trainer import TrainReport

DEFAULT_LM_PROMPT = (
    "Answer the question using only the provided context.\n\n"
    "Context:\n{context}\n\nQuestion: {query}\n\nAnswer:"
)


def build_lm_examples(
    catalog,
    prompt_template: str = DEFAULT_LM_PROMPT,
    max_context_chunks: int = 3,
) -> list[tuple[str, str]]:
    """(prompt, answer) pairs from a workspace: gold-context prompts in the
    exact format ``basic_rag`` emits at eval time, answers from each query's
    ``generation_gt``. Queries without generation GT are skipped."""
    import json

    examples: list[tuple[str, str]] = []
    for qid in catalog.get_all_query_ids():
        row = catalog.get_query(qid)
        if row is None or not row["contents"]:
            continue
        raw_gt = row["generation_gt"]
        if not raw_gt:
            continue
        try:
            gts = json.loads(raw_gt)
        except (json.JSONDecodeError, TypeError):
            gts = [raw_gt]
        if not isinstance(gts, list):
            gts = [gts]
        gold_ids = [
            r["chunk_id"]
            for r in catalog.get_relations_by_query(qid)
            if r["chunk_id"] is not None
        ][:max_context_chunks]
        contents = catalog.get_chunk_contents(gold_ids)
        context = "\n\n".join(contents[c] for c in gold_ids if c in contents)
        prompt = prompt_template.format(
            context=context or "(no context retrieved)", query=row["contents"]
        )
        for gt in gts:
            if gt:
                examples.append((prompt, str(gt)))
    return examples


def encode_sft(
    examples: Sequence[tuple[str, str]], seq_len: int
) -> dict[str, np.ndarray]:
    """Right-padded [N, seq_len] ids/mask plus an SFT loss mask.

    Sequence = BOS + prompt bytes + answer bytes + EOS. ``loss_mask[p]`` marks
    positions whose NEXT token is an answer byte or the EOS — prompt tokens
    provide context but contribute no loss. Prompts longer than the budget
    are head-truncated (keep the question tail, like ``byte_tokenize``).
    """
    n = len(examples)
    ids = np.full((n, seq_len), PAD_ID, dtype=np.int32)
    mask = np.zeros((n, seq_len), dtype=np.bool_)
    loss_mask = np.zeros((n, seq_len), dtype=np.bool_)
    for i, (prompt, answer) in enumerate(examples):
        p_ids = [BOS_ID] + [b + _BYTE_OFFSET for b in prompt.encode("utf-8")]
        a_ids = [b + _BYTE_OFFSET for b in answer.encode("utf-8")] + [EOS_ID]
        budget = seq_len - len(a_ids)
        if budget < 1:  # answer alone overflows: keep its head, 1 ctx token
            p_ids = p_ids[:1]
            a_ids = a_ids[: seq_len - 1]
        elif len(p_ids) > budget:
            p_ids = [BOS_ID] + p_ids[len(p_ids) - budget + 1 :]
        row = p_ids + a_ids
        ids[i, : len(row)] = row
        mask[i, : len(row)] = True
        # answer starts at len(p_ids); position p predicts token p+1
        start = len(p_ids)
        loss_mask[i, max(0, start - 1) : len(row) - 1] = True
    return {"ids": ids, "mask": mask, "loss_mask": loss_mask}


def _sft_loss(decoder: CausalDecoder, params, batch) -> jax.Array:
    logits = decoder(params, batch["ids"], batch["mask"])
    targets = jnp.roll(batch["ids"], -1, axis=1)
    valid = batch["loss_mask"] & batch["mask"]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)


class LMTrainer:
    """adamw SFT over the native causal decoder, one jit dispatch per epoch."""

    def __init__(
        self,
        config: DecoderConfig | None = None,
        lr: float = 3e-3,
        batch_size: int = 16,
        seq_len: int = 256,
        weight_decay: float = 0.01,
        seed: int = 0,
        params: dict | None = None,
    ):
        import optax

        self.config = config or DecoderConfig()
        if seq_len > self.config.max_len:
            raise ValueError(
                f"seq_len {seq_len} exceeds decoder max_len {self.config.max_len}"
            )
        self.decoder = CausalDecoder(self.config)
        self.params = params if params is not None else self.decoder.init(seed)
        self.batch_size = batch_size
        self.seq_len = seq_len
        self.seed = seed
        self._tx = optax.adamw(lr, weight_decay=weight_decay)
        self._opt_state = self._tx.init(self.params)

        def one_step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda p: _sft_loss(self.decoder, p, batch)
            )(params)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        @jax.jit
        def run_steps(params, opt_state, batches):
            """batches: {ids/mask/loss_mask: [S, B, T]} — the ENTIRE
            multi-epoch schedule scans inside this one jit (one dispatch +
            one loss readback per training chunk, vs ~30 ms/dispatch via the
            tunnel). Batches are gathered on HOST: a device-side fancy-index
            gather inside the scan body hung the remote axon compiler, and
            memorization-scale stacked batches are only tens of MB."""
            (params, opt_state), losses = jax.lax.scan(
                one_step, (params, opt_state), batches
            )
            return params, opt_state, losses

        self._run_steps = run_steps

    # ------------------------------------------------------------------ data
    def _epoch_order(self, n: int, rng: np.random.Generator) -> np.ndarray:
        """One epoch's [steps, B] shuffled row indices; the ragged tail batch
        is filled by re-sampling (memorization-scale corpora are tiny — no
        example may silently vanish from an epoch)."""
        order = rng.permutation(n)
        pad = (-n) % self.batch_size
        if pad:
            order = np.concatenate([order, rng.choice(n, size=pad)])
        return order.reshape(-1, self.batch_size)

    # ----------------------------------------------------------------- train
    def train(
        self,
        source: Any,
        epochs: int = 10,
        max_steps: int | None = None,
        prompt_template: str = DEFAULT_LM_PROMPT,
        log_every: int = 0,
    ) -> TrainReport:
        """``source`` is a Catalog (examples built from its GT) or a list of
        (prompt, answer) pairs."""
        examples = (
            source
            if isinstance(source, list)
            else build_lm_examples(source, prompt_template)
        )
        if not examples:
            raise ValueError(
                "no LM training examples: queries need generation_gt "
                "(and ideally retrieval GT for context)"
            )
        data = encode_sft(examples, self.seq_len)
        rng = np.random.default_rng(self.seed)
        n = data["ids"].shape[0]
        order = np.concatenate(
            [self._epoch_order(n, rng) for _ in range(epochs)], axis=0
        )
        if max_steps is not None:
            order = order[:max_steps]
        report = TrainReport()
        t0 = time.time()
        # chunk the schedule into FIXED-length scans: remote axon compile
        # time grows with scan trip count (a 500-step scan sat in the
        # compiler for >10 min; 128 compiles in seconds), and equal chunk
        # shapes compile ONCE then redispatch. Also bounds the stacked H2D
        # upload. The tail chunk is padded by resampling rows — extra
        # memorization steps, never dropped examples.
        bytes_per_step = self.batch_size * self.seq_len * 6  # int32 + 2 bool
        chunk_steps = max(1, min(128, order.shape[0], (256 << 20) // bytes_per_step))
        total = order.shape[0]
        pad = (-total) % chunk_steps
        if pad:
            order = np.concatenate([order, order[rng.choice(total, size=pad)]])
        for start in range(0, order.shape[0], chunk_steps):
            idx = order[start : start + chunk_steps]
            batches = {k: jnp.asarray(v[idx]) for k, v in data.items()}
            self.params, self._opt_state, losses = self._run_steps(
                self.params, self._opt_state, batches
            )
            losses = np.asarray(losses)  # forces the chunk (tunnel: 1 readback)
            report.losses.extend(float(x) for x in losses)
        report.steps = order.shape[0]
        report.seconds = time.time() - t0
        if log_every:
            steps_per_epoch = max(1, order.shape[0] // max(1, epochs))
            arr = np.asarray(report.losses)
            for e in range(0, arr.size, steps_per_epoch * log_every):
                chunk = arr[e : e + steps_per_epoch]
                print(f"step {e}: loss {chunk.mean():.4f}")
        return report

    # ------------------------------------------------------------ checkpoint
    def save(self, path: str) -> None:
        from autorag_research_tpu.llm.jax_lm import _flatten

        np.savez(path, **_flatten(self.params))

    def to_llm(self, **kwargs) -> "Any":
        """Wrap the trained params in a serving ``JaxLM``."""
        from autorag_research_tpu.llm.jax_lm import JaxLM

        return JaxLM(config=self.config, params=self.params, **kwargs)
