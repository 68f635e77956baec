"""Bi-encoder training on catalog ground truth.

No reference counterpart (the reference only consumes external embedding
APIs/checkpoints — SURVEY.md §2.6); on TPU, fine-tuning the retrieval encoder
on the ingested dataset's (query, gold chunk) pairs is a first-class
capability. The trainer:

1. builds contrastive pairs from the catalog's retrieval relations (each
   query paired with one gold chunk; in-batch negatives);
2. runs ``contrastive_train_step`` under jit on a (dp, tp) mesh when one is
   supplied (params sharded by ``param_specs``), else single-device;
3. saves the trained params (npz) so ``JaxEncoderEmbedding(params_path=...)``
   serves and indexes with them.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from autorag_research_tpu.models.encoder import (
    EncoderConfig,
    RetrievalEncoder,
    contrastive_train_step,
    hash_tokenize,
    param_specs,
)

logger = logging.getLogger("AutoRAG-Research-TPU")


@dataclass
class TrainReport:
    steps: int = 0
    losses: list[float] = field(default_factory=list)
    seconds: float = 0.0

    @property
    def final_loss(self) -> float | None:
        return self.losses[-1] if self.losses else None


def build_pairs(catalog) -> list[tuple[str, str]]:
    """(query text, gold chunk text) pairs from the catalog's GT relations —
    one pair per (query, gold chunk)."""
    pairs: list[tuple[str, str]] = []
    for qid in catalog.get_all_query_ids():
        qtext = catalog.get_query_text(qid)
        if not qtext:
            continue
        gold_ids = [
            r["chunk_id"]
            for r in catalog.get_relations_by_query(qid)
            if r["chunk_id"] is not None
        ]
        contents = catalog.get_chunk_contents(gold_ids)
        for cid in gold_ids:
            if cid in contents:
                pairs.append((qtext, contents[cid]))
    return pairs


class BiEncoderTrainer:
    def __init__(
        self,
        config: EncoderConfig | None = None,
        lr: float = 1e-3,
        temperature: float = 0.05,
        batch_size: int = 32,
        mesh=None,
        seed: int = 0,
        optimizer: str = "sgd",
        weight_decay: float = 0.01,
    ):
        self.config = config or EncoderConfig()
        self.encoder = RetrievalEncoder(self.config)
        self.lr = lr
        self.temperature = temperature
        self.batch_size = batch_size
        self.mesh = mesh
        self.seed = seed
        self.optimizer = optimizer
        self.weight_decay = weight_decay
        self.params = self.encoder.init(seed)
        if optimizer == "adamw":
            import optax

            self._tx = optax.adamw(lr, weight_decay=weight_decay)
            self._opt_state = self._tx.init(self.params)
        elif optimizer == "sgd":
            self._tx = None
            self._opt_state = None
        else:
            raise ValueError(f"unknown optimizer '{optimizer}' (sgd | adamw)")

    def _shard_params(self):
        if self.mesh is None:
            return
        import jax
        from jax.sharding import NamedSharding

        specs = param_specs(self.config)
        self.params = jax.tree.map(
            lambda p, s: jax.device_put(p, NamedSharding(self.mesh, s)),
            self.params,
            specs,
        )

    def _make_batch(self, pairs: list[tuple[str, str]]):
        import jax
        import jax.numpy as jnp

        queries, docs = zip(*pairs)
        q_ids, q_mask = hash_tokenize(list(queries), self.config.vocab_size, self.config.max_len)
        d_ids, d_mask = hash_tokenize(list(docs), self.config.vocab_size, self.config.max_len)
        batch = {
            "q_ids": jnp.asarray(q_ids),
            "q_mask": jnp.asarray(q_mask),
            "d_ids": jnp.asarray(d_ids),
            "d_mask": jnp.asarray(d_mask),
        }
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P("dp", None))
            batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return batch

    # ------------------------------------------------------------ checkpoints
    def _ckpt_state(self, step: int):
        state = {"params": self.params, "step": np.asarray(step, np.int64)}
        if self._opt_state is not None:
            state["opt_state"] = self._opt_state
        return state

    def save_checkpoint(self, directory: str | Path, step: int) -> Path:
        """Orbax checkpoint of params (+ optimizer state) under
        ``directory/step_<N>``. The checkpoint/resume role the reference
        delegates to DB result-presence (SURVEY.md §5) — training state has no
        DB row, so it gets real checkpoints."""
        import orbax.checkpoint as ocp

        path = Path(directory).resolve() / f"step_{step}"
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self._ckpt_state(step), force=True)
        ckptr.wait_until_finished()
        return path

    @staticmethod
    def latest_checkpoint(directory: str | Path) -> Path | None:
        directory = Path(directory)
        if not directory.is_dir():
            return None
        steps = []
        for p in directory.iterdir():
            if p.is_dir() and p.name.startswith("step_"):
                try:
                    steps.append((int(p.name[5:]), p))
                except ValueError:
                    continue
        return max(steps)[1] if steps else None

    def restore_checkpoint(self, directory: str | Path) -> int:
        """Restore params/opt_state from the latest ``step_<N>`` checkpoint.
        Returns the restored step (0 if no checkpoint exists). Restoring with
        the live state as the target preserves exact pytree structure
        (optax opt_state is a NamedTuple chain)."""
        import jax
        import orbax.checkpoint as ocp

        path = self.latest_checkpoint(directory)
        if path is None:
            return 0
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree.map(np.asarray, self._ckpt_state(0))
        restored = ckptr.restore(path, target)
        self.params = restored["params"]
        if self._opt_state is not None:
            self._opt_state = restored["opt_state"]
        return int(restored["step"])

    def train(
        self,
        catalog,
        epochs: int = 1,
        max_steps: int | None = None,
        checkpoint_dir: str | Path | None = None,
        checkpoint_every: int = 50,
    ) -> TrainReport:
        """Train; with ``checkpoint_dir`` set, auto-resumes from the latest
        checkpoint there and saves every ``checkpoint_every`` steps plus at
        the end. ``max_steps`` counts TOTAL steps including restored ones."""
        import jax

        pairs = build_pairs(catalog)
        if len(pairs) < 2:
            raise ValueError("need at least 2 (query, gold chunk) pairs to train")
        start_step = 0
        if checkpoint_dir is not None:
            start_step = self.restore_checkpoint(checkpoint_dir)
        self._shard_params()
        # fold the resume step into the data-order seed so a resumed run does
        # not replay the exact permutations already consumed
        rng = np.random.default_rng((self.seed, start_step))
        if self._tx is not None:
            from autorag_research_tpu.models.encoder import info_nce_loss

            def optax_step(params, opt_state, batch):
                def loss_fn(p):
                    q = self.encoder(p, batch["q_ids"], batch["q_mask"])
                    d = self.encoder(p, batch["d_ids"], batch["d_mask"])
                    return info_nce_loss(q, d, self.temperature)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self._tx.update(grads, opt_state, params)
                import optax

                return optax.apply_updates(params, updates), opt_state, loss

            optax_step = jax.jit(optax_step)

            def step_fn(p, b):
                new_p, self._opt_state, loss = optax_step(p, self._opt_state, b)
                return new_p, loss
        else:
            step_fn = jax.jit(
                lambda p, b: contrastive_train_step(
                    self.encoder, p, b, lr=self.lr, temperature=self.temperature
                )
            )
        report = TrainReport()
        start = time.perf_counter()
        bsz = min(self.batch_size, len(pairs))
        if self.mesh is not None:
            dp = self.mesh.shape.get("dp", 1)
            if len(pairs) < dp:
                raise ValueError(
                    f"need at least dp={dp} training pairs for this mesh, have {len(pairs)}"
                )
            bsz = max(dp, bsz - bsz % dp)
            # bsz started <= len(pairs) and dp <= len(pairs) is enforced
            # above, so the dp alignment keeps bsz <= len(pairs)
        global_step = start_step
        done = max_steps is not None and global_step >= max_steps
        for _ in range(epochs):
            if done:
                break
            order = rng.permutation(len(pairs))
            for lo in range(0, len(pairs) - bsz + 1, bsz):
                batch_pairs = [pairs[i] for i in order[lo : lo + bsz]]
                batch = self._make_batch(batch_pairs)
                self.params, loss = step_fn(self.params, batch)
                report.losses.append(float(loss))
                report.steps += 1
                global_step += 1
                if checkpoint_dir is not None and global_step % checkpoint_every == 0:
                    self.save_checkpoint(checkpoint_dir, global_step)
                if max_steps is not None and global_step >= max_steps:
                    done = True
                    break
        if checkpoint_dir is not None and report.steps:
            self.save_checkpoint(checkpoint_dir, global_step)
        report.seconds = time.perf_counter() - start
        logger.info(
            "trained %d steps in %.1fs (loss %.4f -> %.4f)",
            report.steps, report.seconds,
            report.losses[0] if report.losses else float("nan"),
            report.final_loss or float("nan"),
        )
        return report

    def save(self, path: str | Path) -> None:
        from autorag_research_tpu.embeddings.jax_encoder import save_params

        save_params(self.params, path)

    def as_embedding(self, batch_size: int = 256):
        """Wrap the trained params as an embedding adapter for indexing."""
        from autorag_research_tpu.embeddings.jax_encoder import JaxEncoderEmbedding

        emb = JaxEncoderEmbedding(self.config, batch_size=batch_size)
        emb.params = self.params
        return emb
