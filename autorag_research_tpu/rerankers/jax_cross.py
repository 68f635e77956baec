"""TPU-native cross-encoder reranker.

The on-device counterpart of the reference's torch cross-encoder rerankers
(``rerankers/flag_embedding.py`` etc.; gated HF versions in ``hf.py`` here):
scores every (query, text) pair in one batched forward on the device, no
torch dependency, loadable from ``CrossEncoderTrainer.save`` checkpoints.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import numpy as np

from autorag_research_tpu.models.cross_encoder import CrossEncoder, pair_tokenize
from autorag_research_tpu.models.encoder import EncoderConfig
from autorag_research_tpu.rerankers.base import BaseReranker


class JaxCrossEncoderReranker(BaseReranker):
    model_name = "jax_cross_encoder"

    def __init__(
        self,
        config: EncoderConfig | None = None,
        params_path: str | Path | None = None,
        batch_size: int = 64,
        seed: int = 0,
    ):
        self.config = config or EncoderConfig()
        self.encoder = CrossEncoder(self.config)
        self.batch_size = batch_size
        self.params = self.encoder.init(seed)
        if params_path is not None:
            from autorag_research_tpu.embeddings.jax_encoder import load_params

            self.params = load_params(self.params, params_path)
        self._score = jax.jit(lambda p, ids, mask: self.encoder(p, ids, mask))

    def rerank(self, query: str, texts: Sequence[str], top_k: int | None = None):
        if not texts:
            return []
        scores: list[float] = []
        cfg = self.config
        for lo in range(0, len(texts), self.batch_size):
            chunk = list(texts[lo : lo + self.batch_size])
            n = len(chunk)
            if n < self.batch_size:  # pad to ONE compiled shape per instance
                chunk = chunk + [""] * (self.batch_size - n)
            ids, mask = pair_tokenize([query] * len(chunk), chunk, cfg.vocab_size, cfg.max_len)
            out = self._score(self.params, ids, mask)
            scores.extend(np.asarray(out, np.float64)[:n].tolist())
        return self._finalize(
            [(i, t, float(s)) for i, (t, s) in enumerate(zip(texts, scores))], top_k
        )
