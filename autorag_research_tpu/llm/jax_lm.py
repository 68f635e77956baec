"""JaxLM: local on-TPU generation through the framework LLM protocol.

Fills the reference's LLM-injection role (``injection.py:226-342``) with a
fully on-device path: byte-level tokenize -> jitted prefill+scan decode
(``models/decoder.py``) -> detokenize. With this, ``basic_rag`` (and every
other generation pipeline) runs 100% on the TPU with zero egress — retrieval
kernels and generation on the same chip.

Random-init weights emit noise; ``lm_train_step`` or a loaded checkpoint
(``save``/``load``, flat .npz) provides trained behavior. The decode loop is
compiled once per (batch, prompt-bucket, max_new_tokens) shape and cached.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from autorag_research_tpu.llm.base import BaseLLM, LLMResult
from autorag_research_tpu.models.decoder import (
    CausalDecoder,
    DecoderConfig,
    byte_detokenize,
    byte_tokenize,
)


def _flatten(params, prefix=""):
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten(v, f"{prefix}{i}."))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def _unflatten_into(template, flat, prefix=""):
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}.") for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        return [
            _unflatten_into(v, flat, f"{prefix}{i}.") for i, v in enumerate(template)
        ]
    return jax.numpy.asarray(flat[prefix[:-1]])


class JaxLM(BaseLLM):
    model_name = "jax_lm"

    def __init__(
        self,
        config: DecoderConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        max_prompt_len: int = 384,
        max_new_tokens: int = 96,
        temperature: float = 0.0,
        checkpoint: str | None = None,
    ):
        self.config = config or DecoderConfig()
        if max_prompt_len + max_new_tokens > self.config.max_len:
            raise ValueError(
                f"max_prompt_len {max_prompt_len} + max_new_tokens {max_new_tokens} "
                f"exceeds model max_len {self.config.max_len}"
            )
        self.decoder = CausalDecoder(self.config)
        self.params = params if params is not None else self.decoder.init(seed)
        if checkpoint:
            self.load(checkpoint)
        self.max_prompt_len = max_prompt_len
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self._generate_jit = jax.jit(
            lambda p, ids, mask, rng: self.decoder.generate(
                p, ids, mask, max_new_tokens=self.max_new_tokens,
                temperature=self.temperature, rng=rng,
            )
        )
        # temperature sampling must advance across calls — a fixed default
        # key would make every "sample" byte-identical for the same prompt
        self._sample_key = jax.random.PRNGKey(seed)
        self.calls: list[str] = []

    def _next_key(self):
        self._sample_key, key = jax.random.split(self._sample_key)
        return key

    # ------------------------------------------------------------- protocol
    async def agenerate(self, prompt: str, **kwargs: Any) -> LLMResult:
        self.calls.append(prompt)
        ids, mask = byte_tokenize([prompt], self.max_prompt_len)
        tokens, n_new = self._generate_jit(self.params, ids, mask, self._next_key())
        tokens = np.asarray(tokens)
        text = byte_detokenize(tokens)[0]
        prompt_tokens = int(mask.sum())
        completion = int(np.asarray(n_new)[0])
        return LLMResult(
            text=text,
            token_usage={
                "prompt_tokens": prompt_tokens,
                "completion_tokens": completion,
                "total_tokens": prompt_tokens + completion,
            },
            metadata={"model": "jax_lm", "on_device": True},
        )

    def generate_batch(self, prompts: list[str]) -> list[str]:
        """Batched decode in one device dispatch (serving/bench path)."""
        return [r.text for r in self.generate_batch_results(prompts)]

    def generate_batch_results(self, prompts: list[str]) -> list[LLMResult]:
        """Batched decode returning full :class:`LLMResult` rows, so the
        batched serving path reports the same per-query ``token_usage`` as
        the single-query :meth:`agenerate` path."""
        ids, mask = byte_tokenize(prompts, self.max_prompt_len)
        tokens, n_new = self._generate_jit(self.params, ids, mask, self._next_key())
        texts = byte_detokenize(np.asarray(tokens))
        prompt_lens = np.asarray(mask).sum(axis=1).astype(int)
        new_lens = np.asarray(n_new).astype(int)
        return [
            LLMResult(
                text=t,
                token_usage={
                    "prompt_tokens": int(p),
                    "completion_tokens": int(n),
                    "total_tokens": int(p) + int(n),
                },
                metadata={"model": "jax_lm", "on_device": True},
            )
            for t, p, n in zip(texts, prompt_lens, new_lens)
        ]

    # ----------------------------------------------------------- checkpoint
    def save(self, path: str) -> None:
        np.savez(path, **_flatten(self.params))

    def load(self, path: str) -> None:
        with np.load(path) as data:
            flat = {k: data[k] for k in data.files}
        self.params = _unflatten_into(self.params, flat)
