"""Model registry / dependency injection: names -> cached model instances.

Role parity with the reference ``injection.py:86-370`` (``ModelManager`` per
model kind + ``load_llm``/``load_embedding_model``/``load_reranker`` and the
``@with_llm``/``@with_embedding`` decorators): a model name resolves to a YAML
file under ``configs/{llm,embedding,reranker}/<name>.yaml`` (``type:`` +
constructor kwargs) or to a builtin shortcut; instances are health-checked on
first load and cached for the process.

Builtin types registered here replace the reference's Hydra ``_target_``
strings; third-party types can be registered via
``register_model_type(kind, name, factory)`` or ``type: module.path:Class``.
"""

from __future__ import annotations

import importlib
import logging
from pathlib import Path
from typing import Any, Callable

import yaml

from autorag_research_tpu.exceptions import ModelLoadError

logger = logging.getLogger("AutoRAG-Research-TPU")

_FACTORIES: dict[str, dict[str, Callable[..., Any]]] = {
    "llm": {},
    "embedding": {},
    "reranker": {},
}


def register_model_type(kind: str, name: str, factory: Callable[..., Any]) -> None:
    _FACTORIES[kind][name] = factory


def _builtin_factories() -> None:
    from autorag_research_tpu.embeddings import MockEmbedding, MockMultiVectorEmbedding
    from autorag_research_tpu.llm import MockLLM, ScriptedLLM

    register_model_type("llm", "mock", MockLLM)
    register_model_type("llm", "scripted", ScriptedLLM)
    register_model_type("embedding", "mock", MockEmbedding)
    register_model_type("embedding", "mock_multi", MockMultiVectorEmbedding)

    def _openai_compat(**kw):
        from autorag_research_tpu.llm.openai_compat import OpenAICompatLLM

        return OpenAICompatLLM(**kw)

    register_model_type("llm", "openai_compat", _openai_compat)
    register_model_type("llm", "openai", _openai_compat)
    register_model_type("llm", "vllm", _openai_compat)
    register_model_type("llm", "ollama", _openai_compat)

    # named OpenAI-compatible providers with pinned endpoint + key env
    # (reference preset roles: together.yaml, xai-grok-*.yaml, huggingface.yaml)
    def _openai_compat_preset(default_base_url: str, key_env: str):
        def factory(base_url: str | None = None, **kw):
            from autorag_research_tpu.llm.openai_compat import OpenAICompatLLM

            kw.setdefault("api_key_env", key_env)
            return OpenAICompatLLM(base_url=base_url or default_base_url, **kw)

        return factory

    for name, url, env in [
        ("together", "https://api.together.xyz/v1", "TOGETHER_API_KEY"),
        ("xai", "https://api.x.ai/v1", "XAI_API_KEY"),
        ("huggingface", "http://localhost:8080/v1", "HF_TOKEN"),
    ]:
        register_model_type("llm", name, _openai_compat_preset(url, env))

    def _azure_openai(**kw):
        from autorag_research_tpu.llm.openai_compat import AzureOpenAILLM

        return AzureOpenAILLM(**kw)

    register_model_type("llm", "azure_openai", _azure_openai)

    def _anthropic(**kw):
        from autorag_research_tpu.llm.providers import AnthropicLLM

        return AnthropicLLM(**kw)

    def _gemini(**kw):
        from autorag_research_tpu.llm.providers import GeminiLLM

        return GeminiLLM(**kw)

    def _bedrock(**kw):
        from autorag_research_tpu.llm.providers import BedrockLLM

        return BedrockLLM(**kw)

    register_model_type("llm", "anthropic", _anthropic)
    register_model_type("llm", "gemini", _gemini)
    register_model_type("llm", "bedrock", _bedrock)

    def _jax_lm(**kw):
        from autorag_research_tpu.llm.jax_lm import JaxLM
        from autorag_research_tpu.models.decoder import DecoderConfig

        config_keys = set(DecoderConfig.__dataclass_fields__)
        config_kw = {k: v for k, v in kw.items() if k in config_keys}
        rest = {k: v for k, v in kw.items() if k not in config_keys}
        config = DecoderConfig(**config_kw) if config_kw else None
        return JaxLM(config=config, **rest)

    register_model_type("llm", "jax_lm", _jax_lm)

    def _jax_encoder(multi_vector: bool = False, **kw):
        from autorag_research_tpu.embeddings.jax_encoder import (
            JaxEncoderEmbedding,
            JaxEncoderMultiVectorEmbedding,
        )
        from autorag_research_tpu.models.encoder import EncoderConfig

        config_keys = {f for f in EncoderConfig.__dataclass_fields__}
        config_kw = {k: v for k, v in kw.items() if k in config_keys}
        rest = {k: v for k, v in kw.items() if k not in config_keys}
        if multi_vector:
            return JaxEncoderMultiVectorEmbedding(
                EncoderConfig(multi_vector=True, **config_kw), **rest
            )
        return JaxEncoderEmbedding(EncoderConfig(**config_kw), **rest)

    register_model_type("embedding", "jax_encoder", _jax_encoder)

    # remote OpenAI-compatible /embeddings endpoints (reference roles:
    # openai-{small,large}.yaml, openai-like.yaml, together/ollama/vllm/jina)
    def _openai_embedding_preset(default_base_url: str, key_env: str, model: str):
        def factory(base_url: str | None = None, **kw):
            from autorag_research_tpu.embeddings.openai_compat import (
                OpenAICompatEmbedding,
            )

            kw.setdefault("api_key_env", key_env)
            kw.setdefault("model", model)
            return OpenAICompatEmbedding(base_url=base_url or default_base_url, **kw)

        return factory

    for name, url, env, model in [
        ("openai", "https://api.openai.com/v1", "OPENAI_API_KEY", "text-embedding-3-small"),
        ("openai_compat", "https://api.openai.com/v1", "OPENAI_API_KEY", "text-embedding-3-small"),
        ("together", "https://api.together.xyz/v1", "TOGETHER_API_KEY", "BAAI/bge-large-en-v1.5"),
        ("jina", "https://api.jina.ai/v1", "JINA_API_KEY", "jina-embeddings-v3"),
        ("ollama", "http://localhost:11434/v1", "OLLAMA_API_KEY", "nomic-embed-text"),
        ("vllm", "http://localhost:8000/v1", "VLLM_API_KEY", ""),
    ]:
        register_model_type("embedding", name, _openai_embedding_preset(url, env, model))

    # local torch multi-vector page embedders (reference colpali/colqwen2/
    # bipali presets) and the Infinity server client
    def _lazy_embedding(path: str, **preset):
        def factory(**kw):
            import importlib

            module, cls = path.rsplit(".", 1)
            merged = {**preset, **kw}
            return getattr(importlib.import_module(module), cls)(**merged)

        return factory

    register_model_type(
        "embedding", "colpali",
        _lazy_embedding("autorag_research_tpu.embeddings.colpali.ColPaliEmbedding"),
    )
    register_model_type(
        "embedding", "colqwen",
        _lazy_embedding(
            "autorag_research_tpu.embeddings.colpali.ColPaliEmbedding",
            checkpoint="vidore/colqwen2-v1.0",
        ),
    )
    register_model_type(
        "embedding", "bipali",
        _lazy_embedding("autorag_research_tpu.embeddings.colpali.BiPaliEmbedding"),
    )
    register_model_type(
        "embedding", "infinity",
        _lazy_embedding("autorag_research_tpu.embeddings.infinity.InfinityEmbedding"),
    )
    register_model_type(
        "embedding", "infinity_multi",
        _lazy_embedding(
            "autorag_research_tpu.embeddings.infinity.InfinityMultiVectorEmbedding"
        ),
    )

    from autorag_research_tpu.rerankers import (
        EmbeddingSimilarityReranker,
        LLMListwiseReranker,
        MockReranker,
    )

    register_model_type("reranker", "mock", MockReranker)
    register_model_type("reranker", "llm_listwise", LLMListwiseReranker)
    register_model_type("reranker", "embedding_similarity", EmbeddingSimilarityReranker)

    def _colbert(**kw):
        from autorag_research_tpu.rerankers.colbert import ColBERTReranker

        return ColBERTReranker(**kw)

    register_model_type("reranker", "colbert", _colbert)

    def _jax_cross(**kw):
        from autorag_research_tpu.models.encoder import EncoderConfig
        from autorag_research_tpu.rerankers.jax_cross import JaxCrossEncoderReranker

        cfg_kw = {
            k: kw.pop(k)
            for k in ("vocab_size", "hidden", "layers", "heads", "max_len", "out_dim")
            if k in kw
        }
        config = EncoderConfig(**cfg_kw) if cfg_kw else None
        return JaxCrossEncoderReranker(config=config, **kw)

    register_model_type("reranker", "jax_cross_encoder", _jax_cross)

    def _lazy(path: str):
        def factory(**kw):
            module, cls = path.rsplit(".", 1)
            return getattr(importlib.import_module(module), cls)(**kw)

        return factory

    for name, cls in [
        ("cross_encoder", "CrossEncoderReranker"),
        ("monot5", "MonoT5Reranker"),
        ("upr", "UPRReranker"),
    ]:
        register_model_type("reranker", name, _lazy(f"autorag_research_tpu.rerankers.hf.{cls}"))

    # Named presets for the reference's remaining local rerankers — each is a
    # cross-encoder (or seq2seq) head with a specific checkpoint; the classes
    # above cover the math, these pin the default weights.
    def _cross_encoder_preset(default_checkpoint: str):
        def factory(checkpoint: str | None = None, **kw):
            from autorag_research_tpu.rerankers.hf import CrossEncoderReranker

            return CrossEncoderReranker(checkpoint or default_checkpoint, **kw)

        return factory

    for name, ckpt in [
        ("flag_embedding", "BAAI/bge-reranker-v2-m3"),
        ("koreranker", "Dongjin-kr/ko-reranker"),
        ("sentence_transformer", "cross-encoder/ms-marco-MiniLM-L-6-v2"),
    ]:
        register_model_type("reranker", name, _cross_encoder_preset(ckpt))

    # format-specific variants (causal-LM yes/no, instruction-conditioned,
    # ONNX, OpenVINO) with the reference's default checkpoints
    def _hf_preset(cls_name: str, default_checkpoint: str):
        def factory(checkpoint: str | None = None, **kw):
            import autorag_research_tpu.rerankers.hf as hf_mod

            return getattr(hf_mod, cls_name)(checkpoint or default_checkpoint, **kw)

        return factory

    for name, cls, ckpt in [
        ("flag_embedding_llm", "FlagLLMReranker", "BAAI/bge-reranker-v2-gemma"),
        ("tart", "TARTReranker", "facebook/tart-full-flan-t5-xl"),
        ("flashrank", "FlashRankReranker", "cross-encoder/ms-marco-MiniLM-L-12-v2"),
        ("openvino", "OpenVINOReranker", "cross-encoder/ms-marco-MiniLM-L-6-v2"),
    ]:
        register_model_type("reranker", name, _hf_preset(cls, ckpt))
    for name, cls in [
        ("cohere", "CohereReranker"),
        ("jina", "JinaReranker"),
        ("voyageai", "VoyageReranker"),
        ("mixedbreadai", "MixedbreadReranker"),
    ]:
        register_model_type("reranker", name, _lazy(f"autorag_research_tpu.rerankers.api.{cls}"))


_builtin_factories()


class ModelRegistry:
    """Per-experiment model loader with health checks + instance cache."""

    def __init__(self, config_dir: str | Path | None = None, health_check: bool = True):
        self.config_dir = Path(config_dir) if config_dir else None
        self.health_check = health_check
        self._cache: dict[tuple[str, str], Any] = {}

    # ------------------------------------------------------------ resolution
    def _resolve_spec(self, kind: str, name: str) -> dict:
        if self.config_dir is not None:
            yaml_path = self.config_dir / kind / f"{name}.yaml"
            if yaml_path.exists():
                spec = yaml.safe_load(yaml_path.read_text()) or {}
                if "type" not in spec:
                    raise ModelLoadError(f"{yaml_path} missing 'type'")
                return spec
        if name in _FACTORIES[kind]:
            return {"type": name}
        raise ModelLoadError(
            f"unknown {kind} '{name}': no configs/{kind}/{name}.yaml and no builtin; "
            f"builtins: {sorted(_FACTORIES[kind])}"
        )

    def _instantiate(self, kind: str, spec: dict) -> Any:
        spec = dict(spec)
        type_name = spec.pop("type")
        if ":" in type_name:  # module.path:Class escape hatch
            module, cls = type_name.split(":", 1)
            factory = getattr(importlib.import_module(module), cls)
        else:
            factory = _FACTORIES[kind].get(type_name)
            if factory is None:
                raise ModelLoadError(f"unknown {kind} type '{type_name}'")
        # nested model references resolve recursively
        for key in ("llm", "embedding_model"):
            if isinstance(spec.get(key), str):
                loader = self.load_llm if key == "llm" else self.load_embedding
                spec[key] = loader(spec[key])
        return factory(**spec)

    def _load(self, kind: str, name: str) -> Any:
        key = (kind, name)
        if key in self._cache:
            return self._cache[key]
        instance = self._instantiate(kind, self._resolve_spec(kind, name))
        if self.health_check and hasattr(instance, "health_check"):
            try:
                instance.health_check()
            except Exception as exc:  # noqa: BLE001
                raise ModelLoadError(f"{kind} '{name}' failed health check: {exc}") from exc
        self._cache[key] = instance
        return instance

    # --------------------------------------------------------------- loaders
    def load_llm(self, name: str) -> Any:
        return self._load("llm", name)

    def load_embedding(self, name: str) -> Any:
        return self._load("embedding", name)

    def load_reranker(self, name: str) -> Any:
        return self._load("reranker", name)


_default_registry: ModelRegistry | None = None


def get_default_registry() -> ModelRegistry:
    global _default_registry
    if _default_registry is None:
        _default_registry = ModelRegistry()
    return _default_registry


def load_llm(name: str):
    return get_default_registry().load_llm(name)


def load_embedding_model(name: str):
    return get_default_registry().load_embedding(name)


def load_reranker(name: str):
    return get_default_registry().load_reranker(name)
