from autorag_research_tpu.llm.base import BaseLLM, LLMResult, MockLLM, ScriptedLLM


def __getattr__(name):
    # lazy: JaxLM pulls in jax + the decoder stack; keep `import ...llm` light
    if name == "JaxLM":
        from autorag_research_tpu.llm.jax_lm import JaxLM

        return JaxLM
    if name in ("AnthropicLLM", "GeminiLLM", "BedrockLLM"):
        from autorag_research_tpu.llm import providers

        return getattr(providers, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "BaseLLM",
    "LLMResult",
    "MockLLM",
    "ScriptedLLM",
    "JaxLM",
    "AnthropicLLM",
    "GeminiLLM",
    "BedrockLLM",
]
