from autorag_research_tpu.llm.base import BaseLLM, LLMResult, MockLLM, ScriptedLLM

__all__ = ["BaseLLM", "LLMResult", "MockLLM", "ScriptedLLM"]
