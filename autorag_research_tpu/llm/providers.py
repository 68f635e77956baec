"""Native Anthropic / Google Gemini LLM adapters.

Capability parity with the reference's provider presets
(``configs/llm/anthropic-*.yaml`` -> ``langchain_anthropic.ChatAnthropic``,
``configs/llm/google-gemini-*.yaml`` -> langchain Google GenAI; injected via
reference ``injection.py:226-342``), implemented directly over each
provider's REST API with stdlib urllib — no SDKs baked into this image.

Both adapters accept a ``transport`` callable ``(url, body, headers) -> dict``
so tests (and exotic deployments: proxies, recorded fixtures) can replace the
HTTP layer; the default transport POSTs JSON with urllib. The environment is
egress-blocked, so live calls are exercised only through mock transports
(``tests/test_llm_adapters.py``).
"""

from __future__ import annotations

import asyncio
import base64
import json
import os
import urllib.request
from typing import Any, Callable

from autorag_research_tpu.exceptions import LLMError
from autorag_research_tpu.llm.base import BaseLLM, LLMResult

# (url, json body, headers, timeout seconds) -> parsed JSON response.
# Timeout is a real argument so injected transports (proxies, recorded
# fixtures) receive clean wire headers.
Transport = Callable[[str, dict, dict, float], dict]


def _urllib_transport(url: str, body: dict, headers: dict, timeout: float = 120.0) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), headers=headers
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


class AnthropicLLM(BaseLLM):
    """Anthropic Messages API adapter (reference preset role:
    ``configs/llm/anthropic-claude-*.yaml``)."""

    def __init__(
        self,
        model: str = "claude-sonnet-4-5",
        base_url: str = "https://api.anthropic.com",
        api_key: str | None = None,
        api_key_env: str = "ANTHROPIC_API_KEY",
        temperature: float = 0.0,
        max_tokens: int = 1024,
        anthropic_version: str = "2023-06-01",
        timeout: float = 120.0,
        system: str | None = None,
        transport: Transport | None = None,
    ):
        self.model_name = model
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key or os.environ.get(api_key_env, "")
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.anthropic_version = anthropic_version
        self.timeout = timeout
        self.system = system
        self.transport = transport or _urllib_transport

    def _request(self, prompt: str, images: list[bytes] | None, **kwargs: Any) -> dict:
        if images:
            content: Any = [
                {
                    "type": "image",
                    "source": {
                        "type": "base64",
                        "media_type": "image/png",
                        "data": base64.b64encode(img).decode(),
                    },
                }
                for img in images
            ]
            content.append({"type": "text", "text": prompt})
        else:
            content = prompt
        body = {
            "model": self.model_name,
            "max_tokens": kwargs.get("max_tokens", self.max_tokens),
            "temperature": kwargs.get("temperature", self.temperature),
            "messages": [{"role": "user", "content": content}],
        }
        system = kwargs.get("system", self.system)
        if system:
            body["system"] = system
        headers = {
            "Content-Type": "application/json",
            "x-api-key": self.api_key,
            "anthropic-version": self.anthropic_version,
        }
        try:
            return self.transport(f"{self.base_url}/v1/messages", body, headers, self.timeout)
        except Exception as exc:  # noqa: BLE001
            raise LLMError(f"{self.model_name} call failed: {exc}") from exc

    def _parse(self, data: dict) -> LLMResult:
        if data.get("type") == "error":
            raise LLMError(f"{self.model_name}: {data.get('error')}")
        text = "".join(
            part.get("text", "")
            for part in data.get("content", [])
            if part.get("type") == "text"
        )
        usage = data.get("usage") or {}
        in_tok = usage.get("input_tokens", 0)
        out_tok = usage.get("output_tokens", 0)
        return LLMResult(
            text=text,
            token_usage={
                "prompt_tokens": in_tok,
                "completion_tokens": out_tok,
                "total_tokens": in_tok + out_tok,
            },
            metadata={"stop_reason": data.get("stop_reason")},
        )

    async def agenerate(
        self, prompt: str, images: list[bytes] | None = None, **kwargs: Any
    ) -> LLMResult:
        data = await asyncio.to_thread(self._request, prompt, images, **kwargs)
        return self._parse(data)


class GeminiLLM(BaseLLM):
    """Google Gemini ``generateContent`` adapter (reference preset role:
    ``configs/llm/google-gemini-*.yaml``)."""

    def __init__(
        self,
        model: str = "gemini-2.0-flash",
        base_url: str = "https://generativelanguage.googleapis.com/v1beta",
        api_key: str | None = None,
        api_key_env: str = "GOOGLE_API_KEY",
        temperature: float = 0.0,
        max_tokens: int | None = 1024,
        timeout: float = 120.0,
        system: str | None = None,
        transport: Transport | None = None,
    ):
        self.model_name = model
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key or os.environ.get(api_key_env, "")
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.timeout = timeout
        self.system = system
        self.transport = transport or _urllib_transport

    def _request(self, prompt: str, images: list[bytes] | None, **kwargs: Any) -> dict:
        parts: list[dict] = [{"text": prompt}]
        for img in images or []:
            parts.append(
                {
                    "inline_data": {
                        "mime_type": "image/png",
                        "data": base64.b64encode(img).decode(),
                    }
                }
            )
        gen_cfg: dict[str, Any] = {
            "temperature": kwargs.get("temperature", self.temperature)
        }
        max_tokens = kwargs.get("max_tokens", self.max_tokens)
        if max_tokens is not None:
            gen_cfg["maxOutputTokens"] = max_tokens
        body = {
            "contents": [{"role": "user", "parts": parts}],
            "generationConfig": gen_cfg,
        }
        system = kwargs.get("system", self.system)
        if system:
            body["systemInstruction"] = {"parts": [{"text": system}]}
        headers = {
            "Content-Type": "application/json",
            "x-goog-api-key": self.api_key,
        }
        url = f"{self.base_url}/models/{self.model_name}:generateContent"
        try:
            return self.transport(url, body, headers, self.timeout)
        except Exception as exc:  # noqa: BLE001
            raise LLMError(f"{self.model_name} call failed: {exc}") from exc

    def _parse(self, data: dict) -> LLMResult:
        if "error" in data:
            raise LLMError(f"{self.model_name}: {data['error']}")
        candidates = data.get("candidates") or []
        if not candidates:
            raise LLMError(f"{self.model_name}: empty candidates (blocked?)")
        cand = candidates[0]
        text = "".join(
            p.get("text", "") for p in (cand.get("content") or {}).get("parts", [])
        )
        usage = data.get("usageMetadata") or {}
        return LLMResult(
            text=text,
            token_usage={
                "prompt_tokens": usage.get("promptTokenCount", 0),
                "completion_tokens": usage.get("candidatesTokenCount", 0),
                "total_tokens": usage.get("totalTokenCount", 0),
            },
            metadata={"finish_reason": cand.get("finishReason")},
        )

    async def agenerate(
        self, prompt: str, images: list[bytes] | None = None, **kwargs: Any
    ) -> LLMResult:
        data = await asyncio.to_thread(self._request, prompt, images, **kwargs)
        return self._parse(data)
