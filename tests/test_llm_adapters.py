"""LLM adapters: OpenAI-compatible client against a live mock endpoint."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from autorag_research_tpu.exceptions import LLMError
from autorag_research_tpu.llm.openai_compat import OpenAICompatLLM


@pytest.fixture(scope="module")
def mock_server():
    requests = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            requests.append((self.path, body, dict(self.headers)))
            if self.path != "/v1/chat/completions":
                self.send_response(404)
                self.end_headers()
                return
            payload = {
                "choices": [
                    {
                        "message": {"content": f"echo: {body['messages'][0]['content'] if isinstance(body['messages'][0]['content'], str) else 'multimodal'}"},
                        "finish_reason": "stop",
                        "logprobs": {
                            "content": [{"token": "echo", "logprob": -0.25}]
                        } if body.get("logprobs") else None,
                    }
                ],
                "usage": {"prompt_tokens": 7, "completion_tokens": 3, "total_tokens": 10},
            }
            data = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}/v1", requests
    server.shutdown()


def test_generate_and_usage(mock_server):
    url, requests = mock_server
    llm = OpenAICompatLLM(model="test-model", base_url=url, api_key="k")
    result = llm.generate("hello world")
    assert result.text == "echo: hello world"
    assert result.token_usage == {"prompt_tokens": 7, "completion_tokens": 3, "total_tokens": 10}
    assert result.metadata["finish_reason"] == "stop"
    path, body, headers = requests[-1]
    assert body["model"] == "test-model"
    assert headers["Authorization"] == "Bearer k"


def test_logprobs_and_max_tokens(mock_server):
    url, requests = mock_server
    llm = OpenAICompatLLM(base_url=url, api_key="k", logprobs=True, max_tokens=None)
    result = llm.generate("p", max_tokens=256)
    assert result.logprobs == [{"token": "echo", "logprob": -0.25}]
    _, body, _ = requests[-1]
    assert body["max_tokens"] == 256  # per-call cap honored with None default
    assert body["logprobs"] is True


def test_vision_payload(mock_server):
    url, requests = mock_server
    llm = OpenAICompatLLM(base_url=url, api_key="k")
    from autorag_research_tpu.utils.concurrency import run_async

    result = run_async(llm.agenerate("describe", images=[b"rawbytes"]))
    assert result.text == "echo: multimodal"
    _, body, _ = requests[-1]
    content = body["messages"][0]["content"]
    assert content[0] == {"type": "text", "text": "describe"}
    assert content[1]["image_url"]["url"].startswith("data:image/png;base64,")


def test_connection_error_raises():
    llm = OpenAICompatLLM(base_url="http://127.0.0.1:1/v1", api_key="k", timeout=0.5)
    with pytest.raises(LLMError):
        llm.generate("x")


def test_gated_adapters_import_cleanly():
    # heavy optional adapters must import without their backends present
    from autorag_research_tpu.embeddings.colpali import BiPaliEmbedding, ColPaliEmbedding  # noqa: F401
    from autorag_research_tpu.embeddings.infinity import (  # noqa: F401
        InfinityEmbedding,
        InfinityMultiVectorEmbedding,
    )
    from autorag_research_tpu.exceptions import ModelLoadError

    with pytest.raises(ModelLoadError):
        InfinityEmbedding(base_url="http://127.0.0.1:1", timeout=0.3).embed_texts(["x"])

class TestProviderAdapters:
    """Anthropic / Gemini adapters through mock transports (egress-blocked
    image: the HTTP layer is injectable; wire format asserted per provider)."""

    def test_anthropic_request_and_parse(self):
        from autorag_research_tpu.llm.providers import AnthropicLLM

        seen = {}

        def transport(url, body, headers, timeout):
            seen.update(url=url, body=body, headers=headers)
            return {
                "type": "message",
                "content": [{"type": "text", "text": "claude says hi"}],
                "usage": {"input_tokens": 7, "output_tokens": 3},
                "stop_reason": "end_turn",
            }

        llm = AnthropicLLM(model="claude-sonnet-4-5", api_key="sk-test", transport=transport)
        out = llm.generate("hello", system="be brief", temperature=0.3)
        assert out.text == "claude says hi"
        assert out.token_usage["total_tokens"] == 10
        assert out.metadata["stop_reason"] == "end_turn"
        assert seen["url"].endswith("/v1/messages")
        assert seen["headers"]["x-api-key"] == "sk-test"
        assert seen["headers"]["anthropic-version"]
        assert seen["body"]["system"] == "be brief"
        assert seen["body"]["temperature"] == 0.3
        assert seen["body"]["messages"] == [{"role": "user", "content": "hello"}]

    def test_anthropic_vision_and_error(self):
        from autorag_research_tpu.llm.providers import AnthropicLLM

        seen = {}

        def transport(url, body, headers, timeout):
            seen.update(body=body)
            return {"type": "error", "error": {"type": "invalid_request_error"}}

        llm = AnthropicLLM(api_key="k", transport=transport)
        with pytest.raises(LLMError):
            llm.generate("caption this", images=[b"\x89PNGfake"])
        content = seen["body"]["messages"][0]["content"]
        assert content[0]["type"] == "image"
        assert content[0]["source"]["media_type"] == "image/png"
        assert content[-1] == {"type": "text", "text": "caption this"}

    def test_gemini_request_and_parse(self):
        from autorag_research_tpu.llm.providers import GeminiLLM

        seen = {}

        def transport(url, body, headers, timeout):
            seen.update(url=url, body=body, headers=headers)
            return {
                "candidates": [
                    {
                        "content": {"parts": [{"text": "gemini "}, {"text": "answer"}]},
                        "finishReason": "STOP",
                    }
                ],
                "usageMetadata": {
                    "promptTokenCount": 5,
                    "candidatesTokenCount": 2,
                    "totalTokenCount": 7,
                },
            }

        llm = GeminiLLM(model="gemini-2.0-flash", api_key="g-test", transport=transport)
        out = llm.generate("hello", max_tokens=64)
        assert out.text == "gemini answer"
        assert out.token_usage == {
            "prompt_tokens": 5,
            "completion_tokens": 2,
            "total_tokens": 7,
        }
        assert seen["url"].endswith("models/gemini-2.0-flash:generateContent")
        assert seen["headers"]["x-goog-api-key"] == "g-test"
        assert seen["body"]["generationConfig"]["maxOutputTokens"] == 64

    def test_gemini_blocked_and_error(self):
        from autorag_research_tpu.llm.providers import GeminiLLM

        llm = GeminiLLM(api_key="k", transport=lambda u, b, h, t: {"candidates": []})
        with pytest.raises(LLMError):
            llm.generate("x")
        llm2 = GeminiLLM(api_key="k", transport=lambda u, b, h, t: {"error": {"code": 400}})
        with pytest.raises(LLMError):
            llm2.generate("x")

    def test_injection_resolves_provider_types(self, tmp_path):
        from autorag_research_tpu.injection import ModelRegistry

        (tmp_path / "llm").mkdir()
        (tmp_path / "llm" / "claude.yaml").write_text(
            "type: anthropic\nmodel: claude-sonnet-4-5\napi_key: k\n"
        )
        (tmp_path / "llm" / "gem.yaml").write_text(
            "type: gemini\nmodel: gemini-2.0-flash\napi_key: k\n"
        )
        reg = ModelRegistry(config_dir=tmp_path, health_check=False)
        assert type(reg.load_llm("claude")).__name__ == "AnthropicLLM"
        assert type(reg.load_llm("gem")).__name__ == "GeminiLLM"

    def test_sigv4_matches_aws_published_vector(self):
        """The stdlib signer reproduces AWS's documented IAM ListUsers example
        (docs.aws.amazon.com sigv4-create-signed-request) bit-for-bit."""
        from autorag_research_tpu.llm.providers import sign_v4

        h = sign_v4(
            "GET",
            "iam.amazonaws.com",
            "/",
            {"Action": "ListUsers", "Version": "2010-05-08"},
            {"content-type": "application/x-www-form-urlencoded; charset=utf-8"},
            b"",
            "us-east-1",
            "iam",
            "AKIDEXAMPLE",
            "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
            amz_date="20150830T123600Z",
            sign_payload_header=False,
        )
        assert h["Authorization"] == (
            "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/"
            "aws4_request, SignedHeaders=content-type;host;x-amz-date, Signature="
            "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
        )

    def test_bedrock_request_parse_and_signing(self):
        from autorag_research_tpu.llm.providers import BedrockLLM

        seen = {}

        def transport(url, body, headers, timeout):
            # bedrock transports receive the exact SigV4-signed payload bytes
            assert isinstance(body, bytes)
            seen.update(url=url, body=json.loads(body), headers=headers, timeout=timeout)
            return {
                "output": {
                    "message": {"role": "assistant", "content": [{"text": "Oui."}]}
                },
                "usage": {"inputTokens": 9, "outputTokens": 2, "totalTokens": 11},
                "stopReason": "end_turn",
            }

        llm = BedrockLLM(
            model_id="anthropic.claude-sonnet-4-5-20250929-v1:0",
            region_name="eu-west-1",
            access_key="AKIDEXAMPLE",
            secret_key="secret",
            session_token="tok",
            max_tokens=64,
            transport=transport,
        )
        res = llm.generate("Parlez-vous francais?", system="Answer in French.")
        assert res.text == "Oui."
        assert res.token_usage == {
            "prompt_tokens": 9,
            "completion_tokens": 2,
            "total_tokens": 11,
        }
        assert res.metadata["stop_reason"] == "end_turn"
        # model id percent-encoded exactly once in the as-sent URL
        assert seen["url"] == (
            "https://bedrock-runtime.eu-west-1.amazonaws.com/model/"
            "anthropic.claude-sonnet-4-5-20250929-v1%3A0/converse"
        )
        assert seen["body"]["inferenceConfig"]["maxTokens"] == 64
        assert seen["body"]["system"] == [{"text": "Answer in French."}]
        auth = seen["headers"]["Authorization"]
        assert "/eu-west-1/bedrock/aws4_request" in auth
        assert "x-amz-security-token" in auth  # session token is signed
        assert seen["headers"]["x-amz-security-token"] == "tok"
        assert len(auth.rsplit("Signature=", 1)[1]) == 64

    def test_bedrock_vision_and_error(self):
        from autorag_research_tpu.llm.providers import BedrockLLM

        seen = {}

        def transport(url, body, headers, timeout):
            seen.update(body=json.loads(body))
            return {"message": "The provided model identifier is invalid."}

        llm = BedrockLLM(access_key="a", secret_key="s", transport=transport)
        with pytest.raises(LLMError):
            llm.generate("describe", images=[b"\x89PNG fake"])
        content = seen["body"]["messages"][0]["content"]
        assert content[0]["image"]["format"] == "png"
        assert content[-1] == {"text": "describe"}

    def test_injection_resolves_bedrock_type(self, tmp_path):
        from autorag_research_tpu.injection import ModelRegistry

        (tmp_path / "llm").mkdir()
        (tmp_path / "llm" / "br.yaml").write_text(
            "type: bedrock\nmodel_id: meta.llama3-70b-instruct-v1:0\n"
            "region_name: us-west-2\naccess_key: a\nsecret_key: s\n"
        )
        reg = ModelRegistry(config_dir=tmp_path, health_check=False)
        llm = reg.load_llm("br")
        assert type(llm).__name__ == "BedrockLLM"
        assert llm.region_name == "us-west-2"


class TestAzureOpenAI:
    def test_endpoint_and_headers_dialect(self):
        """Azure speaks /openai/deployments/{d}/chat/completions?api-version=
        with an api-key header, not OpenAI's Bearer scheme."""
        from autorag_research_tpu.llm.openai_compat import AzureOpenAILLM

        llm = AzureOpenAILLM(
            deployment="gpt-4o-dep",
            base_url="https://myres.openai.azure.com",
            api_version="2024-06-01",
            api_key="azkey",
        )
        assert llm._endpoint() == (
            "https://myres.openai.azure.com/openai/deployments/gpt-4o-dep"
            "/chat/completions?api-version=2024-06-01"
        )
        assert llm._headers() == {
            "Content-Type": "application/json",
            "api-key": "azkey",
        }


class TestOpenAICompatEmbedding:
    def test_batching_order_and_dim_discovery(self):
        from autorag_research_tpu.embeddings.openai_compat import OpenAICompatEmbedding

        calls = []

        def transport(url, body, headers, timeout):
            calls.append(list(body["input"]))
            # return rows deliberately OUT of order; 'index' is authoritative
            rows = [
                {"index": i, "embedding": [float(hash(t) % 7), 1.0, 2.0]}
                for i, t in enumerate(body["input"])
            ]
            return {"data": rows[::-1]}

        emb = OpenAICompatEmbedding(
            model="text-embedding-3-small", api_key="k",
            batch_size=2, transport=transport,
        )
        out = emb.embed_texts(["a", "b", "c"])
        assert out.shape == (3, 3) and emb.dim == 3
        assert calls == [["a", "b"], ["c"]]
        assert out[0][0] == float(hash("a") % 7)  # order restored by index

    def test_error_body_raises_llm_error(self):
        from autorag_research_tpu.embeddings.openai_compat import OpenAICompatEmbedding

        emb = OpenAICompatEmbedding(
            api_key="k", transport=lambda u, b, h, t: {"error": {"code": 429}}
        )
        with pytest.raises(LLMError, match="no embeddings"):
            emb.embed_texts(["x"])
