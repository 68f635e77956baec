import numpy as np
import pytest

from autorag_research_tpu.llm.base import LLMResult
from autorag_research_tpu.utils.images import image_to_base64_url, normalize_to_png, resize_image
from autorag_research_tpu.utils.profiling import KernelTimer, SpanRecorder
from autorag_research_tpu.utils.text import (
    approx_token_count,
    extract_token_logprobs,
    to_list,
    truncate_text,
    truncate_texts,
)


def test_truncate_estimate():
    text = "word " * 1000
    out = truncate_text(text, max_tokens=10)
    assert len(out) <= 40
    assert truncate_text("short", 100) == "short"
    assert truncate_texts(["a" * 100, "b"], 5) == ["a" * 20, "b"]


def test_truncate_with_tokenizer():
    class FakeTok:
        def encode(self, t):
            return t.split()

        def decode(self, ids):
            return " ".join(ids)

    assert truncate_text("a b c d e", 3, FakeTok()) == "a b c"


def test_to_list():
    assert to_list(None) == []
    assert to_list([1, 2]) == [1, 2]
    assert to_list(np.array([1, 2])) == [1, 2]
    assert to_list("x") == ["x"]
    assert approx_token_count("abcd" * 5) == 5


def test_extract_token_logprobs():
    res = LLMResult(
        text="Yes", logprobs=[{"token": "Yes", "logprob": -0.1}, {"token": ".", "logprob": -2.0}]
    )
    assert extract_token_logprobs(res) == {"Yes": -0.1, ".": -2.0}
    assert extract_token_logprobs(res, ["yes"]) == {"Yes": -0.1}
    assert extract_token_logprobs(LLMResult(text="x")) is None


def test_image_helpers():
    from PIL import Image
    import io

    img = Image.new("RGB", (2000, 500), "red")
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    jpeg = buf.getvalue()
    png = normalize_to_png(jpeg)
    assert png.startswith(b"\x89PNG")
    assert normalize_to_png(png) is png  # passthrough
    small = resize_image(png, max_side=100)
    out = Image.open(io.BytesIO(small))
    assert max(out.size) == 100
    assert image_to_base64_url(b"abc").startswith("data:image/png;base64,")


def test_span_recorder(tmp_path):
    rec = SpanRecorder()
    with rec.span("a"):
        with rec.span("b"):
            pass
    with rec.span("a"):
        pass
    summary = rec.summary()
    assert set(summary) == {"a", "b"}
    rec.dump(tmp_path / "spans.json")
    assert (tmp_path / "spans.json").exists()


def test_executor_spans(catalog):
    from autorag_research_tpu.config import BaseMetricConfig, ExecutorConfig
    from autorag_research_tpu.executor import Executor
    from autorag_research_tpu.index import registry
    from autorag_research_tpu.pipelines.retrieval.vector_search import VectorSearchConfig

    registry.invalidate()
    cfg = ExecutorConfig(
        pipelines=[VectorSearchConfig(name="vs_span", top_k=2)],
        metrics=[BaseMetricConfig(name="recall")],
        health_check=False,
    )
    result = Executor(catalog, cfg).run()
    assert "vs_span/run" in result.spans
    assert "vs_span/metric/recall" in result.spans
    registry.invalidate()


def test_kernel_timer():
    import jax.numpy as jnp

    timer = KernelTimer(reps=4)
    xs = jnp.ones((4, 8, 8))
    dt = timer.measure(lambda x: x @ x, xs)
    assert dt > 0


def test_resize_extreme_aspect_ratio_clamps_to_1px():
    import io

    from PIL import Image

    img = Image.new("RGB", (1, 2048), "blue")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    small = resize_image(buf.getvalue(), max_side=512)
    out = Image.open(io.BytesIO(small))
    assert out.size == (1, 512)  # short side clamped, no PIL ValueError
