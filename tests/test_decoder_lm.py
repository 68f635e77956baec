"""Causal decoder + JaxLM: cache correctness, training, e2e generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autorag_research_tpu.llm import JaxLM
from autorag_research_tpu.models.decoder import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    CausalDecoder,
    DecoderConfig,
    byte_detokenize,
    byte_tokenize,
    lm_train_step,
)

CFG = DecoderConfig(vocab_size=259, hidden=32, layers=2, heads=2, max_len=64)


@pytest.fixture(scope="module")
def decoder():
    return CausalDecoder(CFG)


@pytest.fixture(scope="module")
def params(decoder):
    return decoder.init(0)


def test_byte_tokenizer_roundtrip():
    texts = ["hello world", "unicode: café ☃", ""]
    ids, mask = byte_tokenize(texts, max_len=32)
    assert ids.shape == (3, 32)
    # left-padded: first row's leading entries are PAD
    assert ids[0, 0] == PAD_ID and not mask[0, 0]
    assert ids[0][mask[0]][0] == BOS_ID
    # strip BOS before detokenizing (detokenize skips ids < byte offset)
    out = byte_detokenize(ids)
    assert out == texts


def test_kv_cache_decode_matches_full_forward(decoder, params):
    """Greedy scan decode must equal naive decode that re-runs the full
    causal forward each step — the KV cache, left-pad positions, and slot
    masks are all on trial here."""
    prompts = ["the capital of france", "x"]
    ids, mask = byte_tokenize(prompts, max_len=24)
    n_new = 8
    tokens, _ = decoder.generate(params, jnp.asarray(ids), jnp.asarray(mask), n_new)
    tokens = np.asarray(tokens)

    # naive reference: append the argmax token, rerun the whole forward
    for row in range(len(prompts)):
        seq = list(ids[row][mask[row]])  # unpadded prompt
        done = False
        for step in range(n_new):
            cur = np.full((1, len(seq)), PAD_ID, dtype=np.int32)
            cur[0] = seq
            m = np.ones((1, len(seq)), dtype=bool)
            logits = decoder(params, jnp.asarray(cur), jnp.asarray(m))
            nxt = int(jnp.argmax(logits[0, -1]))
            if done:
                nxt = PAD_ID
            assert nxt == int(tokens[row, step]), (
                f"row {row} step {step}: cache {tokens[row, step]} != naive {nxt}"
            )
            if nxt == EOS_ID:
                done = True
            if not done:
                seq.append(nxt)


def test_generate_stops_at_eos(decoder, params):
    """Rows that emit EOS freeze to PAD for the rest of the scan."""
    # force an immediate EOS by biasing the embedding-tied logits is fragile;
    # instead just check the produced-count invariant on whatever comes out
    ids, mask = byte_tokenize(["abc"], max_len=16)
    tokens, n = decoder.generate(params, jnp.asarray(ids), jnp.asarray(mask), 12)
    tokens = np.asarray(tokens)[0]
    if EOS_ID in tokens:
        first_eos = int(np.argmax(tokens == EOS_ID))
        assert (tokens[first_eos + 1 :] == PAD_ID).all()
    assert int(n[0]) == int(((tokens != PAD_ID) & (tokens != EOS_ID)).sum())


def test_generate_budget_guard(decoder, params):
    ids, mask = byte_tokenize(["x" * 100], max_len=60)
    with pytest.raises(ValueError):
        decoder.generate(params, jnp.asarray(ids), jnp.asarray(mask), 8)


def test_lm_overfit_then_recite(decoder):
    """Train on one string until the model recites it — proves the training
    objective, the decode loop, and the tokenizer agree end to end."""
    text = "paris"
    ids, mask = byte_tokenize([text + chr(0)], max_len=16)  # cheap EOS-ish stop
    # replace the trailing sentinel byte with a true EOS target
    ids = ids.copy()
    ids[0, -1] = EOS_ID
    batch = {"ids": jnp.asarray(ids), "mask": jnp.asarray(mask)}
    params = decoder.init(3)
    # lr 0.5 oscillates on the CPU backend (precision-sensitive knife edge);
    # 0.3 converges on both CPU and TPU
    step = jax.jit(lambda p: lm_train_step(decoder, p, batch, lr=0.3))
    last = None
    for _ in range(600):
        params, last = step(params)
    assert float(last) < 0.1, f"failed to overfit, loss {float(last)}"

    prompt_ids, prompt_mask = byte_tokenize([""], max_len=16)  # BOS only
    tokens, _ = decoder.generate(
        params, jnp.asarray(prompt_ids), jnp.asarray(prompt_mask), 12
    )
    assert byte_detokenize(np.asarray(tokens))[0].startswith(text)


def test_jaxlm_protocol_and_token_usage():
    llm = JaxLM(config=CFG, max_prompt_len=32, max_new_tokens=8)
    result = llm.generate("What is the capital of France?")
    assert isinstance(result.text, str)
    usage = result.token_usage
    assert usage["prompt_tokens"] > 0
    assert usage["completion_tokens"] <= 8
    assert usage["total_tokens"] == usage["prompt_tokens"] + usage["completion_tokens"]
    # deterministic at temperature 0
    again = llm.generate("What is the capital of France?")
    assert again.text == result.text


def test_jaxlm_batched_results_match_single_path():
    """generate_batch_results reports the same per-query token_usage contract
    as agenerate — the batched serving path must not read zeros."""
    llm = JaxLM(config=CFG, max_prompt_len=32, max_new_tokens=8)
    prompts = ["What is the capital of France?", "hi"]
    rows = llm.generate_batch_results(prompts)
    assert len(rows) == 2
    single = llm.generate(prompts[0])
    assert rows[0].text == single.text
    assert rows[0].token_usage == single.token_usage
    assert rows[1].token_usage["prompt_tokens"] == len("hi") + 1  # BOS + bytes
    assert rows[1].token_usage["total_tokens"] == (
        rows[1].token_usage["prompt_tokens"] + rows[1].token_usage["completion_tokens"]
    )
    # generate_batch stays the text-only view of the same decode
    assert llm.generate_batch(prompts) == [r.text for r in rows]


def test_jaxlm_checkpoint_roundtrip(tmp_path):
    llm = JaxLM(config=CFG, max_prompt_len=32, max_new_tokens=6, seed=7)
    path = str(tmp_path / "lm.npz")
    llm.save(path)
    other = JaxLM(config=CFG, max_prompt_len=32, max_new_tokens=6, seed=99)
    assert other.generate("hi").text != llm.generate("hi").text or True  # may collide
    other.load(path)
    assert other.generate("same prompt").text == llm.generate("same prompt").text


def test_basic_rag_runs_fully_on_device(tmp_path):
    """End-to-end: retrieval kernels + JaxLM generation, zero egress, no mocks."""
    from autorag_research_tpu.index import registry
    from autorag_research_tpu.pipelines.generation.basic_rag import BasicRAGPipeline
    from autorag_research_tpu.pipelines.retrieval.bm25 import BM25Pipeline
    from autorag_research_tpu.store.catalog import Catalog
    from autorag_research_tpu.utils.concurrency import run_async

    registry.invalidate()
    cat = Catalog(tmp_path / "dev.db")
    cat.add_chunks([{"id": i, "contents": c} for i, c in enumerate(
        ["Paris is the capital of France.", "Berlin is the capital of Germany."]
    )])
    cat.add_queries([{"id": 0, "contents": "capital of France?"}])
    bm25 = BM25Pipeline(cat, "bm25_dev")
    llm = JaxLM(config=CFG, max_prompt_len=48, max_new_tokens=8)
    pipe = BasicRAGPipeline(cat, "rag_jaxlm", retrieval_pipeline=bm25, llm=llm)
    out = run_async(pipe._generate(0, 2))
    assert isinstance(out.text, str)
    assert out.metadata["context_chunk_ids"]
    assert out.token_usage["total_tokens"] > 0
    registry.invalidate()


def test_jaxlm_temperature_sampling_advances_across_calls():
    """temperature>0 must SAMPLE: two calls with the same prompt advance the
    key and may differ; at temperature 0 decode stays deterministic
    (regression: a fixed PRNGKey(0) made every sample byte-identical)."""
    llm = JaxLM(config=CFG, max_prompt_len=16, max_new_tokens=12, temperature=1.5)
    outs = {llm.generate("same prompt").text for _ in range(4)}
    assert len(outs) > 1  # 4 high-temperature samples from random init differ
