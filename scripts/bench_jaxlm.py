"""Measure JaxLM decode throughput (tokens/s) on the real chip.

Run: python scripts/bench_jaxlm.py  (env default JAX_PLATFORMS=axon -> v5e)

The whole prefill+decode loop is one jit (lax.scan), so a call is a single
dispatch; timing forces a host readback per call (block_until_ready does not
block through the axon tunnel — CLAUDE.md gotcha).
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from autorag_research_tpu.llm.jax_lm import JaxLM
from autorag_research_tpu.models.decoder import DecoderConfig, byte_tokenize


def bench(config, batch, prompt_len, new_tokens, reps=5):
    llm = JaxLM(
        config=config, max_prompt_len=prompt_len, max_new_tokens=new_tokens
    )
    prompts = [f"question {i}: what is the capital of france?" for i in range(batch)]
    ids, mask = byte_tokenize(prompts, prompt_len)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    # warmup/compile
    tokens, n = llm._generate_jit(llm.params, ids, mask)
    _ = int(np.asarray(n).sum())
    start = time.perf_counter()
    for _ in range(reps):
        tokens, n = llm._generate_jit(llm.params, ids, mask)
        _ = float(np.asarray(tokens).sum())  # force readback
    elapsed = time.perf_counter() - start
    total_tokens = batch * new_tokens * reps
    return total_tokens / elapsed, elapsed / reps


if __name__ == "__main__":
    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = DecoderConfig(hidden=512, layers=8, heads=8, max_len=512, dtype=jnp.bfloat16)
    for batch in (1, 8, 32):
        tps, per_call = bench(cfg, batch, prompt_len=128, new_tokens=128)
        print(
            f"jaxlm decode: batch={batch} hidden=512 L8 bf16 prompt=128 new=128 "
            f"-> {tps:,.0f} tok/s ({per_call * 1e3:.1f} ms/call)",
            file=sys.stderr,
        )
        print(
            {"metric": "jaxlm_decode_tokens_per_s", "batch": batch, "value": round(tps, 1)}
        )
