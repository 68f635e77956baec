"""Real-TPU hardware tests. Run manually: RUN_ON_TPU=1 python -m pytest -m tpu tests/test_tpu_hardware.py

Skipped in the default CPU-mesh CI (the driver benches separately)."""

import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(not os.environ.get("RUN_ON_TPU"), reason="needs real TPU (RUN_ON_TPU=1)"),
]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_dense_paths_agree_on_tpu(rng):
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import (
        dense_topk_pallas,
        dense_topk_xla,
        dense_topk_xla_full,
    )

    q = jnp.asarray(rng.normal(size=(32, 256)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(20000, 256)).astype(np.float32))
    s1, i1 = dense_topk_xla_full(q, c, 10)
    s2, i2 = dense_topk_xla(q, c, 10)
    s3, i3 = dense_topk_pallas(q, c, 10)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))


def test_bm25_pallas_agrees_on_tpu(rng):
    import jax.numpy as jnp

    from autorag_research_tpu.ops.sparse import (
        bm25_topk_pallas,
        bm25_topk_pallas_v2,
        bm25_topk_xla,
    )

    tid = jnp.asarray(rng.integers(0, 30000, size=(20000, 128)).astype(np.int32))
    tw = jnp.asarray(rng.random(size=(20000, 128)).astype(np.float32))
    qid = jnp.asarray(rng.integers(0, 30000, size=(8, 16)).astype(np.int32))
    qw = jnp.asarray(rng.random(size=(8, 16)).astype(np.float32))
    s1, i1 = bm25_topk_pallas(qid, qw, tid, tw, 10)
    s2, i2 = bm25_topk_xla(qid, qw, tid, tw, 10)
    s3, i3 = bm25_topk_pallas_v2(qid, qw, tid, tw, 10)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))

    # lane-packed kernel on a short-doc (width 16 -> pack 8) corpus
    from autorag_research_tpu.ops.sparse import bm25_topk_pallas_packed, pack_slots

    tid16 = np.asarray(tid)[:, :16].copy()
    tw16 = np.asarray(tw)[:, :16].copy()
    s4, i4 = bm25_topk_pallas_v2(qid, qw, jnp.asarray(tid16), jnp.asarray(tw16), 10)
    pids, pw, pack = pack_slots(tid16, tw16, 16)
    s5, i5 = bm25_topk_pallas_packed(
        qid, qw, jnp.asarray(pids), jnp.asarray(pw), tid16.shape[0], 10, pack
    )
    np.testing.assert_array_equal(np.asarray(i4), np.asarray(i5))

    # probe kernel (candidate-tile grid): positive hits identical to v2
    from autorag_research_tpu.ops.sparse import (
        bm25_topk_pallas_probe,
        build_term_tile_lists,
        probe_candidates,
    )

    indptr, tiles = build_term_tile_lists(np.asarray(tid), 2048)
    cand, count, maxc = probe_candidates(
        np.asarray(qid), indptr, tiles, bq=8, cap=tid.shape[0] // 2048 + 1
    )
    s6, i6 = bm25_topk_pallas_probe(
        qid, qw, tid, tw, jnp.asarray(cand), jnp.asarray(count), 10
    )
    s1h, i1h, s6h, i6h = map(np.asarray, (s1, i1, s6, i6))
    for b in range(8):
        pos = s1h[b] > 0
        np.testing.assert_array_equal(i6h[b][: pos.sum()], i1h[b][pos])


def test_maxsim_paths_agree_on_tpu(rng):
    import jax.numpy as jnp

    from autorag_research_tpu.ops.maxsim import (
        maxsim_topk_pallas,
        maxsim_topk_pallas_v2,
        maxsim_topk_xla,
    )

    docs = jnp.asarray(rng.normal(size=(8192, 128, 128)).astype(np.float32))
    dl = jnp.asarray(np.full(8192, 128, np.int32))
    q = jnp.asarray(rng.normal(size=(8, 32, 128)).astype(np.float32))
    ql = jnp.asarray(np.full(8, 32, np.int32))
    s1, i1 = maxsim_topk_xla(q, ql, docs, dl, 10)
    s2, i2 = maxsim_topk_pallas(q, ql, docs, dl, 10, block_n=16)
    s3, i3 = maxsim_topk_pallas_v2(q, ql, docs, dl, 10, block_n=16)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))
