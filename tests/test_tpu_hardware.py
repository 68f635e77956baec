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


def test_verified_exact_agrees_on_tpu(rng):
    """Verified fast path vs full scan on the real chip: ids must match
    everywhere except pairs whose scores sit below f32 reduction-split
    resolution (which the full scan itself orders batch-dependently)."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.dense import (
        build_verified_sidecar,
        dense_topk_verified,
        dense_topk_xla_full,
    )

    c = rng.normal(size=(50000, 256)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    c[77] = c[40000]  # exact duplicate tie across segments
    q = rng.normal(size=(64, 256)).astype(np.float32)
    q[0] = c[77]
    side = build_verified_sidecar(c, rep="bf16", pad_rows_to=2048)
    s1, i1 = dense_topk_xla_full(jnp.asarray(q), jnp.asarray(c), 10)
    s2, i2, nf, cov = dense_topk_verified(
        jnp.asarray(q), jnp.asarray(c), side, 10, engine="pallas",
        return_stats=True,
    )
    s1, i1, s2, i2 = map(np.asarray, (s1, i1, s2, i2))
    mism = i1 != i2
    assert (np.abs(s2[mism] - s1[mism]) <= 4e-7 * (1 + np.abs(s1[mism]))).all()
    # the exact-duplicate tie orders by id on BOTH paths
    row = i2[0].tolist()
    assert row[0] == 77 and row[1] == 40000


def test_maxsim_verified_agrees_on_tpu(rng):
    """Verified-exact MaxSim vs the f32 exact scan on the real chip,
    including duplicate-doc tie order."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.maxsim import (
        build_maxsim_sidecar,
        maxsim_topk_verified,
        maxsim_topk_xla,
    )

    docs = rng.normal(size=(8192, 64, 128)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=2, keepdims=True)
    dl = rng.integers(16, 65, size=8192).astype(np.int32)
    tok = np.arange(64)[None, :] < dl[:, None]
    docs *= tok[:, :, None]
    docs[50] = docs[7000]  # exact duplicate tie
    dl[50] = dl[7000]
    q = rng.normal(size=(8, 32, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=2, keepdims=True)
    ql = np.full(8, 32, np.int32)
    take = min(int(dl[50]), 32)
    q[0, :take] = docs[50, :take]
    ql[0] = take
    side = build_maxsim_sidecar(docs, dl)
    s1, i1 = maxsim_topk_xla(jnp.asarray(q), jnp.asarray(ql), jnp.asarray(docs), jnp.asarray(dl), 10)
    s2, i2, nf, cov = maxsim_topk_verified(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(docs), jnp.asarray(dl),
        side, 10, kprime=32, return_stats=True,
    )
    s1, i1, s2, i2 = map(np.asarray, (s1, i1, s2, i2))
    mism = i1 != i2
    assert (np.abs(s2[mism] - s1[mism]) <= 4e-7 * (1 + np.abs(s1[mism]))).all()
    row = i2[0].tolist()
    assert row[0] == 50 and row[1] == 7000


def test_probe_packed_agrees_on_tpu(rng):
    """probe x packed kernel vs v2 full scan on the real chip."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.sparse import (
        bm25_topk_pallas_probe_packed,
        bm25_topk_pallas_v2,
        build_term_tile_lists,
        pack_slots,
        probe_candidates,
    )

    n, width = 60000, 16
    tid = np.where(
        np.arange(width)[None, :] < rng.integers(4, width, size=(n, 1)),
        rng.integers(0, 50000, size=(n, width)),
        -1,
    ).astype(np.int32)
    tw = np.where(tid >= 0, rng.random(size=(n, width)), 0.0).astype(np.float32)
    pids, pw, pack = pack_slots(tid, tw, width)
    bn_rows = 256
    indptr, tiles = build_term_tile_lists(tid, bn_rows * pack)
    qid = np.full((3, 8), -2, np.int32)
    qw = np.zeros((3, 8), np.float32)
    for b in range(3):
        qid[b, :4] = rng.integers(40000, 50000, size=4)
        qw[b, :4] = rng.uniform(0.5, 1.5, size=4)
    p_tiles = -(-n // (bn_rows * pack))
    cand, count, _ = probe_candidates(qid, indptr, tiles, bq=8, cap=p_tiles)
    s0, i0 = bm25_topk_pallas_v2(
        jnp.asarray(qid), jnp.asarray(qw), jnp.asarray(tid), jnp.asarray(tw), 10
    )
    s1, i1 = bm25_topk_pallas_probe_packed(
        jnp.asarray(qid), jnp.asarray(qw), jnp.asarray(pids), jnp.asarray(pw),
        n, pack, jnp.asarray(cand), jnp.asarray(count), 10, block_n=bn_rows,
    )
    s0, i0, s1, i1 = map(np.asarray, (s0, i0, s1, i1))
    for b in range(3):
        pos = s0[b] > 0
        np.testing.assert_array_equal(i1[b][: pos.sum()], i0[b][pos])
        np.testing.assert_allclose(s1[b][: pos.sum()], s0[b][pos], rtol=1e-5)


def test_wand_agrees_on_tpu(rng):
    """Tile-WAND (upper-bound-pruned probe + pre-dispatch predictor) vs the
    packed full scan on the real chip: every exit (single-pass, two-pass,
    early fallback) must return the scan's positive hits exactly."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.sparse import (
        QUERY_PAD,
        bm25_topk_pallas_packed,
        bm25_topk_wand,
        build_term_tile_maxw,
        cluster_doc_order,
        pack_slots,
    )

    n, width = 60000, 16
    tid = np.where(
        np.arange(width)[None, :] < rng.integers(4, width, size=(n, 1)),
        rng.integers(0, 50000, size=(n, width)),
        -1,
    ).astype(np.int32)
    tw = np.where(tid >= 0, rng.random(size=(n, width)), 0.0).astype(np.float32)
    df = np.bincount(tid[tid >= 0], minlength=50000)
    order = cluster_doc_order(tid, df)
    tid, tw = tid[order], tw[order]
    pids, pw, pack = pack_slots(tid, tw, width)
    bn_rows = 256
    trip = build_term_tile_maxw(tid, tw, bn_rows * pack)
    # query classes: rare (single-pass/two-pass), common (early fallback)
    qid = np.full((4, 8), QUERY_PAD, np.int32)
    qw = np.zeros((4, 8), np.float32)
    qid[0, 0] = int(np.argmax(df))          # most common single term
    qid[1, :2] = np.argsort(-df)[:2]        # two most common terms
    qid[2, :4] = rng.integers(40000, 50000, size=4)  # rare terms
    qid[3, :3] = [int(np.argmax(df)), 40001, 40002]  # mixed
    qw[0, 0] = 1.0
    qw[1, :2] = (0.8, 1.2)
    qw[2, :4] = rng.uniform(0.5, 1.5, size=4)
    qw[3, :3] = (1.0, 1.0, 1.0)
    s0, i0 = bm25_topk_pallas_packed(
        jnp.asarray(qid), jnp.asarray(qw), jnp.asarray(pids), jnp.asarray(pw),
        n, 10, pack,
    )
    s1, i1, stats = bm25_topk_wand(
        jnp.asarray(qid), jnp.asarray(qw), None, None, trip, 10,
        block_n=bn_rows, packed=(jnp.asarray(pids), jnp.asarray(pw), n, pack),
        return_stats=True,
    )
    s0, i0, s1, i1 = map(np.asarray, (s0, i0, s1, i1))
    for b in range(4):
        pos = s0[b] > 0
        np.testing.assert_array_equal(i1[b][: pos.sum()], i0[b][pos])
        np.testing.assert_allclose(s1[b][: pos.sum()], s0[b][pos], rtol=1e-5)


def test_maxsim_page_chunked_agrees_on_tpu(rng):
    """Chunked-matmul Pallas v2 at page scale (td>=512, the mm_docs-chunked
    compile path) vs the XLA scan: exact same ids, bf16 and f32."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.maxsim import (
        maxsim_topk_pallas_v2,
        maxsim_topk_xla,
    )

    docs = rng.normal(size=(2048, 512, 128)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=2, keepdims=True)
    dl = rng.integers(256, 513, size=2048).astype(np.int32)
    tok = np.arange(512)[None, :] < dl[:, None]
    docs *= tok[:, :, None]
    q = rng.normal(size=(8, 32, 128)).astype(np.float32)
    ql = np.full(8, 32, np.int32)
    for dt in (jnp.bfloat16, jnp.float32):
        d_j = jnp.asarray(docs, dt)
        q_j = jnp.asarray(q, dt)
        s1, i1 = maxsim_topk_xla(q_j, jnp.asarray(ql), d_j, jnp.asarray(dl), 10)
        s2, i2 = maxsim_topk_pallas_v2(
            q_j, jnp.asarray(ql), d_j, jnp.asarray(dl), 10, block_n=16
        )
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_maxsim_int8_agreement_on_tpu(rng):
    """int8 MaxSim serving mode vs exact f32 on the real chip: high top-10
    agreement (approximate by contract, never bit-parity)."""
    import jax.numpy as jnp

    from autorag_research_tpu.ops.maxsim import (
        maxsim_topk_int8,
        maxsim_topk_xla,
        quantize_int8_tokens,
    )

    docs = rng.normal(size=(8192, 64, 128)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=2, keepdims=True)
    dl = np.full(8192, 64, np.int32)
    q = rng.normal(size=(8, 32, 128)).astype(np.float32)
    ql = np.full(8, 32, np.int32)
    dq, dscale = quantize_int8_tokens(jnp.asarray(docs))
    s1, i1 = maxsim_topk_xla(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(docs), jnp.asarray(dl), 10
    )
    s2, i2 = maxsim_topk_int8(
        jnp.asarray(q), jnp.asarray(ql), dq, dscale, jnp.asarray(dl), 10
    )
    i1, i2 = np.asarray(i1), np.asarray(i2)
    agree = np.mean([len(set(i1[b]) & set(i2[b])) / 10 for b in range(8)])
    assert agree >= 0.9, agree
