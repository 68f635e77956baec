"""SparseIndex end-to-end (index layer incl. host merge): flat vs bucketized
on a REALISTIC width distribution (lognormal-ish unique-term counts, mean
~60, max 128 — BEIR-chunk-like). Run: python scripts/bench_bm25_index_e2e.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

N, B, K = 500_000, 32, 10
VOCAB = 200_000


def build_index(bucketize):
    from autorag_research_tpu.index.sparse import SparseIndex

    rng = np.random.default_rng(0)
    counts = np.clip(rng.lognormal(np.log(55), 0.45, N).astype(int), 4, 128)
    slot_ids = np.full((N, 128), -1, np.int32)
    slot_w = np.zeros((N, 128), np.float32)
    for i in range(N):
        c = counts[i]
        slot_ids[i, :c] = rng.integers(0, VOCAB, c)
        slot_w[i, :c] = rng.random(c)
    idx = SparseIndex.__new__(SparseIndex)
    idx.ids = list(range(N))
    idx.tokenizer_name = "simple"
    idx.k1, idx.b = 1.2, 0.75
    idx.max_slots = None
    idx.bucketize = bucketize
    idx._device_buckets = None
    idx.vocab = {f"t{t}": t for t in range(VOCAB)}
    idx.doc_freq = np.full(VOCAB, 50, np.int64)
    idx.doc_lengths = counts.astype(np.int64)
    idx.avgdl = float(counts.mean())
    idx.n_docs = N
    idx._slot_ids = slot_ids
    idx._slot_weights = slot_w
    idx._device = None
    return idx, counts


def main():
    import jax

    print("devices:", jax.devices(), file=sys.stderr)
    queries = [" ".join(f"t{t}" for t in np.random.default_rng(q).integers(0, VOCAB, 16))
               for q in range(B)]
    for bucketize in (1, 3):
        idx, counts = build_index(bucketize)
        t0 = time.perf_counter()
        idx.to_device()
        if bucketize > 1:
            widths = [int(np.ceil(b["slot_ids"].shape[1])) for b in idx._device_buckets]
            packs = [b["pack"] for b in idx._device_buckets]
            sizes = [len(b["rows"]) for b in idx._device_buckets]
            print(f"buckets: sizes={sizes} packs={packs}", file=sys.stderr)
        print(f"bucketize={bucketize}: device_bytes={idx.device_bytes()/2**20:.1f}MiB "
              f"to_device={time.perf_counter()-t0:.1f}s", file=sys.stderr)
        idx.search(queries[:2], K)  # warm/compile
        t0 = time.perf_counter()
        reps = 10
        for r in range(reps):
            hits = idx.search(queries, K)
        per = (time.perf_counter() - t0) / reps
        print(f"bucketize={bucketize}: per_batch={per*1e3:.1f}ms QPS={B/per:.1f} "
              f"(first hit q0: {hits[0][0].doc_id if hits[0] else None})", file=sys.stderr)


if __name__ == "__main__":
    main()
