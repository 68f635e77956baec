"""Chained embed->search dispatch vs readback-between: the serving RTT saver.

CLAUDE.md documents chained device dispatches amortizing the ~34 ms axon
tunnel RTT (2nd call +8 ms); this measures that saving on the REAL serving
micro-batch path: JaxEncoderEmbedding -> DenseIndex over a 500k x 768 corpus.

Run: python scripts/bench_serving_fused.py [--n 500000] [--batch 32]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax

    from autorag_research_tpu.embeddings.jax_encoder import JaxEncoderEmbedding
    from autorag_research_tpu.index.dense import DenseIndex
    from autorag_research_tpu.models.encoder import EncoderConfig

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    emb_model = JaxEncoderEmbedding(
        EncoderConfig(hidden=512, layers=6, heads=8, max_len=128, out_dim=768),
        batch_size=args.batch,
    )
    corpus = rng.standard_normal((args.n, 768), dtype=np.float32)
    idx = DenseIndex([f"d{i}" for i in range(args.n)], corpus, mode="exact")
    idx.to_device()
    texts = [f"synthetic serving query number {i} about topic {i % 37}" for i in range(args.batch)]

    def chained():
        embs = emb_model.embed_texts_device(texts)
        return idx.search(embs, 10)

    def readback():
        embs = np.asarray(emb_model.embed_texts(texts))
        return idx.search(embs, 10)

    results = {}
    for name, fn in [("chained", chained), ("readback", readback)]:
        hits = fn()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            hits = fn()
        dt = (time.perf_counter() - t0) / args.reps
        results[name] = round(dt * 1e3, 2)
        print(
            f"{name:9s} {dt * 1e3:7.2f} ms/micro-batch ({args.batch / dt:7.1f} QPS)  "
            f"top1={hits[0][0].doc_id}",
            file=sys.stderr,
        )
    # parity: both paths must retrieve identical ids
    a = [[h.doc_id for h in row] for row in chained()]
    b = [[h.doc_id for h in row] for row in readback()]
    print(f"ids identical: {a == b}", file=sys.stderr)
    results["saving_ms"] = round(results["readback"] - results["chained"], 2)
    print({"metric": "serving_fused_dispatch", "batch": args.batch, **results})


if __name__ == "__main__":
    main()
