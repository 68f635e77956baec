"""End-to-end ingest at catalog scale: bulk insert -> embed -> index build.

BASELINE.md tracks index-build docs/sec; bench.py reports the encoder's raw
embedding rate, but the full path (SQLite bulk insert + resumable embed loop
+ embedding readback + device index build) was unmeasured at >=1M rows
(reference path: orm/service/base_ingestion.py:326-437). This measures each
stage and the whole pipeline.

Run: python scripts/bench_ingest_e2e.py [--n 1000000] [--skip-embed]
"""

import argparse
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--skip-embed", action="store_true",
                    help="skip the model embed loop (CPU-only runs)")
    args = ap.parse_args()
    n = args.n

    from autorag_research_tpu.store.catalog import Catalog
    from autorag_research_tpu.store.ingestion import IngestionService

    tmp = Path(tempfile.mkdtemp(prefix="ingest_e2e_"))
    results = {"n": n}
    try:
        cat = Catalog(tmp / "catalog.db", embedding_dim=args.dim)
        service = IngestionService(cat)

        # ---- stage 1: bulk insert -------------------------------------------
        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        batch = 50_000
        for lo in range(0, n, batch):
            hi = min(lo + batch, n)
            service.add_chunks(
                [
                    {"id": i, "contents": f"synthetic document number {i} about "
                                          f"topic {i % 997} with term{i % 4999}"}
                    for i in range(lo, hi)
                ]
            )
        dt_insert = time.perf_counter() - t0
        results["insert_docs_per_sec"] = round(n / dt_insert, 1)
        print(f"bulk insert: {n} rows in {dt_insert:.1f}s "
              f"({n / dt_insert:,.0f} docs/sec)", file=sys.stderr, flush=True)

        # ---- stage 2: embed loop (resumable service path) -------------------
        if not args.skip_embed:
            from autorag_research_tpu.embeddings.jax_encoder import JaxEncoderEmbedding
            from autorag_research_tpu.models.encoder import EncoderConfig

            emb = JaxEncoderEmbedding(
                EncoderConfig(hidden=512, layers=6, heads=8, max_len=128,
                              out_dim=args.dim),
                batch_size=512,
            )
            t0 = time.perf_counter()
            stats = service.embed_table(emb, "chunk", batch_size=512)
            dt_embed = time.perf_counter() - t0
            done = stats.embedded
            results["embed_docs_per_sec"] = round(done / dt_embed, 1)
            print(f"embed loop: {done} rows in {dt_embed:.1f}s "
                  f"({done / dt_embed:,.0f} docs/sec)", file=sys.stderr, flush=True)

            # ---- stage 3: dense index build (read matrix + device put) ------
            from autorag_research_tpu.index.dense import DenseIndex

            t0 = time.perf_counter()
            idx = DenseIndex.from_catalog(cat, "chunk")
            idx.to_device()
            _ = idx.search(np.asarray(emb.embed_texts(["synthetic document"])), 5)
            dt_index = time.perf_counter() - t0
            results["dense_index_build_docs_per_sec"] = round(n / dt_index, 1)
            print(f"dense index build (read+upload+first search): {dt_index:.1f}s "
                  f"({n / dt_index:,.0f} docs/sec)", file=sys.stderr, flush=True)

        # ---- stage 4: BM25 index build --------------------------------------
        from autorag_research_tpu.index.sparse import SparseIndex

        t0 = time.perf_counter()
        rows = cat.connect().execute("SELECT id, contents FROM chunk").fetchall()
        sidx = SparseIndex([r["id"] for r in rows], [r["contents"] for r in rows])
        dt_bm25 = time.perf_counter() - t0
        results["bm25_build_docs_per_sec"] = round(n / dt_bm25, 1)
        print(f"bm25 index build (tokenize+slots): {dt_bm25:.1f}s "
              f"({n / dt_bm25:,.0f} docs/sec, width {sidx._slot_ids.shape[1]})",
              file=sys.stderr, flush=True)

        db_bytes = (tmp / "catalog.db").stat().st_size
        results["catalog_gb"] = round(db_bytes / 2**30, 2)
        print({"metric": "ingest_e2e", **results})
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
