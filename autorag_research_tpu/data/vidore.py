"""ViDoRe visual document retrieval ingestors (v1 / v2 / v3).

Capability parity with the reference ``data/vidore.py`` (314),
``vidorev2.py`` (285), ``vidorev3.py`` (492): document page images become
ImageChunk rows (PNG bytes + mimetype), queries carry text, and qrels map
queries to relevant pages. v1 collections are single datasets with
query/image pairs per row; v2/v3 ship corpus/queries/qrels splits.
"""

from __future__ import annotations

import io
import random
from typing import Literal

from autorag_research_tpu.data.base import MultiModalDataIngestor, RANDOM_SEED
from autorag_research_tpu.data.hf_util import load_hf_dataset, sample_ids
from autorag_research_tpu.data.registry import register_ingestor
from autorag_research_tpu.store.gt import image as image_gt, or_all


def image_to_png_bytes(img) -> bytes:
    """PIL image (or raw bytes) -> PNG bytes."""
    if isinstance(img, (bytes, bytearray)):
        return bytes(img)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


class _VidoreBase(MultiModalDataIngestor):
    def detect_primary_key_type(self) -> Literal["bigint", "string"]:
        return "string"

    def _write_pages(self, service, pages: dict) -> None:
        service.add_image_chunks(
            [
                {"id": pid, "image": image_to_png_bytes(img), "mimetype": "image/png"}
                for pid, img in pages.items()
            ]
        )


@register_ingestor(
    name="vidore",
    description="ViDoRe v1 visual document retrieval (query/page pairs)",
    hf_repo="vidore-dumps",
)
class ViDoReIngestor(_VidoreBase):
    def __init__(
        self,
        embedding_model=None,
        dataset_name: str = "vidore/docvqa_test_subsampled",
        data=None,
        data_dir: str | None = None,
    ):
        super().__init__(embedding_model)
        self.dataset_name = dataset_name
        self._data = data
        self.data_dir = data_dir  # local datasets.save_to_disk snapshot

    def _load(self, subset: str):
        if self._data is not None:
            return self._data
        return load_hf_dataset(self.dataset_name, split=subset, data_dir=self.data_dir)

    def ingest(self, subset: str = "test", query_limit=None, min_corpus_cnt=None) -> None:
        service = self._require_service()
        rows = list(self._load(subset))
        rng = random.Random(RANDOM_SEED)
        picked = sample_ids(list(range(len(rows))), query_limit, rng)

        pages: dict[str, object] = {}
        query_rows = []
        gts = []
        for i in picked:
            row = rows[i]
            qid = f"{self.dataset_name.split('/')[-1]}_q{i}"
            page_id = str(row.get("image_filename", f"page_{i}"))
            pages[page_id] = row["image"]
            query_text = row.get("query") or row.get("question") or ""
            if not query_text:
                continue
            query_rows.append({"id": qid, "contents": query_text})
            gts.append((qid, page_id))
        service.add_queries(query_rows)
        for qid, page_id in gts:
            service.add_retrieval_gt(qid, image_gt(page_id), chunk_type="image")
        self._write_pages(service, pages)


class _SplitVidore(_VidoreBase):
    """corpus/queries/qrels-split visual benchmarks (ViDoRe v2/v3 shape)."""

    dataset_name: str = ""

    def __init__(
        self, embedding_model=None, dataset_name: str | None = None, data=None,
        data_dir: str | None = None,
    ):
        super().__init__(embedding_model)
        if dataset_name:
            self.dataset_name = dataset_name
        self._data = data
        self.data_dir = data_dir  # local datasets.save_to_disk snapshot

    def _load(self):
        if self._data is not None:
            return self._data
        return {
            "corpus": load_hf_dataset(self.dataset_name, "corpus", split="test", data_dir=self.data_dir),
            "queries": load_hf_dataset(self.dataset_name, "queries", split="test", data_dir=self.data_dir),
            "qrels": load_hf_dataset(self.dataset_name, "qrels", split="test", data_dir=self.data_dir),
        }

    def ingest(self, subset: str = "test", query_limit=None, min_corpus_cnt=None) -> None:
        service = self._require_service()
        data = self._load()
        rng = random.Random(RANDOM_SEED)

        qrels: dict[str, dict[str, int]] = {}
        for row in data["qrels"]:
            qid = str(row.get("query-id", row.get("query_id")))
            did = str(row.get("corpus-id", row.get("corpus_id")))
            qrels.setdefault(qid, {})[did] = int(row.get("score", 1))

        queries = {
            str(r.get("query-id", r.get("query_id", r.get("_id")))): (r.get("query") or r.get("text"))
            for r in data["queries"]
        }
        qids = sample_ids([q for q in queries if q in qrels], query_limit, rng)

        from autorag_research_tpu.data.hf_util import gold_preserving_subsample

        pages = {}
        for r in data["corpus"]:
            did = str(r.get("corpus-id", r.get("corpus_id", r.get("_id"))))
            pages[did] = r["image"]
        if min_corpus_cnt is not None:
            gold = {d for q in qids for d, s in qrels.get(q, {}).items() if s > 0}
            keep = gold_preserving_subsample(list(pages), gold, min_corpus_cnt, rng)
            pages = {d: pages[d] for d in keep}

        service.add_queries([{"id": qid, "contents": queries[qid]} for qid in qids])
        for qid in qids:
            gt_ids = [d for d, s in qrels[qid].items() if s > 0 and d in pages]
            if gt_ids:
                service.add_retrieval_gt(
                    qid, or_all(gt_ids, wrapper_fn=image_gt), chunk_type="image"
                )
        self._write_pages(service, pages)


@register_ingestor(
    name="vidorev2",
    description="ViDoRe v2 visual retrieval (corpus/queries/qrels splits)",
    hf_repo="vidorev2-dumps",
)
class ViDoReV2Ingestor(_SplitVidore):
    dataset_name = "vidore/esg_reports_v2"


@register_ingestor(
    name="vidorev3",
    description="ViDoRe v3 visual retrieval (corpus/queries/qrels splits)",
    hf_repo="vidorev3-dumps",
)
class ViDoReV3Ingestor(_SplitVidore):
    dataset_name = "vidore/vidore_v3_industrial"
