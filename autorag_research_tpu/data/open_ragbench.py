"""Open-RAGBench: arXiv-PDF text + image RAG ingestor.

Capability parity with the reference ``data/open_ragbench.py`` (247 LoC):
questions over arXiv PDFs where both parsed text chunks and page images are
available; text chunks land in ``chunk``, page renders in ``image_chunk``,
and each question's GT references its source chunk/page.
"""

from __future__ import annotations

import hashlib
import random
from typing import Literal

from autorag_research_tpu.data.base import RANDOM_SEED, TextDataIngestor
from autorag_research_tpu.data.hf_util import load_hf_dataset, sample_ids
from autorag_research_tpu.data.registry import register_ingestor
from autorag_research_tpu.data.vidore import image_to_png_bytes
from autorag_research_tpu.store.gt import or_all


def _doc_id(text: str) -> str:
    return "orb_" + hashlib.md5(text.encode("utf-8")).hexdigest()[:16]


@register_ingestor(
    name="open_ragbench",
    description="Open-RAGBench arXiv PDF RAG (text + page images)",
    hf_repo="open_ragbench-dumps",
)
class OpenRAGBenchIngestor(TextDataIngestor):
    def __init__(
        self,
        embedding_model=None,
        hf_path: str = "vectara/open_ragbench",
        data=None,
    ):
        super().__init__(embedding_model)
        self.hf_path = hf_path
        self._data = data

    def detect_primary_key_type(self) -> Literal["bigint", "string"]:
        return "string"

    def _load(self, subset: str):
        if self._data is not None:
            return self._data
        return load_hf_dataset(self.hf_path, split=subset)

    def ingest(self, subset: str = "test", query_limit=None, min_corpus_cnt=None) -> None:
        service = self._require_service()
        rows = list(self._load(subset))
        rng = random.Random(RANDOM_SEED)
        picked = sample_ids(list(range(len(rows))), query_limit, rng)

        chunks: dict[str, str] = {}
        images: dict[str, object] = {}
        queries = []
        gts = []
        for i in picked:
            row = rows[i]
            qid = str(row.get("id", f"orb_q{i}"))
            doc_ids = []
            for text in row.get("contexts") or row.get("chunks") or []:
                if not text:
                    continue
                did = _doc_id(text)
                chunks[did] = text
                doc_ids.append(did)
            page_img = row.get("page_image") or row.get("image")
            if page_img is not None:
                images[f"{qid}_page"] = page_img
            answer = row.get("answer") or row.get("response")
            queries.append(
                {
                    "id": qid,
                    "contents": row.get("question") or row.get("query", ""),
                    "generation_gt": [answer] if answer else None,
                }
            )
            if doc_ids:
                gts.append((qid, or_all(doc_ids)))

        service.add_chunks([{"id": d, "contents": t} for d, t in chunks.items()])
        if images:
            service.add_image_chunks(
                [
                    {"id": pid, "image": image_to_png_bytes(img), "mimetype": "image/png"}
                    for pid, img in images.items()
                ]
            )
        service.add_queries(queries)
        for qid, gt in gts:
            service.add_retrieval_gt(qid, gt, chunk_type="text")
        service.clean()
