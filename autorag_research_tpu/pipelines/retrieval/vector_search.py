"""Dense vector search pipeline (single-vector cosine / multi-vector MaxSim).

Capability parity with the reference ``pipelines/retrieval/vector_search.py:74-191``
(VectorChord ``<=>`` cosine and ``@#`` MaxSim), re-based on the device index:

- ``search_mode="single"``: cosine top-k over the DenseIndex; score =
  cosine similarity (reference's ``1 - distance``,
  ``orm/service/retrieval_pipeline.py:516-524``).
- ``search_mode="multi"``: MaxSim over the MultiVectorIndex; score =
  MaxSim / n_query_vectors (reference ``:501-514``).

The batch path scores every pending query in one kernel launch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Literal

import numpy as np

from autorag_research_tpu.config import BasePipelineConfig

from autorag_research_tpu.exceptions import EmbeddingMissingError
from autorag_research_tpu.index import registry
from autorag_research_tpu.index.dense import DenseIndex
from autorag_research_tpu.pipelines.retrieval.base import BaseRetrievalPipeline


class VectorSearchPipeline(BaseRetrievalPipeline):
    retrieval_unit = "chunk"

    def __init__(
        self,
        catalog,
        name: str = "vector_search",
        search_mode: Literal["single", "multi"] = "single",
        embedding_model=None,
        mesh=None,
        table: str = "chunk",
        index_type: Literal["exact", "ivf", "ivf_contiguous"] = "exact",
        index_options: dict | None = None,
        maxsim_prefilter: int | None = None,
    ):
        self.search_mode = search_mode
        self.embedding_model = embedding_model
        self.mesh = mesh
        self.table = table
        self.index_type = index_type
        self.index_options = index_options or {}
        # multi mode only: PLAID-style two-stage search (proxy prefilter ->
        # exact MaxSim rerank over k * maxsim_prefilter candidates)
        self.maxsim_prefilter = maxsim_prefilter
        # result persistence must route by the searched table, or image hits
        # would land in the chunk result table and silently zero all metrics
        self.retrieval_unit = "image_chunk" if table == "image_chunk" else "chunk"
        super().__init__(catalog, name)

    def _get_pipeline_config(self) -> dict[str, Any]:
        return {
            "type": "vector_search",
            "search_mode": self.search_mode,
            "retrieval_unit": self.retrieval_unit,
            "table": self.table,
            "index_type": self.index_type,
            "index_options": self.index_options,
            "maxsim_prefilter": self.maxsim_prefilter,
        }

    # ------------------------------------------------------------------ index
    def _index(self):
        if self.search_mode == "multi":
            from autorag_research_tpu.index.multi_vector import MultiVectorIndex

            idx = registry.get_or_build(
                self.catalog,
                "multi_vector",
                self.table,
                builder=lambda: MultiVectorIndex.from_catalog(
                    self.catalog, self.table, **self.index_options
                ),
                # options are part of the cache identity like the other
                # branches — they were silently dropped before
                **{str(k): str(v) for k, v in sorted(self.index_options.items())},
            )
        elif self.index_type == "ivf_contiguous":
            from autorag_research_tpu.index.ivf_contiguous import IVFContiguousIndex

            idx = registry.get_or_build(
                self.catalog,
                "ivf_contiguous",
                self.table,
                builder=lambda: IVFContiguousIndex.from_catalog(
                    self.catalog, self.table, **self.index_options
                ),
                **{str(k): str(v) for k, v in sorted(self.index_options.items())},
            )
        elif self.index_type == "ivf":
            from autorag_research_tpu.index.ivf import IVFIndex

            idx = registry.get_or_build(
                self.catalog,
                "ivf",
                self.table,
                builder=lambda: IVFIndex.from_catalog(
                    self.catalog, self.table, **self.index_options
                ),
                # build parameters are part of the cache/artifact identity —
                # two IVF configs with different options must not share indexes
                **{str(k): str(v) for k, v in sorted(self.index_options.items())},
            )
        else:
            # index_options passes through to DenseIndex (e.g. mode="approx"
            # for the fused approx_max_k fast path — 3.1x bf16 QPS at 99.6%
            # top-10 agreement; dtype="bfloat16" halves HBM)
            idx = registry.get_or_build(
                self.catalog,
                "dense",
                self.table,
                builder=lambda: DenseIndex.from_catalog(
                    self.catalog, self.table, **self.index_options
                ),
                **{str(k): str(v) for k, v in sorted(self.index_options.items())},
            )
        if self.mesh is not None and getattr(idx, "_mesh", None) is None and hasattr(idx, "to_device"):
            idx.to_device(self.mesh)  # dense/multi-vector shard rows; IVF
            # shards as per-device sub-indexes (index/ivf.py)
        return idx

    # ----------------------------------------------------------------- search
    def _query_embeddings(self, query_ids: list[Any]):
        multi = self.search_mode == "multi"
        embs = []
        for qid in query_ids:
            e = self.catalog.get_embedding("query", qid, multi=multi)
            if e is None:
                raise EmbeddingMissingError(
                    f"query {qid} has no {'multi-vector ' if multi else ''}embedding"
                )
            embs.append(e)
        return embs

    def _multi_search(self, idx, mats, top_k):
        if self.maxsim_prefilter:
            # the index handles the sharded case itself (warns + full scan);
            # swallowing the kwarg here would hide that signal
            return idx.search(mats, top_k, prefilter=self.maxsim_prefilter)
        return idx.search(mats, top_k)

    def search_by_embedding(self, embedding, top_k: int) -> list[dict[str, Any]]:
        """Direct dense search from a raw embedding (HyDE path — reference
        ``vector_search_by_embedding``, ``orm/service/retrieval_pipeline.py:526+``)."""
        idx = self._index()
        if self.search_mode == "multi":
            hits = self._multi_search(idx, [np.atleast_2d(embedding)], top_k)[0]
        else:
            hits = idx.search(np.atleast_2d(embedding), top_k)[0]
        return [h.as_dict() for h in hits]

    def _retrieve_batch_by_ids(
        self, query_ids, top_k, max_concurrency=16, max_retries=3, retry_delay=1.0
    ):
        idx = self._index()
        out: dict[Any, Any] = {}
        valid_ids, embs = [], []
        for qid in query_ids:
            try:
                e = self._query_embeddings([qid])[0]
                valid_ids.append(qid)
                embs.append(e)
            except EmbeddingMissingError as exc:
                out[qid] = exc
        if valid_ids:
            if self.search_mode == "multi":
                batches = self._multi_search(idx, embs, top_k)
            else:
                batches = idx.search(np.stack(embs), top_k)
            for qid, hits in zip(valid_ids, batches):
                out[qid] = [h.as_dict() for h in hits]
        return out

    def _retrieve_batch_by_texts(self, texts, top_k):
        """Serving hot path: ONE batched embed + ONE kernel launch for the
        whole micro-batch (the default would run a batch-1 search per text)."""
        if self.embedding_model is None:
            raise EmbeddingMissingError("no embedding model configured for text retrieval")
        idx = self._index()
        if self.search_mode == "multi":
            mats = self.embedding_model.embed_texts_multi(list(texts))
            batches = self._multi_search(idx, mats, top_k)
        elif hasattr(self.embedding_model, "embed_texts_device"):
            # on-device embedder: chain embed -> search WITHOUT the
            # intermediate device->host readback (saves one tunnel RTT,
            # ~26 ms/batch through axon; scripts/bench_serving_fused.py)
            embs = self.embedding_model.embed_texts_device(list(texts))
            batches = idx.search(embs, top_k)
        else:
            embs = np.asarray(self.embedding_model.embed_texts(list(texts)))
            batches = idx.search(embs, top_k)
        return [[h.as_dict() for h in hits] for hits in batches]

    async def _retrieve_by_id(self, query_id, top_k):
        res = self._retrieve_batch_by_ids([query_id], top_k)[query_id]
        if isinstance(res, BaseException):
            raise res
        return res

    async def _retrieve_by_text(self, query_text, top_k):
        if self.embedding_model is None:
            raise EmbeddingMissingError(
                "no embedding model configured for text retrieval"
            )
        if self.search_mode == "multi":
            mat = (await self.embedding_model.aembed_texts_multi([query_text]))[0]
            return self.search_by_embedding(mat, top_k)
        vec = await self.embedding_model.aembed_query(query_text)
        return self.search_by_embedding(vec, top_k)


@dataclass(kw_only=True)
class VectorSearchConfig(BasePipelineConfig):
    config_type = "vector_search"
    kind = "retrieval"

    search_mode: str = "single"
    embedding_model: Any = None
    table: str = "chunk"
    index_type: str = "exact"
    index_options: dict | None = None
    maxsim_prefilter: int | None = None

    def build(self, catalog, context):
        return VectorSearchPipeline(
            catalog,
            name=self.name,
            search_mode=self.search_mode,  # type: ignore[arg-type]
            embedding_model=context.load_embedding(self.embedding_model),
            mesh=context.mesh,
            table=self.table,
            index_type=self.index_type,  # type: ignore[arg-type]
            index_options=self.index_options,
            maxsim_prefilter=self.maxsim_prefilter,
        )
