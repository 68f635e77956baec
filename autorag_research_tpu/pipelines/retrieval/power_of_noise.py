"""Power of Noise: inject seeded random corpus noise into retrieval results.

Capability parity with the reference ``pipelines/retrieval/power_of_noise.py:64``
("The Power of Noise: Redefining Retrieval for RAG Systems"): wrap a base
retriever, sample noise documents from the corpus with a fixed seed, and place
them at a configured position (retrieved_first / noise_first / interleave).
``answer_aware_random`` mode excludes the query's ground-truth documents from
the noise pool so noise is guaranteed irrelevant.

Persisted scores encode the constructed order (results are read back sorted by
rel_score desc): position i gets score (n - i).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Any

from autorag_research_tpu.config import BasePipelineConfig
from autorag_research_tpu.pipelines.retrieval.base import BaseRetrievalPipeline


class PowerOfNoisePipeline(BaseRetrievalPipeline):
    def __init__(
        self,
        catalog,
        name: str = "power_of_noise",
        base_retrieval_pipeline=None,
        noise_count: int = 0,
        noise_ratio: float | None = None,
        noise_order: str = "retrieved_first",
        noise_mode: str = "random",
        seed: int = 0,
    ):
        if noise_count < 0:
            raise ValueError("noise_count must be >= 0")
        if noise_ratio is not None and not 0 <= noise_ratio <= 1:
            raise ValueError("noise_ratio must be in [0, 1]")
        if noise_order not in ("retrieved_first", "noise_first", "interleave"):
            raise ValueError(f"unknown noise_order: {noise_order}")
        if noise_mode not in ("random", "answer_aware_random"):
            raise ValueError(f"unknown noise_mode: {noise_mode}")
        self.base = base_retrieval_pipeline
        self.noise_count = noise_count
        self.noise_ratio = noise_ratio
        self.noise_order = noise_order
        self.noise_mode = noise_mode
        self.seed = seed
        self.retrieval_unit = getattr(base_retrieval_pipeline, "retrieval_unit", "chunk")
        super().__init__(catalog, name)

    def _get_pipeline_config(self) -> dict[str, Any]:
        return {
            "type": "power_of_noise",
            "noise_count": self.noise_count,
            "noise_ratio": self.noise_ratio,
            "noise_order": self.noise_order,
            "noise_mode": self.noise_mode,
            "seed": self.seed,
            "retrieval_unit": self.retrieval_unit,
        }

    def _n_noise(self, top_k: int) -> int:
        if self.noise_ratio is not None:
            return int(round(top_k * self.noise_ratio))
        return self.noise_count

    def _sample_noise(self, exclude: set, n: int, query_id: Any | None) -> list:
        if n <= 0:
            return []
        # sample from the table matching the base pipeline's unit so image
        # pipelines get image noise (and never cross-table ids)
        unit = self.retrieval_unit if self.retrieval_unit in ("chunk", "image_chunk") else "chunk"
        gt_col = "chunk_id" if unit == "chunk" else "image_chunk_id"
        if self.noise_mode == "answer_aware_random" and query_id is not None:
            for rel in self.catalog.get_relations_by_query(query_id):
                if rel[gt_col] is not None:
                    exclude.add(rel[gt_col])
        # the corpus is immutable during a run: fetch the id list ONCE per
        # pipeline instance instead of O(N) rows per query
        cache = getattr(self, "_noise_pool_cache", None)
        if cache is None or cache[0] != unit:
            rows = self.catalog.connect().execute(
                f"SELECT id FROM {unit} ORDER BY id"
            ).fetchall()
            cache = (unit, [r["id"] for r in rows])
            self._noise_pool_cache = cache
        pool = [i for i in cache[1] if i not in exclude]
        rng = random.Random(f"{self.seed}:{query_id}")
        return rng.sample(pool, min(n, len(pool)))

    def _compose(self, retrieved: list[dict], noise_ids: list) -> list[dict]:
        noise = [{"doc_id": nid, "score": None} for nid in noise_ids]
        if self.noise_order == "retrieved_first":
            ordered = retrieved + noise
        elif self.noise_order == "noise_first":
            ordered = noise + retrieved
        else:  # interleave
            ordered = []
            for i in range(max(len(retrieved), len(noise))):
                if i < len(retrieved):
                    ordered.append(retrieved[i])
                if i < len(noise):
                    ordered.append(noise[i])
        n = len(ordered)
        return [
            {"doc_id": h["doc_id"], "score": float(n - i)} for i, h in enumerate(ordered)
        ]

    async def _retrieve_by_id(self, query_id, top_k):
        n_noise = self._n_noise(top_k)
        retrieved = await self.base._retrieve_by_id(query_id, max(top_k - n_noise, 0))
        noise = self._sample_noise({h["doc_id"] for h in retrieved}, n_noise, query_id)
        return self._compose(retrieved, noise)

    async def _retrieve_by_text(self, query_text, top_k):
        n_noise = self._n_noise(top_k)
        retrieved = await self.base._retrieve_by_text(query_text, max(top_k - n_noise, 0))
        noise = self._sample_noise({h["doc_id"] for h in retrieved}, n_noise, None)
        return self._compose(retrieved, noise)


@dataclass(kw_only=True)
class PowerOfNoiseConfig(BasePipelineConfig):
    config_type = "power_of_noise"
    kind = "retrieval"

    base_retrieval_pipeline_name: str
    noise_count: int = 0
    noise_ratio: float | None = None
    noise_order: str = "retrieved_first"
    noise_mode: str = "random"
    seed: int = 0

    def build(self, catalog, context):
        return PowerOfNoisePipeline(
            catalog,
            name=self.name,
            base_retrieval_pipeline=context.load_pipeline(self.base_retrieval_pipeline_name),
            noise_count=self.noise_count,
            noise_ratio=self.noise_ratio,
            noise_order=self.noise_order,
            noise_mode=self.noise_mode,
            seed=self.seed,
        )
