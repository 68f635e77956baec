"""LLM-based rerankers.

Capability parity with the reference's RankGPT / dynamic_rag rerankers
(``rerankers/rankgpt.py``, ``rerankers/dynamic_rag.py``): an instruction-tuned
LLM orders a candidate list.
"""

from __future__ import annotations

import re
from typing import Sequence

from autorag_research_tpu.rerankers.base import BaseReranker
from autorag_research_tpu.utils.concurrency import run_async

LISTWISE_PROMPT = (
    "Rank the following {n} passages by relevance to the query.\n"
    "Query: {query}\n\n{passages}\n\n"
    "Output the passage numbers in order of decreasing relevance, separated "
    "by ' > ' (for example: 3 > 1 > 2). Output only the ranking."
)


class LLMListwiseReranker(BaseReranker):
    """RankGPT-style listwise permutation reranking in one LLM call."""

    def __init__(self, llm, window: int = 20):
        self.llm = llm
        self.window = window
        self.model_name = f"llm_listwise({getattr(llm, 'model_name', 'llm')})"

    def rerank(self, query: str, texts: Sequence[str], top_k: int | None = None):
        if not texts:
            return []
        passages = "\n".join(f"[{i + 1}] {t}" for i, t in enumerate(texts))
        prompt = LISTWISE_PROMPT.format(n=len(texts), query=query, passages=passages)
        response = run_async(self.llm.agenerate(prompt))
        order = self._parse_ranking(response.text, len(texts))
        # score = descending rank position; unranked passages appended last
        scored = [
            (idx, texts[idx], float(len(texts) - pos))
            for pos, idx in enumerate(order)
        ]
        return self._finalize(scored, top_k)

    @staticmethod
    def _parse_ranking(text: str, n: int) -> list[int]:
        ranked = []
        for tok in re.findall(r"\d+", text):
            idx = int(tok) - 1
            if 0 <= idx < n and idx not in ranked:
                ranked.append(idx)
        for idx in range(n):  # append anything the LLM dropped
            if idx not in ranked:
                ranked.append(idx)
        return ranked
