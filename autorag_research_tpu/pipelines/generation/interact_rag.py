"""InteractRAG: LLM drives corpus-interaction primitives.

Capability parity with the reference ``pipelines/generation/interact_rag.py:276``:
the agent loops over structured commands against the corpus —
``dense(query)``, ``sparse(query)``, ``fusion(query)``, ``entity(term)``
(exact-term match), ``include(term)`` / ``exclude(term)`` (filter the working
set), ``scale(n)`` (widen k) — then answers from the final working set.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Any

from autorag_research_tpu.config import BasePipelineConfig
from autorag_research_tpu.ops.fusion import rrf_fuse
from autorag_research_tpu.pipelines.generation.base import BaseGenerationPipeline, GenerationResult
from autorag_research_tpu.schema import GENERATION_CONTEXT_CHUNK_ID_KEY
from autorag_research_tpu.utils.tokens import TokenUsageTracker

COMMAND_PROMPT = (
    "You explore a corpus with commands to gather evidence for the question.\n"
    "Commands: dense(text) | sparse(text) | fusion(text) | entity(term) | "
    "include(term) | exclude(term) | scale(n) | answer(final answer)\n"
    "Current working set ({n_docs} docs):\n{working_set}\n\n"
    "Question: {query}\nInteraction log:\n{log}\n\nNext command:"
)

_CMD_RE = re.compile(r"(dense|sparse|fusion|entity|include|exclude|scale|answer)\s*\(\s*(.*?)\s*\)\s*$", re.DOTALL | re.IGNORECASE)


class InteractRAGPipeline(BaseGenerationPipeline):
    def __init__(
        self,
        catalog,
        name: str = "interact_rag",
        retrieval_pipeline=None,  # dense leg
        sparse_retrieval_pipeline=None,
        llm=None,
        max_turns: int = 6,
    ):
        self.sparse_pipeline = sparse_retrieval_pipeline
        self.max_turns = max_turns
        super().__init__(catalog, name, retrieval_pipeline, llm)

    def _get_pipeline_config(self) -> dict[str, Any]:
        return {"type": "interact_rag", "max_turns": self.max_turns}

    async def _generate(self, query_id, top_k) -> GenerationResult:
        query = self.get_query_text(query_id)
        tracker = TokenUsageTracker()
        k = top_k
        working: dict[Any, float] = {}
        log: list[str] = []
        answer = None

        def lookup(ids):
            return self.catalog.get_chunk_contents(list(ids))

        async def dense(q):
            return await self.retrieval_pipeline._retrieve_by_text(q, k)

        async def sparse(q):
            pipe = self.sparse_pipeline or self.retrieval_pipeline
            return await pipe._retrieve_by_text(q, k)

        for _ in range(self.max_turns):
            contents = lookup(working)
            ws = "\n".join(
                f"- {contents[d][:150]}" for d in list(working)[:10] if d in contents
            ) or "(empty)"
            response = await self.llm.agenerate(
                COMMAND_PROMPT.format(
                    n_docs=len(working), working_set=ws, query=query, log="\n".join(log) or "(none)"
                )
            )
            tracker.record(response)
            m = _CMD_RE.search(response.text.strip())
            if m is None:
                log.append(f"unparsed: {response.text.strip()[:80]}")
                continue
            cmd, arg = m.group(1).lower(), m.group(2)
            log.append(f"{cmd}({arg[:60]})")
            if cmd == "answer":
                answer = arg.strip()
                break
            if cmd == "scale":
                try:
                    k = max(1, min(100, int(re.sub(r"\D", "", arg) or k)))
                except ValueError:
                    pass
                continue
            if cmd in ("dense", "sparse", "fusion"):
                if cmd == "fusion":
                    d_hits = await dense(arg)
                    s_hits = await sparse(arg)
                    hits = rrf_fuse(d_hits, s_hits, top_k=k, fetch_k=k)
                else:
                    hits = await (dense(arg) if cmd == "dense" else sparse(arg))
                for h in hits:
                    working[h["doc_id"]] = max(
                        working.get(h["doc_id"], -1e30), float(h["score"])
                    )
            elif cmd == "entity":
                rows = self.catalog.connect().execute(
                    "SELECT id FROM chunk WHERE contents LIKE ? LIMIT ?",
                    (f"%{arg}%", k),
                ).fetchall()
                for r in rows:
                    working.setdefault(r["id"], 0.0)
            elif cmd in ("include", "exclude"):
                contents = lookup(working)
                term = arg.lower()
                keep = {
                    d: s
                    for d, s in working.items()
                    if d in contents
                    and ((term in contents[d].lower()) == (cmd == "include"))
                }
                working = keep

        final_ids = sorted(working, key=lambda d: -working[d])[:top_k]
        if answer is None:
            context = "\n".join(lookup(final_ids).values())
            response = await self.llm.agenerate(
                f"Answer the question using the evidence.\n\nEvidence:\n{context}\n\n"
                f"Question: {query}\nAnswer:"
            )
            tracker.record(response)
            answer = response.text.strip()

        return GenerationResult(
            text=answer,
            token_usage=tracker.total,
            metadata={
                GENERATION_CONTEXT_CHUNK_ID_KEY: final_ids,
                "interaction_log": log,
            },
            retrieved=[{"doc_id": d, "score": working[d]} for d in final_ids],
        )


@dataclass(kw_only=True)
class InteractRAGConfig(BasePipelineConfig):
    config_type = "interact_rag"
    kind = "generation"

    retrieval_pipeline_name: str
    sparse_retrieval_pipeline_name: str | None = None
    llm: Any = None
    max_turns: int = 6

    def build(self, catalog, context):
        sparse = (
            context.load_pipeline(self.sparse_retrieval_pipeline_name)
            if self.sparse_retrieval_pipeline_name
            else None
        )
        return InteractRAGPipeline(
            catalog,
            name=self.name,
            retrieval_pipeline=context.load_pipeline(self.retrieval_pipeline_name),
            sparse_retrieval_pipeline=sparse,
            llm=context.load_llm(self.llm),
            max_turns=self.max_turns,
        )
