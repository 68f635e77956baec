"""Default config tree for ``init``.

The reference fetches its default ``configs/`` from GitHub
(``cli/commands/init.py:16-99``); this image is zero-egress, so the defaults
are embedded here.
"""

from __future__ import annotations

from pathlib import Path

DEFAULT_CONFIGS: dict[str, str] = {
    "experiment.yaml": (
        "# Experiment spec: names resolve under pipelines/ and metrics/\n"
        "pipelines:\n"
        "  retrieval:\n    - vector_search\n    - bm25\n    - hybrid_rrf\n"
        "  generation: []\n"
        "metrics:\n"
        "  retrieval:\n    - recall\n    - ndcg\n"
        "  generation: []\n"
        "executor:\n  health_check: true\n  health_check_queries: 2\n"
    ),
    "db.yaml": "# default workspace location\npath: ./workspaces/default\n",
    "pipelines/retrieval/vector_search.yaml": (
        "type: vector_search\nsearch_mode: single\ntop_k: 10\n"
    ),
    "pipelines/retrieval/vector_search_multi.yaml": (
        "type: vector_search\nsearch_mode: multi\ntop_k: 10\n"
    ),
    "pipelines/retrieval/bm25.yaml": "type: bm25\ntokenizer: english\ntop_k: 10\n",
    "pipelines/retrieval/hybrid_rrf.yaml": (
        "type: hybrid_rrf\nretrieval_pipeline_1_name: vector_search\n"
        "retrieval_pipeline_2_name: bm25\nrrf_k: 60\ntop_k: 10\n"
    ),
    "pipelines/retrieval/hybrid_cc.yaml": (
        "type: hybrid_cc\nretrieval_pipeline_1_name: vector_search\n"
        "retrieval_pipeline_2_name: bm25\nweight: 0.5\nnormalize_method: mm\ntop_k: 10\n"
    ),
    "pipelines/retrieval/hyde.yaml": (
        "type: hyde\nllm: mock\nembedding_model: mock\ntop_k: 10\n"
    ),
    "pipelines/retrieval/image_vector_search.yaml": (
        "type: image_vector_search\nsearch_mode: single\ntop_k: 10\n"
    ),
    "pipelines/generation/basic_rag.yaml": (
        "type: basic_rag\nretrieval_pipeline_name: vector_search\nllm: mock\ntop_k: 5\n"
    ),
    "pipelines/generation/ircot.yaml": (
        # bm25 sub-pipeline: IRCoT retrieves with ad-hoc CoT sentences, which
        # needs text-capable retrieval (dense would require an embedding model)
        "type: ircot\nretrieval_pipeline_name: bm25\nllm: mock\nmax_steps: 8\n"
    ),
    "metrics/retrieval/recall.yaml": "name: recall\nmetric_type: retrieval\n",
    "metrics/retrieval/ndcg.yaml": "name: ndcg\nmetric_type: retrieval\n",
    "metrics/generation/exact_match.yaml": "name: exact_match\nmetric_type: generation\n",
    "metrics/generation/rouge.yaml": (
        "name: rouge\nmetric_type: generation\nkwargs:\n  rouge_type: rougeL\n"
    ),
    "llm/mock.yaml": "type: mock\n",
    "llm/openai.yaml": (
        "type: openai_compat\nmodel: gpt-4o-mini\nbase_url: https://api.openai.com/v1\n"
    ),
    "llm/vllm.yaml": (
        "type: openai_compat\nmodel: my-model\nbase_url: http://localhost:8000/v1\n"
        "api_key_env: VLLM_API_KEY\n"
    ),
    "embedding/mock.yaml": "type: mock\ndim: 64\n",
    "embedding/jax_encoder.yaml": (
        "type: jax_encoder\nhidden: 256\nlayers: 4\nheads: 4\nout_dim: 128\n"
    ),
    "embedding/jax_encoder_multi.yaml": (
        "type: jax_encoder\nmulti_vector: true\nhidden: 256\nlayers: 4\nheads: 4\nout_dim: 128\n"
    ),
    "reranker/mock.yaml": "type: mock\n",
    "reranker/llm_listwise.yaml": "type: llm_listwise\nllm: mock\n",
}


def write_default_configs(target: Path, overwrite: bool = False) -> list[Path]:
    written = []
    for rel, content in DEFAULT_CONFIGS.items():
        path = target / rel
        if path.exists() and not overwrite:
            continue
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(content)
        written.append(path)
    return written
