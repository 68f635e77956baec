"""AutoRAG-Research-TPU: a TPU-native RAG research framework.

A ground-up re-design of the capabilities of ``NomaDamas/AutoRAG-Research``
(reference layer map: ``/root/reference/docs/learn/architecture.md:24-37``) for
TPU hardware:

- The PostgreSQL + VectorChord storage/compute engine (reference
  ``orm/repository/base.py:404-571``, ``orm/repository/chunk.py:185-247``) is
  replaced by device-resident index structures (dense, multi-vector MaxSim,
  sparse BM25) whose hot paths are JAX/XLA + Pallas TPU kernels, sharded over a
  ``jax.sharding.Mesh``.
- The relational catalog (queries, chunks, ground truth, pipelines, results)
  is a lightweight embedded SQLite store with identical resume semantics
  (skip-if-result-present, reference ``orm/service/retrieval_pipeline.py:269-273``).
- Retrieval pipelines are pure functions over indexes with on-device fusion;
  generation pipelines are async LLM orchestration as in the reference.
- Evaluation metrics replicate reference semantics exactly
  (``evaluation/metrics/retrieval.py``, ``evaluation/metrics/generation.py``).
"""

__version__ = "0.1.0"
