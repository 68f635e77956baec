"""BM25 sparse index: tokenization -> CSR stats -> slot-padded device arrays.

Replaces the reference's in-database BM25 stack — ``bm25vector`` columns,
``bm25`` index DDL and ``to_bm25query``/``<&>`` scoring
(``orm/util.py:240-250``, ``orm/repository/chunk.py:185-247``). Index build
computes document frequencies, lengths and per-(doc, term) BM25 weights on the
host (scipy CSR), then lays them out as dense ``[N, L]`` slot arrays for the
TPU scoring kernel (``ops/sparse.py``). Scores are positive, higher = better —
the reference negates the ``<&>`` distance to get the same convention
(``orm/repository/chunk.py:217-238``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autorag_research_tpu.exceptions import IndexNotBuiltError
from autorag_research_tpu.index.base import SearchHit
from autorag_research_tpu.index.tokenize import get_tokenizer
from autorag_research_tpu.ops.sparse import DOC_PAD, QUERY_PAD, bm25_topk


class SparseIndex:
    """Exact BM25 top-k over a slot-padded term-weight layout."""

    def __init__(
        self,
        ids: Sequence[Any],
        texts: Sequence[str] | None = None,
        tokenizer: str = "simple",
        k1: float = 1.2,
        b: float = 0.75,
        max_slots: int | None = None,
    ):
        self.ids = list(ids)
        self.tokenizer_name = tokenizer
        self.k1 = k1
        self.b = b
        self.max_slots = max_slots
        self.vocab: dict[str, int] = {}
        self.doc_freq: np.ndarray | None = None
        self.n_docs = len(self.ids)
        self._slot_ids: np.ndarray | None = None  # [N, L] int32
        self._slot_weights: np.ndarray | None = None  # [N, L] float32
        self._device: tuple[jax.Array, jax.Array] | None = None
        if texts is not None:
            self._build(texts)

    # ----------------------------------------------------------------- build
    @classmethod
    def from_catalog(cls, catalog, table: str = "chunk", **kwargs) -> "SparseIndex":
        rows = catalog.connect().execute(
            f"SELECT id, contents FROM {table} WHERE contents IS NOT NULL ORDER BY id"
        ).fetchall()
        ids = [r["id"] for r in rows]
        texts = [r["contents"] for r in rows]
        return cls(ids, texts, **kwargs)

    def _build(self, texts: Sequence[str]) -> None:
        # Native C++ fast path for the default tokenizer. Token semantics are
        # identical ONLY for pure-ASCII text (the C++ side has no Unicode
        # lowercase/word-class tables — non-ASCII bytes pass through raw,
        # which would disagree with Python's str.lower()/\w on accented
        # letters and Unicode punctuation), so any non-ASCII doc routes the
        # whole build to the Python tokenizer.
        if (
            self.tokenizer_name in ("simple", "wiki_tocken")
            and self.max_slots is None
            and all((t or "").isascii() for t in texts)
        ):
            try:
                from autorag_research_tpu import native

                if native.available():
                    built = native.build_sparse_native(list(texts), self.k1, self.b)
                    self.vocab = built["vocab"]
                    self.doc_freq = built["doc_freq"]
                    self.doc_lengths = built["doc_lengths"]
                    self.avgdl = built["avgdl"]
                    self._slot_ids = built["slot_ids"]
                    self._slot_weights = built["slot_weights"]
                    return
            except Exception as exc:  # noqa: BLE001 - fall back to Python build
                import logging

                logging.getLogger("AutoRAG-Research-TPU").info(
                    "native bm25 build failed (%s); using Python builder", exc
                )
        self._build_python(texts)

    def _build_python(self, texts: Sequence[str]) -> None:
        tok = get_tokenizer(self.tokenizer_name)
        n = len(texts)
        # 1. tokenize + per-doc term frequencies
        doc_tfs: list[dict[int, int]] = []
        vocab = self.vocab
        df_counts: list[int] = []
        lengths = np.zeros(n, dtype=np.int64)
        for i, text in enumerate(texts):
            tokens = tok.tokenize(text or "")
            lengths[i] = len(tokens)
            tf: dict[int, int] = {}
            for t in tokens:
                tid = vocab.get(t)
                if tid is None:
                    tid = len(vocab)
                    vocab[t] = tid
                    df_counts.append(0)
                tf[tid] = tf.get(tid, 0) + 1
            for tid in tf:
                df_counts[tid] += 1
            doc_tfs.append(tf)

        self.doc_freq = np.asarray(df_counts, dtype=np.int64)
        self.doc_lengths = lengths
        self.avgdl = float(lengths.mean()) if n else 0.0

        # 2. BM25 doc-side weights -> slot arrays
        slots = max((len(tf) for tf in doc_tfs), default=0)
        if self.max_slots is not None and slots > self.max_slots:
            slots = self.max_slots
        slots = max(slots, 1)
        slot_ids = np.full((n, slots), DOC_PAD, dtype=np.int32)
        slot_w = np.zeros((n, slots), dtype=np.float32)
        k1, b = self.k1, self.b
        for i, tf in enumerate(doc_tfs):
            norm = k1 * (1 - b + b * (lengths[i] / self.avgdl if self.avgdl else 0.0))
            items = [
                (tid, (cnt * (k1 + 1)) / (cnt + norm)) for tid, cnt in tf.items()
            ]
            if len(items) > slots:
                # overflow: keep the highest-weight terms (approximate; exact
                # for the default unlimited max_slots)
                items.sort(key=lambda x: -x[1])
                items = items[:slots]
            for s, (tid, w) in enumerate(items):
                slot_ids[i, s] = tid
                slot_w[i, s] = w
        self._slot_ids = slot_ids
        self._slot_weights = slot_w

    # ---------------------------------------------------------------- queries
    def idf(self, term_id: int) -> float:
        assert self.doc_freq is not None
        df = float(self.doc_freq[term_id])
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def encode_queries(self, queries: Sequence[str], max_terms: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Tokenize queries -> (term ids [B, T], idf*qtf weights [B, T]),
        padded with QUERY_PAD / 0. Unknown terms are dropped."""
        tok = get_tokenizer(self.tokenizer_name)
        per_query: list[list[tuple[int, float]]] = []
        for q in queries:
            tf: dict[int, int] = {}
            for t in tok.tokenize(q or ""):
                tid = self.vocab.get(t)
                if tid is not None:
                    tf[tid] = tf.get(tid, 0) + 1
            pairs = [(tid, cnt * self.idf(tid)) for tid, cnt in tf.items()]
            if max_terms is not None and len(pairs) > max_terms:
                pairs.sort(key=lambda x: -x[1])
                pairs = pairs[:max_terms]
            per_query.append(pairs)
        t_max = max((len(p) for p in per_query), default=0) or 1
        q_ids = np.full((len(queries), t_max), QUERY_PAD, dtype=np.int32)
        q_w = np.zeros((len(queries), t_max), dtype=np.float32)
        for i, pairs in enumerate(per_query):
            for j, (tid, w) in enumerate(pairs):
                q_ids[i, j] = tid
                q_w[i, j] = w
        return q_ids, q_w

    # ----------------------------------------------------------------- search
    def to_device(self, mesh=None) -> "SparseIndex":
        if self._slot_ids is None:
            raise IndexNotBuiltError("sparse index not built")
        ids = jnp.asarray(self._slot_ids)
        weights = jnp.asarray(self._slot_weights)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from autorag_research_tpu.parallel.mesh import CORPUS_AXIS

            n_shards = mesh.shape[CORPUS_AXIS]
            pad = (-self.n_docs) % n_shards
            if pad:
                ids = jnp.pad(ids, ((0, pad), (0, 0)), constant_values=DOC_PAD)
                weights = jnp.pad(weights, ((0, pad), (0, 0)))
            sharding = NamedSharding(mesh, P(CORPUS_AXIS, None))
            ids = jax.device_put(ids, sharding)
            weights = jax.device_put(weights, sharding)
            self._mesh = mesh
        else:
            ids = jax.device_put(ids)
            weights = jax.device_put(weights)
            self._mesh = None
        self._device = (ids, weights)
        return self

    def search(self, queries: Sequence[str], k: int, method: str = "auto") -> list[list[SearchHit]]:
        if self._slot_ids is None:
            raise IndexNotBuiltError("sparse index not built")
        if self._device is None:
            self.to_device()
        q_ids, q_w = self.encode_queries(queries)
        doc_ids, doc_w = self._device  # type: ignore[misc]
        if getattr(self, "_mesh", None) is not None:
            from autorag_research_tpu.parallel.sharded import sharded_bm25_topk

            scores, rows = sharded_bm25_topk(
                jnp.asarray(q_ids), jnp.asarray(q_w), doc_ids, doc_w,
                k, self.n_docs, self._mesh, method=method,
            )
        else:
            scores, rows = bm25_topk(
                jnp.asarray(q_ids), jnp.asarray(q_w), doc_ids, doc_w, k, method=method
            )
        scores = np.asarray(scores)
        rows = np.asarray(rows)
        k_eff = min(k, self.n_docs)
        out = []
        for qs, qr in zip(scores, rows):
            hits = []
            for s, r in zip(qs[:k_eff], qr[:k_eff]):
                if s <= 0.0:  # no term overlap — not a real hit
                    break
                hits.append(SearchHit(self.ids[int(r)], float(s)))
            out.append(hits)
        return out

    def score_host(self, queries: Sequence[str]) -> np.ndarray:
        """Host scipy CSR oracle: full [B, N] BM25 score matrix."""
        from scipy.sparse import csr_matrix

        assert self._slot_ids is not None
        n_terms = len(self.vocab)
        rows, cols, vals = [], [], []
        for i in range(self.n_docs):
            for s in range(self._slot_ids.shape[1]):
                tid = self._slot_ids[i, s]
                if tid >= 0:
                    rows.append(i)
                    cols.append(tid)
                    vals.append(self._slot_weights[i, s])
        mat = csr_matrix((vals, (rows, cols)), shape=(self.n_docs, max(n_terms, 1)))
        q_ids, q_w = self.encode_queries(queries)
        out = np.zeros((len(queries), self.n_docs), dtype=np.float32)
        for b in range(len(queries)):
            qvec = np.zeros(max(n_terms, 1), dtype=np.float32)
            for tid, w in zip(q_ids[b], q_w[b]):
                if tid >= 0:
                    qvec[tid] = w
            out[b] = mat @ qvec
        return out

    # ------------------------------------------------------------ persistence
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path / "sparse.npz",
            slot_ids=self._slot_ids,
            slot_weights=self._slot_weights,
            doc_freq=self.doc_freq,
            doc_lengths=self.doc_lengths,
        )
        meta = {
            "kind": "sparse",
            "tokenizer": self.tokenizer_name,
            "k1": self.k1,
            "b": self.b,
            "avgdl": self.avgdl,
            "n_docs": self.n_docs,
            "ids": self.ids,
            "vocab": self.vocab,
        }
        (path / "meta.json").write_text(json.dumps(meta, default=str))

    @classmethod
    def load(cls, path: str | Path) -> "SparseIndex":
        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        arrays = np.load(path / "sparse.npz")
        idx = cls(meta["ids"], texts=None, tokenizer=meta["tokenizer"], k1=meta["k1"], b=meta["b"])
        idx.vocab = meta["vocab"]
        idx.avgdl = meta["avgdl"]
        idx.doc_freq = arrays["doc_freq"]
        idx.doc_lengths = arrays["doc_lengths"]
        idx._slot_ids = arrays["slot_ids"]
        idx._slot_weights = arrays["slot_weights"]
        return idx
