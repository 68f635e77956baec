"""Multi-vector (late interaction) index: ragged token embeddings in HBM.

Replaces the reference's ``embeddings VECTOR(dim)[]`` columns + VectorChord
``@#`` MaxSim scans (``orm/schema_factory.py:152-155``,
``orm/repository/base.py:487-571``). Ragged [T_i, d] per-doc matrices are
padded to ``[N, Tmax, d]`` with a token-count vector for masking.

``bucketize > 1`` opts into the bucketed ragged layout: the reference
stores exactly-ragged ``VECTOR(dim)[]`` arrays with no padding at all
(``orm/types.py:13-277``); a single ``[N, Tmax, d]`` device tensor instead
pays HBM and matmul FLOPs proportional to ``Tmax / mean(T_i)`` on skewed
corpora (ColBERT docs commonly span ~30-300 tokens). Bucketing partitions
docs by token count (same DP area-minimizing planner as the BM25 slot
buckets, ``index/sparse._plan_buckets``), pads each bucket only to its own
max, runs one kernel launch per bucket, and host-merges by global
``(-score, row)`` — so results equal the flat layout's exactly, and every
mode (exact / verified / int8) composes per bucket.

Score convention parity: ``search`` returns MaxSim / n_query_vectors
(the reference's ``-distance / n_query_vectors``,
``orm/service/retrieval_pipeline.py:501-514``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autorag_research_tpu.exceptions import EmbeddingMissingError, IndexNotBuiltError
from autorag_research_tpu.index.base import SearchHit
from autorag_research_tpu.index.dense import l2_normalize
from autorag_research_tpu.ops.maxsim import maxsim_topk


def pad_ragged(mats: Sequence[np.ndarray], max_tokens: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """list of [T_i, d] -> (padded [N, Tmax, d], lens [N])."""
    if not mats:
        return np.zeros((0, 1, 0), np.float32), np.zeros((0,), np.int32)
    tmax = max_tokens or max(m.shape[0] for m in mats)
    d = mats[0].shape[1]
    out = np.zeros((len(mats), tmax, d), dtype=np.float32)
    lens = np.zeros(len(mats), dtype=np.int32)
    for i, m in enumerate(mats):
        t = min(m.shape[0], tmax)
        out[i, :t] = m[:t]
        lens[i] = t
    return out, lens


def _mean_token_proxies(docs: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-doc single-vector proxy (normalized mean of real token vectors) —
    ONE definition for both build and load so the PLAID-style prefilter
    stage can never diverge between fresh and restored indexes."""
    if len(docs):
        sums = docs.sum(axis=1)
        counts = np.maximum(lens[:, None], 1)
        return l2_normalize(sums / counts)
    return np.zeros((0, docs.shape[2]), np.float32)


class MultiVectorIndex:
    def __init__(
        self,
        ids: Sequence[Any],
        doc_matrices: Sequence[np.ndarray],
        normalize: bool = True,
        max_tokens: int | None = None,
        search_method: str = "auto",
        mode: str = "exact",
        bucketize: int = 1,
    ):
        if len(ids) != len(doc_matrices):
            raise ValueError("ids/doc_matrices length mismatch")
        if mode not in ("exact", "verified", "int8"):
            raise ValueError(f"unknown mode: {mode}")
        if bucketize < 1:
            raise ValueError("bucketize must be >= 1")
        self.ids = list(ids)
        self.normalize = normalize
        # "verified": GUARANTEED-EXACT fast path — bf16 prescreen of the
        # whole corpus keeps top-k' candidates, only those rescore in f32
        # HIGHEST, and a per-query Cauchy-Schwarz coverage proof (or an
        # exact re-run on failure) makes results ALWAYS equal mode="exact"
        # including tie order (ops/maxsim.maxsim_topk_verified). Safe for
        # parity runs. On a mesh: per-shard verified + deterministic merge
        # (parallel/sharded.sharded_maxsim_topk_verified).
        # "int8": APPROXIMATE serving mode — per-token symmetric int8
        # corpus, s8 MXU contraction, 4x HBM capacity (the f32 token matrix
        # never ships to device). Never for parity/oracle runs
        # (ops/maxsim.maxsim_topk_int8).
        self.mode = mode
        # default kernel for search(): "auto" picks the measured winner per
        # dtype/backend (ops/maxsim.maxsim_topk). Pin to "xla" for
        # cross-device bit-parity on tie-dense workloads — different scoring
        # algorithms sum in different orders, so exactly-tied true scores
        # can split differently between e.g. the TPU Pallas kernel and the
        # CPU scan even though each is individually deterministic.
        self.search_method = search_method
        # >1: bucketed ragged layout (single-device; a mesh keeps the flat
        # layout — shards already bound per-device memory, as SparseIndex does)
        self.bucketize = bucketize
        mats = [
            l2_normalize(np.asarray(m, np.float32)) if normalize else np.asarray(m, np.float32)
            for m in doc_matrices
        ]
        self._docs, self._lens = pad_ragged(mats, max_tokens)
        self._n = len(self.ids)
        self._sidecar: dict | None = None
        self._lo_device: jax.Array | None = None
        self._int8: tuple | None = None  # (docs_q, scales) host cache
        self._scales_device: jax.Array | None = None
        # single-vector proxy per doc (mean of token vectors, normalized) —
        # the PLAID-style candidate-generation stage (see ``search``'s
        # ``prefilter`` and ops/maxsim.maxsim_rerank)
        self._proxies = _mean_token_proxies(self._docs, self._lens)
        self._device: tuple[jax.Array, jax.Array] | None = None
        self._proxies_device: jax.Array | None = None
        self._device_buckets: list[dict] | None = None

    @classmethod
    def from_catalog(cls, catalog, table: str = "chunk", **kwargs) -> "MultiVectorIndex":
        ids, mats = catalog.get_embeddings_matrix(table, multi=True)
        if not ids:
            raise EmbeddingMissingError(f"no multi-vector rows in table '{table}'")
        return cls(ids, mats, **kwargs)

    @property
    def n_docs(self) -> int:
        return self._n

    @property
    def dim(self) -> int:
        return self._docs.shape[2]

    @property
    def max_doc_tokens(self) -> int:
        return self._docs.shape[1]

    def device_bytes(self) -> int:
        """Token-matrix bytes on device under the current layout (the HBM
        cost the bucketed layout exists to shrink)."""
        itemsize = 1 if self.mode == "int8" else 4
        if self._device_buckets is not None:
            total = 0
            for b in self._device_buckets:
                total += int(b["docs"].size) * itemsize
                if "scales" in b:
                    total += int(b["scales"].size) * 4
                if "lo" in b:
                    total += int(b["lo"].size) * itemsize
            return total
        if self._device is not None:
            total = int(self._device[0].size) * itemsize
            if self._scales_device is not None:
                total += int(self._scales_device.size) * 4
            if self._lo_device is not None:
                total += int(self._lo_device.size) * 4
            return total
        return 0

    def _build_device_buckets(self) -> list[dict]:
        """Partition rows by token count; each bucket keeps ascending global
        row ids so per-bucket ``(-score, local_row)`` order equals global
        ``(-score, row)`` order and the merge reproduces the flat layout
        exactly."""
        from autorag_research_tpu.index.sparse import _plan_buckets

        bounds = _plan_buckets(self._lens, self.bucketize)
        buckets: list[dict] = []
        lo_bound = 0
        for hi in bounds:
            rows = np.where((self._lens > lo_bound) & (self._lens <= hi))[0]
            lo_bound = hi
            if rows.size == 0:
                continue
            docs = np.ascontiguousarray(self._docs[rows, :hi])
            lens = self._lens[rows]
            entry: dict = {"rows": rows.astype(np.int64), "lens": jnp.asarray(lens)}
            if self.mode == "int8":
                from autorag_research_tpu.ops.maxsim import quantize_int8_tokens

                docs_q, scales = quantize_int8_tokens(docs)
                entry["docs"] = jax.device_put(jnp.asarray(docs_q))
                entry["scales"] = jax.device_put(jnp.asarray(scales))
            else:
                entry["docs"] = jax.device_put(jnp.asarray(docs))
            if self.mode == "verified":
                from autorag_research_tpu.ops.maxsim import build_maxsim_sidecar

                sidecar = build_maxsim_sidecar(docs, lens)
                entry["sidecar"] = {
                    k: v for k, v in sidecar.items() if k != "docs_lo"
                }
                entry["lo"] = jax.device_put(jnp.asarray(sidecar["docs_lo"]))
            buckets.append(entry)
        return buckets

    def to_device(self, mesh=None) -> "MultiVectorIndex":
        if self.bucketize > 1 and mesh is None and self._n:
            self._device_buckets = self._build_device_buckets()
            self._mesh = None
            self._device = None
            return self
        self._device_buckets = None
        scales = None
        if self.mode == "int8" and self._n:
            # the 4x-capacity point: quantize on host once, ship int8 — the
            # f32 token matrix never occupies HBM
            from autorag_research_tpu.ops.maxsim import quantize_int8_tokens

            if self._int8 is None:
                self._int8 = quantize_int8_tokens(self._docs)
            docs = jnp.asarray(self._int8[0])
            scales = jnp.asarray(self._int8[1])
        else:
            docs = jnp.asarray(self._docs)
        lens = jnp.asarray(self._lens)
        lo = None
        if self.mode == "verified" and self._n:
            from autorag_research_tpu.ops.maxsim import build_maxsim_sidecar

            if self._sidecar is None:
                self._sidecar = build_maxsim_sidecar(self._docs, self._lens)
            lo = jnp.asarray(self._sidecar["docs_lo"])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from autorag_research_tpu.parallel.mesh import CORPUS_AXIS

            n_shards = mesh.shape[CORPUS_AXIS]
            pad = (-self._n) % n_shards
            if pad:
                docs = jnp.pad(docs, ((0, pad), (0, 0), (0, 0)))
                lens = jnp.pad(lens, (0, pad))
                if scales is not None:
                    scales = jnp.pad(scales, ((0, pad), (0, 0)))
            docs = jax.device_put(docs, NamedSharding(mesh, P(CORPUS_AXIS, None, None)))
            lens = jax.device_put(lens, NamedSharding(mesh, P(CORPUS_AXIS)))
            if scales is not None:
                scales = jax.device_put(scales, NamedSharding(mesh, P(CORPUS_AXIS, None)))
            if lo is not None:
                if pad:
                    lo = jnp.pad(lo, ((0, pad), (0, 0), (0, 0)))
                lo = jax.device_put(lo, NamedSharding(mesh, P(CORPUS_AXIS, None, None)))
            self._mesh = mesh
        else:
            docs = jax.device_put(docs)
            lens = jax.device_put(lens)
            if scales is not None:
                scales = jax.device_put(scales)
            if lo is not None:
                lo = jax.device_put(lo)
            self._mesh = None
        self._device = (docs, lens)
        self._scales_device = scales
        self._lo_device = lo
        return self

    def _search_bucketed(
        self, q: np.ndarray, q_lens: np.ndarray, k: int,
        method: str, kprime: int | None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """One kernel launch per token-count bucket; host merge by global
        ``(-score, row)`` — identical results to the flat layout."""
        from autorag_research_tpu.ops.dense import INT_MAX

        nq = q.shape[0]
        all_scores, all_rows = [], []
        for bucket in self._device_buckets:  # type: ignore[union-attr]
            nb = int(bucket["rows"].size)
            kb = min(k, nb)
            if self.mode == "verified":
                from autorag_research_tpu.ops.maxsim import maxsim_topk_verified

                s, r = maxsim_topk_verified(
                    jnp.asarray(q), jnp.asarray(q_lens), bucket["docs"],
                    bucket["lens"],
                    {**bucket["sidecar"], "docs_lo": bucket["lo"]}, kb,
                    kprime=kprime if kprime is not None else 64,
                )
            elif self.mode == "int8":
                from autorag_research_tpu.ops.maxsim import maxsim_topk_int8

                s, r = maxsim_topk_int8(
                    jnp.asarray(q), jnp.asarray(q_lens), bucket["docs"],
                    bucket["scales"], bucket["lens"], kb,
                )
            else:
                s, r = maxsim_topk(
                    jnp.asarray(q), jnp.asarray(q_lens), bucket["docs"],
                    bucket["lens"], kb, method=method,
                )
            s = np.asarray(s)
            r = np.asarray(r)
            valid = (r >= 0) & (r < nb) & (s > -1e37)
            g = np.where(valid, bucket["rows"][np.where(valid, r, 0)], INT_MAX)
            s = np.where(valid, s, -np.inf)
            all_scores.append(s)
            all_rows.append(g)
        scores = np.concatenate(all_scores, axis=1)
        rows = np.concatenate(all_rows, axis=1)
        order = np.lexsort((rows, -scores), axis=1)[:, :k]
        b_idx = np.arange(nq)[:, None]
        return scores[b_idx, order], rows[b_idx, order]

    def search(
        self,
        query_matrices: Sequence[np.ndarray],
        k: int,
        method: str | None = None,
        prefilter: int | None = None,
        kprime: int | None = None,
    ) -> list[list[SearchHit]]:
        """query_matrices: list of [Tq_i, d]. Scores = MaxSim / Tq_i.

        ``prefilter=M`` enables the two-stage PLAID-style search: a dense
        top-(k*M) pass over single-vector doc proxies generates candidates,
        then exact MaxSim reranks only those — trading a little recall for a
        large speedup on big corpora (measure with
        scripts/bench_maxsim_prefilter.py). None = exact full scan.
        ``prefilter`` is an APPROXIMATE mode and refuses to combine with
        mode='verified' (would silently void the always-equal-exact
        contract) or mode='int8' (the exact-rerank stage needs the f32
        token matrix that int8 mode exists to avoid).

        ``kprime`` (mode='verified' only): prescreen candidate-list size,
        clamped to ``max(kprime, k)``; default 64 — the measured operating
        point (docs/VERIFIED.md).
        """
        if self._n == 0:
            raise IndexNotBuiltError("index has no documents")
        if prefilter is not None and self.mode == "verified":
            raise ValueError(
                "prefilter is not supported with mode='verified': the "
                "PLAID-style prefilter is approximate and would void the "
                "mode's always-equal-exact contract; use mode='exact' with "
                "prefilter, or drop prefilter"
            )
        if prefilter is not None and self.mode == "int8":
            raise ValueError(
                "prefilter is not supported with mode='int8' "
                "(the exact-rerank stage needs the f32 token matrix)"
            )
        if prefilter is not None and self.bucketize > 1:
            raise ValueError(
                "prefilter is not supported with bucketize>1: the rerank "
                "stage gathers candidates from one flat device tensor, which "
                "the bucketed layout exists to avoid; use bucketize=1 with "
                "prefilter, or drop prefilter"
            )
        if method is None:
            method = self.search_method
        if self._device is None and self._device_buckets is None:
            self.to_device()
        mats = [
            l2_normalize(np.atleast_2d(np.asarray(m, np.float32)))
            if self.normalize
            else np.atleast_2d(np.asarray(m, np.float32))
            for m in query_matrices
        ]
        q, q_lens = pad_ragged(mats)
        if self._device_buckets is not None:
            scores, rows = self._search_bucketed(q, q_lens, k, method, kprime)
            scores = np.asarray(scores)
            rows = np.asarray(rows)
            k_eff = min(k, self._n)
            out = []
            for qi, (qs, qr) in enumerate(zip(scores, rows)):
                nq_tok = max(int(q_lens[qi]), 1)
                out.append(
                    [
                        SearchHit(self.ids[int(r)], float(s) / nq_tok)
                        for s, r in zip(qs[:k_eff], qr[:k_eff])
                        if r < self._n and s > -1e37
                    ]
                )
            return out
        docs, lens = self._device  # type: ignore[misc]
        if getattr(self, "_mesh", None) is not None:
            from autorag_research_tpu.parallel.sharded import (
                sharded_maxsim_topk,
                sharded_maxsim_topk_verified,
            )

            if prefilter is not None:
                import logging

                # the two-stage prefilter has no sharded implementation yet;
                # say so instead of silently running the opposite perf profile
                # (verified/int8 + prefilter already raised above)
                logging.getLogger(__name__).warning(
                    "prefilter=%s is ignored on a mesh-sharded MultiVectorIndex "
                    "(the exact full scan runs instead)", prefilter,
                )
            if self.mode == "verified":
                scores, rows = sharded_maxsim_topk_verified(
                    jnp.asarray(q), jnp.asarray(q_lens), docs, lens,
                    self._lo_device, self._sidecar["nd_max"],
                    self._sidecar["r_max"], k, self._n, self._mesh,
                    kprime=kprime if kprime is not None else 64,
                )
            elif self.mode == "int8":
                from autorag_research_tpu.parallel.sharded import (
                    sharded_maxsim_topk_int8,
                )

                scores, rows = sharded_maxsim_topk_int8(
                    jnp.asarray(q), jnp.asarray(q_lens), docs,
                    self._scales_device, lens, k, self._n, self._mesh,
                )
            else:
                scores, rows = sharded_maxsim_topk(
                    jnp.asarray(q), jnp.asarray(q_lens), docs, lens, k, self._n,
                    self._mesh, method=method,
                )
        elif prefilter is not None:
            from autorag_research_tpu.ops.dense import dense_topk
            from autorag_research_tpu.ops.maxsim import maxsim_rerank

            if self._proxies_device is None:
                self._proxies_device = jax.device_put(jnp.asarray(self._proxies))
            # stage 1: candidate generation over mean-token proxies
            q_proxy = q.sum(axis=1) / np.maximum(q_lens[:, None], 1)
            q_proxy = l2_normalize(q_proxy)
            n_cand = min(self._n, max(k, k * prefilter))
            _, cand = dense_topk(
                jnp.asarray(q_proxy), self._proxies_device, n_cand
            )
            # stage 2: exact MaxSim over the candidates only
            scores, rows = maxsim_rerank(
                jnp.asarray(q), jnp.asarray(q_lens), docs, lens, cand, k
            )
        elif self.mode == "verified":
            from autorag_research_tpu.ops.maxsim import maxsim_topk_verified

            scores, rows = maxsim_topk_verified(
                jnp.asarray(q), jnp.asarray(q_lens), docs, lens,
                {**self._sidecar, "docs_lo": self._lo_device}, k,
                kprime=kprime if kprime is not None else 64,
            )
        elif self.mode == "int8":
            from autorag_research_tpu.ops.maxsim import maxsim_topk_int8

            scores, rows = maxsim_topk_int8(
                jnp.asarray(q), jnp.asarray(q_lens), docs,
                self._scales_device, lens, k,
            )
        else:
            scores, rows = maxsim_topk(
                jnp.asarray(q), jnp.asarray(q_lens), docs, lens, k, method=method
            )
        scores = np.asarray(scores)
        rows = np.asarray(rows)
        k_eff = min(k, self._n)
        out = []
        for qi, (qs, qr) in enumerate(zip(scores, rows)):
            nq = max(int(q_lens[qi]), 1)
            out.append(
                [
                    SearchHit(self.ids[int(r)], float(s) / nq)
                    # score floor drops NEG_INF filler (empty docs / pad rows)
                    for s, r in zip(qs[:k_eff], qr[:k_eff])
                    if r < self._n and s > -1e37
                ]
            )
        return out

    # ------------------------------------------------------------ persistence
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(path / "mv.npz", docs=self._docs, lens=self._lens)
        (path / "meta.json").write_text(
            json.dumps(
                {
                    "kind": "multi_vector",
                    "normalize": self.normalize,
                    "search_method": self.search_method,
                    "mode": self.mode,
                    "bucketize": self.bucketize,
                    "ids": self.ids,
                },
                default=str,
            )
        )

    @classmethod
    def load(cls, path: str | Path) -> "MultiVectorIndex":
        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        arrays = np.load(path / "mv.npz")
        idx = cls.__new__(cls)
        idx.ids = meta["ids"]
        idx.normalize = meta["normalize"]
        idx.search_method = meta.get("search_method", "auto")
        idx.mode = meta.get("mode", "exact")
        idx.bucketize = meta.get("bucketize", 1)
        idx._docs = arrays["docs"]
        idx._lens = arrays["lens"]
        idx._n = len(idx.ids)
        idx._device = None
        idx._device_buckets = None
        # sidecar / int8 arrays are derived state — rebuilt on first to_device()
        idx._sidecar = None
        idx._lo_device = None
        idx._int8 = None
        idx._scales_device = None
        # rebuild the prefilter proxies (derived state, cheap vs the npz read)
        idx._proxies = _mean_token_proxies(idx._docs, idx._lens)
        idx._proxies_device = None
        return idx
