"""Dense single-vector index: corpus embeddings resident in TPU HBM.

Replaces the reference's pgvector column + VectorChord scan
(``orm/schema_factory.py:148-155``, ``orm/repository/base.py:404-426``).

Score convention parity: the reference returns ``1 - cosine_distance`` =
cosine similarity (``orm/service/retrieval_pipeline.py:516-524``). Vectors are
L2-normalized at build/query time so the kernel's raw dot product *is* the
cosine similarity; with ``metric="ip"`` raw inner product is returned instead.
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
from autorag_research_tpu.ops.dense import (
    build_verified_sidecar,
    dense_topk,
    dense_topk_int8,
    dense_topk_verified,
    quantize_int8,
)
from autorag_research_tpu.parallel.sharded import (
    shard_corpus,
    shard_corpus_int8,
    shard_corpus_verified,
    sharded_dense_topk,
    sharded_dense_topk_int8,
    sharded_dense_topk_verified,
)


def _device_hbm_bytes() -> int:
    """Per-device HBM for capacity checks. Only meaningful on TPU — CPU
    (tests, dryruns) returns a no-limit sentinel. Falls back to the v5e
    16 GB when the runtime exposes no memory stats (the axon tunnel)."""
    if jax.default_backend() != "tpu":
        return 1 << 62
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 << 30


def l2_normalize(x: np.ndarray) -> np.ndarray:
    """Row-normalize; zero rows stay zero (cosine undefined -> score 0)."""
    x = np.asarray(x, dtype=np.float32)
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    return np.where(norms > 0, x / np.where(norms == 0, 1.0, norms), 0.0)


class DenseIndex:
    """Exact dense top-k over an [N, d] corpus array, optionally mesh-sharded."""

    def __init__(
        self,
        ids: Sequence[Any],
        embeddings: np.ndarray,
        metric: str = "cosine",
        dtype: str = "float32",
        mode: str = "exact",
    ):
        if mode not in ("exact", "verified", "approx", "int8"):
            raise ValueError(f"unknown mode: {mode}")
        if len(ids) != embeddings.shape[0]:
            raise ValueError("ids/embeddings length mismatch")
        if metric not in ("cosine", "ip"):
            raise ValueError(f"unknown metric: {metric}")
        self.ids = list(ids)
        self.metric = metric
        self.dtype = dtype
        # "verified": GUARANTEED-EXACT fast path — bf16 Pallas prescreen with
        # per-segment stats + bound-checked f32 HIGHEST rescore; falls back to
        # the full exact scan whenever the per-query coverage proof fails, so
        # results always equal mode="exact" including tie order (2.4x measured
        # on v5e @ 500k x 768; ops/dense.dense_topk_verified). Safe for
        # parity runs. On a mesh: per-shard verified search + the global
        # deterministic merge (parallel/sharded.sharded_dense_topk_verified).
        # "approx": lax.approx_max_k k-selection fused into the score pass —
        # 3.1x the exact path at 99.6% top-10 agreement (ops/dense.
        # dense_topk_approx); tie order is NOT (-score, id) deterministic.
        # "int8": per-row symmetric int8 corpus (4x less HBM + 2x MXU rate)
        # + approx selection — 98% top-10 agreement (ops/dense.
        # dense_topk_int8). approx/int8 are serving modes, never for parity
        # runs.
        self.mode = mode
        self._sidecar = None
        self._device_scale: jax.Array | None = None
        mat = np.asarray(embeddings, dtype=np.float32)
        if metric == "cosine":
            mat = l2_normalize(mat)
        self._host = mat
        self._device: jax.Array | None = None
        self._mesh = None
        self._n = mat.shape[0]

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def from_catalog(
        cls, catalog, table: str = "chunk", metric: str = "cosine",
        dtype: str = "float32", mode: str = "exact",
    ):
        ids, mat = catalog.get_embeddings_matrix(table)
        if not ids:
            raise EmbeddingMissingError(f"no embedded rows in table '{table}'")
        return cls(ids, mat, metric=metric, dtype=dtype, mode=mode)

    @property
    def n_docs(self) -> int:
        return self._n

    @property
    def dim(self) -> int:
        return self._host.shape[1]

    def verified_device_bytes(self) -> int:
        """Per-device resident bytes the verified mode needs: the exact f32
        corpus (rescore source) PLUS the bf16 prescreen sidecar — 6 bytes
        per (doc, dim). One v5e chip (16 GB) therefore caps verified at
        ~2.9M docs @ 768d; larger corpora must shard over a mesh
        (sharded_dense_topk_verified splits both tensors) or drop to
        mode="int8" (2 bytes/dim resident, approximate)."""
        n, d = self._host.shape
        n_pad = -(-n // 2048) * 2048  # sidecar pre-pads rows to the block
        return n * d * 4 + n_pad * d * 2

    def to_device(self, mesh=None) -> "DenseIndex":
        """Materialize the corpus in device HBM — replicated on one device, or
        row-sharded over ``mesh``'s corpus axis."""
        use_mesh = mesh is not None and np.prod(list(mesh.shape.values())) > 1
        if self.mode == "verified":
            shards = int(np.prod(list(mesh.shape.values()))) if use_mesh else 1
            need = self.verified_device_bytes() // shards
            limit = _device_hbm_bytes()
            if need > 0.85 * limit:
                raise IndexNotBuiltError(
                    f"verified mode needs ~{need / 2**30:.1f} GB/device "
                    f"(f32 corpus + bf16 sidecar over {shards} shard(s)) but "
                    f"the device reports {limit / 2**30:.1f} GB HBM. Shard "
                    "over a larger mesh, or use mode='int8' (2 bytes/dim, "
                    "approximate) / mode='exact' with host streaming."
                )
        if self.mode == "int8":
            cq, cs = quantize_int8(self._host)
            if use_mesh:
                self._device, self._device_scale = shard_corpus_int8(
                    jnp.asarray(cq), jnp.asarray(cs), mesh
                )
                self._mesh = mesh
            else:
                self._device = jax.device_put(jnp.asarray(cq))
                self._device_scale = jax.device_put(jnp.asarray(cs))
                self._mesh = None
            return self
        arr = jnp.asarray(self._host, dtype=jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32)
        if use_mesh:
            if self.mode == "verified":
                side = build_verified_sidecar(self._host, rep="bf16")
                corpus_sh, lo_sh = shard_corpus_verified(arr, side, mesh)
                self._device = corpus_sh
                self._sidecar = {
                    "corpus_lo": lo_sh,
                    "corpus_scale": None,
                    "nd_max": side["nd_max"],
                    "r_max": side["r_max"],
                }
            else:
                self._device = shard_corpus(arr, mesh)
            self._mesh = mesh
        else:
            self._device = jax.device_put(arr)
            self._mesh = None
            if self.mode == "verified":
                side = build_verified_sidecar(
                    self._host, rep="bf16", pad_rows_to=2048
                )
                self._sidecar = {
                    "corpus_lo": jax.device_put(jnp.asarray(side["corpus_lo"])),
                    "corpus_scale": None,
                    "nd_max": side["nd_max"],
                    "r_max": side["r_max"],
                }
        return self

    def _ensure_device(self) -> jax.Array:
        if self._device is None:
            self.to_device()
        assert self._device is not None
        return self._device

    # ----------------------------------------------------------------- search
    def topk_rows(self, query_embeddings, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Batch search -> (scores [Q, k], corpus row numbers [Q, k]).

        Accepts numpy OR a device ``jax.Array`` — the device path normalizes
        on-chip and chains straight into the kernel with NO intermediate
        host readback (the serving fused embed->search dispatch)."""
        if self._n == 0:
            raise IndexNotBuiltError("index has no documents")
        if isinstance(query_embeddings, jax.Array):
            q = query_embeddings.astype(jnp.float32)
            if q.ndim == 1:
                q = q[None, :]
            if self.metric == "cosine":
                norms = jnp.linalg.norm(q, axis=-1, keepdims=True)
                q = jnp.where(norms > 0, q / jnp.where(norms == 0, 1.0, norms), 0.0)
        else:
            q = np.atleast_2d(np.asarray(query_embeddings, dtype=np.float32))
            if self.metric == "cosine":
                q = l2_normalize(q)
        corpus = self._ensure_device()
        if self.mode == "int8":
            qj = jnp.asarray(q)
            if self._mesh is not None:
                scores, rows = sharded_dense_topk_int8(
                    qj, corpus, self._device_scale, k, self._n, self._mesh
                )
            else:
                scores, rows = dense_topk_int8(qj, corpus, self._device_scale, k)
            return np.asarray(scores, dtype=np.float32), np.asarray(rows)
        qj = jnp.asarray(q, dtype=corpus.dtype)
        method = "approx" if self.mode == "approx" else "auto"
        if self._mesh is not None and self.mode == "verified":
            scores, rows = sharded_dense_topk_verified(
                qj, corpus, self._sidecar["corpus_lo"],
                self._sidecar["nd_max"], self._sidecar["r_max"],
                k, self._n, self._mesh,
            )
        elif self._mesh is not None:
            scores, rows = sharded_dense_topk(
                qj, corpus, k, self._n, self._mesh, method=method
            )
        elif self.mode == "verified":
            scores, rows = dense_topk_verified(qj, corpus, self._sidecar, k)
        else:
            scores, rows = dense_topk(qj, corpus, k, method=method)
        return np.asarray(scores, dtype=np.float32), np.asarray(rows)

    def search(self, query_embeddings: np.ndarray, k: int) -> list[list[SearchHit]]:
        """Batch search returning doc ids + similarity scores (higher=better)."""
        k_eff = min(k, self._n)
        scores, rows = self.topk_rows(query_embeddings, k)
        out = []
        for qs, qr in zip(scores, rows):
            out.append(
                [SearchHit(self.ids[r], float(s)) for s, r in zip(qs[:k_eff], qr[:k_eff])]
            )
        return out

    # ------------------------------------------------------------ persistence
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.save(path / "embeddings.npy", self._host)
        meta = {
            "kind": "dense",
            "metric": self.metric,
            "dtype": self.dtype,
            "mode": self.mode,
            "n_docs": self._n,
            "dim": self.dim,
            "ids": self.ids,
        }
        (path / "meta.json").write_text(json.dumps(meta, default=str))

    @classmethod
    def load(cls, path: str | Path) -> "DenseIndex":
        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        mat = np.load(path / "embeddings.npy")
        idx = cls.__new__(cls)
        idx.ids = meta["ids"]
        idx.metric = meta["metric"]
        idx.dtype = meta.get("dtype", "float32")
        idx.mode = meta.get("mode", "exact")
        idx._host = mat
        idx._device = None
        idx._device_scale = None
        idx._sidecar = None
        idx._mesh = None
        idx._n = mat.shape[0]
        return idx
