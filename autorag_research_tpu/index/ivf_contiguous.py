"""Cluster-contiguous IVF: TPU-shaped ANN with zero row gathers.

The gather-based IVF (``index/ivf.py``) loses 238x to brute force at 2M rows
because per-row random-access gathers starve the MXU (measured,
scripts/bench_ann_scale.py). This layout fixes the access pattern:

- k-means cells are PHYSICALLY materialized: rows are copied into fixed-size
  blocks ``[n_blocks, block_rows, d]`` grouped by cell (a cell owns
  ceil(size/block_rows) blocks; the tail block is zero-padded);
- each block carries a search key (normalized mean of its rows) — probing
  ranks blocks directly, so skewed cells cost proportionally more probes
  instead of overflowing a padded member table;
- search = one small key matmul + a COARSE gather of ``nprobe_blocks`` whole
  blocks (each ~block_rows x d x 4B contiguous — MB-granular HBM streams, not
  row-granular gathers) + one [p*S, d] x [d, qtile] matmul + masked top-k in
  the framework's (-score, id) order.

This is the ``vchordrq`` role (reference ``orm/util.py:204-250``) in the
regime where it can actually win on TPU: single-query/small-batch latency,
and corpora beyond HBM via ``device="host"`` (keys stay on device; probed
blocks stream from host RAM per query batch).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autorag_research_tpu.exceptions import IndexNotBuiltError
from autorag_research_tpu.index.base import SearchHit
from autorag_research_tpu.index.dense import l2_normalize
from autorag_research_tpu.index.ivf import train_centroids
from autorag_research_tpu.ops.dense import INT_MAX, NEG_INF, _precision_for
from autorag_research_tpu.ops.topk import sort_topk


@functools.partial(jax.jit, static_argnames=("p",))
def _probe_blocks(queries, block_keys, p):
    key_scores = jnp.dot(
        queries, block_keys.T, preferred_element_type=jnp.float32,
        precision=_precision_for(queries.dtype),
    )  # [Q, n_blocks]
    _, top = jax.lax.top_k(key_scores, p)
    return top  # [Q, p]


@functools.partial(jax.jit, static_argnames=("k",))
def _score_blocks(queries, block_data, block_ids, top_blocks, k, n_real):
    """queries [Q, d]; block_data [n_blocks, S, d]; block_ids [n_blocks, S];
    top_blocks [Q, p]. One query at a time through lax.map — the latency
    path; batches fall back to exact anyway."""

    def one(args):
        q, blks = args
        data = block_data[blks]              # [p, S, d] coarse contiguous gather
        ids = block_ids[blks].reshape(-1)    # [p*S]
        scores = jnp.dot(
            data.reshape(-1, data.shape[-1]), q,
            preferred_element_type=jnp.float32,
            precision=_precision_for(q.dtype),
        )
        scores = jnp.where(ids < n_real, scores, NEG_INF)
        out_ids = jnp.where(ids < n_real, ids, INT_MAX)
        return sort_topk(scores[None, :], out_ids[None, :], k)

    scores, ids = jax.lax.map(one, (queries, top_blocks))
    return scores[:, 0, :], ids[:, 0, :]


class IVFContiguousIndex:
    """Block-contiguous IVF ANN over L2-normalized embeddings."""

    def __init__(
        self,
        ids: Sequence[Any],
        embeddings: np.ndarray,
        n_cells: int | None = None,
        block_rows: int = 256,
        nprobe_blocks: int | None = None,
        kmeans_iterations: int = 8,
        seed: int = 0,
        device: str = "tpu",  # "tpu" = blocks in HBM; "host" = stream from RAM
    ):
        self.ids = list(ids)
        n = len(self.ids)
        mat = l2_normalize(np.asarray(embeddings, np.float32))
        self._n = n
        self.block_rows = block_rows
        self.n_cells = min(n_cells or max(8, int(np.sqrt(max(n, 1)) * 2)), max(n, 1))
        self.device_mode = device
        self._build(mat, seed, kmeans_iterations)
        self.nprobe_blocks = nprobe_blocks or max(
            1, self.n_blocks // 32
        )  # ~3% of blocks by default; recall/latency knob
        self._device: tuple | None = None

    # ------------------------------------------------------------------ build
    def _build(self, mat: np.ndarray, seed: int, iterations: int) -> None:
        n, d = mat.shape
        rng = np.random.default_rng(seed)
        centroids = np.asarray(train_centroids(mat, self.n_cells, iterations, rng))

        # single-preference assignment, chunked (full [N, C] stays off-host)
        assign = np.empty(n, dtype=np.int32)
        chunk = 262144
        cj = jnp.asarray(centroids)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            sims = jnp.dot(jnp.asarray(mat[lo:hi]), cj.T, preferred_element_type=jnp.float32)
            assign[lo:hi] = np.asarray(jnp.argmax(sims, axis=1))

        # physically pack rows cell by cell into fixed-size blocks
        s = self.block_rows
        order = np.argsort(assign, kind="stable")
        cells, counts = np.unique(assign, return_counts=True)
        blocks_per_cell = -(-counts // s)
        self.n_blocks = int(blocks_per_cell.sum())
        data = np.zeros((self.n_blocks, s, d), dtype=np.float32)
        row_ids = np.full((self.n_blocks, s), n, dtype=np.int32)  # pad -> n
        keys = np.zeros((self.n_blocks, d), dtype=np.float32)
        b = 0
        pos = 0
        for cell, count in zip(cells, counts):
            rows = order[pos : pos + count]
            pos += count
            for lo in range(0, count, s):
                part = rows[lo : lo + s]
                data[b, : len(part)] = mat[part]
                row_ids[b, : len(part)] = part
                keys[b] = l2_normalize(mat[part].mean(axis=0, keepdims=True))[0]
                b += 1
        self._blocks = data
        self._row_ids = row_ids
        self._keys = keys
        self.centroids = centroids  # kept for diagnostics/persistence

    def to_device(self) -> "IVFContiguousIndex":
        keys = jax.device_put(jnp.asarray(self._keys))
        if self.device_mode == "host":
            # keys on device for probing; block payloads AND row ids stay in
            # host RAM (_search_host reads self._row_ids directly — uploading
            # the [n_blocks, S] int32 table would burn H2D bandwidth and hold
            # dead HBM for the index's lifetime)
            self._device = (keys, None, None)
        else:
            self._device = (
                keys,
                jax.device_put(jnp.asarray(self._blocks)),
                jax.device_put(jnp.asarray(self._row_ids)),
            )
        return self

    # ----------------------------------------------------------------- search
    def search(
        self, query_embeddings: np.ndarray, k: int, nprobe_blocks: int | None = None
    ) -> list[list[SearchHit]]:
        if self._n == 0:
            raise IndexNotBuiltError("index has no documents")
        if self._device is None:
            self.to_device()
        q = l2_normalize(np.atleast_2d(np.asarray(query_embeddings, np.float32)))
        p = min(nprobe_blocks or self.nprobe_blocks, self.n_blocks)
        keys, blocks_dev, row_ids_dev = self._device  # type: ignore[misc]
        qj = jnp.asarray(q)
        top_blocks = _probe_blocks(qj, keys, p)
        k_eff = min(k, self._n)
        if blocks_dev is None:
            scores, rows = self._search_host(q, np.asarray(top_blocks), k_eff)
        else:
            scores, rows = _score_blocks(
                qj, blocks_dev, row_ids_dev, top_blocks, k_eff, self._n
            )
            scores, rows = np.asarray(scores), np.asarray(rows)
        out = []
        for qs, qr in zip(scores, rows):
            out.append(
                [
                    SearchHit(self.ids[int(r)], float(s))
                    for s, r in zip(qs, qr)
                    if r < self._n and s > -1e37
                ]
            )
        return out

    def _search_host(self, q: np.ndarray, top_blocks: np.ndarray, k: int):
        """>HBM regime: stream each query's probed blocks host->device.
        The union of the batch's blocks is fetched once (dedup), scored as one
        device matmul, and per-query results are masked out of the union."""
        uniq, inverse = np.unique(top_blocks, return_inverse=True)
        inverse = inverse.reshape(top_blocks.shape)  # [Q, p] -> index into uniq
        # pad the union to a power-of-two bucket: every distinct U is a
        # distinct jit shape, and batches rarely repeat U exactly — without
        # this every search recompiles (minutes over the remote tunnel).
        # Pad blocks duplicate the last real one; `inverse` never points at
        # them so results are unchanged.
        u = len(uniq)
        u_pad = max(8, 1 << max(0, u - 1).bit_length())
        if u_pad != u:
            uniq = np.pad(uniq, (0, u_pad - u), constant_values=uniq[-1] if u else 0)
        payload = jnp.asarray(self._blocks[uniq])  # [U_pad, S, d] one H2D stream
        ids = jnp.asarray(self._row_ids[uniq])
        scores, rows = _score_blocks(
            jnp.asarray(q), payload, ids, jnp.asarray(inverse), k, self._n
        )
        return np.asarray(scores), np.asarray(rows)

    # ------------------------------------------------------------ persistence
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path / "ivf_cc.npz",
            blocks=self._blocks,
            row_ids=self._row_ids,
            keys=self._keys,
            centroids=self.centroids,
        )
        (path / "meta.json").write_text(
            json.dumps(
                {
                    "kind": "ivf_contiguous",
                    "n_cells": self.n_cells,
                    "block_rows": self.block_rows,
                    "nprobe_blocks": self.nprobe_blocks,
                    "device": self.device_mode,
                    "ids": self.ids,
                },
                default=str,
            )
        )

    @classmethod
    def load(cls, path: str | Path) -> "IVFContiguousIndex":
        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        arrays = np.load(path / "ivf_cc.npz")
        idx = cls.__new__(cls)
        idx.ids = meta["ids"]
        idx.n_cells = meta["n_cells"]
        idx.block_rows = meta["block_rows"]
        idx.nprobe_blocks = meta["nprobe_blocks"]
        idx.device_mode = meta.get("device", "tpu")
        idx._blocks = arrays["blocks"]
        idx._row_ids = arrays["row_ids"]
        idx._keys = arrays["keys"]
        idx.centroids = arrays["centroids"]
        idx.n_blocks = idx._blocks.shape[0]
        idx._n = len(idx.ids)
        idx._device = None
        return idx

    @classmethod
    def from_catalog(cls, catalog, table: str = "chunk", **kwargs) -> "IVFContiguousIndex":
        ids, mat = catalog.get_embeddings_matrix(table)
        if not ids:
            from autorag_research_tpu.exceptions import EmbeddingMissingError

            raise EmbeddingMissingError(f"no embeddings in table '{table}'")
        return cls(ids, mat, **kwargs)
