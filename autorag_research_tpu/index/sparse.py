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


def _plan_buckets(counts: np.ndarray, n_buckets: int) -> list[int]:
    """Bucket max-slot boundaries (ascending, last covers the max count)
    minimizing total padded slot area sum(bucket_size * bucket_width) — DP
    over distinct counts. Skewed corpora (most docs short, few long) waste
    most of a single [N, L_max] layout; 2-3 buckets recover it."""
    counts = np.maximum(np.asarray(counts, dtype=np.int64), 1)
    distinct = np.unique(counts)
    if len(distinct) <= 1 or n_buckets <= 1:
        return [int(distinct[-1])] if len(distinct) else [1]
    n_buckets = min(n_buckets, len(distinct))
    sorted_counts = np.sort(counts)
    num_le = np.searchsorted(sorted_counts, distinct, side="right")  # docs per prefix
    m = len(distinct)
    dp = num_le.astype(np.float64) * distinct  # 1 bucket covering [0..j]
    choice = np.full((n_buckets, m), -1, dtype=np.int64)
    for b in range(1, n_buckets):
        new_dp = np.empty(m)
        for j in range(m):
            # split after distinct[i] (i < j): prior buckets cover [0..i]
            cand = dp[:j] + (num_le[j] - num_le[:j]) * float(distinct[j])
            if len(cand) == 0 or dp[j] <= cand.min():
                new_dp[j] = dp[j]
                choice[b, j] = -1
            else:
                i = int(np.argmin(cand))
                new_dp[j] = cand[i]
                choice[b, j] = i
        dp = new_dp
    bounds = []
    j = m - 1
    for b in range(n_buckets - 1, 0, -1):
        bounds.append(int(distinct[j]))
        i = choice[b, j]
        if i < 0:
            break
        j = i
    else:
        bounds.append(int(distinct[j]))
    return sorted(set(bounds))


class SparseIndex:
    """Exact BM25 top-k over a slot-padded term-weight layout.

    ``bucketize > 1`` opts into the bucketed device layout: docs are
    partitioned by unique-term count and each bucket gets its own trimmed
    ``[Nb, Lb]`` slot arrays (one kernel launch per bucket, host merge by the
    global (-score, row) order). Measured on v5e (500k skewed docs, 90% at
    16 terms / 10% at 128, scripts/bench_bm25_bucketed.py): 4.7x less
    persistent HBM (104 vs 488 MiB); buckets with width <= 64 use the
    lane-packed kernel (3.4x faster at width 16). HOWEVER on a realistic
    BEIR-like width distribution (lognormal mean ~55,
    scripts/bench_bm25_index_e2e.py) bucketize=3 measured 2x SLOWER
    end-to-end than flat (48.7 vs 124.4 QPS): multiple launches + host merge
    outweigh one bucket's pack-2 gain. Use bucketize ONLY for corpora that
    are predominantly short (titles, captions, sentences) or memory-bound.
    The full arrays remain the build/save source of truth.
    """

    def __init__(
        self,
        ids: Sequence[Any],
        texts: Sequence[str] | None = None,
        tokenizer: str = "simple",
        k1: float = 1.2,
        b: float = 0.75,
        max_slots: int | None = None,
        bucketize: int = 1,
        tile_skip: bool = True,
        cluster_layout: bool = False,
        probe_block_n: int = 2048,
    ):
        self.ids = list(ids)
        self.tokenizer_name = tokenizer
        self.k1 = k1
        self.b = b
        self.max_slots = max_slots
        self.bucketize = bucketize
        # term-driven doc-tile pruning for the flat TPU kernel (bit-identical
        # results; see ops/sparse.bm25_topk_pallas_v2_skip)
        self.tile_skip = tile_skip
        # opt-in physical reorder: group docs by rarest term so tile_skip can
        # prune (ops/sparse.cluster_doc_order); equal-score boundary ties may
        # resolve to different docs than the id-ordered layout
        self.cluster_layout = cluster_layout
        # probe-kernel candidate-tile size: bigger tiles amortize the
        # ~50us/grid-step floor (measured 4096 > 2048 on rare-term queries);
        # the aux term->tile lists are built at this granularity
        self.probe_block_n = probe_block_n
        self._bitmaps_device = None
        self._term_tiles = None
        self._device_buckets: list[dict] | None = None
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
                    self._apply_cluster_layout()
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
        self._apply_cluster_layout()
        self._bitmaps_device = None  # layout changed; rebuild lazily
        self._term_tiles = None

    def _apply_cluster_layout(self) -> None:
        """Reorder docs by rarest term when cluster_layout is set — shared by
        the native and Python build paths (the native path previously skipped
        it, silently recording cluster_layout=True for an unclustered index)."""
        if not (self.cluster_layout and len(self.ids)):
            return
        from autorag_research_tpu.ops.sparse import cluster_doc_order

        assert self._slot_ids is not None and self.doc_freq is not None
        order = cluster_doc_order(self._slot_ids, self.doc_freq)
        self._slot_ids = self._slot_ids[order]
        self._slot_weights = self._slot_weights[order]
        self.ids = [self.ids[i] for i in order]
        if getattr(self, "doc_lengths", None) is not None:
            self.doc_lengths = self.doc_lengths[order]

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
    def _term_counts(self) -> np.ndarray:
        assert self._slot_ids is not None
        return (self._slot_ids != DOC_PAD).sum(axis=1)

    def _build_device_buckets(self) -> list[dict]:
        """Partition rows by unique-term count; each bucket keeps ascending
        global row order so local kernel tie-breaks map monotonically to the
        global (-score, row) order. Buckets whose width fits >=2 docs per
        128-lane row use the lane-packed layout + kernel (measured 3.4x
        faster at width 16 — see ops/sparse.bm25_topk_pallas_packed)."""
        from autorag_research_tpu.ops.sparse import pack_slots

        assert self._slot_ids is not None
        counts = self._term_counts()
        bounds = _plan_buckets(counts, self.bucketize)
        buckets = []
        assigned = np.zeros(self.n_docs, dtype=bool)
        for bound in bounds:
            mask = (counts <= bound) & ~assigned
            rows = np.nonzero(mask)[0]
            if rows.size == 0:
                continue
            assigned[rows] = True
            width = max(int(counts[rows].max()), 1)
            pack = max(1, 128 // width)
            if pack >= 2:
                pids, pw, pack = pack_slots(
                    self._slot_ids[rows], self._slot_weights[rows], width
                )
                buckets.append(
                    {
                        "rows": rows,
                        "pack": pack,
                        "slot_ids": jax.device_put(jnp.asarray(pids)),
                        "slot_weights": jax.device_put(jnp.asarray(pw)),
                    }
                )
            else:
                buckets.append(
                    {
                        "rows": rows,
                        "pack": 1,
                        "slot_ids": jax.device_put(jnp.asarray(self._slot_ids[rows, :width])),
                        "slot_weights": jax.device_put(
                            jnp.asarray(self._slot_weights[rows, :width])
                        ),
                    }
                )
        return buckets

    def device_bytes(self) -> int:
        """Slot-array bytes on device under the current layout."""
        if self._device_buckets is not None:
            return sum(
                int(b["slot_ids"].size + b["slot_weights"].size) * 4
                for b in self._device_buckets
            )
        if self._device is not None:
            ids, w = self._device
            return int(ids.size + w.size) * 4
        return 0

    def to_device(self, mesh=None) -> "SparseIndex":
        if self._slot_ids is None:
            raise IndexNotBuiltError("sparse index not built")
        if self.bucketize > 1 and mesh is None:
            # bucketed layout is single-device; mesh sharding keeps the flat
            # layout (shards already bound per-device memory)
            self._device_buckets = self._build_device_buckets()
            self._mesh = None
            self._device = None
            return self
        self._device_buckets = None
        self._device_pack = 1
        self._device_flat = None  # lazy flat upload for method pins on packed
        from autorag_research_tpu.ops.dense import on_tpu

        if (
            mesh is None
            and self._slot_ids.shape[1] <= 64
            and self.n_docs
            # off-TPU the packed kernel runs in interpret mode — fine for
            # test-sized corpora, glacial at scale
            and (on_tpu() or self.n_docs <= 10_000)
        ):
            # whole corpus is short-doc: ONE lane-packed launch, no merge —
            # pure gain (measured 3.4x at width 16, bm25_topk_pallas_packed)
            from autorag_research_tpu.ops.sparse import pack_slots

            pids, pw, pack = pack_slots(
                self._slot_ids, self._slot_weights, self._slot_ids.shape[1]
            )
            if pack > 1:
                self._device = (
                    jax.device_put(jnp.asarray(pids)),
                    jax.device_put(jnp.asarray(pw)),
                )
                self._device_pack = pack
                self._mesh = None
                return self
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

    def _search_bucketed(self, q_ids, q_w, k: int, method: str):
        """One kernel launch per bucket; host merge by global (-score, row)."""
        from autorag_research_tpu.ops.dense import INT_MAX, on_tpu
        from autorag_research_tpu.ops.sparse import bm25_topk_pallas_packed

        nq = q_ids.shape[0]
        all_scores = []
        all_rows = []
        for bucket in self._device_buckets:  # type: ignore[union-attr]
            if bucket.get("pack", 1) > 1:
                s, r = bm25_topk_pallas_packed(
                    jnp.asarray(q_ids), jnp.asarray(q_w),
                    bucket["slot_ids"], bucket["slot_weights"],
                    int(bucket["rows"].size), min(k, bucket["rows"].size),
                    bucket["pack"],
                    interpret=not on_tpu(),
                )
            else:
                s, r = bm25_topk(
                    jnp.asarray(q_ids), jnp.asarray(q_w),
                    bucket["slot_ids"], bucket["slot_weights"],
                    min(k, bucket["rows"].size), method=method,
                )
            s = np.asarray(s)
            r = np.asarray(r)
            valid = r != INT_MAX
            g = np.where(valid, bucket["rows"][np.where(valid, r, 0)], INT_MAX)
            s = np.where(valid, s, -np.inf)
            all_scores.append(s)
            all_rows.append(g)
        scores = np.concatenate(all_scores, axis=1)
        rows = np.concatenate(all_rows, axis=1)
        order = np.lexsort((rows, -scores), axis=1)[:, :k]
        b_idx = np.arange(nq)[:, None]
        return scores[b_idx, order], rows[b_idx, order]

    def search(self, queries: Sequence[str], k: int, method: str = "auto") -> list[list[SearchHit]]:
        if self._slot_ids is None:
            raise IndexNotBuiltError("sparse index not built")
        if self._device is None and self._device_buckets is None:
            self.to_device()
        q_ids, q_w = self.encode_queries(queries)
        if method in ("pallas_v2_skip", "pallas_probe", "pallas_wand") and (
            self._device_buckets is not None
            or getattr(self, "_mesh", None) is not None
            or getattr(self, "_device_pack", 1) > 1
        ):
            # pruned kernels exist only on the flat single-device path; on a
            # bucketed, mesh-sharded, or lane-packed index fall back like the
            # k-gate does
            method = "auto"
        if self._device_buckets is not None:
            scores, rows = self._search_bucketed(q_ids, q_w, k, method)
            k_eff = min(k, self.n_docs)
            out = []
            for qs, qr in zip(scores, rows):
                hits = []
                for s, r in zip(qs[:k_eff], qr[:k_eff]):
                    if not (s > 0.0):  # pads are -inf; zero overlap isn't a hit
                        break
                    hits.append(SearchHit(self.ids[int(r)], float(s)))
                out.append(hits)
            return out
        doc_ids, doc_w = self._device  # type: ignore[misc]
        if getattr(self, "_device_pack", 1) > 1:
            if method != "auto":
                # an explicit implementation pin (e.g. the 'xla' parity
                # oracle) must be HONORED, not silently swapped for the
                # packed kernel: serve it from a lazily-cached flat upload
                # of the host slot arrays (packed layouts are short-doc /
                # small, so the extra resident copy is cheap)
                if getattr(self, "_device_flat", None) is None:
                    self._device_flat = (
                        jax.device_put(jnp.asarray(self._slot_ids)),
                        jax.device_put(jnp.asarray(self._slot_weights)),
                    )
                f_ids, f_w = self._device_flat
                scores, rows = bm25_topk(
                    jnp.asarray(q_ids), jnp.asarray(q_w), f_ids, f_w, k,
                    method=method,
                )
            else:
                scores, rows = self._search_packed_auto(q_ids, q_w, doc_ids, doc_w, k)
        elif getattr(self, "_mesh", None) is not None:
            from autorag_research_tpu.parallel.sharded import sharded_bm25_topk

            scores, rows = sharded_bm25_topk(
                jnp.asarray(q_ids), jnp.asarray(q_w), doc_ids, doc_w,
                k, self.n_docs, self._mesh, method=method,
            )
        else:
            from autorag_research_tpu.ops.dense import on_tpu

            explicit_pruned = method in (
                "pallas_v2_skip", "pallas_probe", "pallas_wand"
            )
            # pruned kernels bump their internal block_n to hold k, which
            # would disagree with the host-side tile aux built at 2048 —
            # beyond that, route to the plain kernels (correctness)
            pruned_ok = min(k, self.n_docs) <= 2048
            if pruned_ok and (
                explicit_pruned or (method == "auto" and self.tile_skip and on_tpu())
            ):
                scores, rows = self._search_pruned(q_ids, q_w, doc_ids, doc_w, k, method)
            else:
                if explicit_pruned:
                    method = "auto"  # k too large for the pruned tile aux
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

    def _search_packed_auto(self, q_ids, q_w, packed_ids, packed_w, k):
        """Auto path for lane-packed corpora: probe x packed compose when the
        query is selective (candidate tiles <= half), else the full packed
        scan. A candidate tile of block_n packed rows covers block_n * pack
        docs, so the host term->tile lists build at that doc granularity —
        the two wins (sub-linear tiles, pack x docs per compare) multiply on
        rare-term queries (scripts/bench_bm25_probe_packed.py)."""
        import numpy as np

        from autorag_research_tpu.ops.dense import on_tpu
        from autorag_research_tpu.ops.sparse import (
            bm25_topk_pallas_packed,
            bm25_topk_pallas_probe_packed,
            probe_candidates,
        )

        pack = self._device_pack
        # Mosaic needs block rows divisible by 8; packs that don't divide
        # probe_block_n (e.g. width-10 docs -> pack 12 -> 170 rows) must
        # round DOWN first or the kernel block spec is rejected on TPU
        bn_rows = max(8, (self.probe_block_n // pack) // 8 * 8)
        docs_per_tile = bn_rows * pack
        # the kernel extracts k per sub-row of bn_rows packed rows
        if self.tile_skip and on_tpu() and min(k, self.n_docs) <= bn_rows:
            p_tiles = max(1, -(-self.n_docs // docs_per_tile))
            indptr, tiles = self._ensure_term_tiles(docs_per_tile)
            cand, count, maxc = probe_candidates(
                np.asarray(q_ids), indptr, tiles, bq=8, cap=p_tiles
            )
            if maxc <= p_tiles // 2:
                cap = min(p_tiles, max(16, 1 << max(0, maxc - 1).bit_length()))
                return bm25_topk_pallas_probe_packed(
                    jnp.asarray(q_ids), jnp.asarray(q_w), packed_ids, packed_w,
                    self.n_docs, pack, jnp.asarray(cand[:, :cap]),
                    jnp.asarray(count), k, block_n=bn_rows,
                    interpret=not on_tpu(),
                )
            # common-term queries: WAND x packed — upper-bound-pruned
            # two-pass probe over the lane-packed layout; internal fallback
            # is the full packed scan
            from autorag_research_tpu.ops.sparse import bm25_topk_wand

            return bm25_topk_wand(
                jnp.asarray(q_ids), jnp.asarray(q_w), None, None,
                self._ensure_term_tiles_maxw(docs_per_tile), k,
                block_n=bn_rows, interpret=not on_tpu(),
                packed=(packed_ids, packed_w, self.n_docs, pack),
            )
        return bm25_topk_pallas_packed(
            jnp.asarray(q_ids), jnp.asarray(q_w), packed_ids, packed_w,
            self.n_docs, k, pack, interpret=not on_tpu(),
        )

    def _search_pruned(self, q_ids, q_w, doc_ids, doc_w, k, method):
        """Pruned device search: probe-mode kernel over the exact candidate
        tiles from the host term->tile inverted index when the query is
        selective (candidates <= half the corpus tiles); Bloom tile-skip
        full-grid kernel otherwise. Both are positive_only — search() drops
        zero-overlap docs regardless."""
        import numpy as np

        from autorag_research_tpu.ops.dense import on_tpu
        from autorag_research_tpu.ops.sparse import (
            bm25_topk_pallas_probe,
            bm25_topk_pallas_v2_skip,
            probe_candidates,
        )

        q_np = np.asarray(q_ids)
        pbn = self.probe_block_n
        # the probe kernel's candidate-tile aux is built at probe_block_n and
        # every tile must hold >= k; beyond that the probe leg cannot serve
        # the request — fall to the Bloom skip leg (whose 2048 granularity is
        # what the caller's pruned_ok gate checked)
        if min(k, self.n_docs) <= pbn and method in (
            "auto", "pallas_probe", "pallas_wand"
        ):
            p_tiles = max(1, -(-self.n_docs // pbn))
            indptr, tiles = self._ensure_term_tiles(pbn)
            cand, count, maxc = probe_candidates(q_np, indptr, tiles, bq=8, cap=p_tiles)
            if method == "pallas_probe" or (
                method == "auto" and maxc <= p_tiles // 2
            ):
                # power-of-two cap buckets bound the number of compiled grids
                cap = min(p_tiles, max(16, 1 << max(0, maxc - 1).bit_length()))
                return bm25_topk_pallas_probe(
                    jnp.asarray(q_ids), jnp.asarray(q_w), doc_ids, doc_w,
                    jnp.asarray(cand[:, :cap]), jnp.asarray(count), k,
                    block_n=pbn, interpret=not on_tpu(),
                )
            if method == "pallas_wand" or method == "auto":
                # common-term query (candidate union > half the tiles): the
                # probe can't pay, but the WAND bound still can — exact
                # two-pass upper-bound-pruned probe. When the bound prunes
                # too little it falls back to the Bloom skip kernel (the
                # previous auto route for this query class).
                from autorag_research_tpu.ops.sparse import (
                    bm25_topk_pallas_v2_skip as _skip,
                    bm25_topk_wand,
                )

                return bm25_topk_wand(
                    jnp.asarray(q_ids), jnp.asarray(q_w), doc_ids, doc_w,
                    self._ensure_term_tiles_maxw(pbn), k,
                    block_n=pbn, interpret=not on_tpu(),
                    fallback=lambda: _skip(
                        jnp.asarray(q_ids), jnp.asarray(q_w), doc_ids, doc_w,
                        self._ensure_bitmaps(2048), min(k, self.n_docs),
                        positive_only=True, block_n=2048,
                        interpret=not on_tpu(),
                    ),
                )
        block_n = 2048  # Bloom bitmaps + skip kernel granularity
        return bm25_topk_pallas_v2_skip(
            jnp.asarray(q_ids), jnp.asarray(q_w), doc_ids, doc_w,
            self._ensure_bitmaps(block_n), k, positive_only=True,
            block_n=block_n, interpret=not on_tpu(),
        )

    def _ensure_term_tiles(self, block_n: int = 2048):
        """Host CSR term->tile inverted lists, built once per (layout, tile
        size)."""
        if not isinstance(self._term_tiles, dict):
            self._term_tiles = {}
        if block_n not in self._term_tiles:
            from autorag_research_tpu.ops.sparse import build_term_tile_lists

            assert self._slot_ids is not None
            self._term_tiles[block_n] = build_term_tile_lists(self._slot_ids, block_n)
        return self._term_tiles[block_n]

    def _ensure_term_tiles_maxw(self, block_n: int = 2048):
        """Host CSR term->(tile, max weight) for the WAND bound, built once
        per (layout, tile size)."""
        if not isinstance(getattr(self, "_term_tiles_maxw", None), dict):
            self._term_tiles_maxw = {}
        if block_n not in self._term_tiles_maxw:
            from autorag_research_tpu.ops.sparse import build_term_tile_maxw

            assert self._slot_ids is not None
            self._term_tiles_maxw[block_n] = build_term_tile_maxw(
                self._slot_ids, self._slot_weights, block_n
            )
        return self._term_tiles_maxw[block_n]

    def _ensure_bitmaps(self, block_n: int = 2048):
        """Tile term-presence bitmaps for the skip kernel, built once per
        layout. block_n MUST match the kernel launch default."""
        if self._bitmaps_device is None:
            from autorag_research_tpu.ops.sparse import build_tile_bitmaps

            assert self._slot_ids is not None
            self._bitmaps_device = jax.device_put(
                jnp.asarray(build_tile_bitmaps(self._slot_ids, block_n))
            )
        return self._bitmaps_device

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
            "bucketize": self.bucketize,
            "tile_skip": self.tile_skip,
            "cluster_layout": self.cluster_layout,
            "probe_block_n": self.probe_block_n,
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
        idx = cls(
            meta["ids"], texts=None, tokenizer=meta["tokenizer"],
            k1=meta["k1"], b=meta["b"], bucketize=meta.get("bucketize", 1),
            tile_skip=meta.get("tile_skip", True),
            # a cluster-ordered layout is already baked into the saved slot
            # arrays; the flag only records provenance (no re-sort on load)
            cluster_layout=meta.get("cluster_layout", False),
            probe_block_n=int(meta.get("probe_block_n", 2048)),
        )
        idx.vocab = meta["vocab"]
        idx.avgdl = meta["avgdl"]
        idx.doc_freq = arrays["doc_freq"]
        idx.doc_lengths = arrays["doc_lengths"]
        idx._slot_ids = arrays["slot_ids"]
        idx._slot_weights = arrays["slot_weights"]
        return idx
