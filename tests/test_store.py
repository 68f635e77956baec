import numpy as np
import pytest

from autorag_research_tpu.exceptions import DuplicateRetrievalGTError, EmptyIterableError
from autorag_research_tpu.store.catalog import Catalog
from autorag_research_tpu.store.gt import (
    and_all,
    build_retrieval_gt_from_relations,
    image,
    normalize_gt,
    or_all,
    text,
)


class TestGTDSL:
    def test_or_group(self):
        assert normalize_gt(text(1) | text(2) | text(3)) == [
            [text(1), text(2), text(3)]
        ]

    def test_and_chain(self):
        got = normalize_gt(text(1) & text(2) & text(3))
        assert [[i.id for i in g] for g in got] == [[1], [2], [3]]

    def test_mixed_expr(self):
        got = normalize_gt((text(1) | image(2)) & text(4))
        assert [[i.id for i in g] for g in got] == [[1, 2], [4]]
        assert got[0][1].chunk_type == "image_chunk"

    def test_bare_int(self):
        got = normalize_gt(42)
        assert got == [[text(42)]]

    def test_or_all_and_all(self):
        assert normalize_gt(or_all([1, 2])) == [[text(1), text(2)]]
        assert len(normalize_gt(and_all([1, 2, 3]))) == 3
        assert normalize_gt(or_all([7])) == [[text(7)]]
        with pytest.raises(EmptyIterableError):
            or_all([])

    def test_graded_scores(self):
        got = normalize_gt(text(1, score=2) | text(2, score=1))
        assert [i.score for i in got[0]] == [2, 1]

    def test_relations_roundtrip(self):
        cat = Catalog()
        cat.add_queries([{"id": 10, "contents": "q"}])
        cat.add_retrieval_gt(10, (text(1, score=2) | image(2)) & text(3))
        rels = cat.get_relations_by_query(10)
        gt, scores = build_retrieval_gt_from_relations([dict(r) for r in rels])
        assert gt == [["chunk_1", "image_chunk_2"], ["chunk_3"]]
        assert scores == {"chunk_1": 2, "image_chunk_2": 1, "chunk_3": 1}

    def test_duplicate_gt_raises(self):
        cat = Catalog()
        cat.add_queries([{"id": 1, "contents": "q"}])
        cat.add_retrieval_gt(1, text(1))
        with pytest.raises(DuplicateRetrievalGTError):
            cat.add_retrieval_gt(1, text(2))
        # upsert allowed
        cat.add_retrieval_gt(1, text(2), upsert=True)
        rels = cat.get_relations_by_query(1)
        assert rels[0]["chunk_id"] == 2


class TestCatalog:
    def test_bulk_insert_dup_skip(self, catalog):
        n = catalog.add_chunks([{"id": 1, "contents": "dup"}, {"id": 99, "contents": "new"}])
        assert n == 1
        assert catalog.count("chunk") == 6

    def test_embedding_roundtrip(self, catalog):
        ids, mat = catalog.get_embeddings_matrix("chunk")
        assert ids == [1, 2, 3, 4, 5]
        assert mat.shape == (5, 8)
        assert mat.dtype == np.float32

    def test_multi_embedding_roundtrip(self, catalog):
        v = np.arange(24, dtype=np.float32).reshape(3, 8)
        catalog.set_multi_embeddings("chunk", [(2, v)])
        got = catalog.get_embedding("chunk", 2, multi=True)
        np.testing.assert_array_equal(got, v)
        ids, mats = catalog.get_embeddings_matrix("chunk", multi=True)
        assert ids == [2]
        assert mats[0].shape == (3, 8)

    def test_unembedded_tracking(self, catalog):
        catalog.add_chunks([{"id": 50, "contents": "no emb"}])
        assert catalog.count_unembedded("chunk") == 1
        rows = catalog.fetch_unembedded("chunk", 10)
        assert [r["id"] for r in rows] == [50]
        rows = catalog.fetch_unembedded("chunk", 10, exclude_ids=[50])
        assert rows == []

    def test_pipeline_resume_identity(self, catalog):
        p1 = catalog.get_or_create_pipeline("bm25", {"k": 10})
        p2 = catalog.get_or_create_pipeline("bm25", {"k": 10})
        assert p1 == p2

    def test_retrieved_results_roundtrip(self, catalog):
        pid = catalog.get_or_create_pipeline("p")
        catalog.add_retrieved_results(pid, [(1, 3, 0.9), (1, 4, 0.7)])
        rows = catalog.get_retrieved(1, pid)
        assert [(r["doc_id"], r["rel_score"]) for r in rows] == [(3, 0.9), (4, 0.7)]
        assert catalog.get_queries_with_results(pid) == {1}

    def test_executor_result_roundtrip(self, catalog):
        pid = catalog.get_or_create_pipeline("gen")
        catalog.add_executor_result(
            1, pid, "answer", {"total_tokens": 5}, 12.5, {"context_chunk_ids": [1, 2]}
        )
        row = catalog.get_executor_result(1, pid)
        assert row["generation_result"] == "answer"
        import json

        assert json.loads(row["result_metadata"])["context_chunk_ids"] == [1, 2]

    def test_evaluation_results(self, catalog):
        pid = catalog.get_or_create_pipeline("p")
        mid = catalog.get_or_create_metric("recall", "retrieval")
        catalog.add_evaluation_results(pid, mid, [(1, 0.5), (2, 1.0), (3, None)])
        assert catalog.get_evaluated_query_ids(pid, mid) == {1, 2, 3}
        assert sorted(catalog.get_evaluation_values(pid, mid)) == [0.5, 1.0]

    def test_nul_sanitization(self):
        cat = Catalog()
        cat.add_chunks([{"id": 1, "contents": "bad\x00text"}])
        assert cat.get_chunk_contents([1])[1] == "badtext"

    def test_query_text_prefers_query_to_llm(self, catalog):
        catalog.add_queries([{"id": 9, "contents": "raw", "query_to_llm": "rewritten"}])
        assert catalog.get_query_text(9) == "rewritten"
        assert catalog.get_query_text(1) == "what is topic zero"

    def test_string_pk(self):
        cat = Catalog()
        cat.add_chunks([{"id": "doc-a", "contents": "x"}])
        cat.add_queries([{"id": "q-1", "contents": "y"}])
        cat.add_retrieval_gt("q-1", "doc-a")
        rels = cat.get_relations_by_query("q-1")
        assert rels[0]["chunk_id"] == "doc-a"

    def test_clean(self):
        cat = Catalog()
        cat.add_chunks([{"id": 1, "contents": "  "}, {"id": 2, "contents": "ok"}])
        removed = cat.clean()
        assert removed["chunk"] == 1
        assert cat.count("chunk") == 1


class TestReviewRegressions:
    def test_gt_upsert_replaces_whole_set(self):
        from autorag_research_tpu.store.gt import or_all

        cat = Catalog()
        cat.add_queries([{"id": 1, "contents": "q"}])
        cat.add_retrieval_gt(1, or_all([1, 2, 3, 4, 5]))
        cat.add_retrieval_gt(1, or_all([7, 8]), upsert=True)
        rels = cat.get_relations_by_query(1)
        assert sorted(r["chunk_id"] for r in rels) == [7, 8]  # no stale rows

    def test_fetch_unembedded_huge_quarantine(self):
        cat = Catalog()
        cat.add_chunks([{"id": i, "contents": f"doc {i}"} for i in range(50)])
        exclude = list(range(2, 40000))  # way past SQLite bind limits
        rows = cat.fetch_unembedded("chunk", 10, exclude_ids=exclude)
        assert [r["id"] for r in rows] == [0, 1]

    def test_memory_catalog_multithreaded_transactions(self):
        import threading

        cat = Catalog()
        cat.add_chunks([{"id": 0, "contents": "seed"}])
        errors = []

        def writer(tid):
            try:
                for i in range(25):
                    cat.add_queries([{"id": f"t{tid}_{i}", "contents": "x"}])
                    cat.get_or_create_pipeline(f"p{tid}_{i % 5}")
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        assert cat.count("query") == 100

    def test_concurrent_get_or_create_pipeline_no_integrity_error(self):
        import threading

        cat = Catalog()
        ids = []

        def create():
            ids.append(cat.get_or_create_pipeline("shared"))

        threads = [threading.Thread(target=create) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(set(ids)) == 1

    def test_delete_pipeline_artifacts_sweeps_derived_pipelines(self):
        """Cleanup of '<name>' must also remove '<name>__*' rows (e.g. hyde's
        inner dense pipeline) — health checks must not leave orphans. A
        sibling 'name_x' (single underscore) must survive."""
        cat = Catalog()
        parent = cat.get_or_create_pipeline("hyde_health_check")
        child = cat.get_or_create_pipeline("hyde_health_check__dense")
        sibling = cat.get_or_create_pipeline("hyde_health_check_x")
        cat.delete_pipeline_artifacts(parent)
        assert cat.get_pipeline("hyde_health_check") is None
        assert cat.get_pipeline("hyde_health_check__dense") is None
        assert cat.get_pipeline("hyde_health_check_x") is not None
        assert cat.get_pipeline("hyde_health_check_x")["id"] == sibling
        del child


class TestConcurrentWriters:
    """Two+ writer threads on one WAL catalog must not corrupt or drop rows
    (VERDICT r3 #9). The catalog hands each thread its own connection
    (threading.local); WAL serializes the writes."""

    def test_parallel_retrieved_result_writers(self, tmp_path):
        import threading

        from autorag_research_tpu.store.catalog import Catalog

        cat = Catalog(tmp_path / "conc.db", embedding_dim=8)
        n_threads, per_thread = 4, 200
        cat.add_chunks(
            [{"id": i, "contents": f"c{i}"} for i in range(n_threads * per_thread)]
        )
        cat.add_queries(
            [{"id": i, "contents": f"q{i}"} for i in range(n_threads)]
        )
        pid = cat.get_or_create_pipeline("concurrent")
        errors: list = []

        def writer(t):
            try:
                for i in range(per_thread):
                    cat.add_retrieved_results(
                        pid, [(t, t * per_thread + i, float(i))]
                    )
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_threads)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, errors
        total = cat.connect().execute(
            "SELECT COUNT(*) c FROM chunk_retrieved_result WHERE pipeline_id=?", (pid,)
        ).fetchone()["c"]
        assert total == n_threads * per_thread
        assert cat.connect().execute("PRAGMA integrity_check").fetchone()[0] == "ok"
        # per-thread rows all present with their scores intact
        for t in range(n_threads):
            rows = cat.get_retrieved(t, pid)
            assert len(rows) == per_thread

    def test_writers_and_readers_interleave(self, tmp_path):
        import threading

        from autorag_research_tpu.store.catalog import Catalog

        cat = Catalog(tmp_path / "conc2.db", embedding_dim=8)
        cat.add_queries([{"id": 1, "contents": "q"}])
        pid = cat.get_or_create_pipeline("rw")
        stop = threading.Event()
        errors: list = []

        def reader():
            try:
                while not stop.is_set():
                    cat.get_queries_with_results(pid)
                    cat.stats()
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        def writer():
            try:
                for i in range(300):
                    cat.add_chunks([{"id": 10_000 + i, "contents": f"w{i}"}])
                    cat.add_retrieved_results(pid, [(1, 10_000 + i, float(i))])
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)
            finally:
                stop.set()

        threads = [threading.Thread(target=reader) for _ in range(2)] + [
            threading.Thread(target=writer)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, errors
        assert len(cat.get_retrieved(1, pid)) == 300
        assert cat.connect().execute("PRAGMA integrity_check").fetchone()[0] == "ok"
