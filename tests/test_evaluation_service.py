"""Evaluation service behaviors: dataset granularity, resume-skip, verifiers."""

import pytest

from autorag_research_tpu.evaluation.metrics.retrieval import retrieval_recall
from autorag_research_tpu.evaluation.service import (
    GenerationEvaluationService,
    RetrievalEvaluationService,
)


@pytest.fixture
def evaluated_catalog(catalog):
    pid = catalog.get_or_create_pipeline("p_eval")
    catalog.add_retrieved_results(pid, [(1, 1, 0.9), (2, 5, 0.8), (3, 3, 0.7)])
    return catalog, pid


class TestQueryGranularity:
    def test_incremental_and_resume(self, evaluated_catalog):
        catalog, pid = evaluated_catalog
        service = RetrievalEvaluationService(catalog)
        summary = service.evaluate(pid, "recall", retrieval_recall)
        assert summary.count == 3
        # resume: tamper one persisted value, re-evaluate -> NOT recomputed
        mid = summary.metric_id
        catalog.add_evaluation_results(pid, mid, [(1, 0.123)])
        summary2 = service.evaluate(pid, "recall", retrieval_recall)
        assert 0.123 in catalog.get_evaluation_values(pid, mid)
        assert summary2.count == 3

    def test_verify_completion(self, evaluated_catalog):
        catalog, pid = evaluated_catalog
        service = RetrievalEvaluationService(catalog)
        summary = service.evaluate(pid, "recall", retrieval_recall)
        assert service.verify_completion(pid, summary.metric_id)
        catalog.add_queries([{"id": 99, "contents": "new query"}])
        assert not service.verify_completion(pid, summary.metric_id)


class TestDatasetGranularity:
    def test_delete_and_recompute(self, evaluated_catalog):
        catalog, pid = evaluated_catalog
        service = RetrievalEvaluationService(catalog)
        calls = []

        def whole_set_metric(inputs):
            calls.append(len(inputs))
            return [0.5] * len(inputs)

        s1 = service.evaluate(pid, "whole_set", whole_set_metric, granularity="dataset")
        assert s1.count == 3 and calls == [3]
        # dataset granularity recomputes everything each time
        service.evaluate(pid, "whole_set", whole_set_metric, granularity="dataset")
        assert calls == [3, 3]

    def test_dataset_granularity_windowed_call_keeps_full_set(self, evaluated_catalog):
        """A query_ids-windowed dataset-granularity call must not destroy the
        full run's rows: the delete-and-recompute covers ALL queries
        (reference base_evaluation.py:418-456); the window only scopes the
        reported average (regression)."""
        catalog, pid = evaluated_catalog
        service = RetrievalEvaluationService(catalog)

        def whole_set_metric(inputs):
            return [0.5] * len(inputs)

        full = service.evaluate(pid, "ws2", whole_set_metric, granularity="dataset")
        assert full.count == 3
        all_ids = sorted(catalog.get_all_query_ids(), key=str)
        windowed = service.evaluate(
            pid, "ws2", whole_set_metric, granularity="dataset",
            query_ids=all_ids[:1],
        )
        assert windowed.count == 1  # reported average is window-scoped
        mid = catalog.get_or_create_metric("ws2", service.metric_type)
        # ...but the persisted rows still cover the full query set
        assert len(catalog.get_evaluation_values(pid, mid)) == 3


class TestGenerationInputs:
    def test_evidence_resolution_order(self, catalog):
        pid = catalog.get_or_create_pipeline("gen_eval")
        service = GenerationEvaluationService(catalog)
        # canonical metadata key wins over persisted rows
        catalog.add_retrieved_results(pid, [(1, 5, 0.9)])
        catalog.add_executor_result(
            1, pid, "answer", result_metadata={"context_chunk_ids": [2]}
        )
        mi = service.build_metric_input(catalog.get_query(1), pid)
        assert mi.retrieved_contents == [catalog.get_chunk_contents([2])[2]]
        # fallback: no metadata evidence -> persisted retrieval rows
        catalog.add_executor_result(2, pid, "answer2", result_metadata={})
        catalog.add_retrieved_results(pid, [(2, 4, 0.9)])
        mi2 = service.build_metric_input(catalog.get_query(2), pid)
        assert mi2.retrieved_contents == [catalog.get_chunk_contents([4])[4]]
        # legacy key fallback when nothing persisted
        catalog.add_executor_result(
            3, pid, "answer3", result_metadata={"retrieved_chunk_ids": [1]}
        )
        mi3 = service.build_metric_input(catalog.get_query(3), pid)
        assert mi3.retrieved_contents == [catalog.get_chunk_contents([1])[1]]

    def test_generation_gt_parsed(self, catalog):
        pid = catalog.get_or_create_pipeline("gen_eval2")
        catalog.add_executor_result(1, pid, "topic zero answer")
        service = GenerationEvaluationService(catalog)
        mi = service.build_metric_input(catalog.get_query(1), pid)
        assert mi.generation_gt == ["topic zero"]
        assert mi.generated_texts == "topic zero answer"


class TestMixedModalityGT:
    def test_mixed_gt_satisfied_by_either_table(self, tmp_path):
        """A mixed OR group (text chunk | page image) counts as recalled when
        EITHER result table holds a hit — the open_ragbench-style GT shape
        (reference open_ragbench.py:217-229 builds exactly this)."""
        from autorag_research_tpu.store.catalog import Catalog
        from autorag_research_tpu.store.gt import image as image_gt, or_all_mixed, text as text_gt

        cat = Catalog(tmp_path / "mixed.db")
        cat.add_chunks([{"id": 1, "contents": "text evidence"}])
        cat.add_image_chunks([{"id": "p1", "image": b"\x89PNG fake", "mimetype": "image/png"}])
        cat.add_queries([
            {"id": 10, "contents": "q text hit"},
            {"id": 11, "contents": "q image hit"},
            {"id": 12, "contents": "q no hit"},
        ])
        for qid in (10, 11, 12):
            cat.add_retrieval_gt(qid, or_all_mixed([text_gt(1), image_gt("p1")]))
        pid = cat.get_or_create_pipeline("p_mixed")
        cat.add_retrieved_results(pid, [(10, 1, 0.9)], unit="chunk")
        cat.add_retrieved_results(pid, [(11, "p1", 0.8)], unit="image_chunk")
        cat.add_retrieved_results(pid, [(12, 1, 0.0)], unit="chunk")
        # query 12's only hit scores 0.0 but is still a retrieved row

        service = RetrievalEvaluationService(cat)
        summary = service.evaluate(pid, "recall", retrieval_recall)
        mid = summary.metric_id
        rows = cat.connect().execute(
            "SELECT query_id, value FROM evaluation_result WHERE pipeline_id=? AND metric_id=?",
            (pid, mid),
        ).fetchall()
        got = {r["query_id"]: r["value"] for r in rows}
        assert got[10] == 1.0  # satisfied via the text table
        assert got[11] == 1.0  # satisfied via the image table
        assert got[12] == 1.0  # chunk 1 retrieved (score irrelevant for recall)


class TestServiceHardening:
    def test_scalar_generation_gt_wraps_as_single_answer(self, catalog):
        """A bare scalar stored in generation_gt ('2019', '0', JSON string)
        must become a one-answer list, not crash or iterate char-wise."""
        pid = catalog.get_or_create_pipeline("gt_scalar")
        service = GenerationEvaluationService(catalog)
        for qid, raw in ((1, "2019"), (2, "0"), (3, '"Paris"')):
            catalog.connect().execute(
                "UPDATE query SET generation_gt=? WHERE id=?", (raw, qid)
            )
            catalog.add_executor_result(qid, pid, "an answer", result_metadata={})
        mi = service.build_metric_input(catalog.get_query(1), pid)
        assert mi.generation_gt == ["2019"]
        assert service.build_metric_input(catalog.get_query(2), pid).generation_gt == ["0"]
        # a JSON-encoded string is a non-list parse -> raw string as one answer
        assert service.build_metric_input(
            catalog.get_query(3), pid
        ).generation_gt == ['"Paris"']

    def test_none_scores_are_retried_not_persisted(self, catalog):
        """None = not-evaluable-yet: the query must be scored on the NEXT run
        once evaluable (regression: a NULL row marked it done forever)."""
        pid = catalog.get_or_create_pipeline("retry_none")
        catalog.add_retrieved_results(pid, [(1, 1, 0.9)])
        service = RetrievalEvaluationService(catalog)
        state = {"ready": False}

        def flaky_metric(inputs):
            if not state["ready"]:
                return [None] * len(inputs)
            return [1.0] * len(inputs)

        s1 = service.evaluate(pid, "flaky", flaky_metric)
        assert s1.count == 0
        state["ready"] = True
        s2 = service.evaluate(pid, "flaky", flaky_metric)
        assert s2.count == 3  # all queries retried and scored

    def test_empty_context_chunk_ids_is_no_evidence(self, catalog):
        """An explicit context_chunk_ids: [] means the generator USED no
        context — persisted retrieval rows must not leak in as evidence
        (reference stops at the first PRESENT key)."""
        pid = catalog.get_or_create_pipeline("empty_ev")
        service = GenerationEvaluationService(catalog)
        catalog.add_retrieved_results(pid, [(1, 5, 0.9)])
        catalog.add_executor_result(
            1, pid, "no-context answer", result_metadata={"context_chunk_ids": []}
        )
        mi = service.build_metric_input(catalog.get_query(1), pid)
        assert mi.retrieved_contents is None

    def test_stringified_int_ids_resolve_and_dedup(self, catalog):
        """json round-trips stringify non-native id types; '12'-style ids
        must still resolve against int catalog PKs, deduplicated in order."""
        pid = catalog.get_or_create_pipeline("str_ids")
        service = GenerationEvaluationService(catalog)
        catalog.add_executor_result(
            1, pid, "a", result_metadata={"context_chunk_ids": ["2", "1", "2", None]}
        )
        mi = service.build_metric_input(catalog.get_query(1), pid)
        lookup = catalog.get_chunk_contents([2, 1])
        assert mi.retrieved_contents == [lookup[2], lookup[1]]


class TestCrashResume:
    """Kill-mid-evaluate must not double-score or skip queries on resume
    (VERDICT r3 #9)."""

    def test_kill_between_batches_resumes_exactly_once(self, tmp_path):
        import numpy as np

        from autorag_research_tpu.store.catalog import Catalog

        cat = Catalog(tmp_path / "cr.db", embedding_dim=8)
        n = 10
        cat.add_chunks([{"id": i, "contents": f"c{i}"} for i in range(1, n + 1)])
        cat.add_queries([{"id": i, "contents": f"q{i}"} for i in range(1, n + 1)])
        for i in range(1, n + 1):
            cat.add_retrieval_gt(i, i)
        pid = cat.get_or_create_pipeline("crash_eval")
        cat.add_retrieved_results(pid, [(i, i, 0.9) for i in range(1, n + 1)])

        calls = {"batches": 0}

        def crashing_metric(inputs):
            calls["batches"] += 1
            if calls["batches"] == 2:
                raise RuntimeError("simulated crash mid-evaluate")
            return [1.0] * len(inputs)

        service = RetrievalEvaluationService(cat)
        with pytest.raises(RuntimeError):
            service.evaluate(pid, "crash_recall", crashing_metric, batch_size=4)
        mid = cat.get_or_create_metric("crash_recall", "retrieval")
        persisted_after_crash = cat.get_evaluated_query_ids(pid, mid)
        assert len(persisted_after_crash) == 4  # exactly the first batch

        # resume with a recorder: only the NOT-yet-persisted queries arrive
        seen: list = []

        def recording_metric(inputs):
            seen.extend(mi.retrieved_ids[0] for mi in inputs)
            return [1.0] * len(inputs)

        fresh = RetrievalEvaluationService(Catalog(tmp_path / "cr.db"))
        summary = fresh.evaluate(pid, "crash_recall", recording_metric, batch_size=4)
        assert summary.count == n and summary.average == 1.0
        assert len(seen) == n - len(persisted_after_crash)  # no double-scoring
        assert len(set(seen)) == len(seen)
        # every query has exactly one persisted row
        rows = cat.connect().execute(
            "SELECT query_id, COUNT(*) c FROM evaluation_result "
            "WHERE pipeline_id=? AND metric_id=? GROUP BY query_id", (pid, mid)
        ).fetchall()
        assert len(rows) == n and all(r["c"] == 1 for r in rows)

    def test_kill_after_compute_before_persist_recomputes_that_batch_only(self, tmp_path):
        from autorag_research_tpu.store.catalog import Catalog

        cat = Catalog(tmp_path / "cr2.db", embedding_dim=8)
        n = 6
        cat.add_queries([{"id": i, "contents": f"q{i}"} for i in range(1, n + 1)])
        for i in range(1, n + 1):
            cat.add_retrieval_gt(i, i)
        cat.add_chunks([{"id": i, "contents": f"c{i}"} for i in range(1, n + 1)])
        pid = cat.get_or_create_pipeline("crash_eval2")
        cat.add_retrieved_results(pid, [(i, i, 0.9) for i in range(1, n + 1)])
        service = RetrievalEvaluationService(cat)

        real_add = cat.add_evaluation_results
        state = {"calls": 0}

        def crashing_add(pipeline_id, metric_id, rows):
            state["calls"] += 1
            if state["calls"] == 2:
                raise RuntimeError("crash AFTER scoring batch 2, BEFORE persist")
            return real_add(pipeline_id, metric_id, rows)

        cat.add_evaluation_results = crashing_add
        with pytest.raises(RuntimeError):
            service.evaluate(pid, "r2", retrieval_recall, batch_size=3)
        cat.add_evaluation_results = real_add

        summary = service.evaluate(pid, "r2", retrieval_recall, batch_size=3)
        assert summary.count == n
        mid = cat.get_or_create_metric("r2", "retrieval")
        rows = cat.connect().execute(
            "SELECT query_id, COUNT(*) c FROM evaluation_result "
            "WHERE pipeline_id=? AND metric_id=? GROUP BY query_id", (pid, mid)
        ).fetchall()
        assert len(rows) == n and all(r["c"] == 1 for r in rows)
