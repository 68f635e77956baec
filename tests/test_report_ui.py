"""Live leaderboard web UI (role parity with the reference Gradio UI,
reporting/ui.py:117-308): serves the three report views over HTTP and
re-reads the catalogs on every request."""

import urllib.error
import urllib.request

import pytest

from autorag_research_tpu.reporting.ui import serve_report
from autorag_research_tpu.store.catalog import Catalog


@pytest.fixture
def workspace(tmp_path):
    ws = tmp_path / "uiws"
    ws.mkdir()
    cat = Catalog(ws / "catalog.db")
    cat.add_queries([{"id": 1, "contents": "q"}])
    pid = cat.get_or_create_pipeline("dense")
    mid = cat.get_or_create_metric("recall", "retrieval")
    cat.add_evaluation_results(pid, mid, [(1, 0.75)])
    return ws, cat


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.status, resp.read().decode("utf-8")


def test_ui_serves_leaderboard(workspace):
    ws, _ = workspace
    handle = serve_report([ws], port=0)
    try:
        status, body = _get(handle.url)
        assert status == 200
        assert "leaderboard" in body
        assert "dense" in body and "0.75" in body
    finally:
        handle.shutdown()


def test_ui_live_refresh_sees_new_results(workspace):
    ws, cat = workspace
    handle = serve_report([ws], port=0)
    try:
        _, before = _get(handle.url)
        assert "bm25" not in before
        pid = cat.get_or_create_pipeline("bm25")
        mid = cat.get_or_create_metric("recall", "retrieval")
        cat.add_evaluation_results(pid, mid, [(1, 0.5)])
        _, after = _get(handle.url)
        assert "bm25" in after  # no restart needed
    finally:
        handle.shutdown()


def test_ui_404_on_other_paths(workspace):
    ws, _ = workspace
    handle = serve_report([ws], port=0)
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(handle.url + "nope")
        assert exc.value.code == 404
    finally:
        handle.shutdown()


def test_workspaces_with_same_basename_do_not_collide(tmp_path):
    """Two workspaces both named 'ws' must appear as distinct datasets in the
    leaderboard (regression: dict keyed by basename dropped one silently)."""
    from autorag_research_tpu.reporting.service import ReportingService

    paths = []
    for parent, pipeline in (("runs_a", "bm25"), ("runs_b", "dense")):
        ws = tmp_path / parent / "ws"
        ws.mkdir(parents=True)
        cat = Catalog(ws / "catalog.db")
        cat.add_queries([{"id": 1, "contents": "q"}])
        pid = cat.get_or_create_pipeline(pipeline)
        mid = cat.get_or_create_metric("recall", "retrieval")
        cat.add_evaluation_results(pid, mid, [(1, 0.5)])
        paths.append(ws)
    service = ReportingService(paths)
    assert len(service.workspaces) == 2
    df = service.results()
    assert set(df["pipeline"]) == {"bm25", "dense"}
    assert len(set(df["dataset"])) == 2
