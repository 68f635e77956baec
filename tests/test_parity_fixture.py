"""Offline parity fixture (VERDICT r2 #6): the synthetic zipfian benchmark
drives the full executor vertical; leaderboards are deterministic across
runs (the cross-device invariance property parity_run.py asserts between
TPU and CPU-mesh executions) and resume completes a half-finished run."""

import json

import pytest

from autorag_research_tpu.index import registry


@pytest.fixture(autouse=True)
def _fresh_registry():
    registry.invalidate()
    yield
    registry.invalidate()


def run_parity(tmp_path, name, extra_args):
    from scripts.parity_run import main

    out = tmp_path / f"{name}.json"
    rc = main(
        [
            "--workspace", str(tmp_path / name),
            "--scale", "smoke",
            "--leaderboard-out", str(out),
            *extra_args,
        ]
    )
    assert rc == 0
    return json.loads(out.read_text())


def test_synthetic_ingestor_deterministic(tmp_path):
    from autorag_research_tpu.data.synthetic import SyntheticIngestor
    from autorag_research_tpu.store.catalog import Catalog
    from autorag_research_tpu.store.ingestion import IngestionService

    cats = []
    for i in range(2):
        cat = Catalog(tmp_path / f"s{i}.db")
        ing = SyntheticIngestor(n_docs=100, n_queries=10, seed=7)
        ing.set_service(IngestionService(cat))
        ing.ingest()
        cats.append(cat)
    a = [dict(r) for r in cats[0].connect().execute("SELECT id, contents FROM chunk ORDER BY id")]
    b = [dict(r) for r in cats[1].connect().execute("SELECT id, contents FROM chunk ORDER BY id")]
    assert a == b  # byte-identical corpora from the same seed
    qa = [dict(r) for r in cats[0].connect().execute("SELECT * FROM query ORDER BY id")]
    qb = [dict(r) for r in cats[1].connect().execute("SELECT * FROM query ORDER BY id")]
    assert qa == qb


def test_synthetic_has_graded_and_or_gt(tmp_path):
    from autorag_research_tpu.data.synthetic import SyntheticIngestor
    from autorag_research_tpu.store.catalog import Catalog
    from autorag_research_tpu.store.ingestion import IngestionService

    cat = Catalog(tmp_path / "gt.db")
    ing = SyntheticIngestor(n_docs=300, n_queries=21, seed=42)
    ing.set_service(IngestionService(cat))
    ing.ingest()
    # some queries must carry multi-group (AND of ORs) GT
    rows = cat.connect().execute(
        "SELECT query_id, COUNT(DISTINCT group_index) AS g FROM retrieval_relation GROUP BY query_id"
    ).fetchall()
    assert rows, "no GT ingested"
    assert any(r["g"] >= 2 for r in rows), "no AND-of-OR multi-group GT present"
    assert any(r["g"] == 1 for r in rows)


def test_parity_leaderboard_deterministic_across_runs(tmp_path):
    args = ["--pipelines", "dense,bm25,hybrid_rrf,maxsim"]
    lb1 = run_parity(tmp_path, "run_a", args)
    lb2 = run_parity(tmp_path, "run_b", args)
    assert lb1 == lb2
    # scores are non-degenerate: fixture gives real (imperfect) retrieval
    assert 0.2 < lb1["dense"]["recall"] <= 1.0
    assert lb1["bm25"]["recall"] > 0.8
    assert lb1["bm25"]["precision"] < 1.0


def test_parity_mesh_matches_single_device(tmp_path):
    """The leaderboard from an 8-device corpus-sharded run equals the
    single-device leaderboard — the shard-count-invariance theorem at the
    full-executor level."""
    args = ["--pipelines", "dense,bm25"]
    single = run_parity(tmp_path, "single", args)
    sharded = run_parity(tmp_path, "sharded", args + ["--mesh"])
    assert single == sharded


def test_parity_resume_completes(tmp_path):
    lb = run_parity(
        tmp_path, "resume", ["--pipelines", "dense,bm25", "--resume-test"]
    )
    assert lb["bm25"]["recall"] is not None
