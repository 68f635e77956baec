"""Turnkey offline recipes for the five BASELINE configs (VERDICT r3 #5).

Each test fabricates a tiny LOCAL snapshot in the exact on-disk format the
real dataset ships in (BEIR directory layout; ``datasets.save_to_disk``
snapshots for MTEB/ViDoRe), then drives the REAL CLI end-to-end:

    ingest --name <ingestor> --extra data_dir=<snapshot> -> run -> report

so the only ingredient missing on a connected machine is the data itself.
The five commands are documented in docs/PARITY.md ("Real-data recipes").

BASELINE configs covered (reference README.md:157-200):
  1. BEIR SciFact  - dense vector_search
  2. BEIR NQ       - bm25
  3. BEIR HotpotQA - hybrid_rrf (and_all multi-hop GT)
  4. MTEB          - MaxSim late-interaction (vector_search multi)
  5. ViDoRe v2     - sharded MaxSim over image pages (run --mesh)
"""

import json
from pathlib import Path

import pytest

from autorag_research_tpu.cli.app import main
from autorag_research_tpu.index import registry


@pytest.fixture(autouse=True)
def _fresh(tmp_path, monkeypatch):
    registry.invalidate()
    monkeypatch.chdir(tmp_path)
    assert main(["init"]) == 0
    # a multi-vector mock embedding preset for the late-interaction recipes
    (tmp_path / "configs" / "embedding" / "mock_multi.yaml").write_text(
        "type: mock_multi\ndim: 16\nmax_tokens: 4\n"
    )
    yield
    registry.invalidate()


def _experiment(retrieval, metrics=("recall", "ndcg")):
    Path("configs/experiment.yaml").write_text(
        "pipelines:\n  retrieval:\n"
        + "".join(f"    - {p}\n" for p in retrieval)
        + "  generation: []\n"
        "metrics:\n  retrieval:\n"
        + "".join(f"    - {m}\n" for m in metrics)
        + "  generation: []\n"
        "executor:\n  health_check: true\n  health_check_queries: 1\n"
    )


def _beir_snapshot(root: Path, n_docs=8, golds_per_query=1):
    """BEIR directory layout: corpus.jsonl / queries.jsonl / qrels/test.tsv."""
    root.mkdir(parents=True)
    docs = [
        {"_id": f"d{i}", "title": f"topic{i}", "text": f"body text number {i} about term{i}"}
        for i in range(n_docs)
    ]
    (root / "corpus.jsonl").write_text("\n".join(json.dumps(d) for d in docs))
    queries, qrels = [], ["query-id\tcorpus-id\tscore"]
    for qi in range(3):
        gold = [f"d{(qi * golds_per_query + g) % n_docs}" for g in range(golds_per_query)]
        # query text == the composed contents of its first gold doc, so the
        # hash-based mock embedding retrieves it at rank 1
        gd = docs[int(gold[0][1:])]
        queries.append({"_id": f"q{qi}", "text": f"{gd['title']} {gd['text']}".strip()})
        for g in gold:
            qrels.append(f"q{qi}\t{g}\t1")
    (root / "queries.jsonl").write_text("\n".join(json.dumps(q) for q in queries))
    (root / "qrels").mkdir()
    (root / "qrels" / "test.tsv").write_text("\n".join(qrels))
    return root


def _run_and_report(db="ws", mesh=False):
    rc = main(["run", "--db", db] + (["--mesh"] if mesh else []))
    assert rc == 0
    assert main(["report", "--db", db, "--html", "report.html"]) == 0
    return Path("report.html").read_text()


def test_scifact_dense_recipe(tmp_path, capsys):
    snap = _beir_snapshot(tmp_path / "scifact")
    assert main([
        "ingest", "--name", "beir", "--db", "ws",
        "--extra", f"data_dir={snap}", "--extra", "dataset_name=scifact",
        "--embedding-model", "mock",
    ]) == 0
    _experiment(["vector_search"])
    _run_and_report()
    out = capsys.readouterr().out
    assert "vector_search" in out and "recall" in out
    # query text == gold doc contents -> the mock embedding must hit rank 1
    assert "recall=1.00" in out or "recall': 1.0" in out or " 1.0" in out


def test_nq_bm25_recipe(tmp_path, capsys):
    snap = _beir_snapshot(tmp_path / "nq")
    assert main([
        "ingest", "--name", "beir", "--db", "ws",
        "--extra", f"data_dir={snap}", "--extra", "dataset_name=nq",
    ]) == 0
    _experiment(["bm25"])
    _run_and_report()
    out = capsys.readouterr().out
    assert "bm25" in out and "recall" in out


def test_hotpotqa_hybrid_recipe(tmp_path, capsys):
    # hotpotqa routes GT through and_all (multi-hop: ALL golds required)
    snap = _beir_snapshot(tmp_path / "hotpotqa", golds_per_query=2)
    assert main([
        "ingest", "--name", "beir", "--db", "ws",
        "--extra", f"data_dir={snap}", "--extra", "dataset_name=hotpotqa",
        "--embedding-model", "mock",
    ]) == 0
    _experiment(["vector_search", "bm25", "hybrid_rrf"])
    _run_and_report()
    out = capsys.readouterr().out
    assert "hybrid_rrf" in out and "recall" in out


def _mteb_snapshot(root: Path):
    import datasets

    docs = [
        {"_id": f"m{i}", "title": "", "text": f"mteb document {i} with term{i} inside"}
        for i in range(6)
    ]
    queries = [{"_id": f"q{i}", "text": docs[i]["text"]} for i in range(3)]
    qrels = [{"query-id": f"q{i}", "corpus-id": f"m{i}", "score": 1} for i in range(3)]
    datasets.Dataset.from_list(docs).save_to_disk(str(root / "corpus"))
    datasets.Dataset.from_list(queries).save_to_disk(str(root / "queries"))
    datasets.Dataset.from_list(qrels).save_to_disk(str(root / "qrels"))
    return root


def test_mteb_maxsim_recipe(tmp_path, capsys):
    snap = _mteb_snapshot(tmp_path / "mteb_scifact")
    assert main([
        "ingest", "--name", "text_mteb", "--db", "ws",
        "--extra", f"data_dir={snap}", "--extra", "task_name=SciFact",
        "--embedding-model", "mock_multi", "--late-interaction",
    ]) == 0
    _experiment(["vector_search_multi"])
    _run_and_report()
    out = capsys.readouterr().out
    assert "vector_search" in out and "recall" in out


def _vidore_snapshot(root: Path):
    import datasets
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    imgs = [
        Image.fromarray(rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8))
        for _ in range(5)
    ]
    corpus = datasets.Dataset.from_dict(
        {"corpus-id": [f"p{i}" for i in range(5)], "image": imgs}
    ).cast_column("image", datasets.Image())
    queries = datasets.Dataset.from_dict(
        {"query-id": [f"q{i}" for i in range(2)],
         "query": [f"what is on page {i}" for i in range(2)]}
    )
    qrels = datasets.Dataset.from_dict(
        {"query-id": ["q0", "q1"], "corpus-id": ["p0", "p3"], "score": [1, 1]}
    )
    corpus.save_to_disk(str(root / "corpus"))
    queries.save_to_disk(str(root / "queries"))
    qrels.save_to_disk(str(root / "qrels"))
    return root


def test_vidore_sharded_maxsim_recipe(tmp_path, capsys):
    snap = _vidore_snapshot(tmp_path / "vidore_v2")
    assert main([
        "ingest", "--name", "vidorev2", "--db", "ws",
        "--extra", f"data_dir={snap}",
        "--embedding-model", "mock_multi", "--late-interaction",
    ]) == 0
    # image MaxSim, sharded over the 8-device CPU mesh via run --mesh
    Path("configs/pipelines/retrieval/image_vector_search.yaml").write_text(
        "type: image_vector_search\nsearch_mode: multi\ntop_k: 5\n"
    )
    _experiment(["image_vector_search"])
    _run_and_report(mesh=True)
    out = capsys.readouterr().out
    assert "image_vector_search" in out and "recall" in out
