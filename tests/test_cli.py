"""CLI, config resolver, injection registry, reporting, plugins."""

import json

import pytest

from autorag_research_tpu.cli.app import main
from autorag_research_tpu.index import registry


@pytest.fixture(autouse=True)
def clear_cache():
    registry.invalidate()
    yield
    registry.invalidate()


@pytest.fixture
def workspace(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["init"]) == 0
    data = tmp_path / "data"
    data.mkdir()
    docs = ["quick brown fox", "lazy dog", "tpu vector search", "rag systems"]
    (data / "corpus.jsonl").write_text(
        "\n".join(json.dumps({"id": i, "contents": d}) for i, d in enumerate(docs))
    )
    (data / "queries.jsonl").write_text(
        json.dumps({"id": 100, "contents": "fox", "gt": [[0]], "generation_gt": ["fox"]})
        + "\n"
        + json.dumps({"id": 101, "contents": "tpu search", "gt": [[2]]})
    )
    assert (
        main(
            ["ingest", "--name", "local", "--db", "ws", "--extra", "data_dir=data",
             "--embedding-model", "mock"]
        )
        == 0
    )
    return tmp_path


def test_init_idempotent(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["init"]) == 0
    assert (tmp_path / "configs" / "experiment.yaml").exists()
    assert main(["init"]) == 0  # second call: no overwrite, still ok


def test_full_run_and_report(workspace, capsys):
    assert main(["run", "--db", "ws"]) == 0
    out = capsys.readouterr().out
    assert "vector_search" in out and "hybrid_rrf" in out and "recall" in out
    assert main(["report", "--db", "ws", "--html", "report.html"]) == 0
    assert (workspace / "report.html").exists()
    html = (workspace / "report.html").read_text()
    assert "hybrid_rrf" in html and "Borda" in html


def test_dump_restore_cycle(workspace):
    assert main(["data", "dump", "--db", "ws", "--file", "ws.tar.gz"]) == 0
    assert main(["data", "restore", "--db", "ws2", "--file", "ws.tar.gz"]) == 0
    assert (workspace / "ws2" / "catalog.db").exists()
    assert (workspace / "ws" / "catalog.db").exists()  # original untouched
    assert main(["data", "restore", "--db", "ws2", "--file", "ws.tar.gz"]) == 1


def test_drop(workspace):
    assert main(["drop", "--db", "ws", "-y"]) == 0
    assert not (workspace / "ws").exists()
    assert main(["drop", "--db", "ws", "-y"]) == 1


def test_show_variants(workspace, capsys):
    for what, needle in [
        ("ingestors", "beir"),
        ("pipelines", "hybrid_rrf"),
        ("metrics", "ndcg"),
    ]:
        assert main(["show", what]) == 0
        assert needle in capsys.readouterr().out


def test_health_check(workspace, capsys):
    assert main(["health-check", "--db", "ws", "--llm", "mock", "--embedding", "mock"]) == 0
    out = capsys.readouterr().out
    assert "db ok" in out and "llm 'mock' ok" in out
    assert main(["health-check", "--llm", "no_such_model"]) == 1


class TestInjection:
    def test_builtin_and_yaml(self, tmp_path):
        import yaml

        from autorag_research_tpu.injection import ModelRegistry

        (tmp_path / "embedding").mkdir()
        (tmp_path / "embedding" / "small.yaml").write_text(
            yaml.dump({"type": "mock", "dim": 8})
        )
        reg = ModelRegistry(tmp_path)
        emb = reg.load_embedding("small")
        assert emb.dim == 8
        assert reg.load_embedding("small") is emb  # cached
        assert reg.load_llm("mock").model_name == "mock"

    def test_nested_model_resolution(self, tmp_path):
        import yaml

        from autorag_research_tpu.injection import ModelRegistry

        (tmp_path / "reranker").mkdir()
        (tmp_path / "reranker" / "lw.yaml").write_text(
            yaml.dump({"type": "llm_listwise", "llm": "mock"})
        )
        reg = ModelRegistry(tmp_path)
        rr = reg.load_reranker("lw")
        assert rr.llm.model_name == "mock"

    def test_unknown_raises(self):
        from autorag_research_tpu.exceptions import ModelLoadError
        from autorag_research_tpu.injection import ModelRegistry

        with pytest.raises(ModelLoadError):
            ModelRegistry().load_llm("nope")


class TestReporting:
    def test_borda(self, workspace):
        main(["run", "--db", "ws"])
        from autorag_research_tpu.reporting.service import ReportingService

        service = ReportingService([workspace / "ws"])
        lb = service.leaderboard()
        assert set(lb.pipeline) == {"vector_search", "bm25", "hybrid_rrf"}
        borda = service.borda_ranking()
        assert borda.iloc[0].borda_points >= borda.iloc[-1].borda_points
        cross = service.cross_dataset("recall")
        assert "ws" in cross.columns


class TestPlugins:
    def test_scaffold(self, tmp_path):
        from autorag_research_tpu.plugin_registry import create_plugin_scaffold

        root = create_plugin_scaffold("my_cool_plugin", tmp_path)
        assert (root / "pyproject.toml").exists()
        assert (root / "my_cool_plugin" / "pipeline.py").exists()
        assert (root / "my_cool_plugin" / "configs" / "pipelines" / "retrieval" / "my_cool_plugin.yaml").exists()
        # scaffolded pipeline module is importable and registers its config
        import sys

        sys.path.insert(0, str(root))
        try:
            import importlib

            module = importlib.import_module("my_cool_plugin.pipeline")
            from autorag_research_tpu.config import BasePipelineConfig

            assert "my_cool_plugin" in BasePipelineConfig.registry
        finally:
            sys.path.remove(str(root))

    def test_register_metric(self):
        from autorag_research_tpu.evaluation.metrics.retrieval import RETRIEVAL_METRICS
        from autorag_research_tpu.plugin_registry import register_metric

        register_metric("always_one", "retrieval", lambda inputs: [1.0] * len(inputs))
        assert "always_one" in RETRIEVAL_METRICS
        del RETRIEVAL_METRICS["always_one"]


class TestConfigResolver:
    def test_experiment_with_wrapper_deps(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        main(["init"])
        from autorag_research_tpu.cli.config_resolver import ConfigResolver

        resolver = ConfigResolver(tmp_path / "configs")
        config = resolver.load_experiment()
        names = [p.name for p in config.pipelines]
        assert names == ["vector_search", "bm25", "hybrid_rrf"]
        # hybrid's deps resolved into extra configs (already in run list here)
        assert config.extra_pipeline_configs == {}
        # metric resolution falls back to builtin names
        m = resolver.resolve_metric("retrieval", "mrr")
        assert m.name == "mrr"


class TestIndexArtifacts:
    def test_artifact_persist_and_reload(self, workspace):
        from autorag_research_tpu.index import registry
        from autorag_research_tpu.index.dense import DenseIndex
        from autorag_research_tpu.store.catalog import Catalog

        cat = Catalog(workspace / "ws" / "catalog.db")
        idx = registry.get_or_build(
            cat, "dense", "chunk", builder=lambda: DenseIndex.from_catalog(cat)
        )
        art = workspace / "ws" / "indexes" / "dense_chunk"
        assert (art / "fingerprint.json").exists()
        # fresh process simulation: clear memory cache, builder must NOT run
        registry.invalidate()

        def explode():
            raise AssertionError("builder should not be called; artifact present")

        idx2 = registry.get_or_build(cat, "dense", "chunk", builder=explode)
        assert idx2.ids == idx.ids

    def test_artifact_stale_on_growth(self, workspace):
        from autorag_research_tpu.embeddings import MockEmbedding
        from autorag_research_tpu.index import registry
        from autorag_research_tpu.index.dense import DenseIndex
        from autorag_research_tpu.store.catalog import Catalog

        cat = Catalog(workspace / "ws" / "catalog.db")
        registry.get_or_build(
            cat, "dense", "chunk", builder=lambda: DenseIndex.from_catalog(cat)
        )
        registry.invalidate()
        emb = MockEmbedding(dim=64)
        cat.add_chunks([{"id": 999, "contents": "new doc", "embedding": emb.embed_query("new doc")}])
        built = []
        idx = registry.get_or_build(
            cat, "dense", "chunk",
            builder=lambda: (built.append(1), DenseIndex.from_catalog(cat))[1],
        )
        assert built == [1]  # stale artifact rebuilt
        assert 999 in idx.ids


def test_every_template_pipeline_config_resolves(tmp_path, monkeypatch):
    """Every shipped pipeline YAML must resolve to a valid typed config
    (catches template/type drift)."""
    monkeypatch.chdir(tmp_path)
    main(["init"])
    from autorag_research_tpu.cli.config_resolver import ConfigResolver

    resolver = ConfigResolver(tmp_path / "configs")
    for kind in ("retrieval", "generation"):
        names = resolver.all_pipeline_names(kind)
        assert names, kind
        for name in names:
            config = resolver.resolve_pipeline(kind, name)
            assert config.name == name
            assert config.kind == kind, f"{name}: {config.kind} != {kind}"


def test_cli_train_command(tmp_path, capsys):
    from autorag_research_tpu.cli.app import main
    from autorag_research_tpu.store.catalog import Catalog
    from autorag_research_tpu.store.gt import or_all

    ws = tmp_path / "trainws"
    ws.mkdir()
    cat = Catalog(ws / "catalog.db")
    docs = [f"topic {chr(97 + i)} text" for i in range(6)]
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(docs)])
    cat.add_queries([{"id": i, "contents": f"find {chr(97 + i)}"} for i in range(6)])
    for i in range(6):
        cat.add_retrieval_gt(i, or_all([i]))

    out = tmp_path / "params.npz"
    rc = main([
        "train", "--db", str(ws), "--out", str(out), "--epochs", "3",
        "--batch-size", "6", "--hidden", "32", "--layers", "1",
    ])
    assert rc == 0 and out.exists()
    captured = capsys.readouterr().out
    assert "trained" in captured and "saved params" in captured

    out2 = tmp_path / "cross.npz"
    rc = main([
        "train", "--db", str(ws), "--model", "cross", "--out", str(out2),
        "--epochs", "3", "--batch-size", "6", "--hidden", "32", "--layers", "1",
    ])
    assert rc == 0 and out2.exists()


def test_every_model_preset_type_resolves_in_injection_registry():
    """Contract between cli init's config tree and the injection registry:
    every llm/embedding/reranker preset's `type:` must be a registered
    factory (a preset naming an unknown type would fail only at run time)."""
    import yaml

    from autorag_research_tpu.cli.templates import DEFAULT_CONFIGS
    from autorag_research_tpu.injection import _FACTORIES

    checked = 0
    for rel, content in DEFAULT_CONFIGS.items():
        kind = rel.split("/", 1)[0]
        if kind not in ("llm", "embedding", "reranker"):
            continue
        spec = yaml.safe_load(content)
        t = spec["type"]
        assert t in _FACTORIES[kind], f"{rel}: type '{t}' not registered for {kind}"
        checked += 1
    assert checked >= 30  # presets across all three kinds


class TestHfDumps:
    """data upload/download + show dumps against a mocked HF Hub
    (reference cli/commands/data.py:33-200, data/hf_storage.py:17-152)."""

    @pytest.fixture
    def hub(self, monkeypatch):
        from pathlib import Path

        store = {}

        class FakeApi:
            def __init__(self, token=None):
                self.token = token

            def create_repo(self, repo_id, repo_type=None, exist_ok=False):
                store.setdefault(repo_id, {})

            def upload_file(self, path_or_fileobj, path_in_repo, repo_id, repo_type):
                store[repo_id][path_in_repo] = Path(path_or_fileobj).read_bytes()

            def list_repo_files(self, repo_id, repo_type=None):
                if repo_id not in store:
                    raise FileNotFoundError(repo_id)
                return sorted(store[repo_id])

        def fake_download(repo_id, filename, repo_type, local_dir, token=None):
            dest = Path(local_dir) / filename
            dest.write_bytes(store[repo_id][filename])
            return str(dest)

        monkeypatch.setattr("huggingface_hub.HfApi", FakeApi)
        monkeypatch.setattr("huggingface_hub.hf_hub_download", fake_download)
        return store

    def test_upload_show_download_cycle(self, workspace, hub, capsys):
        from pathlib import Path

        # upload with no pre-made tarball: dumps implicitly, then pushes
        assert main(["data", "upload", "--db", "ws", "--ingestor", "local"]) == 0
        assert Path("ws.dump.tar.gz").exists()
        assert "ws.dump.tar.gz" in hub["autorag-research-tpu/local-dumps"]
        out = capsys.readouterr().out
        assert "hf://datasets/autorag-research-tpu/local-dumps" in out
        # show dumps lists it
        assert main(["show", "dumps", "--ingestor", "local"]) == 0
        assert "ws.dump.tar.gz" in capsys.readouterr().out
        # download restores into a fresh workspace
        assert (
            main(["data", "download", "--db", "ws3", "--ingestor", "local",
                  "--file", "ws.dump.tar.gz"]) == 0
        )
        assert (workspace / "ws3" / "catalog.db").exists()
        # refuses to clobber an existing workspace
        assert (
            main(["data", "download", "--db", "ws3", "--ingestor", "local",
                  "--file", "ws.dump.tar.gz"]) == 1
        )

    def test_download_requires_ingestor(self, workspace):
        assert main(["data", "download", "--db", "ws4"]) == 1

    def test_missing_dump_is_clean_error(self, workspace, hub, capsys):
        assert (
            main(["data", "download", "--db", "ws5", "--ingestor", "local",
                  "--file", "nope.tar.gz"]) == 1
        )
        assert "download failed" in capsys.readouterr().err

    def test_no_egress_clean_errors(self, workspace, monkeypatch, capsys):
        class Boom:
            def __init__(self, token=None):
                raise OSError("no egress")

        monkeypatch.setattr("huggingface_hub.HfApi", Boom)
        assert main(["data", "upload", "--db", "ws", "--ingestor", "local"]) == 1
        assert "upload failed" in capsys.readouterr().err
        assert main(["show", "dumps", "--ingestor", "local"]) == 0
        assert "<unavailable" in capsys.readouterr().err
