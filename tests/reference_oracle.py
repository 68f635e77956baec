"""Load reference metric/fusion modules standalone for differential testing.

The reference package at ``/root/reference/autorag_research`` cannot be
imported wholesale (its ``__init__``/ORM layers need sqlalchemy + a live
Postgres), but the parity-contract modules are pure Python:

- ``evaluation/metrics/retrieval.py`` — the 7 retrieval metrics
- ``pipelines/retrieval/hybrid.py``   — ``_rrf_fuse`` / ``_cc_fuse``
- ``util.py``                          — the 4 score normalizations

We register namespace-package stubs (so parent ``__init__``s never execute)
plus dummy modules for the heavy imports hybrid.py pulls in but the fusers
never touch, then import the real files through the normal machinery.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

REF_ROOT = "/root/reference/autorag_research"


def reference_available() -> bool:
    return os.path.isdir(REF_ROOT)


def _stub_package(name: str, path: str | None = None) -> types.ModuleType:
    mod = types.ModuleType(name)
    if path is not None:
        mod.__path__ = [path]
    sys.modules[name] = mod
    return mod


_cache: dict[str, types.ModuleType] | None = None


def load_reference_modules() -> dict[str, types.ModuleType]:
    """Return {"retrieval_metrics", "hybrid", "util"} reference modules.

    Idempotent; safe to call from multiple tests.
    """
    global _cache
    if _cache is not None:
        return _cache

    # Parent packages as path-only stubs: submodule imports resolve against
    # the reference tree without executing any reference __init__.py.
    _stub_package("autorag_research", REF_ROOT)
    _stub_package("autorag_research.evaluation", os.path.join(REF_ROOT, "evaluation"))
    _stub_package(
        "autorag_research.evaluation.metrics", os.path.join(REF_ROOT, "evaluation/metrics")
    )
    _stub_package("autorag_research.pipelines", os.path.join(REF_ROOT, "pipelines"))
    _stub_package(
        "autorag_research.pipelines.retrieval", os.path.join(REF_ROOT, "pipelines/retrieval")
    )

    # hybrid.py imports these at module scope but _rrf_fuse/_cc_fuse never
    # touch them; the environment has no sqlalchemy and the real base module
    # needs the ORM stack.
    if "sqlalchemy" not in sys.modules:
        sqlalchemy = _stub_package("sqlalchemy")
        orm = _stub_package("sqlalchemy.orm")
        orm.Session = type("Session", (), {})
        # hybrid.py annotates ``sessionmaker[Session]`` — must be subscriptable
        orm.sessionmaker = type(
            "sessionmaker", (), {"__class_getitem__": classmethod(lambda cls, item: cls)}
        )
        sqlalchemy.orm = orm

    base_stub = _stub_package("autorag_research.pipelines.retrieval.base")
    base_stub.BaseRetrievalPipeline = type("BaseRetrievalPipeline", (), {})
    base_stub.RetrievalUnit = str
    base_stub.get_retrieval_pipeline_unit = lambda *a, **k: "chunk"
    loader_stub = _stub_package("autorag_research.pipelines.retrieval.loader")
    loader_stub.RetrievalPipelineLoader = type("RetrievalPipelineLoader", (), {})

    util = importlib.import_module("autorag_research.util")
    retrieval_metrics = importlib.import_module(
        "autorag_research.evaluation.metrics.retrieval"
    )
    hybrid = importlib.import_module("autorag_research.pipelines.retrieval.hybrid")
    schema = importlib.import_module("autorag_research.schema")

    _cache = {
        "util": util,
        "retrieval_metrics": retrieval_metrics,
        "hybrid": hybrid,
        "schema": schema,
    }
    return _cache
