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


_gen_cache: types.ModuleType | None = None


def _meteor_tokenize(text: str) -> list:
    """Offline stand-in for HF-evaluate's word_tokenize (punkt data absent):
    the data-free Treebank tokenizer — also what the repo's meteor uses, so
    the tokenization is held fixed and the ALGORITHM is what gets compared."""
    import nltk

    try:
        return nltk.word_tokenize(text)
    except LookupError:
        from nltk.tokenize.treebank import TreebankWordTokenizer

        return TreebankWordTokenizer().tokenize(text)


class _NoWordnet:
    @staticmethod
    def synsets(_word):
        return []


def _resolve_wordnet():
    try:
        from nltk.corpus import wordnet

        wordnet.synsets("test")
        return wordnet
    except Exception:  # noqa: BLE001 - LookupError hides behind lazy loaders
        return _NoWordnet()


class _MeteorShim:
    """Matches huggingface evaluate's 'meteor' metric for single-pair calls
    (nltk >= 3.6.4 path: single_meteor_score over word-tokenized texts)."""

    def compute(self, *, predictions, references, alpha=0.9, beta=3.0, gamma=0.5):
        from nltk.translate.meteor_score import single_meteor_score

        wn = _resolve_wordnet()
        scores = [
            float(
                single_meteor_score(
                    _meteor_tokenize(ref),
                    _meteor_tokenize(pred),
                    wordnet=wn,
                    alpha=alpha,
                    beta=beta,
                    gamma=gamma,
                )
            )
            for pred, ref in zip(predictions, references)
        ]
        return {"meteor": sum(scores) / len(scores)}


def load_reference_generation() -> types.ModuleType:
    """Import the reference ``evaluation/metrics/generation.py`` standalone.

    sacrebleu / rouge_score / nltk / pandas / tiktoken are real in this image;
    ``evaluate`` (network-bound) and ``langchain_core`` are stubbed, and the
    reference-internal config/injection/unieval imports get minimal shims.
    The meteor path substitutes the punkt-dependent word_tokenize with the
    data-free Treebank tokenizer — the substitution is shared with the repo
    implementation, so tokenization is held fixed across both sides.
    """
    global _gen_cache
    if _gen_cache is not None:
        return _gen_cache
    load_reference_modules()  # parent stubs + schema/util

    if "langchain_core" not in sys.modules:
        lc = _stub_package("langchain_core")
        emb_mod = _stub_package("langchain_core.embeddings")
        emb_mod.Embeddings = type("Embeddings", (), {})
        lm_mod = _stub_package("langchain_core.language_models")
        lm_mod.BaseLanguageModel = type("BaseLanguageModel", (), {})
        lc.embeddings = emb_mod
        lc.language_models = lm_mod

    if "evaluate" not in sys.modules:
        ev = _stub_package("evaluate")

        def _load(name: str, *a, **k):
            if name == "meteor":
                return _MeteorShim()
            raise RuntimeError(f"offline evaluate stub only provides meteor, not {name}")

        ev.load = _load

    cfg = _stub_package("autorag_research.config")
    cfg.BaseGenerationMetricConfig = type("BaseGenerationMetricConfig", (), {})

    uni = _stub_package("autorag_research.evaluation.metrics.unieval")
    uni.UniEvalScorer = type("UniEvalScorer", (), {})
    uni.get_unieval_scorer = lambda *a, **k: None

    inj = _stub_package("autorag_research.injection")

    def _passthrough_decorator(*_a, **_k):
        def deco(fn):
            return fn

        return deco

    inj.with_embedding = _passthrough_decorator
    inj.with_llm = _passthrough_decorator

    # real reference modules: exceptions + evaluation.metrics.util
    importlib.import_module("autorag_research.exceptions")
    importlib.import_module("autorag_research.evaluation.metrics.util")

    _gen_cache = importlib.import_module("autorag_research.evaluation.metrics.generation")

    # tiktoken is installed but get_encoding() downloads the BPE file
    # (egress-blocked); truncate_texts only needs token-count semantics and
    # the fuzz texts sit far below every max_tokens, so a byte encoder is an
    # exact stand-in (truncation never fires on either side).
    class _CharEncoding:
        @staticmethod
        def encode(text: str) -> list[int]:
            return list(text.encode("utf-8"))

        @staticmethod
        def decode(tokens) -> str:
            return bytes(tokens).decode("utf-8", "ignore")

    ref_util = sys.modules["autorag_research.util"]
    ref_util.tiktoken = types.SimpleNamespace(
        get_encoding=lambda _name: _CharEncoding()
    )
    return _gen_cache
