"""Shared HF-datasets loading helpers for ingestors.

Every HF-backed ingestor accepts ``data=`` (a pre-loaded dataset mapping) so
offline deployments and tests can inject local data; otherwise
``datasets.load_dataset`` runs (requires network egress on first use).
"""

from __future__ import annotations

from typing import Any

from autorag_research_tpu.exceptions import IngestionError


def load_hf_dataset(path: str, name: str | None = None, split: str | None = None, **kw) -> Any:
    try:
        import datasets

        return datasets.load_dataset(path, name, split=split, **kw)
    except Exception as exc:  # noqa: BLE001
        raise IngestionError(
            f"cannot load HF dataset '{path}'"
            f"{f'/{name}' if name else ''} (offline? pass data=... with a local copy): {exc}"
        ) from exc


def sample_ids(ids: list, limit: int | None, rng) -> list:
    if limit is None or limit >= len(ids):
        return list(ids)
    return rng.sample(list(ids), limit)


def gold_preserving_subsample(
    corpus_ids: list, gold_ids: set, min_corpus_cnt: int | None, rng
) -> list:
    """Gold-ID-preserving corpus subsample (the reference's seed-42 pattern,
    ``data/beir.py:133-157``): keep every gold doc, fill with random others up
    to ``min_corpus_cnt``. Shared by every ingestor that subsamples."""
    if min_corpus_cnt is None:
        return list(corpus_ids)
    selected = sorted(gold_ids & set(corpus_ids), key=str)
    rest = [c for c in corpus_ids if c not in gold_ids]
    need = min_corpus_cnt - len(selected)
    if need > 0 and rest:
        selected.extend(rng.sample(rest, min(need, len(rest))))
    return selected
