"""BM25 tokenizers.

The reference tokenizes *inside Postgres* via the pg_tokenizer extension with
pre-built models bert / wiki_tocken / gemma2b / llmlingua2
(``orm/util.py:252-274``, query-time use at ``orm/repository/chunk.py:221``).
Here tokenization is a host-side stage feeding the sparse index builder:

- ``simple``: lowercase unicode word/number regex — self-contained default.
- ``english``: ``simple`` + stopword removal + Porter stemming (Lucene-like).
- ``bert`` / ``gemma2b`` / ``llmlingua2``: HF tokenizer adapters resolved from
  *local* checkpoints (zero-egress image); raise ``TokenizerError`` with
  guidance when absent. ``wiki_tocken`` aliases to ``simple``.

A C++ tokenizer/CSR-builder for large corpora lives in ``native/`` (same
interface, used automatically when built).
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod
from typing import Sequence

from autorag_research_tpu.exceptions import TokenizerError

_WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)

# Lucene's English stopword list (public domain word list).
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


class BaseTokenizer(ABC):
    name: str = "base"

    @abstractmethod
    def tokenize(self, text: str) -> list[str]:
        ...

    def tokenize_batch(self, texts: Sequence[str]) -> list[list[str]]:
        return [self.tokenize(t) for t in texts]


class SimpleTokenizer(BaseTokenizer):
    name = "simple"

    def tokenize(self, text: str) -> list[str]:
        return _WORD_RE.findall(text.lower())


class EnglishTokenizer(BaseTokenizer):
    """simple + stopwords + Porter stemming."""

    name = "english"

    def __init__(self):
        from nltk.stem.porter import PorterStemmer

        self._stemmer = PorterStemmer()

    def tokenize(self, text: str) -> list[str]:
        return [
            self._stemmer.stem(tok)
            for tok in _WORD_RE.findall(text.lower())
            if tok not in ENGLISH_STOPWORDS
        ]


class HFTokenizer(BaseTokenizer):
    """HuggingFace tokenizer adapter (wordpiece/sentencepiece token strings)."""

    def __init__(self, checkpoint: str, name: str | None = None):
        try:
            from transformers import AutoTokenizer

            self._tok = AutoTokenizer.from_pretrained(checkpoint, local_files_only=True)
        except Exception as exc:  # noqa: BLE001
            raise TokenizerError(
                f"cannot load local HF tokenizer '{checkpoint}'; use 'simple' or "
                "'english', or point to a local checkpoint directory"
            ) from exc
        self.name = name or checkpoint

    def tokenize(self, text: str) -> list[str]:
        return self._tok.tokenize(text)


_HF_PRESETS = {
    "bert": "bert-base-uncased",
    "gemma2b": "google/gemma-2b",
    "llmlingua2": "microsoft/llmlingua-2-xlm-roberta-large-meetingbank",
}

_CACHE: dict[str, BaseTokenizer] = {}


def get_tokenizer(name: str = "simple") -> BaseTokenizer:
    if name in _CACHE:
        return _CACHE[name]
    if name == "simple" or name == "wiki_tocken":
        tok: BaseTokenizer = SimpleTokenizer()
    elif name == "english":
        tok = EnglishTokenizer()
    elif name in _HF_PRESETS:
        tok = HFTokenizer(_HF_PRESETS[name], name)
    elif "/" in name or name.startswith("."):
        tok = HFTokenizer(name)
    else:
        raise TokenizerError(
            f"unknown tokenizer '{name}'; known: simple, english, wiki_tocken, "
            f"{', '.join(_HF_PRESETS)} or a local HF checkpoint path"
        )
    _CACHE[name] = tok
    return tok
