"""ctypes bindings for the native (C++) BM25 index builder.

Loads ``native/libbm25_native.so``, compiling it on demand with g++ when the
shared object is missing (build takes ~1s; cached thereafter). Falls back
cleanly — callers check :func:`available` and use the Python builder when the
toolchain is absent.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger("AutoRAG-Research-TPU")

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
LIB_PATH = NATIVE_DIR / "libbm25_native.so"

_lib: ctypes.CDLL | None = None
_load_failed = False


def _build_lib() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return LIB_PATH.exists()
    except Exception as exc:  # noqa: BLE001
        logger.info("native bm25 build unavailable: %s", exc)
        return False


def _get_lib() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not LIB_PATH.exists() and not _build_lib():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(LIB_PATH))
    except OSError as exc:
        logger.info("native bm25 load failed: %s", exc)
        _load_failed = True
        return None
    lib.bm25_create.restype = ctypes.c_void_p
    lib.bm25_create.argtypes = [ctypes.c_double, ctypes.c_double]
    lib.bm25_add_docs.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.bm25_finalize.argtypes = [ctypes.c_void_p]
    for name, restype in [
        ("bm25_n_docs", ctypes.c_int64),
        ("bm25_n_terms", ctypes.c_int64),
        ("bm25_slots", ctypes.c_int32),
        ("bm25_vocab_blob_size", ctypes.c_int64),
    ]:
        fn = getattr(lib, name)
        fn.restype = restype
        fn.argtypes = [ctypes.c_void_p]
    lib.bm25_avgdl.restype = ctypes.c_double
    lib.bm25_avgdl.argtypes = [ctypes.c_void_p]
    for name in (
        "bm25_copy_slot_ids",
        "bm25_copy_slot_weights",
        "bm25_copy_doc_freq",
        "bm25_copy_doc_lengths",
        "bm25_copy_vocab_blob",
    ):
        getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.bm25_destroy.argtypes = [ctypes.c_void_p]
    # index-aux builders (present in rebuilt libs; probe on old .so files)
    try:
        lib.aux_mark_term_tiles.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.aux_term_tiles_indptr.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.aux_term_tiles_extract.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.aux_bloom_bitmaps.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.aux_available = True  # type: ignore[attr-defined]
    except AttributeError:
        lib.aux_available = False  # type: ignore[attr-defined]
    _lib = lib
    return _lib


def aux_available() -> bool:
    lib = _get_lib()
    return bool(lib is not None and getattr(lib, "aux_available", False))


def build_term_tile_lists_native(
    doc_ids: "np.ndarray", block_n: int
) -> tuple["np.ndarray", "np.ndarray"]:
    """C++ term->tile CSR build: (term, tile) presence bits marked straight
    into a per-term-aligned bitmap (no sort), then popcount/ctz extraction.
    35 s (numpy, 2M x 64) -> ~1 s. Output is bit-identical to
    ``ops.sparse.build_term_tile_lists``."""
    lib = _get_lib()
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int32)
    n, slots = doc_ids.shape
    n_tiles = max(1, -(-n // block_n))
    vocab = int(doc_ids.max()) + 1 if n else 1
    vocab = max(vocab, 1)
    words_per_term = (n_tiles + 63) // 64
    bitmap = np.zeros(vocab * words_per_term, dtype=np.uint64)
    lib.aux_mark_term_tiles(
        doc_ids.ctypes.data, n, slots, block_n, words_per_term, bitmap.ctypes.data
    )
    indptr = np.empty(vocab + 1, dtype=np.int64)
    lib.aux_term_tiles_indptr(bitmap.ctypes.data, vocab, words_per_term, indptr.ctypes.data)
    tiles = np.empty(int(indptr[-1]), dtype=np.int32)
    lib.aux_term_tiles_extract(
        bitmap.ctypes.data, vocab, words_per_term, indptr.ctypes.data, tiles.ctypes.data
    )
    return indptr, tiles


def build_tile_bitmaps_native(
    doc_ids: "np.ndarray", block_n: int, n_words: int
) -> "np.ndarray":
    """C++ Bloom tile-filter build: probe bits OR-ed directly (idempotent, no
    dedupe/sort pass). Bit-identical to ``ops.sparse.build_tile_bitmaps``."""
    lib = _get_lib()
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int32)
    n, slots = doc_ids.shape
    n_tiles = max(1, -(-n // block_n))
    out = np.zeros(n_tiles * n_words, dtype=np.uint32)
    lib.aux_bloom_bitmaps(doc_ids.ctypes.data, n, slots, block_n, n_words, out.ctypes.data)
    return out.view(np.int32).reshape(n_tiles, n_words)


def available() -> bool:
    return _get_lib() is not None


def build_sparse_native(texts: list[str], k1: float, b: float) -> dict:
    """Tokenize + build the slot-padded BM25 layout natively.

    Returns dict with slot_ids [N, L] int32, slot_weights [N, L] f32,
    doc_freq int64, doc_lengths int64, avgdl float, vocab {term: id}.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native bm25 library unavailable")
    handle = lib.bm25_create(ctypes.c_double(k1), ctypes.c_double(b))
    try:
        encoded = [t.encode("utf-8") if t else b"" for t in texts]
        arr = (ctypes.c_char_p * len(encoded))(*encoded)
        lengths = np.array([len(e) for e in encoded], dtype=np.int64)
        lib.bm25_add_docs(
            handle, arr, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(encoded)
        )
        lib.bm25_finalize(handle)

        n = lib.bm25_n_docs(handle)
        n_terms = lib.bm25_n_terms(handle)
        slots = lib.bm25_slots(handle)
        slot_ids = np.empty((n, slots), dtype=np.int32)
        slot_weights = np.empty((n, slots), dtype=np.float32)
        doc_freq = np.empty(n_terms, dtype=np.int64)
        doc_lengths = np.empty(n, dtype=np.int64)
        lib.bm25_copy_slot_ids(handle, slot_ids.ctypes.data)
        lib.bm25_copy_slot_weights(handle, slot_weights.ctypes.data)
        lib.bm25_copy_doc_freq(handle, doc_freq.ctypes.data)
        lib.bm25_copy_doc_lengths(handle, doc_lengths.ctypes.data)
        blob_size = lib.bm25_vocab_blob_size(handle)
        blob = ctypes.create_string_buffer(blob_size)
        lib.bm25_copy_vocab_blob(handle, blob)
        terms = blob.raw[:blob_size].decode("utf-8").split("\n")[:-1]
        vocab = {t: i for i, t in enumerate(terms)}
        return {
            "slot_ids": slot_ids,
            "slot_weights": slot_weights,
            "doc_freq": doc_freq,
            "doc_lengths": doc_lengths,
            "avgdl": float(lib.bm25_avgdl(handle)),
            "vocab": vocab,
        }
    finally:
        lib.bm25_destroy(handle)
