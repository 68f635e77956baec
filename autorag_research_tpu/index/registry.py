"""Per-catalog index cache.

Pipelines in one experiment share the same catalog; the device-resident index
is built once and reused across pipelines (the reference gets this for free
because the "index" is the database itself). Keyed by (catalog identity,
table, kind, metric).
"""

from __future__ import annotations

from typing import Any

_CACHE: dict[tuple, Any] = {}


def get_or_build(catalog, kind: str, table: str = "chunk", builder=None, **key_extra):
    key = (id(catalog), catalog.path, kind, table, tuple(sorted(key_extra.items())))
    idx = _CACHE.get(key)
    if idx is None:
        if builder is None:
            raise ValueError("index not cached and no builder provided")
        idx = builder()
        _CACHE[key] = idx
    return idx


def invalidate(catalog=None) -> None:
    """Drop cached indexes (all, or those of one catalog)."""
    if catalog is None:
        _CACHE.clear()
        return
    for key in [k for k in _CACHE if k[0] == id(catalog) or k[1] == catalog.path]:
        del _CACHE[key]
