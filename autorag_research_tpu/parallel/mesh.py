"""Device mesh construction and defaults.

The reference has no device parallelism at all (SURVEY.md §2.10 — its only
concurrency is asyncio fan-out of SQL round-trips). Here parallelism is a
first-class axis: the corpus dimension of every index shards across a
``jax.sharding.Mesh`` axis named ``"corpus"``, and query batches data-parallel
across ``"dp"``. Collectives ride ICI via ``shard_map`` (see
``parallel/sharded.py``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

_default_mesh: Mesh | None = None

CORPUS_AXIS = "corpus"
DP_AXIS = "dp"


def corpus_mesh(
    n_corpus: int | None = None, n_dp: int = 1, devices=None
) -> Mesh:
    """Build a (dp, corpus) mesh. Defaults to all devices on the corpus axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_corpus is None:
        n_corpus = len(devices) // n_dp
    if n_dp * n_corpus > len(devices):
        raise ValueError(
            f"mesh {n_dp}x{n_corpus} needs {n_dp * n_corpus} devices, have {len(devices)}"
        )
    grid = np.array(devices[: n_dp * n_corpus]).reshape(n_dp, n_corpus)
    return Mesh(grid, (DP_AXIS, CORPUS_AXIS))


def set_default_mesh(mesh: Mesh | None) -> None:
    global _default_mesh
    _default_mesh = mesh


def get_default_mesh() -> Mesh:
    global _default_mesh
    if _default_mesh is None:
        _default_mesh = corpus_mesh()
    return _default_mesh
