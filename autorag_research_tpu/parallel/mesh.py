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


def hybrid_corpus_mesh(n_slices: int | None = None, devices=None) -> Mesh:
    """DCN-aware (dp, corpus) mesh for multi-slice deployments.

    Layout: the ``corpus`` axis spans each slice's devices (so the per-shard
    top-k ``all_gather`` in ``parallel/sharded.py`` rides ICI), and ``dp``
    spans slices (queries partition across slices; nothing crosses DCN in the
    retrieval hot path — each slice holds a full corpus shard-set replica).
    Built with ``mesh_utils.create_hybrid_device_mesh`` so device order
    respects physical ICI topology within each slice.

    Falls back to :func:`corpus_mesh` (all devices on the corpus axis) when
    the runtime exposes a single slice — e.g. the CPU test mesh or one chip.
    """
    devices = list(devices if devices is not None else jax.devices())
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    n_slices = n_slices if n_slices is not None else len(slice_ids)
    if n_slices <= 1 or len(slice_ids) <= 1:
        return corpus_mesh(devices=devices)
    from jax.experimental import mesh_utils

    per_slice = len(devices) // n_slices
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, per_slice),
        dcn_mesh_shape=(n_slices, 1),
        devices=devices,
    )
    return Mesh(grid, (DP_AXIS, CORPUS_AXIS))


def set_default_mesh(mesh: Mesh | None) -> None:
    global _default_mesh
    _default_mesh = mesh


def get_default_mesh() -> Mesh:
    global _default_mesh
    if _default_mesh is None:
        _default_mesh = corpus_mesh()
    return _default_mesh
