"""Multi-host (multi-slice / DCN) initialization helpers.

Single-host meshes (this image exposes one chip) are the tested path; these
helpers wire the multi-host story per the design in SURVEY.md §2.10/§5:
``jax.distributed`` brings every host's devices into one global mesh, the
corpus axis spans all slices, and the ICI/DCN split falls out of device
order — ``corpus_mesh`` lays devices out host-major, so per-shard top-k
collectives (``all_gather`` in ``parallel/sharded.py``) ride ICI within a
slice and only the [P, Q, k] candidate lists cross DCN.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("AutoRAG-Research-TPU")


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; TPU pods
    auto-detect all three). Returns True when multi-process mode is active.
    Safe to call on single-host deployments (no-op)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (int(env_np) if env_np else None)
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (int(env_pid) if env_pid else None)

    if coordinator_address is None and num_processes is None:
        try:
            # TPU pod runtimes auto-populate everything
            jax.distributed.initialize()
        except Exception as exc:  # noqa: BLE001 - single host, nothing to join
            logger.debug("single-host mode (%s)", exc)
            return False
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    multi = jax.process_count() > 1
    if multi:
        logger.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    return multi


def global_corpus_mesh(n_dp: int = 1):
    """A (dp, corpus) mesh over ALL processes' devices (call
    :func:`initialize_distributed` first on every host)."""
    from autorag_research_tpu.parallel.mesh import corpus_mesh

    return corpus_mesh(n_dp=n_dp)
