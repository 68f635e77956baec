"""Root conftest: force a virtual 8-device CPU mesh for all tests.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on a CPU mesh via ``--xla_force_host_platform_device_count``
(the driver separately dry-run-compiles the multi-chip path).

This must run before jax is imported anywhere. The environment ships with
``JAX_PLATFORMS=axon`` plus a sitecustomize that registers the remote-TPU
backend whenever ``PALLAS_AXON_POOL_IPS`` is set — both must be overridden,
not defaulted, or tests silently run against the single remote TPU chip
(where >1-device meshes cannot exist). Run TPU-marked tests manually with
``RUN_ON_TPU=1``.
"""

import os
import sys

if not os.environ.get("RUN_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon sitecustomize registers the remote-TPU PJRT plugin at
    # interpreter startup and pins jax_platforms, so the env var alone is
    # ignored by the time conftest runs — pin the config explicitly.
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
