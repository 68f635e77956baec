"""Root conftest: force a virtual 8-device CPU mesh for all tests.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on a CPU mesh via ``--xla_force_host_platform_device_count``
(the driver separately dry-run-compiles the multi-chip path).
This must run before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
