"""Test configuration: force a virtual 8-device CPU platform.

Must run before jax is imported anywhere (pytest imports conftest first).
Multi-chip sharding tests run on the virtual mesh; real-TPU benchmarking
happens in bench.py, not here.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize force-registers the axon TPU platform and
# sets jax_platforms="axon,cpu" regardless of the env var; override it back
# to cpu before any backend initializes so tests run on the virtual
# 8-device CPU mesh (fast, deterministic) instead of tunneling to the TPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
