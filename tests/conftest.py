"""Test harness: run everything on a virtual 8-device CPU mesh.

The real TPU is reserved for bench.py; tests exercise identical code paths on
CPU (XLA host platform) with 8 virtual devices so the sharded step can be
validated without multi-chip hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The sandbox's sitecustomize force-registers the tunneled TPU backend and
# overrides JAX_PLATFORMS; pin the config back to CPU explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
