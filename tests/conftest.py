"""Test harness config: force CPU with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere in the test process.
"""

import os

# NOTE: this environment's axon TPU plugin ignores JAX_PLATFORMS; the legacy
# JAX_PLATFORM_NAME is what actually selects the backend here.  Set both.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
