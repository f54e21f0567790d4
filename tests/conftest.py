"""Test harness config: force CPU with 8 virtual devices for sharding tests.

The interpreter in this environment PRE-IMPORTS jax at startup (a .pth /
sitecustomize hook), so setting JAX_PLATFORMS via os.environ here is too
late for jax's import-time env snapshot — the suite would silently run on
the tunneled TPU.  jax.config.update works post-import as long as no
backend has been initialized yet, which is guaranteed at conftest time.
"""

import os

# force-set, not setdefault: the session shell exports JAX_PLATFORMS=axon
_backend = os.environ.get("ELAINA_TEST_BACKEND", "cpu")
os.environ["JAX_PLATFORMS"] = _backend
os.environ["JAX_PLATFORM_NAME"] = _backend
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# keep lane oversubscription engaged but CPU-sized: tiny test solves widen
# to at most 2k lanes (exercising the pixel-split path everywhere) while
# >= 2k-pixel test solves keep their existing widths/compile sizes
os.environ.setdefault("ELAINA_LANE_TARGET", "2048")

import jax

if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.default_backend() == _backend, (
        "tests must run on %s; backend is %s"
        % (_backend, jax.default_backend()))
