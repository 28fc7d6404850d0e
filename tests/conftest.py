"""Test configuration: run everything on an 8-device virtual CPU mesh.

Must set the env vars before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: unrolled field-op graphs are expensive to
# compile on the CPU backend; cache them across pytest runs.
import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; the env var alone is not enough — the config must
# be updated after jax import to actually run tests on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
# NOTE: no persistent compilation cache here — this environment runs tests
# under different sandbox contexts whose detected CPU features differ, and
# loading an AOT cache entry compiled under the other context segfaults
# (XLA cpu_aot_loader machine-feature mismatch).
# u64 fast path for field-op internals (see ops/goldilocks.py)
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")


def pytest_collection_modifyitems(config, items):
    """Skip @slow tests unless RUN_SLOW=1 (they add ~45 min of BN254
    compile time; run them explicitly when touching the snark stack)."""
    import pytest

    if os.environ.get("RUN_SLOW") == "1":
        return
    marker = pytest.mark.skip(reason="slow test; set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(marker)
