"""Test env: force CPU with 8 virtual devices so every pjit/shard_map/Mesh
codepath is exercised without TPU hardware (SURVEY.md §4 implication (d)).

Note: this image has a sitecustomize that pins JAX_PLATFORMS=axon (the TPU
tunnel), so env vars alone don't stick — we must also update jax.config before
any backend initialization. conftest runs before test modules import, which is
early enough because JAX initializes backends lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: overfit-to-artifact demos (hundreds of train steps; "
        "deselect with -m 'not slow' for a quick pass)")
