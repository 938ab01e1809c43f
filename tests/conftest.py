"""Test configuration: force an 8-device virtual CPU mesh.

SURVEY.md §4.5 — the whole suite runs on CPU with
``--xla_force_host_platform_device_count=8`` so meshes, psum, sharded
resampling, and chain sharding are exercised without TPU hardware.  Must run
before jax is imported anywhere.
"""

import os

# Override unconditionally: the session env pins JAX_PLATFORMS=axon (the
# remote-TPU tunnel), which is both slow for unit tests and single-device.
# The axon sitecustomize additionally calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
# overrides the env var — so we must override the *config* again here (conftest
# runs before any backend is initialized).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()} ({jax.default_backend()})"
