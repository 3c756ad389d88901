"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use `--xla_force_host_platform_device_count=8`; all
cross-device traffic in this framework is batch-axis sharding, so CPU devices
exercise the same partitioning XLA would emit on a TPU slice.

NOTE: the JAX_PLATFORMS env var alone is not enough in this image — the axon
PJRT plugin re-registers itself at interpreter start — so the platform is
pinned via jax.config, which wins over the plugin's env override.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
