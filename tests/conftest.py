"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are validated on
XLA's host-platform device simulation (SURVEY.md §4 item 5).

Note: the environment's sitecustomize registers a remote-TPU PJRT plugin and
force-sets the `jax_platforms` config programmatically, so the JAX_PLATFORMS
env var alone is NOT sufficient — we must override the config after importing
jax (and before the first backend initialization).
"""

import os

# XLA_FLAGS is read at backend-init time; set it before any jax op runs.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
