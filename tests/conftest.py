"""Test configuration: run on a virtual 8-device CPU mesh.

The environment's sitecustomize registers the axon TPU PJRT plugin and
force-prepends ``axon`` to jax_platforms, so plain JAX_PLATFORMS=cpu is
not enough — we override the config before any backend initializes.
"""

import os

# Must come before the first backend use (jax import is fine).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
