"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), as real multi-chip TPU hardware is
not available in CI. Must run before the first jax import.
"""

import os

# Force-override: the dev environment pins JAX_PLATFORMS to the TPU plugin
# (and its sitecustomize imports jax at interpreter start), so both the env
# var and the live jax config must be rewritten before any backend
# initializes. Tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
