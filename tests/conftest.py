"""Test environment: force a virtual 8-device CPU mesh.

Multi-chip sharding tests run on simulated host devices
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count); the real
TPU is exercised only by bench.py / the driver.

Note: this image's sitecustomize registers an `axon` TPU-tunnel backend and
pins jax_platforms to it at interpreter startup, so setting JAX_PLATFORMS in
os.environ here is too late — we must override through jax.config before the
backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8
