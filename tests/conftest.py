"""Test config: run everything on an 8-device virtual CPU mesh.

The environment's axon sitecustomize force-registers a TPU backend and
overrides JAX_PLATFORMS via jax.config at interpreter start, so env vars
alone don't stick — we must update jax.config after import (before any
backend is initialized).
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

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()[:2])
)
assert jax.device_count() == 8, "expected 8 virtual CPU devices"
