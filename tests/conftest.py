"""Test config: force an 8-device virtual CPU platform before any test runs.

The container's sitecustomize registers a remote `axon` TPU backend in every
interpreter and pins JAX_PLATFORMS=axon; tests must run on local CPU with 8
virtual devices (for mesh/sharding tests), so override both the env var and
the live jax config here, before any test module imports jax-dependent code.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
