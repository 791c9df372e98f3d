"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without real hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 test strategy).

The container's sitecustomize registers the ``axon`` TPU backend and pins
``JAX_PLATFORMS=axon``; ``jax.config.update`` after import wins over that,
and XLA_FLAGS takes effect as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
