"""Test harness: run everything on a virtual 8-device CPU mesh.

Standard JAX trick for testing pjit/shard_map topologies without real
chips (SURVEY.md §4). The container's axon sitecustomize registers the
real-TPU backend in every interpreter and pins jax_platforms to it, so we
must both set XLA_FLAGS *and* override the already-applied jax config.
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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
