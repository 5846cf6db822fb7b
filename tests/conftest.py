"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform and splitting it into 8 XLA devices.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (the real TPU tunnel),
# which is slow for tiny unit-test shapes and uses MXU bf16-ish default
# matmul precision. Unit tests run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# sitecustomize (axon) imports jax at interpreter startup, which snapshots
# JAX_PLATFORMS=axon before this file runs — override via the config API.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1024)
