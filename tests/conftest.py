"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers a remote-TPU ("axon") backend at
interpreter startup. Tests must run on a local 8-device virtual CPU mesh
(fast, deterministic f32 matmuls, and exercises the multi-chip sharding
paths), so before any backend is initialised we point jax at CPU and force
8 virtual host devices.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_DIR)
