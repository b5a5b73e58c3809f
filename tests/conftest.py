"""Test config: run everything on a virtual 8-device CPU mesh.

The standard JAX trick for exercising multi-chip sharding without a pod
(SURVEY §4).  The environment's sitecustomize imports jax and overrides
``jax_platforms`` before conftest runs, so the platform must be forced via
jax.config (env vars are consulted earlier); XLA_FLAGS is still read lazily
at first backend creation, so setting it here works.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
