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
# persistent compile cache: the suite is compile-bound on this 1-CPU host
# (425 tests, most of the wall clock is XLA:CPU tracing/compiling the same
# member/pipeline graphs every run) — cache hits cut repeat runs sharply
jax.config.update("jax_compilation_cache_dir", "/tmp/audiolab_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
