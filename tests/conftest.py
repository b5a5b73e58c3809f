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
# persistent compile cache: the suite is compile-bound (most of the wall
# clock is XLA:CPU tracing/compiling the same member/pipeline graphs every
# run) — cache hits cut repeat runs sharply.  Repo-stable path (gitignored)
# so the warm cache survives /tmp cleaning and round transitions; override
# with AUDIOLAB_TEST_CACHE.
_cache = os.environ.get(
    "AUDIOLAB_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
