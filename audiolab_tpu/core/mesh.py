"""Device mesh setup & sharding helpers.

The reference's only parallelism is single-node DDP over NCCL
(modules/rvc/infer/modules/train/train.py:265-303, SURVEY §2.6).  The TPU
replacement is declarative: build one ``jax.sharding.Mesh`` whose axes ride
ICI, annotate shardings, and let XLA emit the collectives.  Axis conventions:

  dp — data parallel (batch)
  tp — tensor parallel (model width; large LMs only)

Multi-host extends the same mesh over DCN via ``jax.distributed.initialize``.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _factor(n: int, tp: int) -> tuple[int, int]:
    tp = min(tp, n)
    while n % tp:
        tp -= 1
    return n // tp, tp


@lru_cache(maxsize=None)
def get_mesh(tp: int = 1) -> Mesh:
    """Global mesh over all visible devices: axes ``(dp, tp)``."""
    devices = jax.devices()
    dp, tp = _factor(len(devices), tp)
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


def local_mesh(n_devices: int | None = None, tp: int = 1) -> Mesh:
    """Mesh over the first ``n_devices`` devices (tests / dry runs)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    dp, tp = _factor(len(devices), tp)
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded over dp, replicated over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed() -> None:
    """Multi-host bring-up (no-op single-host).  Replaces the reference's
    MASTER_ADDR/MASTER_PORT + dist.init_process_group rendezvous
    (train.py:265-266,298-303)."""
    if int(os.environ.get("AUDIOLAB_NUM_HOSTS", "1")) > 1:
        jax.distributed.initialize()
