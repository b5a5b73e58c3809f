"""Multi-host setup (SURVEY §2.6 comm-backend row).

The reference's distributed story is single-node DDP over NCCL with env-var
rendezvous (train.py:265-303).  The TPU equivalent is
``jax.distributed.initialize`` + one global mesh whose first axis spans
hosts over DCN and whose inner axes ride ICI; collectives are emitted by
XLA from shardings — there is no backend selection.

Call ``init_distributed()`` once per process before any jax op on
multi-host pods; it is a no-op on a single host."""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger(__name__)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> dict:
    """Initialize multi-host JAX when env/args indicate a pod.

    Resolution order: explicit args -> JAX_COORDINATOR_ADDRESS env ->
    TPU pod metadata (auto) -> single-host no-op.  Returns a summary."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
