"""Unified long-audio chunking/batching planner.

The reference handles long audio with per-module ad-hoc host loops (SURVEY §5):
RVC silence-guided segmentation (modules/rvc/infer/modules/vc/pipeline.py:252-269),
super-res 10.24 s chunks with crossfade (wrappers/super_res.py:264-320),
OpenVoice 10 s chunks (modules/cloning/openvoice.py:29-157).  On TPU, dynamic
lengths force recompilation, so this planner produces *fixed-size, padded,
batched* chunk tensors that compile once per canonical chunk size, and a
crossfade stitcher that reassembles the processed chunks on device.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ChunkPlan:
    """Static description of a chunked view of a signal.

    chunk:   samples per chunk (static; compile-cache key)
    hop:     chunk stride; overlap = chunk - hop
    n:       original signal length
    count:   number of chunks
    padded:  padded signal length = (count - 1) * hop + chunk
    """

    chunk: int
    hop: int
    n: int
    count: int
    padded: int

    @property
    def overlap(self) -> int:
        return self.chunk - self.hop


def plan_chunks(n: int, chunk: int, overlap: int = 0) -> ChunkPlan:
    if not 0 <= overlap < chunk:
        raise ValueError(f"overlap {overlap} must be in [0, chunk {chunk})")
    hop = chunk - overlap
    count = max(1, -(-max(n - overlap, 1) // hop))
    padded = (count - 1) * hop + chunk
    return ChunkPlan(chunk=chunk, hop=hop, n=n, count=count, padded=padded)


def extract_chunks(x: jnp.ndarray, plan: ChunkPlan) -> jnp.ndarray:
    """``(..., n) -> (count, ..., chunk)`` batched chunk tensor (zero-padded).

    The chunk axis leads so the model sees it as a batch dimension — the TPU
    processes all chunks in one jitted call instead of the reference's serial
    host loop.
    """
    pad = plan.padded - plan.n
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    starts = np.arange(plan.count) * plan.hop
    idx = starts[:, None] + np.arange(plan.chunk)[None, :]  # (count, chunk)
    out = jnp.take(x, jnp.asarray(idx), axis=-1)  # (..., count, chunk)
    return jnp.moveaxis(out, -2, 0)


def stitch_chunks(
    chunks: jnp.ndarray, plan: ChunkPlan, crossfade: bool = True
) -> jnp.ndarray:
    """Overlap-add ``(count, ..., chunk) -> (..., n)`` with linear crossfade.

    Equivalent of the reference's per-module crossfade concat
    (wrappers/super_res.py:276-295, modules/cloning/openvoice.py:120-157) as a
    single on-device scatter-add.
    """
    count, chunk = chunks.shape[0], chunks.shape[-1]
    assert count == plan.count and chunk == plan.chunk
    if plan.overlap and crossfade:
        ramp = jnp.ones((chunk,), chunks.dtype)
        fade = jnp.linspace(0.0, 1.0, plan.overlap + 2, dtype=chunks.dtype)[1:-1]
        head = ramp.at[: plan.overlap].set(fade)
        tail = ramp.at[chunk - plan.overlap :].set(fade[::-1])
        ones = ramp
        if count == 1:
            win = ones[None]
        else:
            first = tail
            last = head
            mid = head * tail
            win = jnp.stack([first] + [mid] * (count - 2) + [last]) if count > 2 else jnp.stack([first, last])
        chunks = chunks * jnp.reshape(win, (count,) + (1,) * (chunks.ndim - 2) + (chunk,))

    out = jnp.zeros(chunks.shape[1:-1] + (plan.padded,), chunks.dtype)
    starts = np.arange(count) * plan.hop
    for i in range(count):  # static count -> unrolled scatter-adds, fused by XLA
        sl = (Ellipsis, slice(int(starts[i]), int(starts[i]) + chunk))
        out = out.at[sl].add(chunks[i])
    return out[..., : plan.n]
