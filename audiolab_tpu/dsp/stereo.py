"""Mid/side stereo ops (reference: handlers/stereo.py:4-23).

Used by the RVC pipeline to convert the mid channel only and recombine
(modules/rvc/infer/modules/vc/pipeline.py:469-535).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def stereo_to_ms(stereo: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``(2, n)`` -> (mid, side), each ``(n,)``."""
    left, right = stereo[0], stereo[1]
    return 0.5 * (left + right), 0.5 * (left - right)


@jax.jit
def ms_to_stereo(mid: jnp.ndarray, side: jnp.ndarray) -> jnp.ndarray:
    """(mid, side) -> ``(2, n)``."""
    return jnp.stack([mid + side, mid - side])


def resample_side(side: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Linear-interp length match for the side channel (handlers/stereo.py:12-17)."""
    orig_len = side.shape[-1]
    if new_len == orig_len:
        return side
    pos = jnp.linspace(0.0, orig_len - 1.0, new_len)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, orig_len - 1)
    i1 = jnp.clip(i0 + 1, 0, orig_len - 1)
    frac = pos - i0
    return side[..., i0] * (1.0 - frac) + side[..., i1] * frac
