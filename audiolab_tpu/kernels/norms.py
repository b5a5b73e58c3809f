"""Fused RMS/LayerNorm Pallas kernels.

The reference leans on triton's fused ``layer_norm_fn`` inside the Zonos
backbone (modules/zonos/backbone.py:5) and torch LayerNorms everywhere else.
On TPU a fused norm kernel keeps the activation in VMEM for the whole
read-reduce-scale pass instead of three HBM round-trips.

Falls back to a pure-jnp implementation off-TPU (tests run on CPU) — XLA
fuses that case adequately; the Pallas path is for TPU where we control the
VMEM tiling explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[:] = (x * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _layernorm_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    o_ref[:] = (
        xc * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
        + b_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _row_tiles(n_rows: int, d: int) -> int:
    """Rows per block: keep ~2 MB blocks in VMEM."""
    target = max(1, (2 * 1024 * 1024) // max(d * 4, 1))
    tile = 1
    while tile * 2 <= min(target, n_rows):
        tile *= 2
    return tile


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm over the last axis; fused Pallas kernel on TPU."""
    d = x.shape[-1]
    if not _on_tpu() or d % 128 != 0:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)

    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d)
    tile = _row_tiles(rows, d)
    grid = (pl.cdiv(rows, tile),)
    out = pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x2, weight)
    return out.reshape(*lead, d)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm over the last axis; fused Pallas kernel on TPU."""
    d = x.shape[-1]
    if not _on_tpu() or d % 128 != 0:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        return (xc * jax.lax.rsqrt(var + eps) * weight + bias).astype(x.dtype)

    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d)
    tile = _row_tiles(rows, d)
    grid = (pl.cdiv(rows, tile),)
    out = pl.pallas_call(
        functools.partial(_layernorm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x2, weight, bias)
    return out.reshape(*lead, d)
