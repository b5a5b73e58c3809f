"""Selective-state-space (Mamba-style) scan + causal conv for TPU.

Replaces the reference's mamba_ssm + causal_conv1d CUDA kernels used by the
Zonos backbone (modules/zonos/backbone.py:4-6; SURVEY §2.5 lists this as a
required first-class kernel).  The recurrence

    h_t = exp(Δ_t A) ⊙ h_{t-1} + Δ_t B_t x_t,    y_t = C_t · h_t + D x_t

is log-depth parallelized with ``jax.lax.associative_scan`` — XLA maps the
combine (elementwise mul/FMA over (B, d_inner, d_state) panels) onto the VPU
with full fusion, which is the TPU-idiomatic equivalent of the CUDA selective
scan.  A sequential ``lax.scan`` step (``ssm_step``) serves autoregressive
decode with a carried state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def selective_scan(
    u: jnp.ndarray,       # (b, t, d_inner)
    delta: jnp.ndarray,   # (b, t, d_inner)
    a: jnp.ndarray,       # (d_inner, d_state)  (negative real, pre-log'd outside)
    b: jnp.ndarray,       # (b, t, d_state)
    c: jnp.ndarray,       # (b, t, d_state)
    d: jnp.ndarray,       # (d_inner,)
) -> jnp.ndarray:
    """Full-sequence selective scan -> (b, t, d_inner)."""
    da = jnp.exp(delta[..., None] * a[None, None])           # (b,t,d,n)
    dbu = (delta * u)[..., None] * b[:, :, None, :]          # (b,t,d,n)

    def combine(x, y):
        a1, s1 = x
        a2, s2 = y
        return a1 * a2, s1 * a2 + s2

    _, h = jax.lax.associative_scan(combine, (da, dbu), axis=1)
    y = jnp.einsum("btdn,btn->btd", h, c)
    return y + u * d[None, None, :]


def ssm_step(
    h: jnp.ndarray,       # (b, d_inner, d_state) carried state
    u_t: jnp.ndarray,     # (b, d_inner)
    delta_t: jnp.ndarray, # (b, d_inner)
    a: jnp.ndarray,       # (d_inner, d_state)
    b_t: jnp.ndarray,     # (b, d_state)
    c_t: jnp.ndarray,     # (b, d_state)
    d: jnp.ndarray,       # (d_inner,)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One decode step; returns (new_state, y_t)."""
    da = jnp.exp(delta_t[..., None] * a[None])               # (b,d,n)
    dbu = (delta_t * u_t)[..., None] * b_t[:, None, :]
    h = h * da + dbu
    y = jnp.einsum("bdn,bn->bd", h, c_t) + u_t * d[None]
    return h, y


def causal_conv1d(
    x: jnp.ndarray,       # (b, t, channels)
    weight: jnp.ndarray,  # (kernel, channels) depthwise
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Depthwise causal conv (causal_conv1d CUDA equivalent)."""
    k = weight.shape[0]
    xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xp,
        weight[:, None, :],  # (k, 1, c) HIO for depthwise
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1],
    )
    if bias is not None:
        out = out + bias
    return out


def causal_conv1d_step(
    cache: jnp.ndarray,   # (b, kernel-1, channels) trailing context
    x_t: jnp.ndarray,     # (b, channels)
    weight: jnp.ndarray,  # (kernel, channels)
    bias: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-token causal conv with rolled cache (decode path)."""
    window = jnp.concatenate([cache, x_t[:, None, :]], axis=1)  # (b, k, c)
    y = jnp.einsum("bkc,kc->bc", window, weight)
    if bias is not None:
        y = y + bias
    return window[:, 1:, :], y
