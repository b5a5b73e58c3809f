"""Diffusion transformer (DiT) backbone — shared by Stable Audio and
ACE-Step.

Reference architectures: Stability's stable-audio DiT (used through
stable_audio_tools, modules/stable_audio/model.py:63-114) and ACE-Step's
linear-attention DiT (modules/acestep/acestep/models/ace_step_transformer.py:568).
Both are the same TPU compute pattern: token stream of latent frames,
AdaLN(-zero) timestep modulation, cross-attention over text conditioning,
big matmuls in bf16 on the MXU.

One implementation here, configured per model; flash attention via the
Pallas kernel for self-attention over long latent sequences."""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.attention import attention_reference, flash_attention
from audiolab_tpu.models.lm import apply_rope, rope_freqs, LMConfig


@dataclass(frozen=True)
class DiTConfig:
    dim: int = 1024
    n_layers: int = 16
    n_heads: int = 16
    cond_dim: int = 768          # cross-attention context width
    in_dim: int = 64             # latent channels
    out_dim: int = 64
    mlp_ratio: int = 4
    dtype: str = "bfloat16"


def timestep_embedding(t: jnp.ndarray, dim: int = 256) -> jnp.ndarray:
    """Sinusoidal (b,) -> (b, dim)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :] * 1000.0
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class AdaLNModulation(nn.Module):
    dim: int
    n_params: int = 6

    @nn.compact
    def __call__(self, c):
        # zero-init so each block starts as identity (AdaLN-zero)
        h = nn.Dense(self.n_params * self.dim, kernel_init=nn.initializers.zeros,
                     name="mod")(nn.silu(c))
        return jnp.split(h[:, None, :], self.n_params, axis=-1)


def modulate(x, shift, scale):
    return x * (1.0 + scale) + shift


class DiTBlock(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t_emb, context=None, context_mask=None):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        hd = c.dim // c.n_heads
        b, tlen, _ = x.shape

        sh1, sc1, g1, sh2, sc2, g2 = AdaLNModulation(c.dim, 6, name="adaln")(t_emb)

        # self-attention
        h = modulate(nn.LayerNorm(use_bias=False, use_scale=False, name="ln1")(x),
                     sh1, sc1)
        q = nn.Dense(c.dim, use_bias=False, dtype=dt, name="wq")(h).reshape(
            b, tlen, c.n_heads, hd)
        k = nn.Dense(c.dim, use_bias=False, dtype=dt, name="wk")(h).reshape(
            b, tlen, c.n_heads, hd)
        v = nn.Dense(c.dim, use_bias=False, dtype=dt, name="wv")(h).reshape(
            b, tlen, c.n_heads, hd)
        freqs = jnp.asarray(rope_freqs(LMConfig(dim=c.dim, n_heads=c.n_heads)))
        pos = jnp.arange(tlen)
        q, k = apply_rope(q, pos, freqs), apply_rope(k, pos, freqs)
        o = flash_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
        )
        o = nn.Dense(c.dim, use_bias=False, dtype=dt, name="wo")(
            jnp.swapaxes(o, 1, 2).reshape(b, tlen, c.dim))
        x = x + g1 * o

        # cross-attention over conditioning context
        if context is not None:
            hx = nn.LayerNorm(name="lnx")(x)
            qx = nn.Dense(c.dim, use_bias=False, dtype=dt, name="xq")(hx).reshape(
                b, tlen, c.n_heads, hd)
            kx = nn.Dense(c.dim, use_bias=False, dtype=dt, name="xk")(context).reshape(
                b, context.shape[1], c.n_heads, hd)
            vx = nn.Dense(c.dim, use_bias=False, dtype=dt, name="xv")(context).reshape(
                b, context.shape[1], c.n_heads, hd)
            mask = (context_mask[:, None, None, :] if context_mask is not None
                    else None)
            ox = attention_reference(
                jnp.swapaxes(qx, 1, 2), jnp.swapaxes(kx, 1, 2),
                jnp.swapaxes(vx, 1, 2), mask=mask,
            )
            x = x + nn.Dense(c.dim, use_bias=False, dtype=dt, name="xo")(
                jnp.swapaxes(ox, 1, 2).reshape(b, tlen, c.dim))

        # MLP
        h = modulate(nn.LayerNorm(use_bias=False, use_scale=False, name="ln2")(x),
                     sh2, sc2)
        h = nn.Dense(c.dim * c.mlp_ratio, dtype=dt, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(c.dim, dtype=dt, name="fc2")(h)
        return x + g2 * h


class DiT(nn.Module):
    """(latents (b,t,in_dim), t (b,), context (b,s,cond_dim)) -> (b,t,out_dim)."""

    cfg: DiTConfig = DiTConfig()

    @nn.compact
    def __call__(self, x, t, context=None, context_mask=None, global_cond=None,
                 return_hidden_at=None):
        """``return_hidden_at=k`` additionally returns the hidden states
        after block k (the ACE-Step SSL projection tap,
        ace_step_transformer.py:478-481)."""
        c = self.cfg
        h = nn.Dense(c.dim, name="proj_in")(x)
        t_emb = nn.Dense(c.dim, name="t1")(timestep_embedding(t))
        t_emb = nn.Dense(c.dim, name="t2")(nn.silu(t_emb))
        if global_cond is not None:
            t_emb = t_emb + nn.Dense(c.dim, name="gc")(global_cond)
        ctx = None
        if context is not None:
            ctx = nn.Dense(c.dim, name="ctx_proj")(context)
        inner = None
        for i in range(c.n_layers):
            h = DiTBlock(c, name=f"block_{i}")(h, t_emb, ctx, context_mask)
            if return_hidden_at is not None and i == return_hidden_at:
                inner = h
        sh, sc = AdaLNModulation(c.dim, 2, name="final_adaln")(t_emb)
        h = modulate(nn.LayerNorm(use_bias=False, use_scale=False, name="final_ln")(h),
                     sh, sc)
        out = nn.Dense(c.out_dim, kernel_init=nn.initializers.zeros,
                       name="proj_out")(h)
        if return_hidden_at is not None:
            return out, inner
        return out
