"""Stable-Audio-Open DiT, checkpoint-faithful (reference loads the
published model via stable_audio_tools; structure read from the wheel the
reference ships: stable_audio_tools/models/{dit.py,transformer.py}).

Geometry of stable-audio-open-1.0: io 64 latent channels, embed 1536,
depth 24, 24 heads x 64, T5 cross tokens 768-wide (project_cond_tokens
false -> the cross K/V stay 768 = 12 heads, GQA-repeated to 24), global
cond (seconds embeds) 1536 projected + timestep Fourier embedding, both
PREPENDED as one token (global_cond_type "prepend" — no per-block adaLN).
Self-attention uses PARTIAL rotary: only the first 32 of 64 head dims
rotate, split-half convention; cross-attention has no rotary.  LayerNorms
are gamma-only (beta is a buffer), FF is a SiLU-GLU, attention/FF output
projections are zero-init.

TPU notes: one jitted denoise step, CFG double-batch outside; attention
shapes (24 heads x 64) tile the MXU; rotary tables are fp32 constants.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SAODiTConfig:
    io_channels: int = 64
    embed_dim: int = 1536
    depth: int = 24
    num_heads: int = 24
    cond_token_dim: int = 768
    global_cond_dim: int = 1536
    dtype: str = "float32"

    @property
    def dim_heads(self) -> int:
        return self.embed_dim // self.num_heads


def _partial_rope(x: jnp.ndarray, seq_offset: int = 0) -> jnp.ndarray:
    """Rotate the first rot_dim dims of each head, split-half convention
    (x-transformers rotate_half); rot_dim = 2*max(dim_heads//2, 32)//2*2 ==
    2*max(hd//2,32) capped at hd.  For hd=64 this rotates 32 dims."""
    hd = x.shape[-1]
    rot = min(hd, 2 * max(hd // 4, 16))  # RotaryEmbedding(max(hd//2,32))
    t = x.shape[-2]
    half = rot // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, rot, 2, dtype=np.float32) / rot))
    pos = jnp.arange(t) + seq_offset
    ang = pos[:, None].astype(jnp.float32) * inv[None, :]  # (t, rot/2)
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
    xr, xu = x[..., :rot], x[..., rot:]
    x1, x2 = xr[..., :half], xr[..., half:]
    rot_half = jnp.concatenate([-x2, x1], axis=-1)
    xr = (xr.astype(jnp.float32) * cos[None, None]
          + rot_half.astype(jnp.float32) * sin[None, None]).astype(x.dtype)
    return jnp.concatenate([xr, xu], axis=-1)


class GammaLN(nn.Module):
    """LayerNorm with learned scale only (transformer.py:215-240)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=True,
                            name="ln")(x)


class SAOSelfAttention(nn.Module):
    cfg: SAODiTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, t, _ = x.shape
        hd = c.dim_heads
        qkv = nn.Dense(3 * c.embed_dim, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, c.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, c.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, c.num_heads, hd).transpose(0, 2, 1, 3)
        q, k = _partial_rope(q), _partial_rope(k)
        from audiolab_tpu.kernels.attention import flash_attention

        o = flash_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim)
        return nn.Dense(c.embed_dim, use_bias=False, name="to_out")(o)


class SAOCrossAttention(nn.Module):
    cfg: SAODiTConfig

    @nn.compact
    def __call__(self, x, ctx):
        c = self.cfg
        b, t, _ = x.shape
        s = ctx.shape[1]
        hd = c.dim_heads
        kv_heads = c.cond_token_dim // hd
        q = nn.Dense(c.embed_dim, use_bias=False, name="to_q")(x)
        kv = nn.Dense(2 * c.cond_token_dim, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, t, c.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, kv_heads, hd).transpose(0, 2, 1, 3)
        rep = c.num_heads // kv_heads
        if rep > 1:
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        from audiolab_tpu.kernels.attention import attention_reference

        o = attention_reference(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim)
        return nn.Dense(c.embed_dim, use_bias=False, name="to_out")(o)


class SAOFeedForward(nn.Module):
    """SiLU-GLU: proj to 2*inner, x*silu(gate), out (transformer.py GLU)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(2 * inner, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.dim, name="out")(a * nn.silu(gate))


class SAOBlock(nn.Module):
    cfg: SAODiTConfig

    @nn.compact
    def __call__(self, x, ctx):
        c = self.cfg
        x = x + SAOSelfAttention(c, name="self_attn")(
            GammaLN(name="pre_norm")(x))
        x = x + SAOCrossAttention(c, name="cross_attn")(
            GammaLN(name="cross_attend_norm")(x), ctx)
        x = x + SAOFeedForward(c.embed_dim, name="ff")(
            GammaLN(name="ff_norm")(x))
        return x


class StableAudioDiT(nn.Module):
    """v-prediction denoiser: (latents (b,t,64), t (b,), cross tokens
    (b,s,768), global cond (b,1536)) -> (b,t,64)."""

    cfg: SAODiTConfig = SAODiTConfig()

    @nn.compact
    def __call__(self, x, t, cross_cond, global_cond):
        c = self.cfg
        # Fourier timestep features (blocks.py:85-94): weight (128, 1)
        w = self.param("timestep_w", nn.initializers.normal(1.0), (128, 1))
        f = 2.0 * np.pi * t[:, None] * w[None, :, 0]
        tf = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)  # (b, 256)
        temb = nn.Dense(c.embed_dim, name="t1")(tf)
        temb = nn.Dense(c.embed_dim, name="t2")(nn.silu(temb))

        ctx = nn.Dense(c.cond_token_dim, use_bias=False, name="c1")(cross_cond)
        ctx = nn.Dense(c.cond_token_dim, use_bias=False, name="c2")(
            nn.silu(ctx))
        g = nn.Dense(c.embed_dim, use_bias=False, name="g1")(global_cond)
        g = nn.Dense(c.embed_dim, use_bias=False, name="g2")(nn.silu(g))
        g = g + temb  # timestep is a global embedding (dit.py:170-176)

        # zero-init residual 1x1 pre-conv (dit.py:120-123)
        x = x + nn.Dense(c.io_channels, use_bias=False,
                         kernel_init=nn.initializers.zeros,
                         name="preprocess_conv")(x)
        h = nn.Dense(c.embed_dim, use_bias=False, name="project_in")(x)
        h = jnp.concatenate([g[:, None, :], h], axis=1)  # prepend token
        for i in range(c.depth):
            h = SAOBlock(c, name=f"layer_{i}")(h, ctx)
        h = h[:, 1:]  # drop the prepend token
        out = nn.Dense(c.io_channels, use_bias=False, name="project_out")(h)
        return out + nn.Dense(c.io_channels, use_bias=False,
                              kernel_init=nn.initializers.zeros,
                              name="postprocess_conv")(out)


# --------------------------------------------------------- Oobleck VAE dec

@dataclass(frozen=True)
class OobleckConfig:
    """stable-audio-open-1.0 decoder geometry (autoencoders.py:316-358)."""

    out_channels: int = 2
    channels: int = 128
    latent_dim: int = 64
    c_mults: tuple = (1, 2, 4, 8, 16)
    strides: tuple = (2, 4, 4, 8, 8)
    final_tanh: bool = False


class SnakeBeta(nn.Module):
    """x + sin^2(exp(a)*x)/(exp(b)+eps), log-scale alphas (blocks.py:301)."""

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        a = self.param("alpha", nn.initializers.zeros, (d,))
        b = self.param("beta", nn.initializers.zeros, (d,))
        xf = x.astype(jnp.float32)
        ea, eb = jnp.exp(a), jnp.exp(b)
        return (xf + jnp.sin(ea * xf) ** 2 / (eb + 1e-9)).astype(x.dtype)


class _OobResUnit(nn.Module):
    ch: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = SnakeBeta(name="s1")(x)
        h = nn.Conv(self.ch, (7,), kernel_dilation=(self.dilation,),
                    padding="SAME", name="c1")(h)
        h = SnakeBeta(name="s2")(h)
        h = nn.Conv(self.ch, (1,), name="c2")(h)
        return x + h


class OobleckDecoder(nn.Module):
    """(b, t, latent) -> (b, out_channels, t*prod(strides))."""

    cfg: OobleckConfig = OobleckConfig()

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        mults = (1,) + tuple(c.c_mults)
        h = nn.Conv(mults[-1] * c.channels, (7,), padding="SAME",
                    name="conv_in")(z)
        n_blocks = len(mults) - 1
        for bi, i in enumerate(range(n_blocks, 0, -1)):
            ch_out = mults[i - 1] * c.channels
            s = c.strides[i - 1]
            h = SnakeBeta(name=f"up_snake_{bi}")(h)
            h = nn.ConvTranspose(ch_out, (2 * s,), strides=(s,),
                                 padding="SAME", name=f"up_{bi}")(h)
            for j, d in enumerate((1, 3, 9)):
                h = _OobResUnit(ch_out, d, name=f"res_{bi}_{j}")(h)
        h = SnakeBeta(name="snake_out")(h)
        h = nn.Conv(c.out_channels, (7,), padding="SAME", use_bias=False,
                    name="conv_out")(h)
        if c.final_tanh:
            h = jnp.tanh(h)
        return jnp.swapaxes(h, 1, 2)  # (b, out_ch, n)
