"""AudioSR's latent-diffusion UNet, checkpoint-layout faithful (vendored
source: the audiosr wheel's diffusionmodules/openaimodel.py:446-880 +
attention.py:326-475, at the shipped basic config utils.py:470-482:
in 32 (16 noisy + 16 lowpass-VAE concat), model 128, mult (1,2,3,5),
2 res blocks/level, self-attention (SpatialTransformer pairs — the
extra_sa layer plus the context_dim=None slot, BOTH pure self-attention
in this model) at downsample rates 2/4/8, head dim 32, v-prediction).

With models/audiosr_vae.py and models/audiosr_vocoder.py this completes
the AudioSR family: lowpass fbank -> VAE-encode -> concat -> UNet DDIM
denoise -> VAE-decode -> 48 kHz vocoder.  Conversion:
utils/convert.convert_audiosr_unet.

``unet_layer_schedule`` enumerates the torch Sequential indices so the
flax module names and the converter mapping are generated from ONE
source of truth.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AudioSRUNetConfig:
    in_channels: int = 32
    model_channels: int = 128
    out_channels: int = 16
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8, 4, 2)
    channel_mult: Sequence[int] = (1, 2, 3, 5)
    num_head_channels: int = 32


def unet_layer_schedule(cfg: AudioSRUNetConfig):
    """Returns (input_blocks, middle, output_blocks): lists of blocks,
    each block a list of (kind, params) matching torch Sequential order.
    kind: conv_in | res | attn | down | up."""
    mc = cfg.model_channels
    inputs = [[("conv_in", dict(out=mc))]]
    chans = [mc]
    ch, ds = mc, 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            block = [("res", dict(inp=ch, out=mult * mc))]
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                block += [("attn", dict(ch=ch)), ("attn", dict(ch=ch))]
            inputs.append(block)
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            inputs.append([("down", dict(ch=ch))])
            chans.append(ch)
            ds *= 2
    middle = [("res", dict(inp=ch, out=ch)), ("attn", dict(ch=ch)),
              ("attn", dict(ch=ch)), ("res", dict(inp=ch, out=ch))]
    outputs = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            block = [("res", dict(inp=ch + ich, out=mult * mc))]
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                block += [("attn", dict(ch=ch)), ("attn", dict(ch=ch))]
            if level and i == cfg.num_res_blocks:
                block.append(("up", dict(ch=ch)))
                ds //= 2
            outputs.append(block)
    return inputs, middle, outputs


def _gn(x, name, eps):
    # upstream GroupNorm32 computes in fp32 — match when x is bf16
    dt = jnp.promote_types(x.dtype, jnp.float32)
    return nn.GroupNorm(num_groups=32, epsilon=eps, dtype=dt,
                        name=name)(x.astype(dt)).astype(x.dtype)


class _UNetResBlock(nn.Module):
    """openaimodel ResBlock (use_scale_shift_norm=False): GN(1e-5)-silu-
    conv3 -> +emb -> GN-silu-conv3 (+1x1 skip)."""

    out_ch: int

    @nn.compact
    def __call__(self, x, emb):
        h = nn.silu(_gn(x, "norm_in", 1e-5))
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_in")(h)
        e = nn.Dense(self.out_ch, name="emb")(nn.silu(emb))
        h = h + e[:, None, None]
        h = nn.silu(_gn(h, "norm_out", 1e-5))
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_out")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="skip")(x)
        return x + h


class _UNetAttn(nn.Module):
    """SpatialTransformer depth-1 with context None: GN(1e-6) + 1x1
    proj_in -> [self-attn, self-attn(ctx slot), GEGLU ff] -> 1x1
    proj_out, residual (attention.py:326-475)."""

    heads: int

    def _xattn(self, x, nm):
        b, n, c = x.shape
        dk = c // self.heads
        q = nn.Dense(c, use_bias=False, name=f"{nm}_q")(x)
        k = nn.Dense(c, use_bias=False, name=f"{nm}_k")(x)
        v = nn.Dense(c, use_bias=False, name=f"{nm}_v")(x)
        q, k, v = (a.reshape(b, n, self.heads, dk).transpose(0, 2, 1, 3)
                   for a in (q, k, v))
        acc = jnp.promote_types(x.dtype, jnp.float32)
        w = jnp.einsum("bhid,bhjd->bhij", q.astype(acc), k.astype(acc))
        w = jax.nn.softmax(w * dk ** -0.5, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", w, v.astype(acc)).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name=f"{nm}_out")(o)

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _gn(x, "norm", 1e-6)
        h = nn.Conv(c, (1, 1), name="proj_in")(h).reshape(b, hh * ww, c)
        h = h + self._xattn(nn.LayerNorm(epsilon=1e-5, name="norm1")(h),
                            "attn1")
        h = h + self._xattn(nn.LayerNorm(epsilon=1e-5, name="norm2")(h),
                            "attn2")
        f = nn.LayerNorm(epsilon=1e-5, name="norm3")(h)
        f = nn.Dense(2 * 4 * c, name="ff0")(f)
        val, gate = jnp.split(f, 2, axis=-1)
        f = val * nn.gelu(gate, approximate=False)   # GEGLU, exact gelu
        h = h + nn.Dense(c, name="ff1")(f)
        h = nn.Conv(c, (1, 1), name="proj_out")(h.reshape(b, hh, ww, c))
        return x + h


class AudioSRUNet(nn.Module):
    """x (b, t', f', in_ch) NHWC latents + timesteps (b,) -> v-prediction
    (b, t', f', out_ch)."""

    cfg: AudioSRUNetConfig = AudioSRUNetConfig()

    @nn.compact
    def __call__(self, x, timesteps):
        c = self.cfg
        mc = c.model_channels
        half = mc // 2
        ft = jnp.result_type(0.0)
        freqs = jnp.exp(-math.log(10000.0)
                        * jnp.arange(half, dtype=ft) / half)
        ang = timesteps.astype(ft)[:, None] * freqs[None]
        t_emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        emb = nn.Dense(4 * mc, name="time_0")(t_emb.astype(x.dtype))
        emb = nn.Dense(4 * mc, name="time_2")(nn.silu(emb))

        inputs, middle, outputs = unet_layer_schedule(c)

        def run_block(h, block, prefix):
            for j, (kind, p) in enumerate(block):
                nm = f"{prefix}_{j}"
                if kind == "conv_in":
                    h = nn.Conv(p["out"], (3, 3), padding=((1, 1), (1, 1)),
                                name=nm)(h)
                elif kind == "res":
                    h = _UNetResBlock(p["out"], name=nm)(h, emb)
                elif kind == "attn":
                    h = _UNetAttn(p["ch"] // c.num_head_channels,
                                  name=nm)(h)
                elif kind == "down":
                    h = nn.Conv(p["ch"], (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)), name=nm)(h)
                elif kind == "up":
                    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                    h = nn.Conv(p["ch"], (3, 3), padding=((1, 1), (1, 1)),
                                name=nm)(h)
            return h

        hs = []
        h = x
        for i, block in enumerate(inputs):
            h = run_block(h, block, f"in_{i}")
            hs.append(h)
        h = run_block(h, middle, "mid")
        for i, block in enumerate(outputs):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = run_block(h, block, f"out_{i}")
        h = nn.silu(_gn(h, "norm_out", 1e-5))
        return nn.Conv(c.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_out")(h)
