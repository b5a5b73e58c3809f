"""AudioSR's mel VAE (stable-diffusion AutoencoderKL), checkpoint-layout
faithful (vendored source: the audiosr wheel's
latent_diffusion/modules/diffusionmodules/model.py:45-690 +
latent_encoder/autoencoder.py:16-120, at the shipped 48k config
utils.py get_basic_config: ch 128, ch_mult (1,2,4,8), 2 res blocks,
no per-level attention, mid-block vanilla attention, z 16, double_z).

fbank input is (b, t, mel, 1) NHWC (torch (b, 1, t, mel)); the 8x
downsample applies to BOTH time and mel (the shipped config ignores
``downsample_time``).  encode returns (mean, logvar) after quant_conv;
decode maps sampled latents through post_quant_conv.

The diffusion UNet and AudioMAE conditioner remain documented cuts — this
plus models/audiosr_vocoder.py covers AudioSR's full decode path
(latents -> mel -> 48 kHz audio).  Conversion:
utils/convert.convert_audiosr_vae.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _gn(x, name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)(x)


class _VAEResBlock(nn.Module):
    """model.py ResnetBlock (temb_ch=0): GN-silu-conv3 x2 + nin shortcut."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(_gn(x, "norm1"))
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(h)
        h = nn.silu(_gn(h, "norm2"))
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class _VAEAttn(nn.Module):
    """model.py AttnBlock: single-head 1x1-projected softmax attention
    over the (t, mel) grid, residual."""

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _gn(x, "norm")
        q = nn.Conv(c, (1, 1), name="q")(h).reshape(b, hh * ww, c)
        k = nn.Conv(c, (1, 1), name="k")(h).reshape(b, hh * ww, c)
        v = nn.Conv(c, (1, 1), name="v")(h).reshape(b, hh * ww, c)
        acc = jnp.promote_types(x.dtype, jnp.float32)
        w = jnp.einsum("bic,bjc->bij", q.astype(acc), k.astype(acc))
        w = jax.nn.softmax(w * c ** -0.5, axis=-1)
        o = jnp.einsum("bij,bjc->bic", w, v.astype(acc)).astype(x.dtype)
        o = nn.Conv(c, (1, 1), name="proj_out")(o.reshape(b, hh, ww, c))
        return x + o


class AudioSRVAEEncoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    z_channels: int = 16

    @nn.compact
    def __call__(self, x):  # (b, t, mel, 1) -> (b, t/8, mel/8, 2z)
        h = nn.Conv(self.ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_in")(x)
        for li, mult in enumerate(self.ch_mult):
            for bi in range(self.num_res_blocks):
                h = _VAEResBlock(self.ch * mult,
                                 name=f"down_{li}_{bi}")(h)
            if li != len(self.ch_mult) - 1:
                # torch asymmetric pad (0,1,0,1) + VALID stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            padding="VALID", name=f"down_{li}_ds")(h)
        h = _VAEResBlock(h.shape[-1], name="mid_1")(h)
        h = _VAEAttn(name="mid_attn")(h)
        h = _VAEResBlock(h.shape[-1], name="mid_2")(h)
        h = nn.silu(_gn(h, "norm_out"))
        return nn.Conv(2 * self.z_channels, (3, 3),
                       padding=((1, 1), (1, 1)), name="conv_out")(h)


class AudioSRVAEDecoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    out_ch: int = 1

    @nn.compact
    def __call__(self, z):  # (b, t/8, mel/8, z) -> (b, t, mel, out_ch)
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_in")(z)
        h = _VAEResBlock(block_in, name="mid_1")(h)
        h = _VAEAttn(name="mid_attn")(h)
        h = _VAEResBlock(block_in, name="mid_2")(h)
        for li in reversed(range(len(self.ch_mult))):
            for bi in range(self.num_res_blocks + 1):
                h = _VAEResBlock(self.ch * self.ch_mult[li],
                                 name=f"up_{li}_{bi}")(h)
            if li != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(h.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                            name=f"up_{li}_us")(h)
        h = nn.silu(_gn(h, "norm_out"))
        return nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_out")(h)


class AudioSRVAE(nn.Module):
    """AutoencoderKL: encode -> (mean, logvar) after quant_conv; decode
    samples through post_quant_conv (autoencoder.py:54-120)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    z_channels: int = 16
    embed_dim: int = 16

    def setup(self):
        self.encoder = AudioSRVAEEncoder(self.ch, self.ch_mult,
                                         self.num_res_blocks,
                                         self.z_channels, name="encoder")
        self.decoder = AudioSRVAEDecoder(self.ch, self.ch_mult,
                                         self.num_res_blocks, 1,
                                         name="decoder")
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, fbank):
        moments = self.quant_conv(self.encoder(fbank))
        return jnp.split(moments, 2, axis=-1)  # mean, logvar

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, fbank):
        mean, _ = self.encode(fbank)
        return self.decode(mean)
