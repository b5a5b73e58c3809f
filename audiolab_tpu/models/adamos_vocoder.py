"""ADaMoS HiFiGAN V1 — ACE-Step's 44.1 kHz mel vocoder, checkpoint-layout
faithful (vendored source: modules/acestep/acestep/music_dcae/
music_vocoder.py).

Structure: a ConvNeXt backbone lifts 128-bin log-mels to 512 channels
(stem conv with REPLICATE padding + channels-first LayerNorms, stages of
depthwise-conv ConvNeXt blocks with layer-scale gamma), then a SiLU
HiFiGAN head (weight-normed conv_pre, ConvTranspose upsamplers, SiLU
ResBlock1s averaged per stage, SiLU + conv_post + tanh).

Beyond ACE-Step this is a general high-quality mel->audio vocoder; the
converter (utils/convert.convert_adamos) fills it from the published
diffusion checkpoint's vocoder weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class AdamosConfig:
    input_channels: int = 128
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (128, 256, 384, 512)
    kernel_size: int = 7
    upsample_rates: Sequence[int] = (4, 4, 2, 2, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (8, 8, 4, 4, 4, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11, 13)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 4
    num_mels: int = 512             # head input width (backbone output)
    upsample_initial_channel: int = 1024
    pre_conv_kernel_size: int = 13
    post_conv_kernel_size: int = 13


class _CNBlock(nn.Module):
    dim: int
    kernel: int

    @nn.compact
    def __call__(self, x):  # (b, t, c)
        h = nn.Conv(self.dim, (self.kernel,), padding="SAME",
                    feature_group_count=self.dim, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,))
        return x + gamma * h


class ConvNeXtBackbone(nn.Module):
    cfg: AdamosConfig

    @nn.compact
    def __call__(self, mel):  # (b, t, input_channels) -> (b, t, dims[-1])
        c = self.cfg
        # stem: replicate-padded conv + LayerNorm
        pad = 3
        x = jnp.pad(mel, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        x = nn.Conv(c.dims[0], (7,), padding="VALID", name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        for j in range(c.depths[0]):
            x = _CNBlock(c.dims[0], c.kernel_size, name=f"stage_0_{j}")(x)
        for i in range(1, len(c.depths)):
            x = nn.LayerNorm(epsilon=1e-6, name=f"mid_norm_{i}")(x)
            x = nn.Dense(c.dims[i], name=f"mid_proj_{i}")(x)
            for j in range(c.depths[i]):
                x = _CNBlock(c.dims[i], c.kernel_size,
                             name=f"stage_{i}_{j}")(x)
        return nn.LayerNorm(epsilon=1e-6, name="final_norm")(x)


class _SiLUResBlock(nn.Module):
    ch: int
    kernel: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dilations):
            h = nn.silu(x)
            h = nn.Conv(self.ch, (self.kernel,), kernel_dilation=(d,),
                        padding="SAME", name=f"c1_{j}")(h)
            h = nn.silu(h)
            h = nn.Conv(self.ch, (self.kernel,), padding="SAME",
                        name=f"c2_{j}")(h)
            x = x + h
        return x


class AdamosHead(nn.Module):
    cfg: AdamosConfig

    @nn.compact
    def __call__(self, x):  # (b, t, num_mels) -> (b, t*hop)
        c = self.cfg
        x = nn.Conv(c.upsample_initial_channel, (c.pre_conv_kernel_size,),
                    padding="SAME", name="conv_pre")(x)
        ch = c.upsample_initial_channel
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            ch //= 2
            x = nn.silu(x)
            # torch ConvT p=(k-u)//2: for k=2u this is flax SAME+flip
            # (validated for the DAC family); k=4,u=2 -> p=1 == same rule
            x = nn.ConvTranspose(ch, (k,), strides=(u,), padding="SAME",
                                 name=f"up_{i}")(x)
            xs = 0.0
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                xs = xs + _SiLUResBlock(ch, rk, tuple(rd),
                                        name=f"res_{i}_{j}")(x)
            x = xs / len(c.resblock_kernel_sizes)
        x = nn.silu(x)
        x = nn.Conv(1, (c.post_conv_kernel_size,), padding="SAME",
                    name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class AdamosVocoder(nn.Module):
    """log-mel (b, t, 128) -> waveform (b, t*512) at 44.1 kHz."""

    cfg: AdamosConfig = AdamosConfig()

    def setup(self):
        self.backbone = ConvNeXtBackbone(self.cfg, name="backbone")
        self.head = AdamosHead(self.cfg, name="head")

    def __call__(self, mel):
        return self.head(self.backbone(mel))
