"""AudioSR's 48 kHz HiFi-GAN vocoder, checkpoint-layout faithful
(vendored source: the audiosr wheel's hifigan/models_v2.py:154-230 at the
config of utilities/model.py get_vocoder_config_48k): 256-bin mel ->
waveform at 480x upsample (rates 6·5·4·2·2, 1536 initial channels, FOUR
MRF kernels 3/7/11/15).

The odd stride-5 stage uses torch ConvTranspose1d(k=2u, p=u//2+u%2,
output_padding=u%2); the general flax correspondence — padding
(k-1-p, k-1-p+op) with a spatially flipped kernel — covers it without a
manual dilate+pad fallback (validated against the wheel oracle in
tests/test_sao_parity.py).

This is the final mel->audio stage of the reference's AudioSR super-res
wrapper (wrappers/super_res.py); the latent-diffusion UNet/VAE remain a
documented cut.  Conversion: utils/convert.convert_audiosr_vocoder.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _HifiResBlock(nn.Module):
    """models_v2 ResBlock1: [lrelu(0.1)->dilated conv->lrelu(0.1)->conv]x3."""

    ch: int
    kernel: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, 0.1)
            h = nn.Conv(self.ch, (self.kernel,), kernel_dilation=(d,),
                        padding="SAME", name=f"c1_{j}")(h)
            h = nn.leaky_relu(h, 0.1)
            h = nn.Conv(self.ch, (self.kernel,), padding="SAME",
                        name=f"c2_{j}")(h)
            x = x + h
        return x


class AudioSRVocoder(nn.Module):
    """mel (b, t, num_mels) -> waveform (b, t * prod(rates)) @ 48 kHz."""

    num_mels: int = 256
    initial_channel: int = 1536
    upsample_rates: Sequence[int] = (6, 5, 4, 2, 2)
    resblock_kernels: Sequence[int] = (3, 7, 11, 15)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 4

    @nn.compact
    def __call__(self, mel):
        x = nn.Conv(self.initial_channel, (7,), padding="SAME",
                    name="conv_pre")(mel)
        ch = self.initial_channel
        for i, u in enumerate(self.upsample_rates):
            ch //= 2
            x = nn.leaky_relu(x, 0.1)
            k = 2 * u
            p = u // 2 + u % 2
            op = u % 2
            x = nn.ConvTranspose(
                ch, (k,), strides=(u,),
                padding=((k - 1 - p, k - 1 - p + op),), name=f"up_{i}")(x)
            xs = 0.0
            for j, (rk, rd) in enumerate(zip(self.resblock_kernels,
                                             self.resblock_dilations)):
                xs = xs + _HifiResBlock(ch, rk, tuple(rd),
                                        name=f"res_{i}_{j}")(x)
            x = xs / len(self.resblock_kernels)
        x = nn.leaky_relu(x, 0.01)  # F.leaky_relu default slope
        x = nn.Conv(1, (7,), padding="SAME", name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
