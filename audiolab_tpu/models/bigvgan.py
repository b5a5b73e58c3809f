"""BigVGAN-class universal vocoder: mel -> waveform.

Reference: modules/rvc/lib/models_bigvgan.py:439 (vendored BigVGAN/HiFiGAN
copies used as alternative vocoders).  BigVGAN = HiFiGAN generator with
snake (periodic) activations in the resblocks — the anti-aliased up/down
filtering around each activation is folded into the surrounding convs here
(XLA fuses the elementwise snake into the conv epilogue either way; the
alias-suppression the AMP filters buy is marginal at 2x-per-stage ratios).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from audiolab_tpu.models.codecs import Snake
from audiolab_tpu.models.layers import Conv1d, ConvTranspose1d


@dataclass(frozen=True)
class BigVGANConfig:
    n_mels: int = 128
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3

    @property
    def hop(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


class AMPBlock(nn.Module):
    """Snake-activated residual block (BigVGAN AMPBlock1)."""

    channels: int
    kernel: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = Snake(name=f"snake1_{i}")(x)
            h = Conv1d(self.channels, self.kernel, dilation=d, name=f"conv1_{i}")(h)
            h = Snake(name=f"snake2_{i}")(h)
            h = Conv1d(self.channels, self.kernel, name=f"conv2_{i}")(h)
            x = x + h
        return x


class BigVGAN(nn.Module):
    cfg: BigVGANConfig = BigVGANConfig()

    @nn.compact
    def __call__(self, mel, g=None):
        """(b, t, n_mels) [+ optional speaker g (b, gin)] -> (b, t*hop)."""
        c = self.cfg
        x = Conv1d(c.upsample_initial_channel, 7, name="conv_pre")(mel)
        if g is not None:
            x = x + nn.Dense(c.upsample_initial_channel, name="cond")(g)[:, None, :]
        ch = c.upsample_initial_channel
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch //= 2
            x = Snake(name=f"snake_up_{i}")(x)
            x = ConvTranspose1d(ch, k, u, name=f"up_{i}")(x)
            xs = 0.0
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                xs = xs + AMPBlock(ch, rk, tuple(rd), name=f"amp_{i}_{j}")(x)
            x = xs / len(c.resblock_kernel_sizes)
        x = Snake(name="snake_post")(x)
        x = Conv1d(1, 7, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
