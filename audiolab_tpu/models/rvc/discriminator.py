"""RVC GAN discriminators in flax (reference:
modules/rvc/lib/discriminator.py — MultiPeriodDiscriminatorV2 with periods
[2,3,5,7,11,17,23,37] (:196) plus the scale discriminator DiscriminatorS).

NTC layout; weight-norm folded (see models/layers.py note).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from audiolab_tpu.models.layers import lrelu

V2_PERIODS = (2, 3, 5, 7, 11, 17, 23, 37)


class DiscriminatorP(nn.Module):
    """Period discriminator: fold time into (t/p, p) and run 2-D convs."""

    period: int

    @nn.compact
    def __call__(self, x):
        # x (b, n, 1)
        b, n, _ = x.shape
        p = self.period
        pad = (-n) % p
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect" if n > 1 else "constant")
        x = x.reshape(b, (n + pad) // p, p, 1)  # (b, t/p, p, 1) NHWC

        fmaps = []
        ch = 32
        for i in range(4):
            x = nn.Conv(ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)),
                        name=f"conv_{i}")(x)
            x = lrelu(x)
            fmaps.append(x)
            ch = min(ch * 4, 1024)
        x = nn.Conv(1024, (5, 1), padding=((2, 2), (0, 0)), name="conv_4")(x)
        x = lrelu(x)
        fmaps.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(b, -1), fmaps


class DiscriminatorS(nn.Module):
    """Scale discriminator: strided 1-D convs on the raw waveform."""

    @nn.compact
    def __call__(self, x):
        # x (b, n, 1)
        fmaps = []
        specs = [
            (16, 15, 1, 1),
            (64, 41, 4, 4),
            (256, 41, 4, 16),
            (1024, 41, 4, 64),
            (1024, 41, 4, 256),
            (1024, 5, 1, 1),
        ]
        for i, (ch, k, s, g) in enumerate(specs):
            x = nn.Conv(ch, (k,), strides=(s,), padding=[(k // 2, k // 2)],
                        feature_group_count=min(g, x.shape[-1]), name=f"conv_{i}")(x)
            x = lrelu(x)
            fmaps.append(x)
        x = nn.Conv(1, (3,), padding=[(1, 1)], name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(x.shape[0], -1), fmaps


class MultiPeriodDiscriminatorV2(nn.Module):
    periods: Sequence[int] = V2_PERIODS

    @nn.compact
    def __call__(self, y, y_hat):
        """Returns (real_outs, fake_outs, real_fmaps, fake_fmaps)."""
        if y.ndim == 2:
            y = y[..., None]
        if y_hat.ndim == 2:
            y_hat = y_hat[..., None]
        discs = [DiscriminatorS(name="disc_s")] + [
            DiscriminatorP(p, name=f"disc_p{p}") for p in self.periods
        ]
        r_outs, f_outs, r_fmaps, f_fmaps = [], [], [], []
        for d in discs:
            ro, rf = d(y)
            fo, ff = d(y_hat)
            r_outs.append(ro)
            f_outs.append(fo)
            r_fmaps.append(rf)
            f_fmaps.append(ff)
        return r_outs, f_outs, r_fmaps, f_fmaps
