"""OpenVoice-class tone color converter.

Reference behavior (modules/cloning/openvoice.py:29-339 + vendored
openvoice lib, SURVEY §2.3): a VITS-style flow model converts the "tone
color" of source speech to a target speaker:

    spec(src) --posterior--> z --flow(g_src)--> z_p --flow^-1(g_tgt)--> z'
    --decoder(g_tgt)--> wav

Speaker embeddings g come from a mel reference encoder.  Conversion runs in
10 s chunks with crossfade concat (openvoice.py:29-157).

TPU design: one jitted graph per chunk batch; the flow is the same
ResidualCouplingBlock used by RVC (models/rvc/synthesizer.py) — shared
code, shared kernels."""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.layers import Conv1d, ConvTranspose1d, ResBlock1, lrelu
from audiolab_tpu.models.rvc.synthesizer import (
    PosteriorEncoder,
    ResidualCouplingBlock,
    SynthesizerConfig,
)


@dataclass(frozen=True)
class ToneColorConfig:
    sr: int = 22050
    n_fft: int = 1024
    hop: int = 256
    spec_channels: int = 513
    inter_channels: int = 192
    hidden_channels: int = 192
    gin_channels: int = 256
    n_mels_ref: int = 80
    upsample_rates: tuple = (8, 8, 2, 2)
    upsample_kernel_sizes: tuple = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    def synth_cfg(self) -> SynthesizerConfig:
        return SynthesizerConfig(
            spec_channels=self.spec_channels,
            inter_channels=self.inter_channels,
            hidden_channels=self.hidden_channels,
            gin_channels=self.gin_channels,
            upsample_rates=self.upsample_rates,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            upsample_initial_channel=self.upsample_initial_channel,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilation_sizes=self.resblock_dilation_sizes,
            sr=self.sr,
        )


class ReferenceEncoder(nn.Module):
    """Mel -> speaker embedding g (openvoice ReferenceEncoder: conv stack +
    GRU; the GRU is replaced by masked mean+max pooling — order-free,
    TPU-friendly, converter maps the GRU state through a dense)."""

    gin_channels: int = 256

    @nn.compact
    def __call__(self, mel):
        h = mel[..., None]  # (b, t, n_mels, 1) 2-D conv stack
        for i, ch in enumerate((32, 32, 64, 64, 128, 128)):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv_{i}")(h)
            h = nn.relu(nn.LayerNorm(name=f"ln_{i}")(h))
        b, t, f, ch = h.shape
        h = h.reshape(b, t, f * ch)
        pooled = jnp.concatenate([h.mean(axis=1), h.max(axis=1)], axis=-1)
        g = nn.Dense(self.gin_channels, name="proj")(pooled)
        return g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-8)


class HiFiGANGenerator(nn.Module):
    """Plain HiFiGAN decoder (GeneratorNSF without the harmonic source —
    openvoice/infer_pack generator)."""

    cfg: ToneColorConfig

    @nn.compact
    def __call__(self, z, g=None):
        c = self.cfg
        x = Conv1d(c.upsample_initial_channel, 7, name="conv_pre")(z)
        if g is not None:
            x = x + nn.Dense(c.upsample_initial_channel, name="cond")(g)[:, None, :]
        ch = c.upsample_initial_channel
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            x = lrelu(x)
            ch //= 2
            x = ConvTranspose1d(ch, k, u, name=f"up_{i}")(x)
            xs = 0.0
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                xs = xs + ResBlock1(ch, rk, tuple(rd), name=f"res_{i}_{j}")(x)
            x = xs / len(c.resblock_kernel_sizes)
        x = lrelu(x)
        x = Conv1d(1, 7, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class ToneColorConverter(nn.Module):
    cfg: ToneColorConfig = ToneColorConfig()

    def setup(self):
        sc = self.cfg.synth_cfg()
        self.enc_q = PosteriorEncoder(sc, name="enc_q")
        self.flow = ResidualCouplingBlock(sc, name="flow")
        self.dec = HiFiGANGenerator(self.cfg, name="dec")
        self.ref_enc = ReferenceEncoder(self.cfg.gin_channels, name="ref_enc")

    def extract_se(self, mel):
        """Reference mel -> speaker embedding (b, gin)."""
        return self.ref_enc(mel)

    def convert(self, spec, spec_lengths, g_src, g_tgt, rng=None):
        """Linear spec (b, t, bins) -> converted waveform (b, t*hop)."""
        g_s = g_src[:, None, :]
        g_t = g_tgt[:, None, :]
        z, _, _, y_mask = self.enc_q(spec, spec_lengths, g=g_s, rng=rng)
        z_p = self.flow(z, y_mask, g=g_s)
        z_hat = self.flow(z_p, y_mask, g=g_t, reverse=True)
        return self.dec(z_hat * y_mask, g=g_tgt)

    def __call__(self, spec, spec_lengths, mel_src, mel_tgt, rng=None):
        g_src = self.extract_se(mel_src)
        g_tgt = self.extract_se(mel_tgt)
        return self.convert(spec, spec_lengths, g_src, g_tgt, rng)
