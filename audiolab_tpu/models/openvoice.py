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
            # OpenVoice's flow couplings run 4 WN layers (VITS default;
            # openvoice_cli models.py:449 + modules.py WN) where RVC uses
            # 3 — verified against the actual openvoice_cli wheel
            # (tests/test_openvoice_wheel_parity.py)
            flow_layers=4,
        )


class ReferenceEncoder(nn.Module):
    """Linear spectrogram -> speaker embedding g, structured EXACTLY like
    openvoice ReferenceEncoder (openvoice_cli models.py:302-366) so the
    published converter.pth fills it: LayerNorm over spec bins, six
    weight-norm-able Conv2d(3x3, stride 2, pad 1) + relu, channel-major
    flatten, a one-layer GRU whose FINAL hidden state feeds proj."""

    gin_channels: int = 256
    spec_channels: int = 513

    @nn.compact
    def __call__(self, spec):
        # spec (b, t, spec_channels)
        h = nn.LayerNorm(epsilon=1e-5, name="layernorm")(spec)[..., None]
        for i, ch in enumerate((32, 32, 64, 64, 128, 128)):
            # torch Conv2d p=1 s=2: explicit padding (flax SAME at stride 2
            # is off by one on every output)
            h = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), name=f"conv_{i}")(h)
            h = nn.relu(h)
        b, t, f, ch = h.shape
        # torch transposes to (N, T, CH, F) then flattens channel-major
        h = h.transpose(0, 1, 3, 2).reshape(b, t, ch * f)
        cell = nn.GRUCell(128, param_dtype=h.dtype)
        final_state = nn.RNN(cell, return_carry=True, name="gru")(h)[0]
        # upstream returns the raw projection (api.py extract_se averages
        # raw embeddings over reference files; no L2 normalization)
        return nn.Dense(self.gin_channels, name="proj")(final_state)


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
        x = lrelu(x, 0.01)  # upstream Generator uses torch's default slope
        x = Conv1d(1, 7, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class ToneColorConverter(nn.Module):
    cfg: ToneColorConfig = ToneColorConfig()

    def setup(self):
        sc = self.cfg.synth_cfg()
        self.enc_q = PosteriorEncoder(sc, name="enc_q")
        self.flow = ResidualCouplingBlock(sc, name="flow")
        self.dec = HiFiGANGenerator(self.cfg, name="dec")
        self.ref_enc = ReferenceEncoder(self.cfg.gin_channels,
                                        self.cfg.spec_channels,
                                        name="ref_enc")

    def extract_se(self, spec):
        """Reference linear spectrogram (b, t, bins) -> embedding (b, gin)
        (openvoice extracts SE from the spectrogram, not mel)."""
        return self.ref_enc(spec)

    def convert(self, spec, spec_lengths, g_src, g_tgt, rng=None):
        """Linear spec (b, t, bins) -> converted waveform (b, t*hop)."""
        g_s = g_src[:, None, :]
        g_t = g_tgt[:, None, :]
        z, _, _, y_mask = self.enc_q(spec, spec_lengths, g=g_s, rng=rng)
        z_p = self.flow(z, y_mask, g=g_s)
        z_hat = self.flow(z_p, y_mask, g=g_t, reverse=True)
        return self.dec(z_hat * y_mask, g=g_tgt)

    def __call__(self, spec, spec_lengths, ref_spec_src, ref_spec_tgt,
                 rng=None):
        g_src = self.extract_se(ref_spec_src)
        g_tgt = self.extract_se(ref_spec_tgt)
        return self.convert(spec, spec_lengths, g_src, g_tgt, rng)
