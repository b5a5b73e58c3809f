"""RVC VITS-style synthesizer with NSF-HiFiGAN decoder, in flax.

Functional re-implementation of SynthesizerTrnMs256/768NSFsid(_nono)
(reference: modules/rvc/infer/lib/infer_pack/models.py:20-1052):

  TextEncoder        feature+pitch embed -> rel-attn transformer -> (m, logs)
  ResidualCouplingBlock   4 mean-only coupling flows (+Flip)
  PosteriorEncoder   lin-spec -> WN -> (z, m_q, logs_q)        [train only]
  GeneratorNSF       harmonic sine source + upsample stack + ResBlocks
  MultiPeriodDiscriminator(V2)                                  [train only]

TPU design notes
- NTC layout throughout; no CPU⇄device crossings inside a conversion.
- The sine source's phase integration is a single f32 cumsum (the
  reference's fmod/cumsum trick at models.py:353-366 exists for fp16
  precision; bf16 TPU runs keep phase in f32).
- Inference path is one jitted graph: enc_p -> flow(reverse) -> dec.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.layers import (
    WN,
    Conv1d,
    ConvTranspose1d,
    ResBlock1,
    TransformerEncoder,
    lrelu,
    sequence_mask,
)


@dataclass(frozen=True)
class SynthesizerConfig:
    """Mirrors the v2 48k hparams (modules/rvc/configs/v2/48k.json)."""

    spec_channels: int = 1025
    segment_size: int = 17280
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (12, 10, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (24, 20, 4, 4)
    spk_embed_dim: int = 109
    gin_channels: int = 256
    sr: int = 48000
    feat_channels: int = 768  # 256 for v1 models
    use_f0: bool = True
    flow_layers: int = 3      # WN layers per coupling: RVC uses 3
                              # (infer_pack/models.py), OpenVoice/VITS 4

    @property
    def upp(self) -> int:
        return int(np.prod(self.upsample_rates))


def config_for(sr: int, version: str = "v2") -> SynthesizerConfig:
    """Built-in presets matching modules/rvc/configs/{v1,v2}/{32k,40k,48k}.json."""
    presets = {
        (48000, "v2"): dict(upsample_rates=(12, 10, 2, 2), upsample_kernel_sizes=(24, 20, 4, 4)),
        (40000, "v2"): dict(upsample_rates=(10, 10, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4)),
        (32000, "v2"): dict(upsample_rates=(10, 8, 2, 2), upsample_kernel_sizes=(20, 16, 4, 4)),
        (48000, "v1"): dict(upsample_rates=(10, 6, 2, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4, 4)),
        (40000, "v1"): dict(upsample_rates=(10, 10, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4)),
        (32000, "v1"): dict(upsample_rates=(10, 4, 2, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4, 4)),
    }
    extra = presets[(sr, version)]
    return SynthesizerConfig(
        sr=sr,
        feat_channels=768 if version == "v2" else 256,
        spec_channels=1025 if sr != 32000 else 513,
        **extra,
    )


class TextEncoder(nn.Module):
    """models.py:20-82 — feature/pitch embedding + rel-attn encoder."""

    cfg: SynthesizerConfig

    @nn.compact
    def __call__(self, phone, pitch, lengths):
        c = self.cfg
        x = nn.Dense(c.hidden_channels, name="emb_phone")(phone)
        if c.use_f0 and pitch is not None:
            x = x + nn.Embed(256, c.hidden_channels, name="emb_pitch")(pitch)
        x = x * np.sqrt(c.hidden_channels)
        x = lrelu(x)
        x_mask = sequence_mask(lengths, x.shape[1])[..., None].astype(x.dtype)
        x = TransformerEncoder(
            c.hidden_channels, c.filter_channels, c.n_heads, c.n_layers,
            c.kernel_size, name="encoder",
        )(x, x_mask)
        stats = Conv1d(2 * c.inter_channels, 1, name="proj")(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return m, logs, x_mask


class ResidualCouplingLayer(nn.Module):
    """modules.py ResidualCouplingLayer, mean_only."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.channels // 2
        x0, x1 = jnp.split(x, 2, axis=-1)
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate,
            self.n_layers, self.gin_channels, name="enc",
        )(h, x_mask, g=g)
        m = Conv1d(half, 1, name="post")(h) * x_mask  # post init zeros in ref
        if not reverse:
            x1 = (m + x1) * x_mask
        else:
            x1 = (x1 - m) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    """models.py:84-131 — n_flows × (coupling + flip)."""

    cfg: SynthesizerConfig
    n_flows: int = 4

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        c = self.cfg
        layers = [
            ResidualCouplingLayer(
                c.inter_channels, c.hidden_channels, 5, 1,
                getattr(c, "flow_layers", 3),
                gin_channels=c.gin_channels, name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]
        if not reverse:
            for i in range(self.n_flows):
                x = layers[i](x, x_mask, g=g, reverse=False)
                x = x[..., ::-1]  # Flip (channel reversal)
        else:
            for i in range(self.n_flows - 1, -1, -1):
                x = x[..., ::-1]  # undo the Flip that followed coupling i
                x = layers[i](x, x_mask, g=g, reverse=True)
        return x


class PosteriorEncoder(nn.Module):
    """models.py:149-205 — lin-spec -> WN(16 layers) -> gaussian posterior."""

    cfg: SynthesizerConfig

    @nn.compact
    def __call__(self, y, y_lengths, g=None, rng=None):
        c = self.cfg
        y_mask = sequence_mask(y_lengths, y.shape[1])[..., None].astype(y.dtype)
        h = Conv1d(c.hidden_channels, 1, name="pre")(y) * y_mask
        h = WN(c.hidden_channels, 5, 1, 16, c.gin_channels, name="enc")(h, y_mask, g=g)
        stats = Conv1d(2 * c.inter_channels, 1, name="proj")(h) * y_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        noise = jax.random.normal(rng, m.shape, m.dtype) if rng is not None else 0.0
        z = (m + noise * jnp.exp(logs)) * y_mask
        return z, m, logs, y_mask


def sine_source(
    f0: jnp.ndarray, upp: int, sr: int, rng: jax.Array | None = None,
    sine_amp: float = 0.1, noise_std: float = 0.003, harmonics: int = 1,
) -> jnp.ndarray:
    """Harmonic sine excitation from frame-rate f0 (SineGen, models.py:313-394).

    f0 (b, t) frame-rate Hz -> (b, t*upp, harmonics) phase-continuous sines
    with voiced/unvoiced noise mixing.
    """
    b, t = f0.shape
    f0_up = jnp.repeat(f0, upp, axis=-1)  # sample-and-hold to audio rate
    phase = jnp.cumsum(f0_up / sr, axis=-1)  # cycles, f32
    h = jnp.arange(1, harmonics + 1, dtype=f0.dtype)
    rad = phase[..., None] * h[None, None, :]
    sines = jnp.sin(2.0 * np.pi * rad) * sine_amp
    uv = (f0_up > 0.0).astype(f0.dtype)[..., None]
    if rng is not None:
        noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
        noise = noise_amp * jax.random.normal(rng, sines.shape, sines.dtype)
    else:
        noise = 0.0
    return sines * uv + noise


class GeneratorNSF(nn.Module):
    """models.py:449-580 — NSF-HiFiGAN decoder."""

    cfg: SynthesizerConfig

    @nn.compact
    def __call__(self, x, f0, g=None, rng=None):
        c = self.cfg
        upp = c.upp
        # source module: sines -> linear -> tanh (SourceModuleHnNSF)
        har = sine_source(f0, upp, c.sr, rng=rng)
        har = jnp.tanh(nn.Dense(1, name="source_linear")(har))  # (b, t*upp, 1)

        x = Conv1d(c.upsample_initial_channel, 7, name="conv_pre")(x)
        if g is not None:
            x = x + Conv1d(c.upsample_initial_channel, 1, name="cond")(g)

        n_up = len(c.upsample_rates)
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = lrelu(x)
            x = ConvTranspose1d(ch, k, u, name=f"up_{i}")(x)
            if i + 1 < n_up:
                stride_f0 = int(np.prod(c.upsample_rates[i + 1 :]))
                src = nn.Conv(
                    ch, (stride_f0 * 2,), strides=(stride_f0,),
                    padding=[(stride_f0 // 2, stride_f0 // 2)],
                    name=f"noise_conv_{i}",
                )(har)
            else:
                src = nn.Conv(ch, (1,), name=f"noise_conv_{i}")(har)
            m = min(x.shape[1], src.shape[1])
            x = x[:, :m, :] + src[:, :m, :]
            xs = 0.0
            for j, (rk, rd) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
            ):
                xs = xs + ResBlock1(ch, rk, tuple(rd), name=f"resblock_{i}_{j}")(x)
            x = xs / len(c.resblock_kernel_sizes)
        # final activation uses torch's DEFAULT leaky slope 0.01, not 0.1
        # (models.py:562 `F.leaky_relu(x)` — parity-verified vs torch)
        x = lrelu(x, 0.01)
        x = Conv1d(1, 7, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)  # (b, t*upp, 1)


class SynthesizerTrn(nn.Module):
    """Full synthesizer; ``infer`` is the deployment path, ``__call__`` the
    training path (models.py:722-779)."""

    cfg: SynthesizerConfig

    def setup(self):
        c = self.cfg
        self.enc_p = TextEncoder(c, name="enc_p")
        self.dec = GeneratorNSF(c, name="dec")
        self.flow = ResidualCouplingBlock(c, name="flow")
        self.enc_q = PosteriorEncoder(c, name="enc_q")
        self.emb_g = nn.Embed(c.spk_embed_dim, c.gin_channels, name="emb_g")

    def __call__(self, phone, phone_lengths, pitch, pitchf, y, y_lengths, ds, rngs):
        """Training forward: returns (o, ids_slice, x_mask, y_mask, latents)."""
        c = self.cfg
        g = self.emb_g(ds)[:, None, :]  # (b, 1, gin)
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, g=g, rng=rngs["posterior"])
        z_p = self.flow(z, y_mask, g=g)

        # random segment slice (fixed segment_size -> static shapes)
        seg_frames = c.segment_size // (c.upp)
        max_start = jnp.maximum(y_lengths - seg_frames, 1)
        ids = jax.random.randint(rngs["slice"], (z.shape[0],), 0, 2**30) % max_start
        z_slice = _slice_segments(z, ids, seg_frames)
        pitchf_slice = _slice_segments(pitchf[..., None], ids, seg_frames)[..., 0]
        o = self.dec(z_slice, pitchf_slice, g=g, rng=rngs["noise"])
        return o, ids, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q)

    def infer(self, phone, phone_lengths, pitch, nsff0, sid, rng=None, noise_scale=0.66666):
        g = self.emb_g(sid)[:, None, :]
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        noise = (
            jax.random.normal(rng, m_p.shape, m_p.dtype) if rng is not None else 0.0
        )
        z_p = (m_p + jnp.exp(logs_p) * noise * noise_scale) * x_mask
        z = self.flow(z_p, x_mask, g=g, reverse=True)
        o = self.dec(z * x_mask, nsff0, g=g, rng=rng)
        return o[..., 0]  # (b, samples)


def _slice_segments(x: jnp.ndarray, ids: jnp.ndarray, seg: int) -> jnp.ndarray:
    """Batched dynamic slice (commons.rand_slice_segments equivalent)."""

    def one(xb, i):
        return jax.lax.dynamic_slice_in_dim(xb, i, seg, axis=0)

    return jax.vmap(one)(x, ids)
