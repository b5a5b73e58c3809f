"""Neural audio codecs — the token⇄waveform layer under every audio LM.

Reference ships three codec stacks that are one architecture family:
  - YuE's xcodec: SEANet encoder/decoder + residual VQ
    (modules/yue/inference/xcodec_mini_infer/models/soundstream_hubert_new.py:25,
     modules/seanet.py, quantization/core_vq.py)
  - Zonos/Dia's DAC: snake-activation conv decoder, 9 codebooks
    (modules/zonos/autoencoder.py, modules/diatts/dia/audio.py)
  - Vocos-style ISTFT vocoder head (xcodec_mini_infer/vocos.py)

TPU design: all convs NWC; decode paths are single jitted graphs; RVQ
encode is an MXU nearest-codebook matmul (argmin over -2·x·cᵀ+|c|²), not a
gather loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.stft import hann_window


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation x + sin²(αx)/α (DAC, BigVGAN)."""
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)
    return (xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)).astype(x.dtype)


class Snake(nn.Module):
    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],))
        return snake(x, alpha)


class CausalConv1d(nn.Module):
    """Left-padded conv (streaming-safe, SEANet convention)."""

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) * self.dilation - (self.stride - 1)
        x = jnp.pad(x, ((0, 0), (max(pad, 0), 0), (0, 0)))
        return nn.Conv(
            self.features, (self.kernel,), strides=(self.stride,),
            kernel_dilation=(self.dilation,), padding="VALID",
            feature_group_count=self.groups, name="conv",
        )(x)


class SEANetResUnit(nn.Module):
    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.elu(x)
        h = CausalConv1d(self.features // 2, 3, dilation=self.dilation, name="c1")(h)
        h = nn.elu(h)
        h = CausalConv1d(self.features, 1, name="c2")(h)
        return x + h


@dataclass(frozen=True)
class SEANetConfig:
    channels: int = 1
    dim: int = 512            # latent width at the bottleneck
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)   # upsample ratios, decoder order
    n_res: int = 1
    kernel: int = 7
    last_kernel: int = 7

    @property
    def hop(self) -> int:
        return int(np.prod(self.ratios))


class SEANetEncoder(nn.Module):
    cfg: SEANetConfig = SEANetConfig()

    @nn.compact
    def __call__(self, x):
        """(b, n, channels) -> (b, n/hop, dim)."""
        c = self.cfg
        mult = 1
        h = CausalConv1d(c.n_filters, c.kernel, name="conv_in")(x)
        for i, ratio in enumerate(reversed(c.ratios)):
            for j in range(c.n_res):
                h = SEANetResUnit(mult * c.n_filters, dilation=3**j, name=f"res_{i}_{j}")(h)
            h = nn.elu(h)
            h = CausalConv1d(mult * c.n_filters * 2, ratio * 2, stride=ratio,
                             name=f"down_{i}")(h)
            mult *= 2
        h = nn.elu(h)
        return CausalConv1d(c.dim, c.last_kernel, name="conv_out")(h)


class SEANetDecoder(nn.Module):
    cfg: SEANetConfig = SEANetConfig()

    @nn.compact
    def __call__(self, z):
        """(b, t, dim) -> (b, t*hop, channels)."""
        c = self.cfg
        mult = 2 ** len(c.ratios)
        h = CausalConv1d(mult * c.n_filters, c.kernel, name="conv_in")(z)
        for i, ratio in enumerate(c.ratios):
            h = nn.elu(h)
            h = nn.ConvTranspose(
                mult * c.n_filters // 2, (ratio * 2,), strides=(ratio,),
                padding="SAME", name=f"up_{i}",
            )(h)
            for j in range(c.n_res):
                h = SEANetResUnit(mult * c.n_filters // 2, dilation=3**j,
                                  name=f"res_{i}_{j}")(h)
            mult //= 2
        h = nn.elu(h)
        return CausalConv1d(c.channels, c.last_kernel, name="conv_out")(h)


# ------------------------------------------------------------------ RVQ

class ResidualVQ(nn.Module):
    """Residual vector quantizer (core_vq.py semantics, MXU lookup)."""

    n_q: int = 8
    codebook_size: int = 1024
    dim: int = 512

    def setup(self):
        self.codebooks = self.param(
            "codebooks",
            nn.initializers.normal(0.02),
            (self.n_q, self.codebook_size, self.dim),
        )

    def encode(self, z: jnp.ndarray, n_q: int | None = None) -> jnp.ndarray:
        """(b, t, dim) -> codes (b, n_q, t) int32 (nearest residual)."""
        n_q = n_q or self.n_q
        res = z.astype(jnp.float32)
        codes = []
        for qi in range(n_q):
            cb = self.codebooks[qi].astype(jnp.float32)  # (K, d)
            # argmin_k |res - c_k|² == argmax_k (res·c_k - |c_k|²/2)
            score = res @ cb.T - 0.5 * jnp.sum(cb * cb, axis=-1)
            idx = jnp.argmax(score, axis=-1)  # (b, t)
            res = res - cb[idx]
            codes.append(idx.astype(jnp.int32))
        return jnp.stack(codes, axis=1)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (b, n_q, t) -> (b, t, dim)."""
        n_q = codes.shape[1]
        z = 0.0
        for qi in range(n_q):
            z = z + self.codebooks[qi][codes[:, qi]]
        return z

    def __call__(self, z):
        codes = self.encode(z)
        zq = self.decode(codes)
        # straight-through for training
        return z + jax.lax.stop_gradient(zq - z), codes


# ------------------------------------------------------------------ SoundStream / xcodec

@dataclass(frozen=True)
class CodecConfig:
    sr: int = 16000
    seanet: SEANetConfig = SEANetConfig()
    n_q: int = 8
    codebook_size: int = 1024

    @property
    def frame_rate(self) -> float:
        return self.sr / self.seanet.hop


class SoundStreamCodec(nn.Module):
    """Encoder + RVQ + decoder (xcodec's acoustic path,
    soundstream_hubert_new.py:25 — the semantic HuBERT branch is train-time
    only and not needed for decode)."""

    cfg: CodecConfig = CodecConfig()

    def setup(self):
        self.encoder = SEANetEncoder(self.cfg.seanet)
        self.decoder = SEANetDecoder(self.cfg.seanet)
        self.rvq = ResidualVQ(self.cfg.n_q, self.cfg.codebook_size, self.cfg.seanet.dim)

    def encode(self, audio: jnp.ndarray, n_q: int | None = None) -> jnp.ndarray:
        """(b, n) -> (b, n_q, t)."""
        z = self.encoder(audio[..., None])
        return self.rvq.encode(z, n_q)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """(b, n_q, t) -> (b, n)."""
        z = self.rvq.decode(codes)
        return self.decoder(z)[..., 0]

    def __call__(self, audio):
        z = self.encoder(audio[..., None])
        zq, codes = self.rvq(z)
        return self.decoder(zq)[..., 0], codes


# ------------------------------------------------------------------ DAC decoder (Zonos / Dia)

@dataclass(frozen=True)
class DACConfig:
    sr: int = 44100
    dim: int = 1024                 # latent width after codes projection
    rates: Sequence[int] = (8, 8, 4, 2)
    n_q: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    decoder_dim: int | None = None  # first decoder width (upstream 1536);
                                    # defaults to ``dim``

    @property
    def hop(self) -> int:
        return int(np.prod(self.rates))

    @property
    def d0(self) -> int:
        return self.decoder_dim or self.dim


class DACResUnit(nn.Module):
    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        h = Snake(name="s1")(x)
        h = nn.Conv(self.features, (7,), kernel_dilation=(self.dilation,),
                    padding="SAME", name="c1")(h)
        h = Snake(name="s2")(h)
        h = nn.Conv(self.features, (1,), name="c2")(h)
        return x + h


class DACDecoder(nn.Module):
    """DAC-style decoder: per-codebook 8-d embeddings -> projection -> snake
    conv upsample stack (descript-audio-codec; vendored in yue + used by
    zonos/dia for token->audio)."""

    cfg: DACConfig = DACConfig()

    @nn.compact
    def __call__(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (b, n_q, t) -> audio (b, t*hop).

        Structure matches descript-audio-codec's decode path so real
        weights convert: per-quantizer codebook + out_proj summed (the RVQ
        dequantize), then Conv(7) at decoder_dim with halving DecoderBlocks
        (Snake -> ConvT(2r, stride r) -> 3 ResUnits, dilations 1/3/9)."""
        c = self.cfg
        z = 0.0
        for qi in range(c.n_q):
            emb = nn.Embed(c.codebook_size, c.codebook_dim,
                           name=f"codebook_{qi}")(codes[:, qi])
            z = z + nn.Dense(c.dim, name=f"out_proj_{qi}")(emb)

        ch = c.d0
        h = nn.Conv(ch, (7,), padding="SAME", name="conv_in")(z)
        for i, r in enumerate(c.rates):
            ch //= 2
            h = Snake(name=f"snake_{i}")(h)
            h = nn.ConvTranspose(ch, (2 * r,), strides=(r,), padding="SAME",
                                 name=f"up_{i}")(h)
            for j in range(3):
                h = DACResUnit(ch, dilation=3**j, name=f"res_{i}_{j}")(h)
        h = Snake(name="snake_out")(h)
        h = nn.Conv(1, (7,), padding="SAME", name="conv_out")(h)
        return jnp.tanh(h)[..., 0]


# ------------------------------------------------------------------ Vocos (ISTFT head)

@dataclass(frozen=True)
class VocosConfig:
    dim: int = 512
    n_layers: int = 8
    ffn_mult: int = 3
    n_fft: int = 1024
    hop: int = 256


class ConvNeXtBlock(nn.Module):
    dim: int
    ffn_mult: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7,), padding="SAME", feature_group_count=self.dim,
                    name="dwconv")(x)
        h = nn.LayerNorm(name="norm")(h)
        h = nn.Dense(self.dim * self.ffn_mult, name="pw1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="pw2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return x + gamma * h


class Vocos(nn.Module):
    """ConvNeXt trunk -> (mag, phase) -> iSTFT (xcodec_mini_infer vocos.py).
    Turns codec latents into high-rate audio without transposed convs —
    all MXU matmuls + one overlap-add, ideal on TPU."""

    cfg: VocosConfig = VocosConfig()

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """(b, t, in_dim) -> (b, t*hop)."""
        c = self.cfg
        h = nn.Conv(c.dim, (7,), padding="SAME", name="embed")(z)
        h = nn.LayerNorm(name="norm_in")(h)
        for i in range(c.n_layers):
            h = ConvNeXtBlock(c.dim, c.ffn_mult, name=f"block_{i}")(h)
        h = nn.LayerNorm(name="norm_out")(h)
        n_bins = c.n_fft // 2 + 1
        out = nn.Dense(2 * n_bins, name="head")(h)
        logmag, phase = jnp.split(out.astype(jnp.float32), 2, axis=-1)
        # upstream vocos clips the MAGNITUDE at 1e2 (heads.py); the inner
        # logmag clip just keeps exp finite in fp32
        mag = jnp.clip(jnp.exp(jnp.clip(logmag, None, 12.0)), None, 1e2)
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        return istft(real, imag, c.n_fft, c.hop)


def istft(real: jnp.ndarray, imag: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Inverse STFT via iDFT matmul + overlap-add. (b, t, n_bins) -> (b, n).
    center=True convention (crops n_fft//2 each side)."""
    b, t, n_bins = real.shape
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_bins)[None, :]
    cos = np.cos(2 * np.pi * k * f / n_fft)
    sin = np.sin(2 * np.pi * k * f / n_fft)
    scale = np.ones(n_bins)
    scale[1 : n_fft // 2 + (n_fft % 2)] = 2.0  # hermitian doubling
    cos *= scale / n_fft
    sin *= scale / n_fft
    frames = real @ jnp.asarray(cos.T) - imag @ jnp.asarray(sin.T)  # (b, t, n_fft)

    win = jnp.asarray(hann_window(n_fft))
    frames = frames * win
    n = (t - 1) * hop + n_fft
    idx = (np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((b, n)).at[:, idx].add(frames.reshape(b, -1))
    wsum = jnp.zeros((n,)).at[idx].add(jnp.tile(win * win, (t,)))
    out = out / jnp.maximum(wsum, 1e-8)
    return out[:, n_fft // 2 : n - n_fft // 2]


# ------------------------------------------------------------- xcodec (YuE)

class TorchConvTranspose(nn.Module):
    """torch-semantics ConvTranspose1d via explicit dilate + pad + conv:
    out[t] matches torch(k, s, p, op) exactly for any stride (flax
    ConvTranspose padding conventions only line up for the even-stride
    k=2s/p=s/2 case).  Kernel layout equals convTwn_w's output."""

    features: int
    kernel: int
    stride: int
    torch_padding: int
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        b, t, cin = x.shape
        y = jnp.zeros((b, (t - 1) * self.stride + 1, cin), x.dtype)
        y = y.at[:, :: self.stride].set(x)
        lo = self.kernel - 1 - self.torch_padding
        hi = lo + self.output_padding
        y = jnp.pad(y, ((0, 0), (lo, hi), (0, 0)))
        return nn.Conv(self.features, (self.kernel,), padding="VALID",
                       use_bias=self.use_bias, name="conv")(y)


@dataclass(frozen=True)
class XCodecConfig:
    """YuE xcodec decode geometry (soundstream_hubert_new.py:25-120):
    RVQ over 896-d (128 acoustic + 768 semantic), fc_post2 -> 128-d,
    DAC-style decoder at 1024 channels, rates (8, 5, 4, 2)."""

    n_q: int = 8
    codebook_size: int = 1024
    dim: int = 896                  # quantizer dimension D + 768
    acoustic_dim: int = 128         # fc_post2 output (decoder input)
    decoder_dim: int = 1024
    rates: Sequence[int] = (8, 5, 4, 2)

    @property
    def hop(self) -> int:
        return int(np.prod(self.rates))


class XCodecDecoder(nn.Module):
    """codes (b, n_q, t) -> audio (b, t*hop) — the YuE decode path
    (SoundStream.decode: quantizer.decode -> fc_post2 -> decoder_2)."""

    cfg: XCodecConfig = XCodecConfig()

    @nn.compact
    def __call__(self, codes: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        z = 0.0
        for qi in range(c.n_q):
            z = z + nn.Embed(c.codebook_size, c.dim,
                             name=f"codebook_{qi}")(codes[:, qi])
        z = nn.Dense(c.acoustic_dim, name="fc_post2")(z)

        ch = c.decoder_dim
        h = nn.Conv(ch, (7,), padding="SAME", name="conv_in")(z)
        for i, r in enumerate(c.rates):
            ch //= 2
            h = Snake(name=f"snake_{i}")(h)
            h = TorchConvTranspose(
                ch, 2 * r, r, torch_padding=int(np.ceil(r / 2)),
                output_padding=r % 2, name=f"up_{i}")(h)
            for j in range(3):
                h = DACResUnit(ch, dilation=3**j, name=f"res_{i}_{j}")(h)
        h = Snake(name="snake_out")(h)
        # the vendored dac2.Decoder omits the final Tanh (dac/model/dac.py
        # comments it out) — keep raw output for bit parity
        h = nn.Conv(1, (7,), padding="SAME", name="conv_out")(h)
        return h[..., 0]
