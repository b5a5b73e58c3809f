"""HTDemucs (hybrid transformer Demucs v4) — the reference's 6-stem model.

The reference's multistem path loads ``htdemucs_6s.yaml`` through
audio-separator (modules/separator/stem_separator.py:459,466), i.e. the
facebookresearch/demucs v4 checkpoint family.  This is a flax
re-implementation of that module graph (demucs/htdemucs.py +
hdemucs.py:HEncLayer/HDecLayer + demucs.py:DConv + transformer.py), so
published ``htdemucs``/``htdemucs_6s`` weights convert
(``utils.convert.convert_htdemucs``) and drive ``separate_multistem``.

Graph (htdemucs defaults: depth 4, channels 48, growth 2, nfft 4096,
cac, dconv in encoders only, bottom_channels 512, 5 cross-transformer
layers):

  spectrogram branch: normalized STFT -> complex-as-channels image
    (b, 4, 2048, T) -> 4x HEncLayer over the FREQ axis (k8 s4 + DConv +
    GLU rewrite), with a scaled frequency embedding after layer 0
  time branch: waveform -> 4x HEncLayer 1-d (k8 s4)
  cross-domain transformer: both branches flattened to sequences,
    2-d/1-d sinusoidal positions, layers alternating self- and
    cross-attention (norm-first, LayerScale, GroupNorm out)
  decoders with skip connections -> freq masks (cac) + time residual;
  output = iSTFT(masked spec) + time branch

TPU notes: freq convs are (k, 1) 2-d convs — XLA tiles them like 1-d
convs on the MXU; the DConv stack runs on (b*freq, t, c) batches; both
attention families are plain batched MHA at ~1-3k sequence length, one
jitted graph per segment shape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.stft import hann_window


@dataclass(frozen=True)
class HTDemucsConfig:
    sources: Sequence[str] = ("drums", "bass", "other", "vocals",
                              "guitar", "piano")  # htdemucs_6s
    audio_channels: int = 2
    channels: int = 48
    growth: int = 2
    nfft: int = 4096
    depth: int = 4
    kernel_size: int = 8
    stride: int = 4
    time_stride: int = 2
    context: int = 1
    context_enc: int = 0
    norm_starts: int = 4
    norm_groups: int = 4
    dconv_depth: int = 2
    dconv_comp: int = 8
    bottom_channels: int = 512
    t_layers: int = 5
    t_heads: int = 8
    t_hidden_scale: float = 4.0
    t_max_period: float = 10000.0
    t_weight_pos_embed: float = 1.0
    freq_emb_scale: float = 0.2
    emb_scale: float = 10.0
    segment_seconds: float = 7.8    # htdemucs training segment (Fraction 39/5)
    samplerate: int = 44100

    @property
    def hop(self) -> int:
        return self.nfft // 4


def _glu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


class GroupNormT(nn.Module):
    """torch GroupNorm(groups, C) over channel-last activations."""

    groups: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        shape = x.shape[:-1] + (self.groups, d // self.groups)
        h = x.reshape(shape)
        axes = tuple(range(1, len(shape) - 2)) + (len(shape) - 1,)
        mu = jnp.mean(h, axis=axes, keepdims=True)
        var = jnp.var(h, axis=axes, keepdims=True)
        h = ((h - mu) / jnp.sqrt(var + 1e-5)).reshape(x.shape)
        return (h * self.param("weight", nn.initializers.ones, (d,))
                + self.param("bias", nn.initializers.zeros, (d,)))


class DConv(nn.Module):
    """demucs.py DConv: depth residual branches of dilated conv ->
    GroupNorm(1) -> GELU -> 1x1 -> GroupNorm(1) -> GLU -> LayerScale."""

    channels: int
    compress: int = 8
    depth: int = 2

    @nn.compact
    def __call__(self, x):
        """(b, t, c) -> (b, t, c)."""
        hidden = int(self.channels / self.compress)
        for d in range(self.depth):
            dil = 2 ** d
            h = nn.Conv(hidden, (3,), kernel_dilation=(dil,), padding=dil,
                        name=f"c1_{d}")(x)
            h = nn.gelu(GroupNormT(1, name=f"n1_{d}")(h), approximate=False)
            h = nn.Conv(2 * self.channels, (1,), name=f"c2_{d}")(h)
            h = _glu(GroupNormT(1, name=f"n2_{d}")(h))
            scale = self.param(f"scale_{d}", nn.initializers.zeros,
                               (self.channels,))
            x = x + h * scale
        return x


class HEncLayer(nn.Module):
    """hdemucs.py HEncLayer; channel-last ((b, f, t, c) freq /
    (b, t, c) time)."""

    chout: int
    kernel_size: int = 8
    stride: int = 4
    freq: bool = True
    norm: bool = False
    norm_groups: int = 4
    context: int = 0
    dconv: bool = True
    dconv_depth: int = 2
    dconv_comp: int = 8
    empty: bool = False
    pad: bool = True

    @nn.compact
    def __call__(self, x, inject=None):
        pad = self.kernel_size // 4 if self.pad else 0
        if self.freq:
            y = nn.Conv(self.chout, (self.kernel_size, 1),
                        strides=(self.stride, 1), padding=((pad, pad), (0, 0)),
                        name="conv")(x)
        else:
            t = x.shape[1]
            if t % self.stride:
                x = jnp.pad(x, ((0, 0), (0, self.stride - t % self.stride),
                                (0, 0)))
            y = nn.Conv(self.chout, (self.kernel_size,),
                        strides=(self.stride,), padding=pad, name="conv")(x)
        if self.empty:
            return y
        if inject is not None:
            if inject.ndim == 3 and y.ndim == 4:
                inject = inject[:, None]
            y = y + inject
        norm1 = (GroupNormT(self.norm_groups, name="norm1") if self.norm
                 else (lambda v: v))
        y = nn.gelu(norm1(y), approximate=False)
        if self.dconv:
            if self.freq:
                b, f, t, c = y.shape
                y = DConv(c, self.dconv_comp, self.dconv_depth,
                          name="dconv")(y.reshape(b * f, t, c))
                y = y.reshape(b, f, t, c)
            else:
                y = DConv(y.shape[-1], self.dconv_comp, self.dconv_depth,
                          name="dconv")(y)
        k = 1 + 2 * self.context
        if self.freq:
            # scalar kernel on torch Conv2d -> square (k, k)
            z = nn.Conv(2 * self.chout, (k, k), padding=self.context,
                        name="rewrite")(y)
        else:
            z = nn.Conv(2 * self.chout, (k,), padding=self.context,
                        name="rewrite")(y)
        norm2 = (GroupNormT(self.norm_groups, name="norm2") if self.norm
                 else (lambda v: v))
        return _glu(norm2(z))


class HDecLayer(nn.Module):
    chout: int
    kernel_size: int = 8
    stride: int = 4
    freq: bool = True
    norm: bool = False
    norm_groups: int = 4
    context: int = 1
    last: bool = False
    empty: bool = False
    pad: bool = True

    @nn.compact
    def __call__(self, x, skip, length):
        pad = self.kernel_size // 4 if self.pad else 0
        if not self.empty:
            x = x + skip
            k = 1 + 2 * self.context
            if self.freq:
                # torch passes a scalar kernel to Conv2d -> SQUARE (k, k)
                # context over both freq and time (hdemucs.py HDecLayer)
                z = nn.Conv(2 * x.shape[-1], (k, k),
                            padding=self.context, name="rewrite")(x)
            else:
                z = nn.Conv(2 * x.shape[-1], (k,), padding=self.context,
                            name="rewrite")(x)
            norm1 = (GroupNormT(self.norm_groups, name="norm1") if self.norm
                     else (lambda v: v))
            y = _glu(norm1(z))
        else:
            y = x
        # default flax ConvTranspose kernel layout — the validated
        # convT2_w/convTwn_w conversion kinds (spatial flip) apply
        if self.freq:
            h = nn.ConvTranspose(self.chout, (self.kernel_size, 1),
                                 strides=(self.stride, 1), padding="VALID",
                                 name="conv_tr")(y)
        else:
            h = nn.ConvTranspose(self.chout, (self.kernel_size,),
                                 strides=(self.stride,), padding="VALID",
                                 name="conv_tr")(y)
        norm2 = (GroupNormT(self.norm_groups, name="norm2") if self.norm
                 else (lambda v: v))
        z = norm2(h)
        if self.freq:
            if pad:
                z = z[:, pad:-pad, :, :]
        else:
            z = z[:, pad:pad + length, :]
        if not self.last:
            z = nn.gelu(z, approximate=False)
        return z, y


# ------------------------------------------------------- transformer

def create_sin_embedding(length: int, dim: int,
                         max_period: float = 10000.0) -> np.ndarray:
    pos = np.arange(length, dtype=np.float64)[:, None]
    half = dim // 2
    adim = np.arange(half, dtype=np.float64)[None, :]
    phase = pos / (max_period ** (adim / (half - 1)))
    return np.concatenate([np.cos(phase), np.sin(phase)],
                          axis=-1).astype(np.float32)   # (t, dim)


def create_2d_sin_embedding(d_model: int, height: int, width: int,
                            max_period: float = 10000.0) -> np.ndarray:
    """(d_model, h, w) — transformer.py create_2d_sin_embedding."""
    pe = np.zeros((d_model, height, width), np.float32)
    half = d_model // 2
    div = np.exp(np.arange(0.0, half, 2) * -(math.log(max_period) / half))
    pos_w = np.arange(0.0, width)[:, None]
    pos_h = np.arange(0.0, height)[:, None]
    pe[0:half:2] = np.repeat(
        np.sin(pos_w * div).T[:, None, :], height, axis=1)
    pe[1:half:2] = np.repeat(
        np.cos(pos_w * div).T[:, None, :], height, axis=1)
    pe[half::2] = np.repeat(
        np.sin(pos_h * div).T[:, :, None], width, axis=2)
    pe[half + 1::2] = np.repeat(
        np.cos(pos_h * div).T[:, :, None], width, axis=2)
    return pe


class MHA(nn.Module):
    """torch nn.MultiheadAttention(batch_first) equivalent (fused in_proj)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim
        wq = nn.Dense(d, name="q")(q)
        wk = nn.Dense(d, name="k")(k)
        wv = nn.Dense(d, name="v")(v)
        b, tq, _ = wq.shape
        tk = wk.shape[1]
        hd = d // self.heads
        wq = wq.reshape(b, tq, self.heads, hd).transpose(0, 2, 1, 3)
        wk = wk.reshape(b, tk, self.heads, hd).transpose(0, 2, 1, 3)
        wv = wv.reshape(b, tk, self.heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", wq, wk) / math.sqrt(hd)
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, wv)
        o = o.transpose(0, 2, 1, 3).reshape(b, tq, d)
        return nn.Dense(d, name="out_proj")(o)


class SelfLayer(nn.Module):
    """MyTransformerEncoderLayer, norm_first + LayerScale + GroupNorm out."""

    dim: int
    heads: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        g1 = self.param("gamma_1", nn.initializers.zeros, (self.dim,))
        g2 = self.param("gamma_2", nn.initializers.zeros, (self.dim,))
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + g1 * MHA(self.dim, self.heads, name="self_attn")(h, h, h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(self.hidden, name="linear1")(h)
        h = nn.Dense(self.dim, name="linear2")(nn.gelu(h, approximate=False))
        x = x + g2 * h
        return GroupNormT(1, name="norm_out")(x)


class CrossLayer(nn.Module):
    dim: int
    heads: int
    hidden: int

    @nn.compact
    def __call__(self, q, kv):
        g1 = self.param("gamma_1", nn.initializers.zeros, (self.dim,))
        g2 = self.param("gamma_2", nn.initializers.zeros, (self.dim,))
        qn = nn.LayerNorm(epsilon=1e-5, name="norm1")(q)
        kn = nn.LayerNorm(epsilon=1e-5, name="norm2")(kv)
        x = q + g1 * MHA(self.dim, self.heads, name="cross_attn")(qn, kn, kn)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        h = nn.Dense(self.hidden, name="linear1")(h)
        h = nn.Dense(self.dim, name="linear2")(nn.gelu(h, approximate=False))
        x = x + g2 * h
        return GroupNormT(1, name="norm_out")(x)


class CrossTransformer(nn.Module):
    cfg: HTDemucsConfig

    @nn.compact
    def __call__(self, x, xt):
        """x (b, f, t1, c), xt (b, t2, c) -> same shapes."""
        c = self.cfg
        dim = x.shape[-1]
        hidden = int(dim * c.t_hidden_scale)
        b, f, t1, _ = x.shape
        pe2 = create_2d_sin_embedding(dim, f, t1, c.t_max_period)
        # b c f t -> b (t f) c
        pe2 = jnp.asarray(pe2).transpose(2, 1, 0).reshape(t1 * f, dim)
        xs = x.transpose(0, 2, 1, 3).reshape(b, t1 * f, dim)
        xs = nn.LayerNorm(epsilon=1e-5, name="norm_in")(xs)
        xs = xs + c.t_weight_pos_embed * pe2[None]

        t2 = xt.shape[1]
        pe1 = jnp.asarray(create_sin_embedding(t2, dim, c.t_max_period))
        xts = nn.LayerNorm(epsilon=1e-5, name="norm_in_t")(xt)
        xts = xts + c.t_weight_pos_embed * pe1[None]

        for idx in range(c.t_layers):
            if idx % 2 == 0:
                xs = SelfLayer(dim, c.t_heads, hidden,
                               name=f"layer_{idx}")(xs)
                xts = SelfLayer(dim, c.t_heads, hidden,
                                name=f"layer_t_{idx}")(xts)
            else:
                old = xs
                xs = CrossLayer(dim, c.t_heads, hidden,
                                name=f"layer_{idx}")(xs, xts)
                xts = CrossLayer(dim, c.t_heads, hidden,
                                 name=f"layer_t_{idx}")(xts, old)
        xs = xs.reshape(b, t1, f, dim).transpose(0, 2, 1, 3)
        return xs, xts


# ----------------------------------------------------------- spec utils

def _spec(x: jnp.ndarray, nfft: int, hop: int) -> jnp.ndarray:
    """htdemucs _spec: reflect-padded normalized STFT, last bin dropped,
    2 frames trimmed each side.  x (b, ch, n) -> complex-ish
    (b, ch, freqs, le, 2) real/imag last."""
    le = int(math.ceil(x.shape[-1] / hop))
    pad = hop // 2 * 3
    x = jnp.pad(x, ((0, 0), (0, 0),
                    (pad, pad + le * hop - x.shape[-1])), mode="reflect")
    # torch.stft(center=True, normalized=True, reflect)
    n = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (nfft // 2, nfft // 2)),
                 mode="reflect")
    frames = jnp.stack(
        [xp[..., i * hop: i * hop + nfft]
         for i in range(1 + n // hop)], axis=-2)
    win = jnp.asarray(hann_window(nfft, periodic=True))
    frames = frames * win
    spec = jnp.fft.rfft(frames, axis=-1) / math.sqrt(nfft)  # normalized
    spec = jnp.stack([spec.real, spec.imag], axis=-1)  # (b,ch,T,F,2)
    spec = spec.transpose(0, 1, 3, 2, 4)               # (b,ch,F,T,2)
    spec = spec[:, :, :-1]                             # drop last freq bin
    return spec[:, :, :, 2: 2 + le]


def _ispec(spec: jnp.ndarray, nfft: int, hop: int, length: int) -> jnp.ndarray:
    """inverse of _spec (per source): (b, s, ch, F, T, 2) -> (b, s, ch, n)."""
    pad = hop // 2 * 3
    le = hop * int(math.ceil(length / hop)) + 2 * pad
    z = jnp.pad(spec, ((0, 0), (0, 0), (0, 0), (0, 1), (2, 2), (0, 0)))
    zc = z[..., 0] + 1j * z[..., 1]                    # (b,s,ch,F,T)
    frames = jnp.fft.irfft(zc.transpose(0, 1, 2, 4, 3), n=nfft,
                           axis=-1) * math.sqrt(nfft)
    win = np.asarray(hann_window(nfft, periodic=True), np.float64)
    t_frames = frames.shape[-2]
    out_len = (t_frames - 1) * hop + nfft
    idx = (np.arange(t_frames)[:, None] * hop
           + np.arange(nfft)[None, :]).ravel()
    sig = jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype)
    sig = sig.at[..., idx].add((frames * win).reshape(
        frames.shape[:-2] + (-1,)))
    wsum = np.zeros(out_len)
    for i in range(t_frames):
        wsum[i * hop: i * hop + nfft] += win * win
    sig = sig / jnp.asarray(np.maximum(wsum, 1e-10))
    sig = sig[..., nfft // 2: nfft // 2 + le]
    return sig[..., pad: pad + length]


# ------------------------------------------------------------- model

class HTDemucs(nn.Module):
    cfg: HTDemucsConfig = HTDemucsConfig()

    @nn.compact
    def __call__(self, mix):
        """(b, ch, n) -> (b, n_sources, ch, n)."""
        c = self.cfg
        length = mix.shape[-1]
        train_len = int(c.segment_seconds * c.samplerate)
        pre_pad = None
        if length < train_len:
            pre_pad = length
            mix = jnp.pad(mix, ((0, 0), (0, 0), (0, train_len - length)))
            length = train_len

        z = _spec(mix, c.nfft, c.hop)                 # (b,ch,F,T,2)
        b, ch, fq, t, _ = z.shape
        # cac channels: (b, ch*2, F, T) -> channel-last image (b,F,T,ch*2)
        mag = z.transpose(0, 1, 4, 2, 3).reshape(b, ch * 2, fq, t)
        mean = jnp.mean(mag, axis=(1, 2, 3), keepdims=True)
        std = jnp.std(mag, axis=(1, 2, 3), keepdims=True, ddof=1)
        x = (mag - mean) / (1e-5 + std)
        x = x.transpose(0, 2, 3, 1)                   # (b,F,T,ch*2)

        meant = jnp.mean(mix, axis=(1, 2), keepdims=True)
        stdt = jnp.std(mix, axis=(1, 2), keepdims=True, ddof=1)
        xt = ((mix - meant) / (1e-5 + stdt)).transpose(0, 2, 1)  # (b,n,ch)

        s = len(c.sources)
        chans = [c.channels * c.growth ** i for i in range(c.depth)]
        saved, saved_t, lengths, lengths_t = [], [], [], []
        for i in range(c.depth):
            norm = i >= c.norm_starts
            lengths.append(x.shape[1])
            lengths_t.append(xt.shape[1])
            xt = HEncLayer(chans[i], c.kernel_size, c.stride, freq=False,
                           norm=norm, norm_groups=c.norm_groups,
                           context=c.context_enc, dconv=True,
                           dconv_depth=c.dconv_depth,
                           dconv_comp=c.dconv_comp,
                           name=f"tencoder_{i}")(xt)
            saved_t.append(xt)
            x = HEncLayer(chans[i], c.kernel_size, c.stride, freq=True,
                          norm=norm, norm_groups=c.norm_groups,
                          context=c.context_enc, dconv=True,
                          dconv_depth=c.dconv_depth, dconv_comp=c.dconv_comp,
                          name=f"encoder_{i}")(x)
            if i == 0:
                emb = self.param(
                    "freq_emb", nn.initializers.normal(1.0),
                    (x.shape[1], x.shape[-1]))
                x = x + c.freq_emb_scale * c.emb_scale * emb[None, :, None, :]
            saved.append(x)

        if c.bottom_channels:
            x = nn.Dense(c.bottom_channels, name="channel_upsampler")(x)
            xt = nn.Dense(c.bottom_channels, name="channel_upsampler_t")(xt)
        x, xt = CrossTransformer(c, name="crosstransformer")(x, xt)
        if c.bottom_channels:
            x = nn.Dense(chans[-1], name="channel_downsampler")(x)
            xt = nn.Dense(chans[-1], name="channel_downsampler_t")(xt)

        for j in range(c.depth):
            i = c.depth - 1 - j                      # decoder stage index
            norm = i >= c.norm_starts
            chout = ch * 2 * s if i == 0 else chans[i - 1]
            chout_t = ch * s if i == 0 else chans[i - 1]
            x, _pre = HDecLayer(chout, c.kernel_size, c.stride, freq=True,
                                norm=norm, norm_groups=c.norm_groups,
                                context=c.context, last=i == 0,
                                name=f"decoder_{j}")(
                x, saved.pop(), lengths.pop())
            xt, _ = HDecLayer(chout_t, c.kernel_size, c.stride, freq=False,
                              norm=norm, norm_groups=c.norm_groups,
                              context=c.context, last=i == 0,
                              name=f"tdecoder_{j}")(
                xt, saved_t.pop(), lengths_t.pop())

        # freq branch -> cac spectra per source
        x = x.transpose(0, 3, 1, 2)                   # (b, S*ch*2, F, T)
        x = x.reshape(b, s, ch * 2, fq, t)
        x = x * std[:, None] + mean[:, None]
        zout = x.reshape(b, s, ch, 2, fq, t).transpose(0, 1, 2, 4, 5, 3)
        wav_spec = _ispec(zout, c.nfft, c.hop, length)

        xt = xt.transpose(0, 2, 1).reshape(b, s, ch, length)
        xt = xt * stdt[:, None] + meant[:, None]
        out = xt + wav_spec
        if pre_pad is not None:
            out = out[..., :pre_pad]
        return out
