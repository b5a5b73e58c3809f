"""MDX23C (TFC-TDF v3) separator, checkpoint-compatible.

The reference's default ensemble and its drum-separation path run MDX23C
torch checkpoints — ``MDX23C-8KFFT-InstVoc_HQ.ckpt`` (weights 7.2/14.9)
and ``MDX23C-DrumSep-aufr33-jarredou.ckpt`` — via the audio-separator
package (modules/separator/stem_separator.py:111,113,379-386,534-541).
Those checkpoints are plain state dicts of ZFTurbo's
Music-Source-Separation-Training ``mdx23c_tfc_tdf_v3`` network:

  stereo STFT (complex-as-channels, dim_f bins) -> subband fold
  -> 1x1 first conv -> U-Net of TFC_TDF blocks
     (per block: 1x1 shortcut; IN+GELU+3x3 conv; freq-bottleneck MLP
      residual; IN+GELU+3x3 conv; + shortcut)
     with (2,2)-strided down/upscales and channel growth per scale
  -> multiplicative skip with the first-conv output
  -> final 1x1 convs over [mix, x] -> per-instrument complex spectra
  -> subband unfold -> iSTFT

TPU notes: all convs run NHWC with time as H and freq as W so XLA tiles
them onto the MXU directly; the whole forward is one fused jit graph per
chunk shape (the reference round-trips through onnx/torch per chunk).

Converted by ``utils.convert.convert_mdx23c`` /
``load_mdx23c_checkpoint``; ensemble wrapper ``mdx23c_member`` in
pipelines/separate.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from audiolab_tpu.kernels.stft import istft, stft


@dataclass(frozen=True)
class MDX23CConfig:
    """Field names mirror the audio-separator/MSST yaml (audio.* and
    model.* sections) so configs for published checkpoints transcribe
     1:1.  Defaults = MDX23C-8KFFT-InstVoc_HQ."""

    sample_rate: int = 44100
    n_fft: int = 8192
    hop_length: int = 1024
    dim_f: int = 4096            # retained freq bins
    num_channels: int = 2        # audio channels
    num_subbands: int = 4
    num_scales: int = 5
    scale: tuple[int, int] = (2, 2)   # (time, freq) stride per scale
    num_blocks_per_scale: int = 2
    channels: int = 128          # model.num_channels (base conv width)
    growth: int = 128
    bottleneck_factor: int = 4
    norm: str = "InstanceNorm"   # InstanceNorm | GroupNormN | Identity
    act: str = "gelu"
    instruments: Sequence[str] = ("Vocals", "Instrumental")
    target_instrument: str | None = None

    @property
    def num_targets(self) -> int:
        return 1 if self.target_instrument else len(self.instruments)

    @property
    def dim_c(self) -> int:
        return self.num_subbands * self.num_channels * 2


def _act(name: str):
    if name == "gelu":
        # torch nn.GELU() is the exact erf form
        return lambda x: nn.gelu(x, approximate=False)
    if name == "relu":
        return nn.relu
    if name.startswith("leakyrelu"):
        slope = float(name.replace("leakyrelu", "") or 0.01)
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    raise ValueError(f"unknown act {name}")


class _Norm(nn.Module):
    """get_norm equivalent: InstanceNorm2d(affine) == GroupNorm with one
    channel per group; GroupNormN == N groups; else identity."""

    kind: str

    @nn.compact
    def __call__(self, x):
        if self.kind == "InstanceNorm":
            return nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5,
                                name="norm")(x)
        if self.kind.startswith("GroupNorm"):
            g = int(self.kind.replace("GroupNorm", ""))
            return nn.GroupNorm(num_groups=g, epsilon=1e-5, name="norm")(x)
        return x


class TFCTDFv3(nn.Module):
    """One TFC_TDF stack (``num_blocks_per_scale`` blocks)."""

    ch: int            # output channels
    dim_f: int         # freq bins at this scale
    n_blocks: int
    bn: int            # bottleneck factor
    norm: str
    act: str

    @nn.compact
    def __call__(self, x):
        act = _act(self.act)
        for j in range(self.n_blocks):
            s = nn.Conv(self.ch, (1, 1), use_bias=False,
                        name=f"b{j}_shortcut")(x)
            y = _Norm(self.norm, name=f"b{j}_tfc1_norm")(x)
            y = nn.Conv(self.ch, (3, 3), padding="SAME", use_bias=False,
                        name=f"b{j}_tfc1_conv")(act(y))
            z = act(_Norm(self.norm, name=f"b{j}_tdf_norm")(y))
            z = jnp.swapaxes(z, -1, -2)            # (b, t, ch, f)
            z = nn.Dense(self.dim_f // self.bn, use_bias=False,
                         name=f"b{j}_tdf1")(z)
            z = nn.Dense(self.dim_f, use_bias=False,
                         name=f"b{j}_tdf2")(act(z))
            y = y + jnp.swapaxes(z, -1, -2)
            w = act(_Norm(self.norm, name=f"b{j}_tfc2_norm")(y))
            w = nn.Conv(self.ch, (3, 3), padding="SAME", use_bias=False,
                        name=f"b{j}_tfc2_conv")(w)
            x = w + s
        return x


class TFCTDFNetV3(nn.Module):
    """audio (b, num_channels, n) -> (b, num_targets, num_channels, n)."""

    cfg: MDX23CConfig = MDX23CConfig()

    def _cac2cws(self, x):
        # (b, t, F, C) -> (b, t, F/k, C*k); channel index = c*k + subband,
        # subband s covering freq slice [s*F/k, (s+1)*F/k)
        k = self.cfg.num_subbands
        b, t, f, c = x.shape
        x = x.reshape(b, t, k, f // k, c)
        x = x.transpose(0, 1, 3, 4, 2)
        return x.reshape(b, t, f // k, c * k)

    def _cws2cac(self, x):
        k = self.cfg.num_subbands
        b, t, f, c = x.shape
        x = x.reshape(b, t, f, c // k, k)
        x = x.transpose(0, 1, 4, 2, 3)
        return x.reshape(b, t, f * k, c // k)

    @nn.compact
    def __call__(self, audio):
        c = self.cfg
        act = _act(c.act)
        b, ch, n = audio.shape
        n_bins = c.n_fft // 2 + 1
        re, im = stft(audio, n_fft=c.n_fft, hop=c.hop_length)
        # torch layout packs channels as [c0_re, c0_im, c1_re, c1_im]
        spec = jnp.stack([re, im], axis=2)          # (b, ch, 2, T, bins)
        t_frames = spec.shape[-2]
        tot = c.scale[0] ** c.num_scales
        if t_frames % tot:
            raise ValueError(
                f"{t_frames} STFT frames not divisible by {tot}; pick a "
                f"chunk with (n // hop + 1) % {tot} == 0")
        spec = spec.reshape(b, ch * 2, t_frames, n_bins)
        x = spec.transpose(0, 2, 3, 1)[:, :, : c.dim_f, :]  # (b,t,f,C)
        mix = x = self._cac2cws(x)                  # (b, t, f/k, dim_c)

        first = x = nn.Conv(c.channels, (1, 1), use_bias=False,
                            name="first_conv")(x)
        chs, dim_f = c.channels, c.dim_f // c.num_subbands
        skips = []
        for i in range(c.num_scales):
            x = TFCTDFv3(chs, dim_f, c.num_blocks_per_scale,
                         c.bottleneck_factor, c.norm, c.act,
                         name=f"enc_{i}")(x)
            skips.append(x)
            y = _Norm(c.norm, name=f"down_{i}_norm")(x)
            x = nn.Conv(chs + c.growth, c.scale, strides=c.scale,
                        use_bias=False, name=f"down_{i}_conv")(act(y))
            chs += c.growth
            dim_f //= c.scale[1]
        x = TFCTDFv3(chs, dim_f, c.num_blocks_per_scale,
                     c.bottleneck_factor, c.norm, c.act, name="mid")(x)
        for i in range(c.num_scales - 1, -1, -1):
            y = act(_Norm(c.norm, name=f"up_{i}_norm")(x))
            x = nn.ConvTranspose(chs - c.growth, c.scale, strides=c.scale,
                                 padding="VALID", use_bias=False,
                                 name=f"up_{i}_conv")(y)
            chs -= c.growth
            dim_f *= c.scale[1]
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = TFCTDFv3(chs, dim_f, c.num_blocks_per_scale,
                         c.bottleneck_factor, c.norm, c.act,
                         name=f"dec_{i}")(x)
        x = x * first                                # v3 multiplicative skip
        x = nn.Conv(c.channels, (1, 1), use_bias=False, name="final_conv1")(
            jnp.concatenate([mix, x], axis=-1))
        x = nn.Conv(c.num_targets * c.dim_c, (1, 1), use_bias=False,
                    name="final_conv2")(act(x))
        x = self._cws2cac(x)                         # (b, t, dim_f, nt*ch*2)
        x = x.transpose(0, 3, 1, 2)                  # (b, nt*ch*2, t, f)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, n_bins - c.dim_f)))
        x = x.reshape(b, c.num_targets, ch, 2, t_frames, n_bins)
        return istft(x[:, :, :, 0], x[:, :, :, 1], n_fft=c.n_fft,
                     hop=c.hop_length, length=n)

    def good_length(self, seconds: float) -> int:
        """Smallest sample count >= seconds whose frame count divides the
        U-Net's total time stride (torch feeds exact chunk_size)."""
        c = self.cfg
        tot = c.scale[0] ** c.num_scales
        frames = math.ceil((seconds * c.sample_rate / c.hop_length + 1)
                           / tot) * tot
        return (frames - 1) * c.hop_length
