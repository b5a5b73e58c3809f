"""UVR "VR architecture" nets (vocal-remover CascadedASPPNet/CascadedNet),
checkpoint-compatible.

The reference's separator runs several VR .pth checkpoints through
audio-separator: the woodwinds split (``17_HP-Wind_Inst-UVR.pth``,
stem_separator.py:114,596), noise removal (``UVR-DeNoise.pth``, :148,799),
echo removal (``UVR-De-Echo-*.pth``, :1048-1050) and the background-vocal
karaoke split (``UVR-BVE-4B_SN-44100-1.pth``, :752).  Those weights are
tsurumeso vocal-remover nets in two generations:

* ``CascadedASPPNet`` (lib_v5 nets.py) — three cascaded ASPP U-Nets over a
  low/high band split, separable dilated convs in the ASPP, aux heads.
* ``CascadedNet`` (lib_v5 nets_new.py) — per-band two-stage cascades of
  BaseNets with a BiLSTM bottleneck at the dec2 level.

Both consume a magnitude spectrogram (the multiband "combined" spec built
by vr_bands.py) and emit a sigmoid mask over ``n_fft//2 + 1`` bins.

TPU notes: inference-only, so every torch BatchNorm is FOLDED into a
per-channel affine at conversion time (no batch_stats collections, one
fused multiply-add that XLA merges into the conv); bilinear x2 upsampling
(align_corners) is two dense gather-lerps; convs run NHWC (bins=H,
frames=W) on the MXU.

Converted by ``utils.convert.convert_vr`` / ``load_vr_checkpoint`` (arch
and widths auto-detected from the state dict).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class VRConfig:
    arch: str = "cascaded_net"   # cascaded_net (nets_new) | cascaded_asppnet
    n_fft: int = 2048            # 2 * combined-spec bins (model param json)
    # old arch width; new arch nout/nout_lstm
    ch: int = 32
    nout: int = 32
    nout_lstm: int = 128
    # ASPP dilations: old nets use (4, 8, 16); new nets 2-D (freq, time)
    dilations: tuple = (4, 8, 16)
    dilations_new: tuple = ((4, 2), (8, 4), (12, 6))

    @property
    def max_bin(self) -> int:
        return self.n_fft // 2

    @property
    def output_bin(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def offset(self) -> int:
        """Frames to crop from each side of a window (lib_v5 nets)."""
        return 128 if self.arch == "cascaded_asppnet" else 64


def _bilinear_ac(x, out_h, out_w):
    """F.interpolate(mode='bilinear', align_corners=True) on NHWC."""
    b, h, w, c = x.shape

    def lerp(arr, axis_len, n_out, axis):
        if axis_len == n_out:
            return arr
        if axis_len == 1:
            reps = [1, 1, 1, 1]
            reps[axis] = n_out
            return jnp.tile(arr, reps)
        pos = jnp.arange(n_out) * (axis_len - 1) / (n_out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, axis_len - 1)
        wl = (1.0 - (pos - lo)).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        bb = jnp.take(arr, hi, axis=axis)
        shape = [1, 1, 1, 1]
        shape[axis] = n_out
        wl = wl.reshape(shape)
        return a * wl + bb * (1 - wl)

    x = lerp(x, h, out_h, 1)
    return lerp(x, w, out_w, 2)


def _crop_center(skip, w):
    """spec_utils.crop_center: center-crop the TIME axis only."""
    sw = skip.shape[2]
    if sw == w:
        return skip
    s = (sw - w) // 2
    return skip[:, :, s:s + w]


class FoldedBN(nn.Module):
    """torch BatchNorm folded to y = x * scale + bias (eval mode)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class ConvBNActiv(nn.Module):
    """lib_v5 layers.Conv2DBNActiv: conv(bias=False) + BN + activ."""

    nout: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    activ: str = "relu"

    @nn.compact
    def __call__(self, x):
        p = _pair(self.pad)
        d = _pair(self.dilation)
        x = nn.Conv(self.nout, _pair(self.ksize), strides=_pair(self.stride),
                    padding=(p, p) if isinstance(self.pad, int) else
                    ((p[0], p[0]), (p[1], p[1])),
                    kernel_dilation=d, use_bias=False, name="conv")(x)
        x = FoldedBN(name="bn")(x)
        if self.activ == "relu":
            return nn.relu(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class SepConvBNActiv(nn.Module):
    """lib_v5 layers.SeperableConv2DBNActiv: depthwise + pointwise + BN."""

    nout: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    activ: str = "relu"

    @nn.compact
    def __call__(self, x):
        nin = x.shape[-1]
        p = _pair(self.pad)
        x = nn.Conv(nin, _pair(self.ksize), strides=_pair(self.stride),
                    padding=((p[0], p[0]), (p[1], p[1])),
                    kernel_dilation=_pair(self.dilation),
                    feature_group_count=nin, use_bias=False, name="dw")(x)
        x = nn.Conv(self.nout, (1, 1), use_bias=False, name="pw")(x)
        x = FoldedBN(name="bn")(x)
        if self.activ == "relu":
            return nn.relu(x)
        return nn.leaky_relu(x, negative_slope=0.01)


# ----------------------------------------------------- old arch (nets.py)

class EncoderV5(nn.Module):
    nout: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        skip = ConvBNActiv(self.nout, 3, 1, 1, activ="leaky", name="conv1")(x)
        h = ConvBNActiv(self.nout, 3, self.stride, 1, activ="leaky",
                        name="conv2")(skip)
        return h, skip


class DecoderV5(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = _bilinear_ac(x, x.shape[1] * 2, x.shape[2] * 2)
        if skip is not None:
            skip = _crop_center(skip, x.shape[2])
            x = jnp.concatenate([x, skip], axis=-1)
        return ConvBNActiv(self.nout, 3, 1, 1, name="conv")(x)


class ASPPModuleV5(nn.Module):
    nout: int
    dilations: tuple = (4, 8, 16)

    @nn.compact
    def __call__(self, x):
        nin = x.shape[-1]
        h, w = x.shape[1], x.shape[2]
        pooled = jnp.mean(x, axis=1, keepdims=True)  # AdaptiveAvgPool (1, W)
        feat1 = _bilinear_ac(ConvBNActiv(nin, 1, 1, 0, name="conv1")(pooled),
                             h, w)
        feat2 = ConvBNActiv(nin, 1, 1, 0, name="conv2")(x)
        feats = [feat1, feat2]
        for i, d in enumerate(self.dilations):
            feats.append(SepConvBNActiv(nin, 3, 1, d, d,
                                        name=f"conv{i + 3}")(x))
        out = jnp.concatenate(feats, axis=-1)
        return ConvBNActiv(self.nout, 1, 1, 0, name="bottleneck")(out)


class BaseASPPNet(nn.Module):
    ch: int
    dilations: tuple = (4, 8, 16)

    @nn.compact
    def __call__(self, x):
        ch = self.ch
        h, e1 = EncoderV5(ch, name="enc1")(x)
        h, e2 = EncoderV5(ch * 2, name="enc2")(h)
        h, e3 = EncoderV5(ch * 4, name="enc3")(h)
        h, e4 = EncoderV5(ch * 8, name="enc4")(h)
        h = ASPPModuleV5(ch * 16, self.dilations, name="aspp")(h)
        h = DecoderV5(ch * 8, name="dec4")(h, e4)
        h = DecoderV5(ch * 4, name="dec3")(h, e3)
        h = DecoderV5(ch * 2, name="dec2")(h, e2)
        h = DecoderV5(ch, name="dec1")(h, e1)
        return h


class CascadedASPPNet(nn.Module):
    """lib_v5 nets.py: input magnitude (b, bins, frames, 2) -> mask
    (b, output_bin, frames, 2)."""

    cfg: VRConfig = VRConfig(arch="cascaded_asppnet")

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x[:, : c.max_bin]
        bandw = x.shape[1] // 2
        aux1 = jnp.concatenate([
            BaseASPPNet(c.ch, c.dilations,
                        name="stg1_low_band_net")(x[:, :bandw]),
            BaseASPPNet(c.ch, c.dilations,
                        name="stg1_high_band_net")(x[:, bandw:]),
        ], axis=1)
        h = jnp.concatenate([x, aux1], axis=-1)
        aux2 = BaseASPPNet(c.ch, c.dilations, name="stg2_full_band_net")(
            ConvBNActiv(c.ch // 2, 1, 1, 0, name="stg2_bridge")(h))
        h = jnp.concatenate([x, aux1, aux2], axis=-1)
        h = BaseASPPNet(c.ch * 2, c.dilations, name="stg3_full_band_net")(
            ConvBNActiv(c.ch, 1, 1, 0, name="stg3_bridge")(h))
        mask = nn.sigmoid(nn.Conv(2, (1, 1), use_bias=False, name="out")(h))
        pad = c.output_bin - mask.shape[1]
        return jnp.pad(mask, ((0, 0), (0, pad), (0, 0), (0, 0)),
                       mode="edge")


# ------------------------------------------------- new arch (nets_new.py)

class EncoderNew(nn.Module):
    nout: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        x = ConvBNActiv(self.nout, 3, self.stride, 1, activ="leaky",
                        name="conv1")(x)
        return ConvBNActiv(self.nout, 3, 1, 1, activ="leaky",
                           name="conv2")(x)


class DecoderNew(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = _bilinear_ac(x, x.shape[1] * 2, x.shape[2] * 2)
        if skip is not None:
            skip = _crop_center(skip, x.shape[2])
            x = jnp.concatenate([x, skip], axis=-1)
        return ConvBNActiv(self.nout, 3, 1, 1, name="conv1")(x)


class ASPPModuleNew(nn.Module):
    nout: int
    dilations: tuple = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        pooled = jnp.mean(x, axis=1, keepdims=True)
        feat1 = _bilinear_ac(
            ConvBNActiv(self.nout, 1, 1, 0, name="conv1")(pooled), h, w)
        feats = [feat1, ConvBNActiv(self.nout, 1, 1, 0, name="conv2")(x)]
        for i, d in enumerate(self.dilations):
            feats.append(ConvBNActiv(self.nout, 3, 1, d, d,
                                     name=f"conv{i + 3}")(x))
        out = jnp.concatenate(feats, axis=-1)
        return nn.Conv(self.nout, (1, 1), use_bias=False,
                       name="bottleneck")(out)


class LSTMModule(nn.Module):
    """Conv to 1 channel -> frame-major BiLSTM over bins -> dense back."""

    nout_lstm: int

    @nn.compact
    def __call__(self, x):
        from audiolab_tpu.models.pyannet import TorchBiLSTM

        b, bins, frames, _ = x.shape
        h = ConvBNActiv(1, 1, 1, 0, name="conv")(x)[..., 0]  # (b, bins, t)
        h = jnp.swapaxes(h, 1, 2)                            # (b, t, bins)
        h = TorchBiLSTM(self.nout_lstm // 2, 1, name="lstm")(h)
        h = nn.Dense(bins, name="dense")(h)
        h = nn.relu(FoldedBN(name="dense_bn")(h))
        return jnp.swapaxes(h, 1, 2)[..., None]              # (b,bins,t,1)


class BaseNetNew(nn.Module):
    nout: int
    nout_lstm: int
    dilations: tuple = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        n = self.nout
        e1 = ConvBNActiv(n, 3, 1, 1, name="enc1")(x)
        e2 = EncoderNew(n * 2, name="enc2")(e1)
        e3 = EncoderNew(n * 4, name="enc3")(e2)
        e4 = EncoderNew(n * 6, name="enc4")(e3)
        e5 = EncoderNew(n * 8, name="enc5")(e4)
        h = ASPPModuleNew(n * 8, self.dilations, name="aspp")(e5)
        h = DecoderNew(n * 6, name="dec4")(h, e4)
        h = DecoderNew(n * 4, name="dec3")(h, e3)
        h = DecoderNew(n * 2, name="dec2")(h, e2)
        h = jnp.concatenate(
            [h, LSTMModule(self.nout_lstm, name="lstm_dec2")(h)], axis=-1)
        return DecoderNew(n, name="dec1")(h, e1)


class CascadedNet(nn.Module):
    """lib_v5 nets_new.py: magnitude (b, bins, frames, 2) -> mask."""

    cfg: VRConfig = VRConfig(arch="cascaded_net")

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        nout, nl = c.nout, c.nout_lstm
        x = x[:, : c.max_bin]
        bandw = x.shape[1] // 2
        l1_in, h1_in = x[:, :bandw], x[:, bandw:]
        l1 = BaseNetNew(nout // 2, nl, c.dilations_new,
                        name="stg1_low_band_net_0")(l1_in)
        l1 = ConvBNActiv(nout // 4, 1, 1, 0,
                         name="stg1_low_band_net_1")(l1)
        h1 = BaseNetNew(nout // 4, nl // 2, c.dilations_new,
                        name="stg1_high_band_net")(h1_in)
        aux1 = jnp.concatenate([l1, h1], axis=1)
        l2_in = jnp.concatenate([l1_in, l1], axis=-1)
        h2_in = jnp.concatenate([h1_in, h1], axis=-1)
        l2 = BaseNetNew(nout, nl, c.dilations_new,
                        name="stg2_low_band_net_0")(l2_in)
        l2 = ConvBNActiv(nout // 2, 1, 1, 0,
                         name="stg2_low_band_net_1")(l2)
        h2 = BaseNetNew(nout // 2, nl // 2, c.dilations_new,
                        name="stg2_high_band_net")(h2_in)
        aux2 = jnp.concatenate([l2, h2], axis=1)
        f3_in = jnp.concatenate([x, aux1, aux2], axis=-1)
        f3 = BaseNetNew(nout, nl, c.dilations_new,
                        name="stg3_full_band_net")(f3_in)
        mask = nn.sigmoid(nn.Conv(2, (1, 1), use_bias=False, name="out")(f3))
        pad = c.output_bin - mask.shape[1]
        return jnp.pad(mask, ((0, 0), (0, pad), (0, 0), (0, 0)),
                       mode="edge")


def make_vr_net(cfg: VRConfig):
    if cfg.arch == "cascaded_asppnet":
        return CascadedASPPNet(cfg)
    return CascadedNet(cfg)


def infer_vr_config(sd: dict, n_fft: int | None = None) -> VRConfig:
    """Sniff arch + widths from a UVR .pth state dict."""
    if any(k.startswith("stg2_bridge.") for k in sd):
        ch = sd["stg1_low_band_net.enc1.conv1.conv.0.weight"].shape[0]
        return VRConfig(arch="cascaded_asppnet", ch=int(ch),
                        n_fft=n_fft or 2048)
    out_w = sd["out.weight"]
    nout = int(out_w.shape[1])
    ih = sd["stg1_low_band_net.0.lstm_dec2.lstm.weight_ih_l0"]
    nout_lstm = int(ih.shape[0]) // 2          # 4 gates * (nout_lstm // 2)
    inferred_nfft = int(ih.shape[1]) * 8       # in = max_bin // 4
    return VRConfig(arch="cascaded_net", nout=nout, nout_lstm=nout_lstm,
                    n_fft=n_fft or inferred_nfft)
