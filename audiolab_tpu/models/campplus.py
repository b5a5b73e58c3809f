"""CAMPPlus speaker (xvector) encoder — checkpoint-compatible with the
copy bundled in Chatterbox's ``s3gen.safetensors`` under
``speaker_encoder.`` (the 3D-Speaker/modelscope CAMPPlus that CosyVoice
and the published chatterbox package use to embed reference audio for
the S3Gen flow; reference layouts/tts.py:381 loads it inside
ChatterboxTTS.from_pretrained).

Published topology (campplus.py in 3D-Speaker, mirrored by the seeded
replica in tests/torch_campplus_replica.py):

  head      FCM — 2-D conv front end over (1, mel, T): conv1+bn1, two
            residual stages of BasicResBlock pairs (freq-stride 2 on the
            first block of each), conv2+bn2 with stride (2, 1); output
            reshaped to (C*mel/8, T) channels
  xvector   Sequential:
              tdnn       TDNNLayer Conv1d(320->128, k5, stride 2) + BN+ReLU
              block1..3  CAMDenseTDNNBlock — dense concat of
                         (12, 24, 16) CAMDenseTDNNLayers (bottleneck
                         1x1 to 128, CAM-gated k3 conv to growth 32,
                         dilations 1/2/2), BN+ReLU pre-activations
              transit1..3  BN+ReLU then 1x1 conv halving channels
              out_nonlinear  BN+ReLU
              stats      mean ++ unbiased std over time
              dense      1x1 conv (no bias) + BatchNorm(affine=False)

  CAM gate: sigmoid MLP over (global mean + 100-frame segment means),
  multiplying the local conv path.

Inference front end (chatterbox xvector.py ``inference``): kaldi fbank
80 mel / 16 kHz / dither 0 (kernels/kaldi.py), per-utterance CMN.

TPU design: NTC/NHWC layouts, BatchNorm folded to frozen affine
normalisation (inference), the CAM segment pooling is a static
pad+reshape mean — everything jit-compatible, no dynamic shapes.

Converter: utils/convert.convert_campplus (prefix ``speaker_encoder.``
for s3gen.safetensors); parity: tests/test_campplus_parity.py."""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.layers import Conv1d


@dataclass(frozen=True)
class CAMPPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    m_channels: int = 32
    block_layers: tuple = (12, 24, 16)
    block_kernels: tuple = (3, 3, 3)
    block_dilations: tuple = (1, 2, 2)
    seg_len: int = 100

    @property
    def head_out_channels(self) -> int:
        return self.m_channels * (self.feat_dim // 8)


class BNInfer(nn.Module):
    """Frozen inference BatchNorm1d/2d over the last axis: running stats
    + optional affine, as a pure normalisation (no batch statistics)."""

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * self.param("scale", nn.initializers.ones, (c,))
            y = y + self.param("bias", nn.initializers.zeros, (c,))
        return y


class BNReLU(nn.Module):
    """get_nonlinear('batchnorm-relu')."""

    @nn.compact
    def __call__(self, x):
        return nn.relu(BNInfer(name="batchnorm")(x))


class BasicResBlock(nn.Module):
    """FCM residual 2-D block; stride downsamples the FREQ axis only
    (torch stride=(s, 1) over (B, C, F, T) — here NHWC (B, F, T, C))."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        s = (self.stride, 1)
        y = nn.Conv(self.planes, (3, 3), strides=s, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.relu(BNInfer(name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = BNInfer(name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=s, use_bias=False,
                        name="shortcut_conv")(x)
            x = BNInfer(name="shortcut_bn")(x)
        return nn.relu(y + x)


class FCM(nn.Module):
    cfg: CAMPPlusConfig

    @nn.compact
    def __call__(self, feat):
        """(b, t, mel) -> (b, t, m_channels * mel/8)."""
        c = self.cfg
        x = feat.transpose(0, 2, 1)[..., None]  # (b, mel, t, 1) NHWC
        x = nn.Conv(c.m_channels, (3, 3), padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(BNInfer(name="bn1")(x))
        for li, name in enumerate(("layer1", "layer2")):
            for bi in range(2):
                x = BasicResBlock(c.m_channels, stride=2 if bi == 0 else 1,
                                  name=f"{name}_{bi}")(x)
        x = nn.Conv(c.m_channels, (3, 3), strides=(2, 1), padding=1,
                    use_bias=False, name="conv2")(x)
        x = nn.relu(BNInfer(name="bn2")(x))
        # torch reshape (b, C, F', T) -> (b, C*F', T): channel-major
        b, f, t, ch = x.shape
        return x.transpose(0, 2, 3, 1).reshape(b, t, ch * f)


class CAMLayer(nn.Module):
    """Context-aware mask: local conv gated by a sigmoid MLP over
    global-mean + segment-mean context."""

    bn_channels: int
    out_channels: int
    kernel: int
    dilation: int
    seg_len: int = 100
    reduction: int = 2

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 * self.dilation
        y = Conv1d(self.out_channels, self.kernel, dilation=self.dilation,
                   padding=pad, use_bias=False, name="linear_local")(x)
        t = x.shape[1]
        n_seg = -(-t // self.seg_len)
        xp = jnp.pad(x, ((0, 0), (0, n_seg * self.seg_len - t), (0, 0)))
        seg_sum = xp.reshape(x.shape[0], n_seg, self.seg_len,
                             x.shape[-1]).sum(axis=2)
        # avg_pool1d(ceil_mode=True, padding=0): the tail window divides
        # by its VALID length
        lens = jnp.minimum(
            t - jnp.arange(n_seg) * self.seg_len, self.seg_len)
        seg = seg_sum / lens[None, :, None]
        seg = jnp.repeat(seg, self.seg_len, axis=1)[:, :t]
        context = jnp.mean(x, axis=1, keepdims=True) + seg
        h = nn.relu(Conv1d(self.bn_channels // self.reduction, 1,
                           name="linear1")(context))
        m = jax.nn.sigmoid(Conv1d(self.out_channels, 1, name="linear2")(h))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    cfg: CAMPPlusConfig
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        bn_ch = c.bn_size * c.growth_rate
        h = BNReLU(name="nonlinear1")(x)
        h = Conv1d(bn_ch, 1, use_bias=False, name="linear1")(h)
        h = BNReLU(name="nonlinear2")(h)
        return CAMLayer(bn_ch, c.growth_rate, self.kernel, self.dilation,
                        c.seg_len, name="cam_layer")(h)


class CAMPPlus(nn.Module):
    """(b, t, feat_dim) CMN fbank -> (b, embedding_size)."""

    cfg: CAMPPlusConfig = CAMPPlusConfig()

    @nn.compact
    def __call__(self, feat):
        c = self.cfg
        x = FCM(c, name="head")(feat)
        x = Conv1d(c.init_channels, 5, stride=2, padding=2, use_bias=False,
                   name="tdnn_linear")(x)
        x = BNReLU(name="tdnn_nonlinear")(x)
        ch = c.init_channels
        for i, (n_layers, k, d) in enumerate(zip(
                c.block_layers, c.block_kernels, c.block_dilations)):
            for li in range(n_layers):
                y = CAMDenseTDNNLayer(c, k, d,
                                      name=f"block{i + 1}_tdnnd{li + 1}")(x)
                x = jnp.concatenate([x, y], axis=-1)
            ch += n_layers * c.growth_rate
            x = BNReLU(name=f"transit{i + 1}_nonlinear")(x)
            x = Conv1d(ch // 2, 1, use_bias=False,
                       name=f"transit{i + 1}_linear")(x)
            ch //= 2
        x = BNReLU(name="out_nonlinear")(x)
        mean = jnp.mean(x, axis=1)
        # torch .std(unbiased=True)
        var = jnp.sum((x - mean[:, None]) ** 2, axis=1) / (x.shape[1] - 1)
        stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)
        e = nn.Dense(c.embedding_size, use_bias=False,
                     name="dense_linear")(stats)
        return BNInfer(affine=False, name="dense_nonlinear")(e)


def campplus_xvector(params: dict, wav16k: np.ndarray,
                     cfg: CAMPPlusConfig = CAMPPlusConfig()) -> np.ndarray:
    """Reference wav (n,) at 16 kHz -> (embedding_size,) xvector
    (chatterbox xvector.py inference: kaldi fbank + CMN)."""
    from audiolab_tpu.kernels.kaldi import kaldi_fbank

    feat = kaldi_fbank(jnp.asarray(wav16k, jnp.float32)[None],
                       n_mels=cfg.feat_dim)
    feat = feat - jnp.mean(feat, axis=1, keepdims=True)
    return np.asarray(CAMPPlus(cfg).apply({"params": params}, feat)[0])
