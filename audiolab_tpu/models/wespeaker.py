"""WeSpeaker ResNet34 speaker-embedding model (r-vector).

The reference's diarization pipeline is pyannote/speaker-diarization-3.1
(modules/cloning/speaker_separation.py:39-45), whose embedding stage is
``pyannote/wespeaker-voxceleb-resnet34-LM`` — the WeSpeaker toolkit's
ResNet34 r-vector: a plain ResNet-34 (m_channels=32, blocks 3/4/6/3) run
over the 80-bin kaldi fbank treated as a (freq, time) image, temporal
statistics pooling (mean ++ unbiased std over time of the flattened
channel x freq map), and one linear projection to a 256-d embedding.
Together with the converted segmentation-3.0 PyanNet
(models/pyannet.py), this completes the 3.1 stack: both neural stages
of the pipeline are checkpoint-compatible.

Front end (wespeaker's wav front end, mirrored by pyannote's wrapper):
torchaudio-kaldi fbank, 80 mels / 25 ms / 10 ms / dither 0
(kernels/kaldi.py), then per-utterance cepstral mean subtraction.

TPU design notes: NHWC conv layout as (batch, freq, time, chan) so the
three stride-2 stages shrink both axes on the MXU-friendly channel-last
path; BatchNorms are inference-folded to per-channel affines at
conversion time (utils/convert.wespeaker_mapping, bnfold kinds);
statistics pooling is two reductions — the whole forward is one jitted
graph with static shapes.

Converter: utils/convert.convert_wespeaker / load_wespeaker_checkpoint;
parity: tests/test_wespeaker_parity.py vs a seeded torch replica with
the published checkpoint's key names.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.kaldi import kaldi_fbank


@dataclass(frozen=True)
class WeSpeakerConfig:
    feat_dim: int = 80
    embed_dim: int = 256
    m_channels: int = 32
    num_blocks: tuple = (3, 4, 6, 3)      # ResNet34
    two_emb_layer: bool = False           # voxceleb-resnet34-LM: False
    sr: int = 16000


class Affine(nn.Module):
    """Per-channel scale+bias over the last axis — an inference-folded
    BatchNorm (scale = w/sqrt(var+eps), bias = b - mean*scale)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


class BasicBlock(nn.Module):
    """wespeaker models/resnet.py BasicBlock: conv3x3-bn-relu,
    conv3x3-bn, += shortcut (1x1 conv+bn when shape changes), relu."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        p = ((1, 1), (1, 1))
        s = (self.stride, self.stride)
        h = nn.Conv(self.planes, (3, 3), strides=s, padding=p,
                    use_bias=False, name="conv1")(x)
        h = nn.relu(Affine(name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=p, use_bias=False,
                    name="conv2")(h)
        h = Affine(name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=s, padding="VALID",
                        use_bias=False, name="short_conv")(x)
            x = Affine(name="short_bn")(x)
        return nn.relu(h + x)


class WeSpeakerResNet(nn.Module):
    cfg: WeSpeakerConfig = WeSpeakerConfig()

    @nn.compact
    def __call__(self, fbank):
        """fbank (b, t, feat_dim), already CMN'd -> (b, embed_dim).

        Matches wespeaker ResNet.forward: the fbank is transposed to a
        (freq, time) image with one input channel.
        """
        c = self.cfg
        x = fbank.transpose(0, 2, 1)[..., None]      # (b, F, T, 1)
        x = nn.Conv(c.m_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv1")(x)
        x = nn.relu(Affine(name="bn1")(x))
        for li, (nb, stride) in enumerate(
                zip(c.num_blocks, (1, 2, 2, 2)), start=1):
            planes = c.m_channels * (2 ** (li - 1))
            for bi in range(nb):
                x = BasicBlock(planes, stride if bi == 0 else 1,
                               name=f"layer{li}_block{bi}")(x)
        # TSTP: torch flattens (b, C, F', T') -> (b, C*F', T') then takes
        # mean ++ unbiased std over time; replicate that exact ordering
        b, fdim, tdim, ch = x.shape
        x = x.transpose(0, 3, 1, 2).reshape(b, ch * fdim, tdim)
        mean = jnp.mean(x, axis=-1)
        var = jnp.sum((x - mean[..., None]) ** 2, axis=-1) / max(tdim - 1, 1)
        stats = jnp.concatenate([mean, jnp.sqrt(var + 1e-7)], axis=-1)
        embed_a = nn.Dense(c.embed_dim, name="seg_1")(stats)
        if not c.two_emb_layer:
            return embed_a
        h = Affine(name="seg_bn_1")(nn.relu(embed_a))
        return nn.Dense(c.embed_dim, name="seg_2")(h)


def wespeaker_fbank(wav: np.ndarray, sr: int = 16000,
                    n_mels: int = 80) -> jnp.ndarray:
    """wespeaker/pyannote front end: kaldi fbank (dither 0) +
    per-utterance cepstral mean subtraction.  wav (b, n) or (n,)."""
    w = jnp.asarray(wav, jnp.float32)
    if w.ndim == 1:
        w = w[None]
    fb = kaldi_fbank(w, sr=sr, n_mels=n_mels)
    return fb - jnp.mean(fb, axis=1, keepdims=True)


def wespeaker_embed(model: WeSpeakerResNet, params, wav: np.ndarray,
                    sr: int = 16000) -> jnp.ndarray:
    """Raw wav (b, n) -> L2-normalised (b, embed_dim) embeddings."""
    fb = wespeaker_fbank(wav, sr=sr, n_mels=model.cfg.feat_dim)
    e = model.apply({"params": params}, fb)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-9)
