"""AutoencoderDC (DC-AE) — ACE-Step's ``music_dcae_f8c8`` inner codec.

The reference loads ``diffusers.AutoencoderDC`` for the mel <-> latent
transform (modules/acestep/acestep/music_dcae/music_dcae_pipeline.py:11,40);
without it real ACE-Step checkpoints cannot produce audio.  This is a flax
re-implementation of the diffusers module graph
(diffusers/models/autoencoders/autoencoder_dc.py + the
SanaMultiscaleLinearAttention processor), config-driven so the published
checkpoint's ``config.json`` supplies the geometry (``config_from_json``).

Blocks (op-for-op from the diffusers source, which is itself the port of
han-lab's DC-AE — arXiv:2410.10733):
  - ResBlock: conv3x3 -> act -> conv3x3(no bias) -> RMSNorm(affine+bias)
    -> +residual
  - EfficientViTBlock: multiscale ReLU linear attention (+residual) then
    GLUMBConv (inverted conv -> silu -> depthwise -> GLU gate -> point
    conv -> RMSNorm) (+residual)
  - DCDownBlock2d: conv (stride 2, or stride 1 + pixel-unshuffle) with a
    channel-averaged pixel-unshuffle shortcut
  - DCUpBlock2d: interpolate+conv (or conv + pixel-shuffle) with a
    channel-repeated pixel-shuffle shortcut
  - encoder out_shortcut / decoder in_shortcut channel average / repeat

Layout: NHWC; for ACE-Step mels the image is (b, 128 mel bins, T, 2 ch).
All kernels are square and strides isotropic, so orientation is free —
the converter only fixes channel order (identical to torch's).

TPU notes: everything is convs + 1x1 matmuls (MXU); the linear attention
is two batched (hd+1, N) x (N, hd) matmuls — O(N) in sequence length, no
softmax, no masks; one jitted graph per (mel, T) shape.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DCAEConfig:
    """Field names/semantics mirror diffusers AutoencoderDC's config.
    Defaults are the f8c8 class geometry; real checkpoints override via
    ``config_from_json`` (music_dcae_f8c8/config.json)."""

    in_channels: int = 2
    latent_channels: int = 8
    attention_head_dim: int = 32
    encoder_block_types: tuple = ("ResBlock", "ResBlock", "ResBlock",
                                  "EfficientViTBlock")
    encoder_block_out_channels: tuple = (128, 256, 512, 512)
    encoder_layers_per_block: tuple = (2, 2, 2, 3)
    encoder_qkv_multiscales: tuple = ((), (), (), (5,))
    decoder_block_types: tuple = ("ResBlock", "ResBlock", "ResBlock",
                                  "EfficientViTBlock")
    decoder_block_out_channels: tuple = (128, 256, 512, 512)
    decoder_layers_per_block: tuple = (3, 3, 3, 3)
    decoder_qkv_multiscales: tuple = ((), (), (), (5,))
    decoder_norm_types: tuple | str = "rms_norm"
    decoder_act_fns: tuple | str = "silu"
    downsample_block_type: str = "conv"
    upsample_block_type: str = "interpolate"
    scaling_factor: float = 1.0


def config_from_json(path: str) -> DCAEConfig:
    """Build a DCAEConfig from a diffusers checkpoint dir or config.json."""
    if os.path.isdir(path):
        path = os.path.join(path, "config.json")
    with open(path) as f:
        c = json.load(f)

    def tup(x):
        if isinstance(x, str):
            return x
        return tuple(tuple(v) if isinstance(v, (list, tuple)) else v
                     for v in x)

    kw = {}
    for f_ in DCAEConfig.__dataclass_fields__:
        if f_ in c:
            v = c[f_]
            kw[f_] = tup(v) if isinstance(v, (list, tuple)) else v
    return DCAEConfig(**kw)


# ------------------------------------------------------------- primitives

class DCRMSNorm(nn.Module):
    """diffusers RMSNorm(eps=1e-5, affine, bias) over the channel axis;
    variance through an fp32 cast like the torch source."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x * (1.0 / jnp.sqrt(var + self.eps)).astype(x.dtype)
        d = x.shape[-1]
        y = y * self.param("weight", nn.initializers.ones, (d,))
        return y + self.param("bias", nn.initializers.zeros, (d,))


def _act(name: str):
    return {"silu": nn.silu, "relu": nn.relu,
            "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
            "gelu": nn.gelu}[name]


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC equivalent of torch.pixel_unshuffle channel order
    (out ch = c*r^2 + di*r + dj)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC equivalent of torch.pixel_shuffle (in ch = c*r^2 + di*r + dj)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c // (r * r))


class ResBlock(nn.Module):
    out_channels: int
    norm_type: str = "rms_norm"
    act_fn: str = "silu"

    @nn.compact
    def __call__(self, x):
        res = x
        h = nn.Conv(x.shape[-1], (3, 3), padding=1, name="conv1")(x)
        h = _act(self.act_fn)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = DCRMSNorm(name="norm")(h)
        return h + res


class SanaMultiscaleProjection(nn.Module):
    """Depthwise k x k conv + per-(head,qkv) 1x1 grouped conv, both
    bias-free (SanaMultiscaleAttentionProjection)."""

    heads: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        p = self.kernel_size // 2
        h = nn.Conv(c, (self.kernel_size, self.kernel_size), padding=p,
                    feature_group_count=c, use_bias=False, name="proj_in")(x)
        return nn.Conv(c, (1, 1), feature_group_count=3 * self.heads,
                       use_bias=False, name="proj_out")(h)


class SanaMultiscaleLinearAttention(nn.Module):
    """ReLU linear attention with multiscale depthwise aggregation
    (diffusers SanaMultiscaleLinearAttention +
    SanaMultiscaleAttnProcessor2_0, op-for-op)."""

    out_channels: int
    attention_head_dim: int = 32
    kernel_sizes: tuple = (5,)
    norm_type: str = "rms_norm"
    residual_connection: bool = True
    eps: float = 1e-15

    @nn.compact
    def __call__(self, x):
        b, hgt, wid, in_ch = x.shape
        hd = self.attention_head_dim
        heads = in_ch // hd  # mult=1.0
        inner = heads * hd
        res = x

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)
        qkv = jnp.concatenate([q, k, v], axis=-1)       # (b, H, W, 3I)

        scales = [qkv]
        for s, ks in enumerate(self.kernel_sizes):
            scales.append(SanaMultiscaleProjection(
                heads, ks, name=f"to_qkv_multiscale_{s}")(qkv))
        h = jnp.concatenate(scales, axis=-1)            # (b, H, W, 3I(1+S))

        n = hgt * wid
        use_linear = n > hd
        if use_linear:
            h = h.astype(jnp.float32)
        # channel-major groups of 3*hd, exactly like the torch reshape
        # (B, C, H, W) -> (B, -1, 3*hd, N): channels are laid out
        # NHWC here, so move channels first before grouping
        h = h.transpose(0, 3, 1, 2).reshape(b, -1, 3 * hd, n)
        query, key, value = jnp.split(h, 3, axis=2)     # (b, G, hd, n)
        query = nn.relu(query)
        key = nn.relu(key)

        if use_linear:
            value = jnp.pad(value, ((0, 0), (0, 0), (0, 1), (0, 0)),
                            constant_values=1.0)
            scores = value @ key.transpose(0, 1, 3, 2)  # (b, G, hd+1, hd)
            out = scores @ query                        # (b, G, hd+1, n)
            out = out.astype(jnp.float32)
            out = out[:, :, :-1] / (out[:, :, -1:] + self.eps)
            out = out.astype(x.dtype)
        else:
            scores = key.transpose(0, 1, 3, 2) @ query  # (b, G, n, n)
            scores = scores.astype(jnp.float32)
            scores = scores / (jnp.sum(scores, axis=2, keepdims=True)
                               + self.eps)
            out = value @ scores.astype(value.dtype)    # (b, G, hd, n)

        out = out.reshape(b, -1, hgt, wid).transpose(0, 2, 3, 1)
        out = nn.Dense(self.out_channels, use_bias=False, name="to_out")(out)
        out = DCRMSNorm(name="norm_out")(out)
        if self.residual_connection:
            out = out + res
        return out


class GLUMBConv(nn.Module):
    out_channels: int
    expand_ratio: float = 4.0
    norm_type: str | None = "rms_norm"
    residual_connection: bool = True

    @nn.compact
    def __call__(self, x):
        res = x
        hidden = int(self.expand_ratio * x.shape[-1])
        h = nn.Conv(hidden * 2, (1, 1), name="conv_inverted")(x)
        h = nn.silu(h)
        h = nn.Conv(hidden * 2, (3, 3), padding=1,
                    feature_group_count=hidden * 2, name="conv_depth")(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.silu(gate)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="conv_point")(h)
        if self.norm_type == "rms_norm":
            h = DCRMSNorm(name="norm")(h)
        if self.residual_connection:
            h = h + res
        return h


class EfficientViTBlock(nn.Module):
    attention_head_dim: int = 32
    qkv_multiscales: tuple = (5,)
    norm_type: str = "rms_norm"

    @nn.compact
    def __call__(self, x):
        x = SanaMultiscaleLinearAttention(
            x.shape[-1], self.attention_head_dim, tuple(self.qkv_multiscales),
            self.norm_type, residual_connection=True, name="attn")(x)
        return GLUMBConv(x.shape[-1], norm_type="rms_norm",
                         residual_connection=True, name="conv_out")(x)


def _block(block_type: str, out_ch: int, head_dim: int, norm: str, act: str,
           scales: tuple, name: str):
    if block_type == "ResBlock":
        return ResBlock(out_ch, norm, act, name=name)
    if block_type == "EfficientViTBlock":
        return EfficientViTBlock(head_dim, tuple(scales), norm, name=name)
    raise ValueError(block_type)


class DCDownBlock2d(nn.Module):
    out_channels: int
    downsample: bool = False  # True: stride-1 conv + pixel_unshuffle
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        f = 2
        conv_out = (self.out_channels // (f * f) if self.downsample
                    else self.out_channels)
        h = nn.Conv(conv_out, (3, 3),
                    strides=(1, 1) if self.downsample else (f, f),
                    padding=1, name="conv")(x)
        if self.downsample:
            h = pixel_unshuffle(h, f)
        if self.shortcut:
            g = x.shape[-1] * f * f // self.out_channels
            y = pixel_unshuffle(x, f)
            y = y.reshape(*y.shape[:-1], -1, g).mean(axis=-1)
            h = h + y
        return h


class DCUpBlock2d(nn.Module):
    out_channels: int
    interpolate: bool = False
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        f = 2
        if self.interpolate:
            b, hh, ww, c = x.shape
            up = jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)  # nearest
            h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv")(up)
        else:
            h = nn.Conv(self.out_channels * f * f, (3, 3), padding=1,
                        name="conv")(x)
            h = pixel_shuffle(h, f)
        if self.shortcut:
            r = self.out_channels * f * f // x.shape[-1]
            y = jnp.repeat(x, r, axis=-1)
            y = pixel_shuffle(y, f)
            h = h + y
        return h


# ------------------------------------------------------------ enc / dec

class DCAEEncoder(nn.Module):
    cfg: DCAEConfig = field(default_factory=DCAEConfig)

    @nn.compact
    def __call__(self, x):
        """(b, H, W, in_channels) -> (b, H/f, W/f, latent)."""
        c = self.cfg
        chans = c.encoder_block_out_channels
        layers = c.encoder_layers_per_block
        n = len(chans)
        if layers[0] > 0:
            x = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in")(x)
        else:
            x = DCDownBlock2d(chans[1],
                              c.downsample_block_type == "pixel_unshuffle",
                              shortcut=False, name="conv_in")(x)
        for i in range(n):
            for j in range(layers[i]):
                x = _block(c.encoder_block_types[i], chans[i],
                           c.attention_head_dim, "rms_norm", "silu",
                           c.encoder_qkv_multiscales[i],
                           name=f"down_{i}_{j}")(x)
            if i < n - 1 and layers[i] > 0:
                x = DCDownBlock2d(
                    chans[i + 1],
                    c.downsample_block_type == "pixel_unshuffle",
                    shortcut=True, name=f"down_{i}_{layers[i]}")(x)
        # out_shortcut: channel-group average of the last hidden
        g = chans[-1] // c.latent_channels
        y = x.reshape(*x.shape[:-1], -1, g).mean(axis=-1)
        return nn.Conv(c.latent_channels, (3, 3), padding=1,
                       name="conv_out")(x) + y


class DCAEDecoder(nn.Module):
    cfg: DCAEConfig = field(default_factory=DCAEConfig)

    @nn.compact
    def __call__(self, z):
        """(b, h, w, latent) -> (b, h*f, w*f, in_channels)."""
        c = self.cfg
        chans = c.decoder_block_out_channels
        layers = c.decoder_layers_per_block
        n = len(chans)
        norms = ((c.decoder_norm_types,) * n
                 if isinstance(c.decoder_norm_types, str)
                 else c.decoder_norm_types)
        acts = ((c.decoder_act_fns,) * n
                if isinstance(c.decoder_act_fns, str) else c.decoder_act_fns)
        x = nn.Conv(chans[-1], (3, 3), padding=1, name="conv_in")(z)
        x = x + jnp.repeat(z, chans[-1] // c.latent_channels, axis=-1)
        for i in range(n - 1, -1, -1):
            if i < n - 1 and layers[i] > 0:
                x = DCUpBlock2d(chans[i],
                                c.upsample_block_type == "interpolate",
                                shortcut=True, name=f"up_{i}_0")(x)
            off = 1 if (i < n - 1 and layers[i] > 0) else 0
            for j in range(layers[i]):
                x = _block(c.decoder_block_types[i], chans[i],
                           c.attention_head_dim, norms[i], acts[i],
                           c.decoder_qkv_multiscales[i],
                           name=f"up_{i}_{j + off}")(x)
        x = DCRMSNorm(name="norm_out")(x)
        x = nn.relu(x)
        if layers[0] > 0:
            return nn.Conv(c.in_channels, (3, 3), padding=1,
                           name="conv_out")(x)
        return DCUpBlock2d(c.in_channels,
                           c.upsample_block_type == "interpolate",
                           shortcut=False, name="conv_out")(x)


class AutoencoderDC(nn.Module):
    """encode/decode wrapper matching diffusers' module names."""

    cfg: DCAEConfig = field(default_factory=DCAEConfig)

    def setup(self):
        self.encoder = DCAEEncoder(self.cfg, name="encoder")
        self.decoder = DCAEDecoder(self.cfg, name="decoder")

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x):
        return self.decode(self.encode(x))


def spatial_compression(cfg: DCAEConfig) -> int:
    n_down = len(cfg.encoder_block_out_channels) - 1
    if cfg.encoder_layers_per_block[0] == 0:
        n_down += 1
    return 2 ** n_down
