"""Shared flax building blocks for the model zoo.

VITS-style components used by the RVC synthesizer (reference architectures:
modules/rvc/infer/lib/infer_pack/attentions.py — Encoder with windowed
relative attention; modules/rvc/lib/modules.py — WN, ResBlock1).  All
tensors are NTC/NWC (time-major-channel-last), the TPU-friendly layout;
torch NCT weights are transposed once at conversion.

Weight norm note: torch wraps many convs in weight_norm.  For inference and
for our training runs we use plain kernels; the converter folds
g * v / ||v|| into a single kernel (numerically identical at convergence).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


def lrelu(x: jnp.ndarray, slope: float = LRELU_SLOPE) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(b,) lengths -> (b, max_len) bool mask."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


class Conv1d(nn.Module):
    """1-D conv over NTC with torch-style 'same' padding semantics."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    padding: str | int | None = None  # None -> torch get_padding (same)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.padding is None:
            pad = (self.kernel_size * self.dilation - self.dilation) // 2
        elif isinstance(self.padding, int):
            pad = self.padding
        else:
            pad = self.padding
        padding = [(pad, pad)] if isinstance(pad, int) else pad
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=padding,
            use_bias=self.use_bias,
        )(x)


class RelPositionMultiHeadAttention(nn.Module):
    """VITS windowed-relative-position self-attention
    (attentions.py MultiHeadAttention with window_size)."""

    channels: int
    n_heads: int
    window_size: int = 10

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        b, t, _ = x.shape
        h = self.n_heads
        k_ch = self.channels // h

        q = nn.Dense(self.channels, name="conv_q")(x)
        k = nn.Dense(self.channels, name="conv_k")(x)
        v = nn.Dense(self.channels, name="conv_v")(x)

        q = q.reshape(b, t, h, k_ch).transpose(0, 2, 1, 3)  # (b,h,t,d)
        k = k.reshape(b, t, h, k_ch).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, k_ch).transpose(0, 2, 1, 3)

        scale = 1.0 / np.sqrt(k_ch)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale

        # relative position logits (single shared head bank, n_heads_rel=1)
        w = self.window_size
        emb_k = self.param(
            "emb_rel_k",
            nn.initializers.normal(stddev=k_ch**-0.5),
            (1, 2 * w + 1, k_ch),
        )
        rel = self._get_relative_embeddings(emb_k, t, w)  # (1, 2t-1, d)
        rel_logits = jnp.einsum("bhqd,xmd->bhqm", q, rel) * scale  # (b,h,t,2t-1)
        scores = scores + self._relative_to_absolute(rel_logits)

        if mask is not None:
            scores = jnp.where(mask, scores, -1e4)
        probs = jax.nn.softmax(scores, axis=-1)

        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        # relative position values
        emb_v = self.param(
            "emb_rel_v",
            nn.initializers.normal(stddev=k_ch**-0.5),
            (1, 2 * w + 1, k_ch),
        )
        rel_v = self._get_relative_embeddings(emb_v, t, w)
        p_rel = self._absolute_to_relative(probs)  # (b,h,t,2t-1)
        out = out + jnp.einsum("bhqm,xmd->bhqd", p_rel, rel_v)

        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        return nn.Dense(self.channels, name="conv_o")(out)

    @staticmethod
    def _get_relative_embeddings(emb: jnp.ndarray, length: int, window: int) -> jnp.ndarray:
        """Pad/slice the (1, 2w+1, d) bank to (1, 2*length-1, d)."""
        pad = max(length - (window + 1), 0)
        start = max((window + 1) - length, 0)
        if pad > 0:
            emb = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
        return emb[:, start : start + 2 * length - 1]

    @staticmethod
    def _relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
        """(b,h,t,2t-1) rel logits -> (b,h,t,t) absolute (VITS index shift)."""
        b, h, t, _ = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
        x = x.reshape(b, h, t * 2 * t)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
        return x.reshape(b, h, t + 1, 2 * t - 1)[:, :, :t, t - 1 :]

    @staticmethod
    def _absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
        """(b,h,t,t) -> (b,h,t,2t-1)."""
        b, h, t, _ = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
        x = x.reshape(b, h, t * (2 * t - 1))
        x = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))
        return x.reshape(b, h, t, 2 * t)[:, :, :, 1:]


class FFN(nn.Module):
    """Conv feed-forward (attentions.py FFN): conv k -> relu -> conv k."""

    channels: int
    filter_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        if mask is not None:
            x = x * mask
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(x)
        x = nn.relu(x)
        if mask is not None:
            x = x * mask
        x = Conv1d(self.channels, self.kernel_size, name="conv_2")(x)
        if mask is not None:
            x = x * mask
        return x


class TransformerEncoder(nn.Module):
    """attentions.Encoder: n_layers of (rel-MHA + LN, FFN + LN), post-norm."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 3
    window_size: int = 10

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray) -> jnp.ndarray:
        # x (b, t, c); x_mask (b, t, 1)
        attn_mask = (x_mask[:, None, :, 0][..., None] * x_mask[:, None, None, :, 0]) > 0
        x = x * x_mask
        for i in range(self.n_layers):
            y = RelPositionMultiHeadAttention(
                self.hidden_channels, self.n_heads, self.window_size,
                name=f"attn_{i}",
            )(x * x_mask, attn_mask)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(x + y)  # torch LN eps (modules.py:18)
            y = FFN(
                self.hidden_channels, self.filter_channels, self.kernel_size,
                name=f"ffn_{i}",
            )(x, x_mask)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(x + y)
        return x * x_mask


class WN(nn.Module):
    """WaveNet residual stack with gated tanh units + global conditioning
    (modules.py WN — used by PosteriorEncoder and coupling layers)."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_mask: jnp.ndarray, g: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        # x (b, t, hidden); g (b, 1, gin)
        output = jnp.zeros_like(x)
        if g is not None:
            g_all = Conv1d(2 * self.hidden_channels * self.n_layers, 1, name="cond_layer")(g)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            x_in = Conv1d(
                2 * self.hidden_channels,
                self.kernel_size,
                dilation=dilation,
                name=f"in_layer_{i}",
            )(x)
            if g is not None:
                off = i * 2 * self.hidden_channels
                x_in = x_in + g_all[:, :, off : off + 2 * self.hidden_channels]
            a, b = jnp.split(x_in, 2, axis=-1)
            acts = jnp.tanh(a) * jax.nn.sigmoid(b)
            res_skip = Conv1d(
                2 * self.hidden_channels if i < self.n_layers - 1 else self.hidden_channels,
                1,
                name=f"res_skip_{i}",
            )(acts)
            if i < self.n_layers - 1:
                res, skip = jnp.split(res_skip, 2, axis=-1)
                x = (x + res) * x_mask
                output = output + skip
            else:
                output = output + res_skip
        return output * x_mask


class ResBlock1(nn.Module):
    """HiFi-GAN ResBlock1 (modules.py:147): 3×(dilated conv + conv) residual."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j, d in enumerate(self.dilations):
            xt = lrelu(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, name=f"conv1_{j}")(xt)
            xt = lrelu(xt)
            xt = Conv1d(self.channels, self.kernel_size, dilation=1, name=f"conv2_{j}")(xt)
            x = x + xt
        return x


class ConvTranspose1d(nn.Module):
    """Transposed conv over NTC matching torch ConvTranspose1d(k, s, padding=(k-s)//2)."""

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding="VALID",
            use_bias=True,
        )(x)
        # torch output length = (t-1)*s - 2*pad + k with pad=(k-s)//2
        pad = (self.kernel_size - self.stride) // 2
        if pad > 0:
            y = y[:, pad:-pad, :]
        return y
