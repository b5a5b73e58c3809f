"""HuBERT / ContentVec feature extractor in flax.

Replaces the fairseq C++ wheel the reference loads for RVC features
(modules/rvc/infer/modules/vc/utils.py:181-192 — HubertModel from
hubert_base.pt; pipeline.py:186-191 extracts layer 9 (v1, + final_proj to
256) or layer 12 (v2, 768-d)).

Standard HuBERT-base topology (weights convert 1:1 from the fairseq
checkpoint):
  conv feature extractor: 7 layers, 512 ch, strides (5,2,2,2,2,2,2)
    kernels (10,3,3,3,3,2,2) -> 320x downsample (~50 Hz), GroupNorm on
    layer 0 only, GELU
  post-projection 512 -> 768, LayerNorm
  conv positional embedding: k=128, groups=16, GELU, residual
  12 post-LN transformer layers: 12 heads, FFN 3072, GELU
  final_proj 768 -> 256 (used by v1 models only)

TPU notes: all convs NWC; attention runs through the Pallas flash kernel
on TPU (kernels/attention.py); whole-utterance batches — no 60 s host
chunk loop (that lives in the pipeline's chunk planner instead).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.attention import flash_attention

_CONV_LAYERS = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2


@dataclass(frozen=True)
class HubertConfig:
    dim: int = 768
    ffn_dim: int = 3072
    heads: int = 12
    layers: int = 12
    final_dim: int = 256


class ConvFeatureExtractor(nn.Module):
    @nn.compact
    def __call__(self, x):
        # x (b, n) waveform 16 kHz
        x = x[..., None]  # (b, n, 1)
        for i, (ch, k, s) in enumerate(_CONV_LAYERS):
            x = nn.Conv(ch, (k,), strides=(s,), padding="VALID", use_bias=False,
                        name=f"conv_{i}")(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=ch, epsilon=1e-5, name="gn_0")(x)  # torch eps
            x = nn.gelu(x, approximate=False)
        return x  # (b, t, 512)


class SelfAttention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, padding_mask=None):
        b, t, _ = x.shape
        d = self.dim // self.heads
        q = nn.Dense(self.dim, name="q_proj")(x)
        k = nn.Dense(self.dim, name="k_proj")(x)
        v = nn.Dense(self.dim, name="v_proj")(x)
        q = q.reshape(b, t, self.heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.heads, d).transpose(0, 2, 1, 3)
        o = flash_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return nn.Dense(self.dim, name="out_proj")(o)


class TransformerLayer(nn.Module):
    """fairseq post-LN encoder layer."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x):
        y = SelfAttention(self.cfg.dim, self.cfg.heads, name="attn")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln1")(x + y)
        y = nn.Dense(self.cfg.ffn_dim, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.cfg.dim, name="fc2")(y)
        x = nn.LayerNorm(epsilon=1e-5, name="ln2")(x + y)
        return x


class Hubert(nn.Module):
    cfg: HubertConfig = HubertConfig()

    @nn.compact
    def __call__(self, wav, output_layer: int = 12):
        """wav (b, n) 16 kHz in [-1,1] -> features (b, t, 768) from the given
        1-indexed layer; layer 9 + final_proj path via ``extract_v1``."""
        feats = ConvFeatureExtractor(name="feature_extractor")(wav)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post_extract")(feats)
        x = nn.Dense(self.cfg.dim, name="post_extract_proj")(x)

        # conv positional embedding (k=128, g=16), residual
        pos = nn.Conv(self.cfg.dim, (128,), padding=[(64, 64)],
                      feature_group_count=16, name="pos_conv")(x)
        pos = nn.gelu(pos[:, : x.shape[1], :], approximate=False)
        # torch SamePad removes one trailing element for even kernels
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)

        hidden = x
        out = None
        for i in range(self.cfg.layers):
            hidden = TransformerLayer(self.cfg, name=f"layer_{i}")(hidden)
            if i + 1 == output_layer:
                out = hidden
        return out if out is not None else hidden

    @nn.compact
    def final_proj(self, x):
        return nn.Dense(self.cfg.final_dim, name="final_proj")(x)


class HubertFeatureExtractor(nn.Module):
    """Convenience wrapper returning v1 (256-d, layer 9 + proj) or v2
    (768-d, layer 12) features as the RVC pipeline expects."""

    version: str = "v2"
    cfg: HubertConfig = HubertConfig()
    output_layer: int | None = None  # None -> 12 (v2) / 9 (v1), scaled

    @nn.compact
    def __call__(self, wav):
        if self.output_layer is not None:
            layer = self.output_layer
        elif self.version == "v2":
            layer = self.cfg.layers
        else:  # v1 taps layer 9 of 12 (pipeline.py:186-191); scale for small cfgs
            layer = max(1, self.cfg.layers * 9 // 12)
        x = Hubert(self.cfg, name="hubert")(wav, output_layer=layer)
        if self.version == "v1":
            x = nn.Dense(self.cfg.final_dim, name="final_proj")(x)
        return x


def pos_conv_samepad_fix(pos: jnp.ndarray) -> jnp.ndarray:
    """fairseq pads 64/64 then drops the last frame (SamePad for even k)."""
    return pos[:, :-1, :]
