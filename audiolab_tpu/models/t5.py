"""T5 text encoder (flax) — the Stable-Audio prompt conditioner.

Reference behavior: modules/stable_audio/model.py loads stable-audio-open
via stable_audio_tools, whose ``T5Conditioner`` (conditioners.py:286-368 in
the shipped wheel) tokenizes to max_length=128 and runs the *frozen*
transformers ``T5EncoderModel("t5-base")``; because the torch module is
hidden from ``state_dict`` (``self.__dict__["model"]``), T5 weights are NOT
in the stable-audio checkpoint — they come from the published t5-base
weights, which ``convert_t5`` maps here.

Architecture (t5-base v1.0): RMS layer norms (no bias / no mean
subtraction), unscaled attention (no 1/sqrt(d_kv)), shared relative
position bias (32 buckets, max distance 128) held by block 0 only, ReLU
feed-forward (``gated=True`` switches to the v1.1 gated-GELU wi_0/wi_1
layout).  All Denses are bias-free.

TPU notes: the whole prompt encode is one jitted forward at a fixed
(batch, 128) shape; matmuls are (128, 768)x(768, ·) MXU tiles; the
relative-bias gather is a static (t, t) table folded into the logits add.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    dim: int = 768          # d_model
    d_kv: int = 64
    heads: int = 12
    d_ff: int = 3072
    layers: int = 12
    rel_buckets: int = 32
    rel_max_distance: int = 128
    gated: bool = False     # v1.1 gated-gelu FFN
    per_layer_bias: bool = False   # UMT5: each layer owns its rel bias
    eps: float = 1e-6


def t5_base() -> T5Config:
    return T5Config()


def umt5_base() -> T5Config:
    """ACE-Step's text encoder (pipeline_ace_step.py requires the
    umt5-base checkpoint dir): gated FFN + per-layer relative bias."""
    return T5Config(vocab_size=256384, gated=True, per_layer_bias=True)


class T5LayerNorm(nn.Module):
    """RMS norm: no bias, no mean subtraction (T5 convention)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x * (1.0 / jnp.sqrt(var + self.eps)).astype(x.dtype)
        return y * self.param("weight", nn.initializers.ones, (x.shape[-1],))


def relative_position_buckets(q_len: int, k_len: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Bidirectional T5 bucket table (t5 modeling, _relative_position_bucket).

    Static numpy: shapes are compile-time constants, the table is baked
    into the jitted graph."""
    ctx = np.arange(q_len, dtype=np.int64)[:, None]
    mem = np.arange(k_len, dtype=np.int64)[None, :]
    rel = mem - ctx                               # (q, k)
    nb = num_buckets // 2
    ret = (rel > 0).astype(np.int64) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return ret + np.where(is_small, n, large)


class T5SelfAttention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, bias, q_scale: float = 1.0):
        """x (b,t,d); bias (b|1, h, t, t) already includes the mask.

        ``q_scale`` reproduces ACE-Step's ERG-tag hook on SelfAttention.q
        (pipeline_ace_step.py get_text_embeddings_null: tau=0.01 on
        encoder blocks 8-9 of umt5-base)."""
        c = self.cfg
        inner = c.heads * c.d_kv
        dn = lambda name: nn.Dense(inner, use_bias=False, name=name)  # noqa: E731
        b, t, _ = x.shape
        q = (dn("q")(x) * q_scale).reshape(b, t, c.heads, c.d_kv)
        k = dn("k")(x).reshape(b, t, c.heads, c.d_kv)
        v = dn("v")(x).reshape(b, t, c.heads, c.d_kv)
        # NO 1/sqrt(d_kv) scaling — T5 folds it into the weights
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) + bias
        w = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, inner)
        return nn.Dense(c.dim, use_bias=False, name="o")(o)


class T5FFN(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        if c.gated:
            g = nn.gelu(nn.Dense(c.d_ff, use_bias=False, name="wi_0")(x),
                        approximate=True)
            h = g * nn.Dense(c.d_ff, use_bias=False, name="wi_1")(x)
        else:
            h = nn.relu(nn.Dense(c.d_ff, use_bias=False, name="wi")(x))
        return nn.Dense(c.dim, use_bias=False, name="wo")(h)


class T5Encoder(nn.Module):
    """transformers T5EncoderModel equivalent: ids (+mask) -> (b, t, dim)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, ids, mask=None, q_tau: float = 1.0,
                 q_tau_layers: tuple = ()):
        c = self.cfg
        t = ids.shape[1]
        x = nn.Embed(c.vocab_size, c.dim, name="emb")(ids)
        buckets = jnp.asarray(
            relative_position_buckets(t, t, c.rel_buckets, c.rel_max_distance)
        )
        mask_add = 0.0
        if mask is not None:
            neg = jnp.finfo(x.dtype).min
            mask_add = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)

        def rel_bias(name):
            pos = nn.Embed(c.rel_buckets, c.heads, name=name)(buckets)
            return jnp.transpose(pos, (2, 0, 1))[None]        # (1, h, t, t)

        if not c.per_layer_bias:
            # block-0-only relative bias, shared by every layer (T5)
            bias = rel_bias("rel_bias") + mask_add
        for i in range(c.layers):
            if c.per_layer_bias:                               # UMT5
                bias = rel_bias(f"rel_bias_{i}") + mask_add
            h = T5LayerNorm(c.eps, name=f"ln1_{i}")(x)
            x = x + T5SelfAttention(c, name=f"attn_{i}")(
                h, bias, q_scale=q_tau if i in q_tau_layers else 1.0)
            h = T5LayerNorm(c.eps, name=f"ln2_{i}")(x)
            x = x + T5FFN(c, name=f"ffn_{i}")(h)
        x = T5LayerNorm(c.eps, name="final_ln")(x)
        if mask is not None:
            # T5Conditioner multiplies embeddings by the attention mask
            # (conditioners.py:372)
            x = x * mask[..., None].astype(x.dtype)
        return x
