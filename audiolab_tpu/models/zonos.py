"""Zonos-class TTS: hybrid SSM/attention backbone, 9-codebook AR decode.

Reference behavior (modules/zonos/, SURVEY §2.3):
  - mamba-ssm hybrid backbone (backbone.py:11-51)
  - DAC 9-codebook autoregressive decode with a delay pattern
    (codebook_pattern.py), masked token before each codebook starts
  - CFG via double batch (model.py:190-278), CUDA-graph decode step
    (model.py:97-153)
  - prefix conditioning: espeak phonemes + Fourier/int conditioners
    (conditioning.py:209-372), speaker embedding net (speaker_cloning.py:423)

TPU redesign:
  - selective-scan kernel (kernels/ssm.py) for prefill; carried-state
    ``ssm_step`` inside ONE `lax.scan` for decode — the XLA replacement for
    the CUDA-graph capture.  The scan body is compiled once; the KV/conv/SSM
    states are donated through the scan carry.
  - CFG double-batch rides the same graph (batch 2B), combined on-device.
  - espeak is a host C library not present here: a rule-based normalizer +
    char tokenizer stands in (same conditioner interface; swap when espeak
    is available).
"""

from __future__ import annotations

import math

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.ssm import (
    causal_conv1d,
    causal_conv1d_step,
    selective_scan,
    ssm_step,
)
from audiolab_tpu.models.codecs import DACConfig, DACDecoder
from audiolab_tpu.models.lm import RMSNorm, apply_rope, rope_freqs, LMConfig
from audiolab_tpu.kernels.attention import attention_reference, flash_attention


@dataclass(frozen=True)
class ZonosConfig:
    dim: int = 1024
    n_layers: int = 12
    attn_every: int = 6        # every k-th block is attention, rest mamba
    n_heads: int = 16
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    n_codebooks: int = 9
    codebook_size: int = 1026  # 1024 + EOS + MASKED
    max_seq_len: int = 3072    # ~35 s at 86 Hz
    vocab_text: int = 256      # char-level phoneme fallback
    spk_dim: int = 256
    cond_dim: int = 64
    mixer: str = "mamba1"      # "mamba2" = upstream Zonos hybrid mixer
    headdim: int = 64          # mamba2 head width (d_inner/headdim heads)
    head_size: int | None = None   # logits width; upstream Zonos heads are
                                   # Linear(dim, 1025) while embeddings are
                                   # 1026-wide (model.py:36-37). None keeps
                                   # codebook_size (random-weight default).

    @property
    def d_inner(self) -> int:
        return self.expand * self.dim

    @property
    def eos_id(self) -> int:
        return self.codebook_size - 2

    @property
    def masked_id(self) -> int:
        return self.codebook_size - 1


# ------------------------------------------------------------------ blocks

class MambaBlock(nn.Module):
    cfg: ZonosConfig

    def setup(self):
        c = self.cfg
        di = c.d_inner
        self.in_proj = nn.Dense(2 * di, use_bias=False, name="in_proj")
        self.conv_w = self.param("conv_w", nn.initializers.lecun_normal(),
                                 (c.d_conv, di))
        self.conv_b = self.param("conv_b", nn.initializers.zeros, (di,))
        self.x_proj = nn.Dense(c.d_state * 2 + di // 16, use_bias=False,
                               name="x_proj")
        self.dt_proj = nn.Dense(di, name="dt_proj")
        self.a_log = self.param(
            "a_log", lambda k, s: jnp.log(jnp.tile(jnp.arange(1, s[1] + 1.0), (s[0], 1))),
            (di, c.d_state),
        )
        self.d_skip = self.param("d_skip", nn.initializers.ones, (di,))
        self.out_proj = nn.Dense(c.dim, use_bias=False, name="out_proj")

    def _gates(self, xc):
        c = self.cfg
        di = c.d_inner
        proj = self.x_proj(xc)
        dt_rank = di // 16
        dt, b, cc = jnp.split(proj, [dt_rank, dt_rank + c.d_state], axis=-1)
        delta = jax.nn.softplus(self.dt_proj(dt))
        return delta, b, cc

    def __call__(self, x):
        """Full-sequence: (b, t, dim) -> (b, t, dim)."""
        xz = self.in_proj(x)
        xi, z = jnp.split(xz, 2, axis=-1)
        xc = nn.silu(causal_conv1d(xi, self.conv_w, self.conv_b))
        delta, b, cc = self._gates(xc)
        a = -jnp.exp(self.a_log)
        y = selective_scan(xc, delta, a, b, cc, self.d_skip)
        return self.out_proj(y * nn.silu(z))

    def step(self, x_t, state):
        """Single token: x_t (b, dim), state = (conv_cache, ssm_state)."""
        conv_cache, h = state
        xz = self.in_proj(x_t)
        xi, z = jnp.split(xz, 2, axis=-1)
        conv_cache, xc = causal_conv1d_step(conv_cache, xi, self.conv_w, self.conv_b)
        xc = nn.silu(xc)
        delta, b, cc = self._gates(xc)
        a = -jnp.exp(self.a_log)
        h, y = ssm_step(h, xc, delta, a, b, cc, self.d_skip)
        return self.out_proj(y * nn.silu(z)), (conv_cache, h)

    def prefill(self, h):
        """Full-sequence forward that also returns the decode state
        (conv tail + h_T) — the scan exposes per-step states."""
        xz = self.in_proj(h)
        xi, z = jnp.split(xz, 2, axis=-1)
        xc = nn.silu(causal_conv1d(xi, self.conv_w, self.conv_b))
        delta, bb, cc = self._gates(xc)
        a = -jnp.exp(self.a_log)
        da = jnp.exp(delta[..., None] * a[None, None])
        dbu = (delta * xc)[..., None] * bb[:, :, None, :]

        def combine(p, q2):
            a1, s1 = p
            a2, s2 = q2
            return a1 * a2, s1 * a2 + s2

        _, hs = jax.lax.associative_scan(combine, (da, dbu), axis=1)
        y = jnp.einsum("btdn,btn->btd", hs, cc) + xc * self.d_skip
        conv_tail = jnp.pad(
            xi, ((0, 0), (self.cfg.d_conv - 1, 0), (0, 0))
        )[:, -(self.cfg.d_conv - 1):, :]
        return self.out_proj(y * nn.silu(z)), (conv_tail, hs[:, -1])

    def init_state(self, batch: int):
        c = self.cfg
        return (
            jnp.zeros((batch, c.d_conv - 1, c.d_inner)),
            jnp.zeros((batch, c.d_inner, c.d_state)),
        )


class Mamba2Block(nn.Module):
    """mamba_ssm Mamba2 mixer, checkpoint-layout faithful (the upstream
    Zonos hybrid backbone): fused in_proj -> [z | xBC | dt], depthwise
    causal conv over (x,B,C), per-HEAD scalar decay A and skip D,
    softplus(dt + dt_bias), gated RMSNorm before out_proj.

    The SSD recurrence is exactly our selective_scan with the per-head
    scalar A broadcast over headdim and B/C shared across heads
    (ngroups=1): h' = h*exp(dt*A) + dt*x⊗B, y = C·h + D*x."""

    cfg: ZonosConfig

    def setup(self):
        c = self.cfg
        di = c.d_inner
        self.nheads = di // c.headdim
        self.conv_dim = di + 2 * c.d_state
        d_in_proj = 2 * di + 2 * c.d_state + self.nheads
        self.in_proj = nn.Dense(d_in_proj, use_bias=False, name="in_proj")
        self.conv_w = self.param("conv_w", nn.initializers.lecun_normal(),
                                 (c.d_conv, self.conv_dim))
        self.conv_b = self.param("conv_b", nn.initializers.zeros,
                                 (self.conv_dim,))
        self.dt_bias = self.param("dt_bias", nn.initializers.zeros,
                                  (self.nheads,))
        self.a_log = self.param(
            "a_log", lambda k, s: jnp.log(jnp.arange(1, s[0] + 1.0)),
            (self.nheads,))
        self.d_skip = self.param("d_skip", nn.initializers.ones,
                                 (self.nheads,))
        self.norm_w = self.param("norm_w", nn.initializers.ones, (di,))
        self.out_proj = nn.Dense(c.dim, use_bias=False, name="out_proj")

    def _pieces(self, zxbcdt):
        c = self.cfg
        di = c.d_inner
        z, xbc, dt = jnp.split(zxbcdt, [di, di + self.conv_dim], axis=-1)
        return z, xbc, dt

    def _ssm_params(self, xbc, dt):
        c = self.cfg
        di = c.d_inner
        xx, bb, cc = jnp.split(xbc, [di, di + c.d_state], axis=-1)
        dt = jax.nn.softplus(dt + self.dt_bias)
        delta = jnp.repeat(dt, c.headdim, axis=-1)       # heads -> channels
        a = -jnp.exp(self.a_log)                          # (nheads,)
        a_full = jnp.repeat(a, c.headdim)[:, None] * jnp.ones((1, c.d_state))
        d_full = jnp.repeat(self.d_skip, c.headdim)
        return xx, bb, cc, delta, a_full, d_full

    def _gated_norm(self, y, z):
        g = y * nn.silu(z)
        gf = g.astype(jnp.float32)
        r = gf * jax.lax.rsqrt(jnp.mean(gf * gf, axis=-1, keepdims=True)
                               + 1e-5)
        return (r * self.norm_w).astype(y.dtype)

    def __call__(self, x):
        zxbcdt = self.in_proj(x)
        z, xbc, dt = self._pieces(zxbcdt)
        xbc = nn.silu(causal_conv1d(xbc, self.conv_w, self.conv_b))
        xx, bb, cc, delta, a_full, d_full = self._ssm_params(xbc, dt)
        y = selective_scan(xx, delta, a_full, bb, cc, d_full)
        return self.out_proj(self._gated_norm(y, z))

    def step(self, x_t, state):
        conv_cache, h = state
        zxbcdt = self.in_proj(x_t)
        z, xbc, dt = self._pieces(zxbcdt)
        conv_cache, xbc = causal_conv1d_step(conv_cache, xbc, self.conv_w,
                                             self.conv_b)
        xbc = nn.silu(xbc)
        xx, bb, cc, delta, a_full, d_full = self._ssm_params(xbc, dt)
        h, y = ssm_step(h, xx, delta, a_full, bb, cc, d_full)
        return self.out_proj(self._gated_norm(y, z)), (conv_cache, h)

    def prefill(self, h):
        zxbcdt = self.in_proj(h)
        z, xbc_raw, dt = self._pieces(zxbcdt)
        xbc = nn.silu(causal_conv1d(xbc_raw, self.conv_w, self.conv_b))
        xx, bb, cc, delta, a_full, d_full = self._ssm_params(xbc, dt)
        da = jnp.exp(delta[..., None] * a_full[None, None])
        dbu = (delta * xx)[..., None] * bb[:, :, None, :]

        def combine(p, q2):
            a1, s1 = p
            a2, s2 = q2
            return a1 * a2, s1 * a2 + s2

        _, hs = jax.lax.associative_scan(combine, (da, dbu), axis=1)
        y = jnp.einsum("btdn,btn->btd", hs, cc) + xx * d_full
        conv_tail = jnp.pad(
            xbc_raw, ((0, 0), (self.cfg.d_conv - 1, 0), (0, 0))
        )[:, -(self.cfg.d_conv - 1):, :]
        out = self.out_proj(self._gated_norm(y, z))
        return out, (conv_tail, hs[:, -1])

    def init_state(self, batch: int):
        c = self.cfg
        return (
            jnp.zeros((batch, c.d_conv - 1, self.conv_dim)),
            jnp.zeros((batch, c.d_inner, c.d_state)),
        )


class AttnBlock(nn.Module):
    cfg: ZonosConfig

    def setup(self):
        c = self.cfg
        self.wq = nn.Dense(c.dim, use_bias=False, name="wq")
        self.wk = nn.Dense(c.dim, use_bias=False, name="wk")
        self.wv = nn.Dense(c.dim, use_bias=False, name="wv")
        self.wo = nn.Dense(c.dim, use_bias=False, name="wo")
        self._freqs = rope_freqs(
            LMConfig(dim=c.dim, n_heads=c.n_heads, rope_theta=10000.0)
        )

    def _qkv(self, x, pos):
        c = self.cfg
        hd = c.dim // c.n_heads
        b, t, _ = x.shape
        q = self.wq(x).reshape(b, t, c.n_heads, hd)
        k = self.wk(x).reshape(b, t, c.n_heads, hd)
        v = self.wv(x).reshape(b, t, c.n_heads, hd)
        freqs = jnp.asarray(self._freqs)
        return apply_rope(q, pos, freqs), apply_rope(k, pos, freqs), v

    def __call__(self, x, pos):
        q, k, v = self._qkv(x, pos)
        o = flash_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
            causal=True,
        )
        b, t = x.shape[:2]
        return self.wo(jnp.swapaxes(o, 1, 2).reshape(b, t, -1))

    def step(self, x_t, pos, state):
        """x_t (b, dim); state = dict(k, v, index) preallocated."""
        q, k, v = self._qkv(x_t[:, None, :], pos)
        idx = state["index"]
        kf = jax.lax.dynamic_update_slice_in_dim(state["k"], k, idx, axis=1)
        vf = jax.lax.dynamic_update_slice_in_dim(state["v"], v, idx, axis=1)
        mask = (jnp.arange(kf.shape[1])[None, :] <= idx)[:, None, None, :]
        o = attention_reference(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(kf, 1, 2), jnp.swapaxes(vf, 1, 2),
            mask=mask,
        )
        b = x_t.shape[0]
        out = self.wo(jnp.swapaxes(o, 1, 2).reshape(b, 1, -1))[:, 0]
        return out, dict(k=kf, v=vf, index=idx + 1)

    def init_state(self, batch: int, max_len: int | None = None):
        c = self.cfg
        hd = c.dim // c.n_heads
        n = max_len or c.max_seq_len
        return dict(
            k=jnp.zeros((batch, n, c.n_heads, hd)),
            v=jnp.zeros((batch, n, c.n_heads, hd)),
            index=jnp.zeros((), jnp.int32),
        )


class GatedMLP(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 4, use_bias=False, name="w1")(x)
        g = nn.Dense(self.dim * 4, use_bias=False, name="w3")(x)
        return nn.Dense(self.dim, use_bias=False, name="w2")(nn.silu(h) * g)


class ZonosBackbone(nn.Module):
    """Interleaved mamba/attention trunk (backbone.py hybrid)."""

    cfg: ZonosConfig

    def setup(self):
        c = self.cfg
        mamba_cls = Mamba2Block if c.mixer == "mamba2" else MambaBlock
        self.blocks = [
            AttnBlock(c, name=f"attn_{i}")
            if (i + 1) % c.attn_every == 0
            else mamba_cls(c, name=f"mamba_{i}")
            for i in range(c.n_layers)
        ]
        self.norms = [RMSNorm(name=f"norm_{i}") for i in range(c.n_layers)]
        self.mlps = [GatedMLP(c.dim, name=f"mlp_{i}") for i in range(c.n_layers)]
        self.mlp_norms = [RMSNorm(name=f"mlp_norm_{i}") for i in range(c.n_layers)]
        self.final_norm = RMSNorm(name="final_norm")

    def is_attn(self, i: int) -> bool:
        return (i + 1) % self.cfg.attn_every == 0

    def __call__(self, x, pos):
        for i, blk in enumerate(self.blocks):
            h = self.norms[i](x)
            x = x + (blk(h, pos) if self.is_attn(i) else blk(h))
            x = x + self.mlps[i](self.mlp_norms[i](x))
        return self.final_norm(x)

    def prefill_states(self, x, pos, cache_len: int | None = None):
        """Full-sequence forward that ALSO returns decode states primed with
        the prefix (conv tail + ssm state + kv cache).  ``cache_len`` sizes
        the KV caches to the actual generation length — decode attention
        cost scales with it, so don't default to max_seq_len."""
        states = []
        b, t, _ = x.shape
        for i, blk in enumerate(self.blocks):
            h = self.norms[i](x)
            if self.is_attn(i):
                st = blk.init_state(b, cache_len)
                # prefill kv by stepping the whole prefix through cache once:
                # cheaper: recompute k/v full and write into cache
                q, k, v = blk._qkv(h, pos)
                st["k"] = jax.lax.dynamic_update_slice_in_dim(st["k"], k, 0, axis=1)
                st["v"] = jax.lax.dynamic_update_slice_in_dim(st["v"], v, 0, axis=1)
                st["index"] = jnp.asarray(t, jnp.int32)
                o = flash_attention(
                    jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                    jnp.swapaxes(v, 1, 2), causal=True,
                )
                x = x + blk.wo(jnp.swapaxes(o, 1, 2).reshape(b, t, -1))
                states.append(st)
            else:
                o, st = blk.prefill(h)
                x = x + o
                states.append(st)
            x = x + self.mlps[i](self.mlp_norms[i](x))
        return self.final_norm(x), states

    def step(self, x_t, pos, states):
        new_states = []
        for i, blk in enumerate(self.blocks):
            h = self.norms[i](x_t)
            if self.is_attn(i):
                o, st = blk.step(h, pos, states[i])
            else:
                o, st = blk.step(h, states[i])
            x_t = x_t + o
            x_t = x_t + self.mlps[i](self.mlp_norms[i](x_t))
            new_states.append(st)
        return self.final_norm(x_t), new_states


# ------------------------------------------------------------------ conditioners

class FourierConditioner(nn.Module):
    """Continuous scalar(s) -> dim via random Fourier features
    (conditioning.py FourierConditioner)."""

    out_dim: int
    in_dim: int = 1

    @nn.compact
    def __call__(self, x):  # (b, in_dim)
        w = self.param("w", nn.initializers.normal(1.0), (self.in_dim, self.out_dim // 2))
        proj = 2 * jnp.pi * x @ w
        feats = jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1)
        return nn.Dense(self.out_dim, name="proj")(feats)[:, None, :]  # (b,1,dim)


class SpeakerEncoder(nn.Module):
    """Mel -> speaker embedding (speaker_cloning.py:423 equivalent — conv
    stack + attentive stats pooling, reduced)."""

    out_dim: int = 256

    @nn.compact
    def __call__(self, mel):  # (b, t, n_mels)
        h = mel
        for i, ch in enumerate((128, 128, 256)):
            h = nn.Conv(ch, (5,), strides=(2 if i else 1,), padding="SAME",
                        name=f"conv_{i}")(h)
            h = nn.relu(nn.LayerNorm(name=f"ln_{i}")(h))
        # attentive pooling
        att = nn.Dense(1, name="att")(h)  # (b, t, 1)
        w = jax.nn.softmax(att, axis=1)
        mu = jnp.sum(h * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(h * h * w, axis=1) - mu * mu, 1e-6, None))
        e = nn.Dense(self.out_dim, name="proj")(jnp.concatenate([mu, sg], axis=-1))
        return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)


_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789 .,!?'-;:\""


def tokenize_text(text: str, max_len: int = 256) -> np.ndarray:
    """Rule-normalized char tokenizer (espeak phonemizer stand-in; the
    conditioner interface matches conditioning.py:180-207)."""
    text = " ".join(text.lower().strip().split())
    ids = [min(_CHARS.find(ch) + 1 if ch in _CHARS else 0, 255) for ch in text]
    ids = ids[:max_len]
    return np.asarray(ids, np.int32)


# ------------------------------------------------------------------ model

class ZonosModel(nn.Module):
    cfg: ZonosConfig = ZonosConfig()

    def setup(self):
        c = self.cfg
        self.backbone = ZonosBackbone(c, name="backbone")
        self.code_embs = nn.Embed(c.n_codebooks * c.codebook_size, c.dim,
                                  name="code_embs")
        self.text_emb = nn.Embed(c.vocab_text, c.dim, name="text_emb")
        self.spk_proj = nn.Dense(c.dim, name="spk_proj")
        self.emotion_cond = FourierConditioner(c.dim, 8, name="emotion")
        self.rate_cond = FourierConditioner(c.dim, 1, name="rate")
        self.pitch_cond = FourierConditioner(c.dim, 1, name="pitch")
        self.heads = [
            nn.Dense(c.head_size or c.codebook_size, use_bias=False,
                     name=f"head_{q}")
            for q in range(c.n_codebooks)
        ]

    def embed_codes(self, codes):
        """codes (b, n_q, t) -> summed embeddings (b, t, dim)."""
        c = self.cfg
        offs = (jnp.arange(c.n_codebooks) * c.codebook_size)[None, :, None]
        emb = self.code_embs(codes + offs)  # (b, n_q, t, dim)
        return emb.sum(axis=1)

    def prefix(self, text_ids, spk_emb, emotion, rate, pitch):
        """Conditioning prefix (b, t_prefix, dim)."""
        parts = [
            self.text_emb(text_ids),
            self.spk_proj(spk_emb)[:, None, :],
            self.emotion_cond(emotion),
            self.rate_cond(rate),
            self.pitch_cond(pitch),
        ]
        return jnp.concatenate(parts, axis=1)

    def logits9(self, h):
        """(b, dim) -> (b, n_q, codebook_size)."""
        return jnp.stack([head(h) for head in self.heads], axis=1)

    def prefill(self, text_ids, spk_emb, emotion, rate, pitch, bos_codes,
                cache_len: int | None = None):
        """Run prefix + BOS frame; returns (logits9, states, prefix_len)."""
        x_prefix = self.prefix(text_ids, spk_emb, emotion, rate, pitch)
        x_bos = self.embed_codes(bos_codes)  # (b, 1, dim) frame of masked ids
        x = jnp.concatenate([x_prefix, x_bos], axis=1)
        pos = jnp.arange(x.shape[1])
        h, states = self.backbone.prefill_states(x, pos, cache_len)
        return self.logits9(h[:, -1]), states, x.shape[1]

    def prefill_embedded(self, x_prefix, bos_codes,
                         cache_len: int | None = None):
        """prefill from a PRE-EMBEDDED prefix (b, t, dim) — the path for
        the checkpoint prefix bank (ZonosPrefixConditioner below), which
        embeds the upstream cond dict outside the AR graph."""
        x_bos = self.embed_codes(bos_codes)
        x = jnp.concatenate([x_prefix, x_bos], axis=1)
        pos = jnp.arange(x.shape[1])
        h, states = self.backbone.prefill_states(x, pos, cache_len)
        return self.logits9(h[:, -1]), states, x.shape[1]

    def decode_step(self, codes_t, pos, states):
        """codes_t (b, n_q) -> (logits9, states)."""
        x_t = self.embed_codes(codes_t[:, :, None])[:, 0]
        h, states = self.backbone.step(x_t, pos, states)
        return self.logits9(h), states


# ------------------------------------------------------------------ generation

def delay_pattern(codes: jnp.ndarray, masked_id: int) -> jnp.ndarray:
    """(b, n_q, t) -> (b, n_q, t + n_q) delayed: codebook q shifted right q
    steps (codebook_pattern.py apply_delay_pattern)."""
    b, n_q, t = codes.shape
    out = jnp.full((b, n_q, t + n_q), masked_id, codes.dtype)
    for q in range(n_q):
        out = out.at[:, q, q : q + t].set(codes[:, q])
    return out


def undelay_pattern(delayed: jnp.ndarray, n_q: int) -> jnp.ndarray:
    """(b, n_q, t + n_q) -> (b, n_q, t)."""
    t = delayed.shape[2] - n_q
    return jnp.stack([delayed[:, q, q : q + t] for q in range(n_q)], axis=1)


def generate(
    model: ZonosModel,
    params,
    text_ids: jnp.ndarray,       # (b, t_text)
    spk_emb: jnp.ndarray,        # (b, spk_dim)
    max_frames: int = 600,
    emotion: jnp.ndarray | None = None,
    rate: jnp.ndarray | None = None,
    pitch: jnp.ndarray | None = None,
    cfg_scale: float = 2.0,
    temperature: float = 1.0,
    top_k: int = 0,
    min_p: float = 0.1,
    repetition_penalty: float = 3.0,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """AR generation with delay pattern + CFG double batch.

    Sampling defaults follow the published Zonos.generate
    (model.py:202 min_p=0.1; sampling.py repetition_penalty=3.0 over the
    last 2 frames per codebook).

    Returns codes (b, n_q, max_frames) (undelayed; EOS-padded)."""
    c = model.cfg
    b = text_ids.shape[0]
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    emotion = emotion if emotion is not None else jnp.tile(
        jnp.asarray([[0.3, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]]), (b, 1)
    )
    rate = rate if rate is not None else jnp.full((b, 1), 15.0)
    pitch = pitch if pitch is not None else jnp.full((b, 1), 20.0)

    # CFG: [cond; uncond] double batch — uncond drops text (zeros)
    text2 = jnp.concatenate([text_ids, jnp.zeros_like(text_ids)], axis=0)
    spk2 = jnp.concatenate([spk_emb, spk_emb], axis=0)
    em2 = jnp.concatenate([emotion, emotion], axis=0)
    ra2 = jnp.concatenate([rate, rate], axis=0)
    pi2 = jnp.concatenate([pitch, pitch], axis=0)
    bos = jnp.full((2 * b, c.n_codebooks, 1), c.masked_id, jnp.int32)

    total = max_frames + c.n_codebooks  # delay tail
    cache_len = text_ids.shape[1] + 12 + 1 + total + 2  # prefix+bos+steps
    core = _generate_core(model, max_frames, cache_len, cfg_scale,
                          temperature, top_k, min_p, repetition_penalty)
    delayed = core(params, text2, spk2, em2, ra2, pi2, bos, rng)
    return undelay_pattern(delayed, c.n_codebooks)


from functools import lru_cache


def _make_sample9(model: ZonosModel, max_frames: int, cfg_scale: float,
                  temperature: float, top_k: int, min_p: float = 0.1,
                  repetition_penalty: float = 3.0, rep_window: int = 2):
    """CFG-merged 9-codebook sampler shared by both decode cores.

    Defaults mirror the published Zonos.generate
    (modules/zonos/model.py:202 sampling_params=dict(min_p=0.1);
    sampling.py:101-109 repetition_penalty=3.0 over a window of the last
    2 frames per codebook).  min_p needs only a row-max — no per-step
    sort — so it is also the fastest filter on TPU; ``top_k`` remains as
    an alternative when nonzero."""
    c = model.cfg

    def sample9(logits2, key, step, window):
        """window: (b, n_q, rep_window) last emitted ids (V = none)."""
        lc, lu = jnp.split(logits2, 2, axis=0)  # (b, n_q, V)
        lg = lu + cfg_scale * (lc - lu)
        v = lg.shape[-1]
        if repetition_penalty != 1.0:
            # sampling.py:83-98: factors = rp^(occurrences in window);
            # logits <= 0 multiply, > 0 divide
            ar = jnp.arange(v)
            count = jnp.sum(window[..., None] == ar[None, None, None, :],
                            axis=2)
            factors = repetition_penalty ** count.astype(lg.dtype)
            lg = jnp.where(lg <= 0, lg * factors, lg / factors)
        bq = lg.shape[0] * c.n_codebooks
        flat = lg.reshape(bq, -1) / jnp.maximum(temperature, 1e-6)
        if top_k > 0:
            k_eff = min(top_k, flat.shape[-1])
            kth = jax.lax.top_k(flat, k_eff)[0][:, -1:]
            flat = jnp.where(flat < kth, -jnp.inf, flat)
        if min_p > 0.0:
            probs = jax.nn.softmax(flat, axis=-1)
            keep = probs >= min_p * jnp.max(probs, axis=-1, keepdims=True)
            flat = jnp.where(keep, flat, -jnp.inf)
        toks = jax.random.categorical(key, flat, axis=-1).reshape(
            lg.shape[0], c.n_codebooks)
        q_idx = jnp.arange(c.n_codebooks)[None, :]
        # delay pattern: codebook q emits MASKED until step >= q; EOS after
        toks = jnp.where(step >= q_idx, toks, c.masked_id)
        toks = jnp.where(step >= max_frames + q_idx, c.eos_id, toks)
        window = jnp.concatenate([window[..., 1:], toks[..., None]], axis=-1)
        return toks, window  # (b, n_q), (b, n_q, W)

    def init_window(b):
        # sentinel -1 = "no token yet": matches no vocab id
        return jnp.full((b, c.n_codebooks, rep_window), -1, jnp.int32)

    return sample9, init_window


@lru_cache(maxsize=32)
def _generate_core(model: ZonosModel, max_frames: int, cache_len: int,
                   cfg_scale: float, temperature: float, top_k: int,
                   min_p: float = 0.1, repetition_penalty: float = 3.0):
    """ONE jitted graph for prefill + the whole decode scan, cached per
    (model, shape) — the un-jitted prefill otherwise runs op-by-op with a
    network round trip per op on tunneled TPUs."""
    c = model.cfg
    total = max_frames + c.n_codebooks
    sample9, init_window = _make_sample9(model, max_frames, cfg_scale,
                                         temperature, top_k, min_p,
                                         repetition_penalty)

    @jax.jit
    def core(params, text2, spk2, em2, ra2, pi2, bos, rng):
        logits, states, plen = model.apply(
            {"params": params}, text2, spk2, em2, ra2, pi2, bos, cache_len,
            method=ZonosModel.prefill,
        )

        def body(carry, i):
            logits, states, rng, window = carry
            rng, key = jax.random.split(rng)
            toks, window = sample9(logits, key, i, window)  # (b, n_q)
            toks2 = jnp.concatenate([toks, toks], axis=0)
            pos = jnp.asarray([0], jnp.int32) + plen + i
            logits, states = model.apply(
                {"params": params}, toks2, pos, states,
                method=ZonosModel.decode_step,
            )
            return (logits, states, rng, window), toks

        win0 = init_window(text2.shape[0] // 2)
        (_, _, _, _), frames = jax.lax.scan(
            body, (logits, states, rng, win0), jnp.arange(total))
        return jnp.moveaxis(frames, 0, 2)  # (b, n_q, total)

    return core


def generate_embedded(
    model: ZonosModel,
    params,
    x_prefix2: jnp.ndarray,      # (2b, t_prefix, dim) [cond; uncond]
    max_frames: int = 600,
    cfg_scale: float = 2.0,
    temperature: float = 1.0,
    top_k: int = 0,
    min_p: float = 0.1,
    repetition_penalty: float = 3.0,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """AR generation from a pre-embedded CFG prefix pair — build it with
    the converted ZonosPrefixConditioner over upstream cond dicts (cond
    and uncond variants), matching model.py:190-278's conditioning flow.
    Sampling defaults mirror the published run (min_p 0.1, window-2
    repetition penalty 3.0).

    Returns codes (b, n_q, max_frames) (undelayed; EOS-padded)."""
    c = model.cfg
    b2 = x_prefix2.shape[0]
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    bos = jnp.full((b2, c.n_codebooks, 1), c.masked_id, jnp.int32)
    total = max_frames + c.n_codebooks
    cache_len = x_prefix2.shape[1] + 1 + total + 2
    core = _generate_core_embedded(model, max_frames, cache_len, cfg_scale,
                                   temperature, top_k, min_p,
                                   repetition_penalty)
    delayed = core(params, x_prefix2, bos, rng)
    return undelay_pattern(delayed, c.n_codebooks)


@lru_cache(maxsize=32)
def _generate_core_embedded(model: ZonosModel, max_frames: int,
                            cache_len: int, cfg_scale: float,
                            temperature: float, top_k: int,
                            min_p: float = 0.1,
                            repetition_penalty: float = 3.0):
    """ONE jitted prefill+decode graph over an embedded prefix (same scan
    as _generate_core; prefix embedding happens outside)."""
    c = model.cfg
    total = max_frames + c.n_codebooks
    sample9, init_window = _make_sample9(model, max_frames, cfg_scale,
                                         temperature, top_k, min_p,
                                         repetition_penalty)

    @jax.jit
    def core(params, x_prefix2, bos, rng):
        logits, states, plen = model.apply(
            {"params": params}, x_prefix2, bos, cache_len,
            method=ZonosModel.prefill_embedded,
        )

        def body(carry, i):
            logits, states, rng, window = carry
            rng, key = jax.random.split(rng)
            toks, window = sample9(logits, key, i, window)
            toks2 = jnp.concatenate([toks, toks], axis=0)
            pos = jnp.asarray([0], jnp.int32) + plen + i
            logits, states = model.apply(
                {"params": params}, toks2, pos, states,
                method=ZonosModel.decode_step,
            )
            return (logits, states, rng, window), toks

        win0 = init_window(x_prefix2.shape[0] // 2)
        (_, _, _, _), frames = jax.lax.scan(
            body, (logits, states, rng, win0), jnp.arange(total))
        return jnp.moveaxis(frames, 0, 2)

    return core


# ------------------------------------------------- checkpoint prefix bank

# Phoneme symbol inventory (DATA, required for checkpoint compatibility —
# the published phoneme_embedder rows are indexed by this exact table;
# reference modules/zonos/conditioning.py:25-35).  espeak itself (which
# produces the IPA string) is not in this image: plug any phonemizer in and
# tokenize with ``tokenize_phonemes_np``.
ZONOS_PAD_ID, ZONOS_UNK_ID, ZONOS_BOS_ID, ZONOS_EOS_ID = 0, 1, 2, 3
_ZONOS_SYMBOLS = (
    ';:,.!?¡¿—…"«»“”() *~-/\\&'
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ"
)
_ZONOS_SYMBOL_TO_ID = {s: i + 4 for i, s in enumerate(_ZONOS_SYMBOLS)}
ZONOS_PHONEME_VOCAB = 4 + len(_ZONOS_SYMBOLS)


def tokenize_phonemes_np(phonemes: list[str]) -> np.ndarray:
    """IPA strings -> LEFT-padded id batch [PAD..., BOS, chars, EOS]
    (conditioning.py:148-158; unknown chars -> UNK)."""
    ids = [[ZONOS_BOS_ID,
            *(_ZONOS_SYMBOL_TO_ID.get(c, ZONOS_UNK_ID) for c in p),
            ZONOS_EOS_ID] for p in phonemes]
    longest = max(map(len, ids))
    return np.asarray([[ZONOS_PAD_ID] * (longest - len(r)) + r for r in ids],
                      np.int32)


@dataclass(frozen=True)
class CondSpec:
    """One entry of the model config's prefix_conditioner.conditioners
    list (conditioning.py:38-285)."""
    type: str                 # Espeak|Fourier|Integer|Passthrough Conditioner
    name: str
    cond_dim: int | None = None
    projection: str = "none"  # none | linear | mlp
    uncond_type: str = "none"
    input_dim: int = 1
    min_val: float = 0.0
    max_val: float = 1.0


# Published Zonos-v0.1 conditioner bank shape (overridden by the model
# config.json at load time — the list is data-driven end to end).
DEFAULT_ZONOS_CONDITIONERS = (
    CondSpec("EspeakPhonemeConditioner", "espeak"),
    CondSpec("PassthroughConditioner", "speaker", cond_dim=128,
             projection="linear", uncond_type="learned"),
    CondSpec("FourierConditioner", "emotion", input_dim=8,
             uncond_type="learned"),
    CondSpec("FourierConditioner", "fmax", min_val=0.0, max_val=24000.0,
             uncond_type="learned"),
    CondSpec("FourierConditioner", "pitch_std", min_val=0.0, max_val=400.0,
             uncond_type="learned"),
    CondSpec("FourierConditioner", "speaking_rate", min_val=0.0,
             max_val=40.0, uncond_type="learned"),
    CondSpec("IntegerConditioner", "language_id", min_val=-1.0,
             max_val=126.0, uncond_type="learned"),
)


class ZonosPrefixConditioner(nn.Module):
    """Checkpoint-layout-faithful prefix conditioner bank
    (conditioning.py:287-303): each spec'd conditioner embeds its slot of
    the cond dict (or its learned uncond vector when the slot is absent),
    sequences are concatenated along time, then the bank-level projection +
    LayerNorm.  Conversion: utils/convert.convert_zonos_prefix."""

    dim: int
    specs: tuple = DEFAULT_ZONOS_CONDITIONERS
    projection: str = "none"

    def _project(self, x, kind, nm):
        if kind == "linear":
            return nn.Dense(self.dim, name=f"{nm}_proj")(x)
        if kind == "mlp":
            h = nn.Dense(self.dim, name=f"{nm}_proj0")(x)
            return nn.Dense(self.dim, name=f"{nm}_proj1")(nn.silu(h))
        return x

    @nn.compact
    def __call__(self, cond: dict):
        outs = []
        for s in self.specs:
            nm = f"c_{s.name}"
            x = cond.get(s.name)
            # create every param regardless of which slots are present so
            # ONE init covers the full checkpoint
            uv = (self.param(f"{nm}_uncond", nn.initializers.zeros,
                             (self.dim,))
                  if s.uncond_type == "learned" else None)
            if s.type == "EspeakPhonemeConditioner":
                emb = nn.Embed(ZONOS_PHONEME_VOCAB, self.dim,
                               name=f"{nm}_emb")
                h = emb(x) if x is not None else None
            elif s.type == "FourierConditioner":
                w = self.param(f"{nm}_weight", nn.initializers.normal(1.0),
                               (self.dim // 2, s.input_dim))
                if x is not None:
                    xn = (x - s.min_val) / (s.max_val - s.min_val)
                    f = 2.0 * math.pi * xn @ w.T
                    h = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)
                else:
                    h = None
            elif s.type == "IntegerConditioner":
                emb = nn.Embed(int(s.max_val - s.min_val) + 1, self.dim,
                               name=f"{nm}_emb")
                h = (emb(x[..., 0].astype(jnp.int32) - int(s.min_val))
                     if x is not None else None)
            elif s.type == "PassthroughConditioner":
                h = x
            else:
                raise ValueError(s.type)
            if h is None:
                outs.append(uv[None, None])
                continue
            outs.append(self._project(h, s.projection, nm))
        b = max(o.shape[0] for o in outs)
        outs = [jnp.broadcast_to(o, (b,) + o.shape[1:]) for o in outs]
        h = jnp.concatenate(outs, axis=1)
        h = self._project(h, self.projection, "prefix")
        return nn.LayerNorm(epsilon=1e-5, name="norm")(h)
