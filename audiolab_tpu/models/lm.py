"""Generic decoder-only transformer LM core — shared by the audio LMs.

The reference ships three separate AR transformer stacks: YuE's LLaMA-style
stage-1/stage-2 LMs (modules/yue/inference/infer.py via transformers), Dia's
enc-dec transformer (modules/diatts/dia/layers.py), and Zonos's hybrid
backbone (modules/zonos/backbone.py).  All of them are the same compute
pattern on TPU: RoPE + (G)QA attention + gated MLP, prefill once, then a
`lax.scan` decode loop over a preallocated KV cache (the XLA analogue of the
reference's CUDA-graph capture, modules/zonos/model.py:106-152).

This module provides that pattern once:
  - ``TransformerLM``     — flax module, supports prefill + single-step
  - ``init_cache``        — preallocated static-shape KV cache
  - ``decode``            — scan-based AR loop with donated cache, CFG,
                            temperature/top-k sampling, logit processors
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.attention import attention_reference, flash_attention


@dataclass(frozen=True)
class LMConfig:
    vocab_size: int = 32000
    dim: int = 2048
    n_layers: int = 16
    n_heads: int = 16
    n_kv_heads: int = 16          # < n_heads => GQA
    ffn_dim: int = 5632
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 4096
    tie_embeddings: bool = False
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


def rope_freqs(cfg: LMConfig) -> np.ndarray:
    d = cfg.head_dim
    return (1.0 / (cfg.rope_theta ** (np.arange(0, d, 2) / d))).astype(np.float32)


def apply_rope(x: jnp.ndarray, pos: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """x (b, t, h, d), pos (b, t) or (t,)."""
    if pos.ndim == 1:
        pos = pos[None, :]
    angles = pos[..., None].astype(jnp.float32) * freqs  # (b, t, d/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (y * w).astype(x.dtype)


class Attention(nn.Module):
    cfg: LMConfig

    @nn.compact
    def __call__(self, x, pos, mask, cache=None):
        """x (b,t,dim); cache None (full causal) or dict(k,v,index) for decode.

        Returns (out, new_cache)."""
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        hd = c.head_dim
        b, t, _ = x.shape
        q = nn.Dense(c.n_heads * hd, use_bias=False, dtype=dt, name="wq")(x)
        k = nn.Dense(c.n_kv_heads * hd, use_bias=False, dtype=dt, name="wk")(x)
        v = nn.Dense(c.n_kv_heads * hd, use_bias=False, dtype=dt, name="wv")(x)
        q = q.reshape(b, t, c.n_heads, hd)
        k = k.reshape(b, t, c.n_kv_heads, hd)
        v = v.reshape(b, t, c.n_kv_heads, hd)

        freqs = jnp.asarray(rope_freqs(c))
        q = apply_rope(q, pos, freqs)
        k = apply_rope(k, pos, freqs)

        rep = c.n_heads // c.n_kv_heads
        if cache is None:
            kf, vf = k, v
            causal = True
            attn_mask = mask
        else:
            # single-step (t small, usually 1): write into the ring buffer
            idx = cache["index"]
            kf = jax.lax.dynamic_update_slice_in_dim(cache["k"], k.astype(dt), idx, axis=1)
            vf = jax.lax.dynamic_update_slice_in_dim(cache["v"], v.astype(dt), idx, axis=1)
            cache = dict(k=kf, v=vf, index=idx + t)
            causal = False
            # causal within the written block: query j (block offset) sees
            # keys at positions <= idx + j.  For t == 1 this is the plain
            # "everything written so far" decode mask; for t > 1 (prefill
            # through the cache) it prevents early prefix positions from
            # attending to later ones, which would otherwise poison the
            # cached k/v of every layer past the first.
            qpos = idx + jnp.arange(t)
            attn_mask = (jnp.arange(kf.shape[1])[None, None, None, :]
                         <= qpos[None, None, :, None])
            if mask is not None:
                # caller-supplied key-validity mask (e.g. left-pad
                # exclusion for bucketed prompts) composes with the
                # causal ring-buffer mask
                attn_mask = jnp.logical_and(attn_mask, mask)

        if rep > 1:
            kf = jnp.repeat(kf, rep, axis=2)
            vf = jnp.repeat(vf, rep, axis=2)

        qh = jnp.swapaxes(q, 1, 2)  # (b,h,t,d)
        kh = jnp.swapaxes(kf, 1, 2)
        vh = jnp.swapaxes(vf, 1, 2)
        if cache is None and t > 1:
            o = flash_attention(qh, kh, vh, causal=causal)
        else:
            o = attention_reference(qh, kh, vh, causal=causal, mask=attn_mask)
        o = jnp.swapaxes(o, 1, 2).reshape(b, t, c.n_heads * hd)
        out = nn.Dense(c.dim, use_bias=False, dtype=dt, name="wo")(o)
        return out, cache


class MLP(nn.Module):
    cfg: LMConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        gate = nn.Dense(c.ffn_dim, use_bias=False, dtype=dt, name="w1")(x)
        up = nn.Dense(c.ffn_dim, use_bias=False, dtype=dt, name="w3")(x)
        return nn.Dense(c.dim, use_bias=False, dtype=dt, name="w2")(nn.silu(gate) * up)


class Block(nn.Module):
    cfg: LMConfig

    @nn.compact
    def __call__(self, x, pos, mask, cache=None):
        h, cache = Attention(self.cfg, name="attn")(
            RMSNorm(self.cfg.norm_eps, name="attn_norm")(x), pos, mask, cache
        )
        x = x + h
        x = x + MLP(self.cfg, name="mlp")(RMSNorm(self.cfg.norm_eps, name="mlp_norm")(x))
        return x, cache


class TransformerLM(nn.Module):
    """Decoder-only LM.  ``embed_fn``/``head_fn`` hooks let multi-codebook
    audio LMs (Zonos/Dia) replace the token embedding / output head."""

    cfg: LMConfig
    embed_input: bool = True   # False: caller passes embeddings directly
    with_head: bool = True

    @nn.compact
    def __call__(self, tokens_or_embeds, pos=None, caches=None, mask=None):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        if self.embed_input:
            emb = nn.Embed(c.vocab_size, c.dim, dtype=dt, name="tok_emb")
            x = emb(tokens_or_embeds)
        else:
            x = tokens_or_embeds.astype(dt)
        b, t = x.shape[:2]
        if pos is None:
            pos = jnp.arange(t)

        new_caches = []
        for i in range(c.n_layers):
            cache_i = None if caches is None else caches[i]
            x, cache_i = Block(c, name=f"layer_{i}")(x, pos, mask, cache_i)
            new_caches.append(cache_i)
        x = RMSNorm(c.norm_eps, name="final_norm")(x)
        if self.with_head:
            if self.cfg.tie_embeddings and self.embed_input:
                logits = emb.attend(x.astype(jnp.float32))
            else:
                logits = nn.Dense(c.vocab_size, use_bias=False, name="lm_head")(
                    x.astype(jnp.float32)
                )
            return logits, (new_caches if caches is not None else None)
        return x, (new_caches if caches is not None else None)


def init_cache(cfg: LMConfig, batch: int, max_len: int | None = None) -> list[dict]:
    max_len = max_len or cfg.max_seq_len
    dt = jnp.dtype(cfg.dtype)
    return [
        dict(
            k=jnp.zeros((batch, max_len, cfg.n_kv_heads, cfg.head_dim), dt),
            v=jnp.zeros((batch, max_len, cfg.n_kv_heads, cfg.head_dim), dt),
            index=jnp.zeros((), jnp.int32),
        )
        for _ in range(cfg.n_layers)
    ]


# ------------------------------------------------------------------ sampling

def sample_logits(
    logits: jnp.ndarray,
    rng: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
) -> jnp.ndarray:
    """(b, vocab) -> (b,) sampled token ids. temperature 0 => greedy."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def cfg_logits(cond: jnp.ndarray, uncond: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Classifier-free guidance combine (Zonos/YuE double-batch trick)."""
    return uncond + scale * (cond - uncond)


def decode(
    apply_fn: Callable,
    params,
    caches,
    first_token: jnp.ndarray,     # (b,)
    start_pos: int,
    steps: int,
    rng: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    logit_processor: Callable | None = None,
    stop_token: int | None = None,
):
    """`lax.scan` AR decode: donated cache, static step count.

    apply_fn(params, tokens(b,1), pos(1,), caches) -> (logits(b,1,V), caches).
    Returns (tokens (b, steps), final caches)."""

    def body(carry, i):
        tok, caches, rng = carry
        rng, key = jax.random.split(rng)
        pos = jnp.asarray([start_pos], jnp.int32) + i
        logits, caches = apply_fn(params, tok[:, None], pos, caches)
        logits = logits[:, -1]
        if logit_processor is not None:
            logits = logit_processor(logits, i)
        nxt = sample_logits(logits, key, temperature, top_k)
        if stop_token is not None:
            done = tok == stop_token
            nxt = jnp.where(done, stop_token, nxt)
        return (nxt, caches, rng), nxt

    (_, caches, _), toks = jax.lax.scan(
        body, (first_token, caches, rng), jnp.arange(steps)
    )
    return jnp.swapaxes(toks, 0, 1), caches
