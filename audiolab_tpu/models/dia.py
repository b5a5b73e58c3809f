"""Dia-class dialogue TTS: text encoder → AR codebook decoder.

Reference behavior (modules/diatts/dia/, SURVEY §2.3):
  - enc-dec transformer (dia/layers.py:873): byte-level text encoder,
    decoder over 9 DAC codebooks with delay pattern
  - CFG sampling, KV-cached decode (dia/model.py:219 generate)
  - audio prompt: DAC codes of a reference clip prepended to the decoder
    stream for voice conditioning

TPU redesign: cross-attention K/V are computed ONCE from the encoder output
and carried as constants through a `lax.scan` decode; self-attention uses a
preallocated cache (same pattern as models/lm.py).  CFG rides a double
batch through the same compiled step."""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.attention import attention_reference, flash_attention
from audiolab_tpu.models.lm import RMSNorm, apply_rope
from audiolab_tpu.models.zonos import delay_pattern, undelay_pattern


@dataclass(frozen=True)
class DiaConfig:
    vocab_text: int = 256          # byte-level
    dim_enc: int = 512
    dim_dec: int = 1024
    n_layers_enc: int = 6
    n_layers_dec: int = 12
    n_heads: int = 16              # decoder GQA query heads
    n_codebooks: int = 9
    codebook_size: int = 1028      # 1024 + BOS/EOS/PAD/MASK
    max_text_len: int = 512
    max_audio_len: int = 2048
    dtype: str = "float32"
    # upstream Dia-1.6B geometry (dia/config.py): decoder self-attn is GQA
    # (kv_heads < query heads, explicit gqa_head_dim); cross-attn is MHA
    # with its own head dim.  None keeps the derived defaults.
    kv_heads: int | None = None          # None -> n_heads (no GQA)
    head_dim_dec: int | None = None      # None -> dim_dec // n_heads
    cross_head_dim: int | None = None    # None -> dim_dec // n_heads
    n_heads_enc: int | None = None       # None -> n_heads // 2

    @property
    def eos_id(self) -> int:
        return self.codebook_size - 3

    @property
    def bos_id(self) -> int:
        return self.codebook_size - 2

    @property
    def masked_id(self) -> int:
        return self.codebook_size - 1


class MHA(nn.Module):
    """Self- or cross-attention with optional cache.

    Matches the vendored Dia Attention (layers.py:241-406): GQA via
    kv_heads/head_dim, rotary on q AND k (cross-attn K uses source
    positions), and softmax scale **1.0** — Dia does NOT scale by
    1/sqrt(head_dim) (layers.py:399 scale=1.0)."""

    dim: int                     # output width
    n_heads: int
    n_kv_heads: int | None = None
    head_dim: int | None = None
    scale: float = 1.0

    def setup(self):
        hd = self.head_dim or self.dim // self.n_heads
        kvh = self.n_kv_heads or self.n_heads
        self.hd, self.kvh = hd, kvh
        self.wq = nn.Dense(self.n_heads * hd, use_bias=False, name="wq")
        self.wk = nn.Dense(kvh * hd, use_bias=False, name="wk")
        self.wv = nn.Dense(kvh * hd, use_bias=False, name="wv")
        self.wo = nn.Dense(self.dim, use_bias=False, name="wo")
        # timescale 1..10000 over head_dim (layers.py:167-207) == theta-1e4
        self._freqs = 1.0 / (10000.0 ** (np.arange(0, hd, 2) / hd))

    def qkv(self, xq, xkv, pos_q=None, pos_k=None, rope=True):
        """Returns q (b,t,N,hd) and k/v already GQA-repeated to N heads
        (the upstream caches store repeated K/V too)."""
        b, tq, _ = xq.shape
        tk = xkv.shape[1]
        q = self.wq(xq).reshape(b, tq, self.n_heads, self.hd)
        k = self.wk(xkv).reshape(b, tk, self.kvh, self.hd)
        v = self.wv(xkv).reshape(b, tk, self.kvh, self.hd)
        if rope:
            freqs = jnp.asarray(self._freqs)
            q = apply_rope(q, pos_q if pos_q is not None else jnp.arange(tq), freqs)
            k = apply_rope(k, pos_k if pos_k is not None else jnp.arange(tk), freqs)
        rep = self.n_heads // self.kvh
        if rep > 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        return q, k, v

    def __call__(self, xq, xkv, causal=False, mask=None, pos_q=None, pos_k=None,
                 rope=True):
        q, k, v = self.qkv(xq, xkv, pos_q, pos_k, rope)
        qh, kh, vh = (jnp.swapaxes(a, 1, 2) for a in (q, k, v))
        if mask is None and causal and xq.shape[1] > 1:
            o = flash_attention(qh, kh, vh, causal=True, scale=self.scale)
        else:
            o = attention_reference(qh, kh, vh, causal=causal, mask=mask,
                                    scale=self.scale)
        b, tq = xq.shape[:2]
        return self.wo(
            jnp.swapaxes(o, 1, 2).reshape(b, tq, self.n_heads * self.hd))


class FFN(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 4, use_bias=False, name="w1")(x)
        g = nn.Dense(self.dim * 4, use_bias=False, name="w3")(x)
        return nn.Dense(self.dim, use_bias=False, name="w2")(nn.silu(h) * g)


class DiaEncoder(nn.Module):
    cfg: DiaConfig

    @nn.compact
    def __call__(self, text_ids, text_mask=None):
        c = self.cfg
        x = nn.Embed(c.vocab_text, c.dim_enc, name="emb")(text_ids)
        mask = None
        if text_mask is not None:
            mask = text_mask[:, None, None, :]
        heads = c.n_heads_enc or c.n_heads // 2
        for i in range(c.n_layers_enc):
            h = RMSNorm(name=f"norm1_{i}")(x)
            x = x + MHA(c.dim_enc, heads, name=f"attn_{i}")(
                h, h, mask=mask
            )
            x = x + FFN(c.dim_enc, name=f"ffn_{i}")(RMSNorm(name=f"norm2_{i}")(x))
        return RMSNorm(name="final_norm")(x)


class DiaDecoder(nn.Module):
    cfg: DiaConfig

    def setup(self):
        c = self.cfg
        self.code_emb = nn.Embed(c.n_codebooks * c.codebook_size, c.dim_dec,
                                 name="code_emb")
        # upstream cross-attn consumes encoder output directly (its k/v
        # projections map enc width -> heads*head_dim); no enc projection
        self.self_attn = [MHA(c.dim_dec, c.n_heads, c.kv_heads,
                              c.head_dim_dec, name=f"self_{i}")
                          for i in range(c.n_layers_dec)]
        self.cross_attn = [MHA(c.dim_dec, c.n_heads, None, c.cross_head_dim,
                               name=f"cross_{i}")
                           for i in range(c.n_layers_dec)]
        self.ffns = [FFN(c.dim_dec, name=f"ffn_{i}") for i in range(c.n_layers_dec)]
        self.n1 = [RMSNorm(name=f"n1_{i}") for i in range(c.n_layers_dec)]
        self.n2 = [RMSNorm(name=f"n2_{i}") for i in range(c.n_layers_dec)]
        self.n3 = [RMSNorm(name=f"n3_{i}") for i in range(c.n_layers_dec)]
        self.final = RMSNorm(name="final_norm")
        self.heads = [nn.Dense(c.codebook_size, use_bias=False, name=f"head_{q}")
                      for q in range(c.n_codebooks)]

    def embed(self, codes):
        """(b, n_q, t) -> (b, t, dim)."""
        c = self.cfg
        offs = (jnp.arange(c.n_codebooks) * c.codebook_size)[None, :, None]
        return self.code_emb(codes + offs).sum(axis=1)

    def logits9(self, h):
        return jnp.stack([hd(h) for hd in self.heads], axis=1)

    def cross_kv(self, enc_out):
        """Precompute per-layer cross K/V from encoder output; K carries
        rotary at SOURCE positions (layers.py:680-698)."""
        c = self.cfg
        b, tk, _ = enc_out.shape
        pos_k = jnp.arange(tk)
        kvs = []
        for i in range(c.n_layers_dec):
            mha = self.cross_attn[i]
            k = mha.wk(enc_out).reshape(b, tk, mha.kvh, mha.hd)
            k = apply_rope(k, pos_k, jnp.asarray(mha._freqs))
            v = mha.wv(enc_out).reshape(b, tk, mha.kvh, mha.hd)
            kvs.append((k, v))
        return kvs

    def _cross(self, i, xq, kv, enc_mask, pos_q):
        mha = self.cross_attn[i]
        b, tq, _ = xq.shape
        q = mha.wq(xq).reshape(b, tq, mha.n_heads, mha.hd)
        q = apply_rope(q, pos_q, jnp.asarray(mha._freqs))
        k, v = kv
        mask = enc_mask[:, None, None, :] if enc_mask is not None else None
        o = attention_reference(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
            mask=mask, scale=mha.scale,
        )
        return mha.wo(
            jnp.swapaxes(o, 1, 2).reshape(b, tq, mha.n_heads * mha.hd))

    def prefill(self, codes, enc_out, enc_mask=None):
        """Full forward over (b, n_q, t) prompt; returns (logits9_last,
        self_kv_caches, cross_kvs)."""
        c = self.cfg
        x = self.embed(codes)
        b, t, _ = x.shape
        pos = jnp.arange(t)
        cross = self.cross_kv(enc_out)
        caches = []
        for i in range(c.n_layers_dec):
            h = self.n1[i](x)
            mha = self.self_attn[i]
            q, k, v = mha.qkv(h, h, pos, pos)
            o = flash_attention(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
                causal=True, scale=mha.scale,
            )
            x = x + mha.wo(
                jnp.swapaxes(o, 1, 2).reshape(b, t, mha.n_heads * mha.hd))
            cache_k = jnp.zeros((b, c.max_audio_len, mha.n_heads, mha.hd),
                                k.dtype)
            cache_v = jnp.zeros_like(cache_k)
            cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k, 0, axis=1)
            cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v, 0, axis=1)
            caches.append(dict(k=cache_k, v=cache_v, index=jnp.asarray(t, jnp.int32)))
            x = x + self._cross(i, self.n2[i](x), cross[i], enc_mask, pos)
            x = x + self.ffns[i](self.n3[i](x))
        h = self.final(x[:, -1])
        return self.logits9(h), caches, cross

    def step(self, codes_t, pos, caches, cross, enc_mask=None):
        """codes_t (b, n_q) -> (logits9, caches)."""
        c = self.cfg
        x = self.embed(codes_t[:, :, None])
        new_caches = []
        for i in range(c.n_layers_dec):
            h = self.n1[i](x)
            mha = self.self_attn[i]
            st = caches[i]
            q, k, v = mha.qkv(h, h, pos, pos)
            idx = st["index"]
            kf = jax.lax.dynamic_update_slice_in_dim(st["k"], k, idx, axis=1)
            vf = jax.lax.dynamic_update_slice_in_dim(st["v"], v, idx, axis=1)
            mask = (jnp.arange(kf.shape[1])[None, :] <= idx)[:, None, None, :]
            o = attention_reference(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(kf, 1, 2),
                jnp.swapaxes(vf, 1, 2), mask=mask, scale=mha.scale,
            )
            b = x.shape[0]
            x = x + mha.wo(
                jnp.swapaxes(o, 1, 2).reshape(b, 1, mha.n_heads * mha.hd))
            new_caches.append(dict(k=kf, v=vf, index=idx + 1))
            x = x + self._cross(i, self.n2[i](x), cross[i], enc_mask, pos)
            x = x + self.ffns[i](self.n3[i](x))
        return self.logits9(self.final(x[:, 0])), new_caches


class DiaModel(nn.Module):
    cfg: DiaConfig = DiaConfig()

    def setup(self):
        self.encoder = DiaEncoder(self.cfg, name="encoder")
        self.decoder = DiaDecoder(self.cfg, name="decoder")

    def __call__(self, text_ids, codes, text_mask=None):
        """Teacher-forcing forward (training): returns logits (b,n_q,t,V)."""
        enc = self.encoder(text_ids, text_mask)
        logits, _, _ = self.decoder.prefill(codes, enc, text_mask)
        return logits

    def encode_text(self, text_ids, text_mask=None):
        return self.encoder(text_ids, text_mask)

    def prefill(self, codes, enc_out, enc_mask=None):
        return self.decoder.prefill(codes, enc_out, enc_mask)

    def step(self, codes_t, pos, caches, cross, enc_mask=None):
        return self.decoder.step(codes_t, pos, caches, cross, enc_mask)


def tokenize_dialogue(text: str, max_len: int = 512) -> np.ndarray:
    """Byte-level tokenizer; [S1]/[S2] speaker tags pass through as bytes
    (dia convention keeps them literal)."""
    b = text.encode("utf-8")[:max_len]
    return np.frombuffer(b, np.uint8).astype(np.int32)


def generate(
    model: DiaModel,
    params,
    text_ids: jnp.ndarray,          # (b, t_text)
    max_frames: int = 512,
    audio_prompt: jnp.ndarray | None = None,   # (b, n_q, t_prompt)
    cfg_scale: float = 3.0,
    temperature: float = 1.2,
    top_k: int = 64,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """CFG double-batch AR generation; returns undelayed codes
    (b, n_q, max_frames)."""
    c = model.cfg
    b = text_ids.shape[0]
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    text2 = jnp.concatenate([text_ids, jnp.zeros_like(text_ids)], axis=0)
    mask2 = jnp.concatenate(
        [text_ids != 0, jnp.ones_like(text_ids, bool)], axis=0
    )
    bos = jnp.full((b, c.n_codebooks, 1), c.bos_id, jnp.int32)
    prompt = bos if audio_prompt is None else jnp.concatenate(
        [bos, delay_pattern(audio_prompt, c.masked_id)], axis=2
    )
    prompt2 = jnp.concatenate([prompt, prompt], axis=0)
    core = _generate_core(model, max_frames, cfg_scale, temperature, top_k)
    delayed = core(params, text2, mask2, prompt2, rng)
    return undelay_pattern(delayed, c.n_codebooks)


from functools import lru_cache


@lru_cache(maxsize=32)
def _generate_core(model: DiaModel, max_frames: int, cfg_scale: float,
                   temperature: float, top_k: int):
    """Prefill + decode scan as ONE cached jitted graph (un-jitted prefill
    dispatches op-by-op over the TPU tunnel)."""
    c = model.cfg
    total = max_frames + c.n_codebooks

    def sample9(logits2, key, step):
        lc, lu = jnp.split(logits2, 2, axis=0)
        lg = lu + cfg_scale * (lc - lu)
        keys = jax.random.split(key, c.n_codebooks)
        toks = []
        for q in range(c.n_codebooks):
            lq = lg[:, q] / jnp.maximum(temperature, 1e-6)
            kth = jnp.sort(lq, axis=-1)[:, -top_k][:, None]
            lq = jnp.where(lq < kth, -jnp.inf, lq)
            tq = jax.random.categorical(keys[q], lq, axis=-1)
            tq = jnp.where(step >= q, tq, c.masked_id)
            tq = jnp.where(step >= max_frames + q, c.eos_id, tq)
            toks.append(tq)
        return jnp.stack(toks, axis=1)

    @jax.jit
    def core(params, text2, mask2, prompt2, rng):
        enc = model.apply({"params": params}, text2, mask2,
                          method=DiaModel.encode_text)
        logits, caches, cross = model.apply(
            {"params": params}, prompt2, enc, mask2, method=DiaModel.prefill
        )
        plen = prompt2.shape[2]

        def body(carry, i):
            logits, caches, rng = carry
            rng, key = jax.random.split(rng)
            toks = sample9(logits, key, i)
            toks2 = jnp.concatenate([toks, toks], axis=0)
            pos = jnp.asarray([0], jnp.int32) + plen + i
            logits, caches = model.apply(
                {"params": params}, toks2, pos, caches, cross, mask2,
                method=DiaModel.step,
            )
            return (logits, caches, rng), toks

        _, frames = jax.lax.scan(body, (logits, caches, rng),
                                 jnp.arange(total))
        return jnp.moveaxis(frames, 0, 2)

    return core
