"""Checkpoint-layout-faithful ACE-Step diffusion transformer.

Mirrors the published ``ace_step_transformer.safetensors`` layout (vendored
reference: modules/acestep/acestep/models/ace_step_transformer.py:206-330 and
attention.py:197-340) so ``utils/convert.convert_acestep_dit`` can fill it
from the real weights:

  - ``PatchEmbedIn``  — the (16, 1)-patch early-conv stack (Conv2d k=(16,1)
    + GroupNorm(32) + 1x1 Conv2d), expressed as two Dense layers + flax
    GroupNorm over the flattened (channel*height) patch features.
  - ``LinearTransformerBlock`` — Sana-style block: affine-less RMSNorm,
    **lite linear attention** (relu kernel, fp32 accumulation, ones-row
    denominator; customer_attention_processor.py:26-246), a softmax
    cross-attention over the conditioning sequence, GLUMBConv feed-forward,
    and adaLN-single via a per-block ``scale_shift_table`` (6, dim).
  - ``T2IFinalLayerOut`` — modulated RMSNorm + linear + unpatchify.
  - conditioning embedders (speaker / genre / lyric-proj) and the SSL
    projector MLPs used by the REPA-style training losses.

RoPE follows the upstream quirk exactly: Qwen2-style *half-duplicated*
cos/sin tables combined with *interleaved-pair* rotation
(customer_attention_processor.py:34-62).

``LyricConformerEncoder`` (below) is the lyric encoder at its
instantiated defaults; ``ACEStepDiT.encode`` takes its output as
``lyric_hidden`` (compose via ``embed_lyrics`` -> conformer -> encode,
keeping the DiT graph free of the token-length-dependent conformer
shapes).  Flow-matching sampling, APG
guidance and retake/repaint live in pipelines/acestep.py; the
speed-oriented (non-checkpoint) DiT used for benching is models/acestep.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ACEStepDiTConfig:
    in_channels: int = 8
    num_layers: int = 28
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    mlp_ratio: float = 4.0
    out_channels: int = 8
    rope_theta: float = 1_000_000.0
    speaker_embedding_dim: int = 512
    text_embedding_dim: int = 768
    lyric_vocab_size: int = 6681
    lyric_hidden_size: int = 1024
    patch_height: int = 16
    ssl_latent_dims: Sequence[int] = (1024, 768)
    ssl_encoder_depths: Sequence[int] = (9, 9)
    dtype: str = "float32"

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def _rms(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Affine-less RMSNorm (upstream RMSNorm(elementwise_affine=False))."""
    dt = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(dt)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype)


def rope_tables(seq_len: int, dim: int, theta: float):
    """Qwen2-style tables: freqs duplicated along the feature dim
    (ace_step_transformer.py:63-82): cos/sin (seq, dim)."""
    ft = jnp.result_type(0.0)  # f64 under jax_enable_x64 (parity), else f32
    inv = 1.0 / theta ** (jnp.arange(0, dim, 2, dtype=ft) / dim)
    freqs = jnp.arange(seq_len, dtype=ft)[:, None] * inv[None]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x (b, h, s, d).  Upstream pairs are INTERLEAVED ((x0,x1), (x2,x3)…)
    while the tables are half-duplicated — reproduced verbatim
    (customer_attention_processor.py:34-62), fp32 accumulate."""
    xr, xi = x[..., 0::2], x[..., 1::2]
    rot = jnp.stack([-xi, xr], axis=-1).reshape(x.shape)
    dt = jnp.promote_types(x.dtype, jnp.float32)
    out = x.astype(dt) * cos[None, None] + rot.astype(dt) * sin[None, None]
    return out.astype(x.dtype)


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, _ = x.shape
    return x.reshape(b, t, heads, -1).transpose(0, 2, 1, 3)  # (b, h, t, d)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


class LiteLASelfAttention(nn.Module):
    """Relu-kernel linear attention (CustomLiteLAProcessor2_0:26-246):
    out = (V·Kᵀ)·Q normalized by a ones-row denominator, fp32 accumulate.
    O(t·d²) — this is what makes 24 heads x 64 over multi-minute latent
    sequences cheap; on TPU the two einsums are plain MXU matmuls."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, cos, sin, q_scale: float = 1.0):
        inner = self.heads * self.head_dim
        # q_scale reproduces the ERG "temperature" forward hook upstream
        # registers on to_q (pipeline_ace_step.py forward_diffusion_with_
        # temperature: output *= tau)
        q = nn.Dense(inner, dtype=self.dtype, name="to_q")(x) * q_scale
        k = nn.Dense(inner, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, dtype=self.dtype, name="to_v")(x)
        q, k, v = (_split_heads(a, self.heads) for a in (q, k, v))
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if mask is not None:
            m = mask.astype(q.dtype)[:, None, :, None]  # (b, 1, t, 1)
            q, k, v = q * m, k * m, v * m
        acc = jnp.promote_types(x.dtype, jnp.float32)
        q = nn.relu(q).astype(acc)
        k = nn.relu(k).astype(acc)
        v = v.astype(acc)
        # vk (b,h,dv,dk) = sum_s v k ; numerator (b,h,t,dv) = q·vkᵀ
        vk = jnp.einsum("bhsd,bhse->bhde", v, k)
        num = jnp.einsum("bhte,bhde->bhtd", q, vk)
        den = jnp.einsum("bhte,bhe->bht", q, jnp.sum(k, axis=2))
        out = num / (den[..., None] + 1e-15)
        out = _merge_heads(out).astype(x.dtype)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class SoftmaxCrossAttention(nn.Module):
    """Standard SDPA over the conditioning sequence with RoPE on Q (self
    positions) and K (encoder positions); additive -inf mask from
    mask_q x mask_kv (CustomerAttnProcessor2_0:351-420)."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, mask, enc_mask, cos, sin, cos_c, sin_c,
                 q_scale: float = 1.0):
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, dtype=self.dtype, name="to_q")(x) * q_scale
        k = nn.Dense(inner, dtype=self.dtype, name="to_k")(enc)
        v = nn.Dense(inner, dtype=self.dtype, name="to_v")(enc)
        q, k, v = (_split_heads(a, self.heads) for a in (q, k, v))
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos_c, sin_c)
        acc = jnp.promote_types(x.dtype, jnp.float32)
        logits = jnp.einsum("bhtd,bhsd->bhts", q.astype(acc), k.astype(acc))
        logits = logits / math.sqrt(self.head_dim)
        if mask is not None and enc_mask is not None:
            combined = mask[:, :, None] * enc_mask[:, None, :]  # (b, t, s)
            logits = jnp.where(combined[:, None] == 1, logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", w, v.astype(acc))
        out = _merge_heads(out).astype(x.dtype)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class GLUMBConv(nn.Module):
    """Sana MBConv feed-forward (attention.py:132-196): 1x1 expand (SiLU) ->
    depthwise k3 -> GLU gate (SiLU) -> 1x1 project (no bias)."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(2 * self.hidden, (1,), dtype=self.dtype,
                    name="inverted_conv")(x)
        h = nn.silu(h)
        h = nn.Conv(2 * self.hidden, (3,), padding="SAME",
                    feature_group_count=2 * self.hidden, dtype=self.dtype,
                    name="depth_conv")(h)
        a, gate = h[..., : self.hidden], h[..., self.hidden:]
        h = a * nn.silu(gate)
        return nn.Conv(self.out, (1,), use_bias=False, dtype=self.dtype,
                       name="point_conv")(h)


class LinearTransformerBlock(nn.Module):
    """attention.py:197-340: adaLN-single modulated lite-LA + un-normed
    residual cross-attention + modulated GLUMBConv."""

    cfg: ACEStepDiTConfig

    @nn.compact
    def __call__(self, x, enc, mask, enc_mask, cos, sin, cos_c, sin_c, temb,
                 q_scale: float = 1.0):
        c = self.cfg
        dim = c.inner_dim
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(1.0 / math.sqrt(dim)), (6, dim))
        mods = table[None].astype(temb.dtype) + temb.reshape(-1, 6, dim)
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = (
            mods[:, i: i + 1] for i in range(6))

        h = _rms(x) * (1 + sc_msa) + s_msa
        a = LiteLASelfAttention(c.num_attention_heads, c.attention_head_dim,
                                c.jdtype, name="attn")(h, mask, cos, sin,
                                                       q_scale)
        x = x + g_msa * a
        # cross attention reads the RAW residual stream (no norm) —
        # attention.py:306-315
        a = SoftmaxCrossAttention(c.num_attention_heads, c.attention_head_dim,
                                  c.jdtype, name="cross_attn")(
            x, enc, mask, enc_mask, cos, sin, cos_c, sin_c, q_scale)
        x = x + a
        h = _rms(x) * (1 + sc_mlp) + s_mlp
        f = GLUMBConv(int(dim * c.mlp_ratio), dim, c.jdtype, name="ff")(h)
        return x + g_mlp * f


class PatchEmbedIn(nn.Module):
    """ace_step_transformer.py:153-199: the (16, 1) patch conv has stride ==
    kernel over the full latent height, i.e. a Dense over the flattened
    (channel, height) patch — stated as such for the MXU instead of a
    degenerate Conv2d."""

    cfg: ACEStepDiTConfig

    @nn.compact
    def __call__(self, latent):  # (b, c, h, t) torch layout
        c = self.cfg
        b, ch, hh, t = latent.shape
        x = latent.transpose(0, 3, 1, 2).reshape(b, t, ch * hh)
        x = x.astype(c.jdtype)
        x = nn.Dense(c.in_channels * 256, dtype=c.jdtype, name="early0")(x)
        # torch GroupNorm stats span (C/G, H, W); with h=1 flax's
        # spatial+group reduction over (t, C/G) matches exactly — except
        # upstream normalizes per-(1, t) position jointly across time too.
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="gn")(x)
        return nn.Dense(c.inner_dim, dtype=c.jdtype, name="early2")(x)


class T2IFinalLayerOut(nn.Module):
    """Sana final layer (ace_step_transformer.py:95-151): modulated
    affine-less RMSNorm -> linear -> unpatchify to (b, out_ch, 16, t)."""

    cfg: ACEStepDiTConfig

    @nn.compact
    def __call__(self, x, embedded_t, output_length):
        c = self.cfg
        dim = c.inner_dim
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(1.0 / math.sqrt(dim)), (2, dim))
        mods = table[None].astype(embedded_t.dtype) + embedded_t[:, None]
        shift, scale = mods[:, 0:1], mods[:, 1:2]
        x = _rms(x) * (1 + scale) + shift
        x = nn.Dense(c.patch_height * c.out_channels, dtype=c.jdtype,
                     name="linear")(x)
        b, t, _ = x.shape
        # last dim is (patch_h, out_ch) C-order; unpatchify einsum
        # nhwpqc->nchpwq puts channel first, height = patch row
        x = x.reshape(b, t, c.patch_height, c.out_channels)
        x = x.transpose(0, 3, 2, 1)  # (b, out_ch, patch_h, t)
        if output_length > t:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, output_length - t)))
        elif output_length < t:
            x = x[..., :output_length]
        return x


class ACEStepDiT(nn.Module):
    """Full conditional flow-matching transformer; __call__ == upstream
    ``forward`` (encode + decode), torch tensor layouts at the boundary."""

    cfg: ACEStepDiTConfig = field(default_factory=ACEStepDiTConfig)

    def setup(self):
        c = self.cfg
        self.timestep_linear_1 = nn.Dense(c.inner_dim, dtype=c.jdtype,
                                          name="timestep_embedder_linear_1")
        self.timestep_linear_2 = nn.Dense(c.inner_dim, dtype=c.jdtype,
                                          name="timestep_embedder_linear_2")
        self.t_block = nn.Dense(6 * c.inner_dim, dtype=c.jdtype,
                                name="t_block")
        self.speaker_embedder = nn.Dense(c.inner_dim, dtype=c.jdtype,
                                         name="speaker_embedder")
        self.genre_embedder = nn.Dense(c.inner_dim, dtype=c.jdtype,
                                       name="genre_embedder")
        self.lyric_embs = nn.Embed(c.lyric_vocab_size, c.lyric_hidden_size,
                                   name="lyric_embs")
        self.lyric_proj = nn.Dense(c.inner_dim, dtype=c.jdtype,
                                   name="lyric_proj")
        self.proj_in = PatchEmbedIn(c, name="proj_in")
        self.blocks = [
            LinearTransformerBlock(c, name=f"block_{i}")
            for i in range(c.num_layers)
        ]
        self.final_layer = T2IFinalLayerOut(c, name="final_layer")
        self.projectors = [
            [
                nn.Dense(2 * c.inner_dim, dtype=c.jdtype,
                         name=f"projector_{i}_0"),
                nn.Dense(2 * c.inner_dim, dtype=c.jdtype,
                         name=f"projector_{i}_1"),
                nn.Dense(ssl_dim, dtype=c.jdtype, name=f"projector_{i}_2"),
            ]
            for i, ssl_dim in enumerate(c.ssl_latent_dims)
        ]

    # -------------------------------------------------------------- pieces

    def time_embedding(self, timestep):
        """diffusers Timesteps(256, flip_sin_to_cos=True, shift=0) +
        TimestepEmbedding MLP."""
        half = 128
        exponent = -math.log(10000.0) * jnp.arange(
            half, dtype=jnp.result_type(0.0))
        freqs = jnp.exp(exponent / half)
        ang = timestep.astype(freqs.dtype)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        emb = self.timestep_linear_1(emb.astype(self.cfg.jdtype))
        return self.timestep_linear_2(nn.silu(emb))

    def embed_lyrics(self, lyric_token_idx):
        """Token embedding only; run an external conformer over the result
        and pass it to ``encode`` as ``lyric_hidden`` (upstream
        forward_lyric_encoder, ace_step_transformer.py:365-377 — the
        ConformerEncoder itself is a documented cut)."""
        return self.lyric_embs(lyric_token_idx)

    def encode(self, text_hidden, text_mask, speaker_embeds,
               lyric_hidden=None, lyric_mask=None):
        """Conditioning sequence: [speaker(1) | genre | lyrics] with the
        concatenated mask (ace_step_transformer.py:379-417)."""
        spk = self.speaker_embedder(speaker_embeds)[:, None]
        parts = [spk, self.genre_embedder(text_hidden)]
        masks = [jnp.ones((spk.shape[0], 1), text_mask.dtype), text_mask]
        if lyric_hidden is not None:
            parts.append(self.lyric_proj(lyric_hidden))
            masks.append(lyric_mask)
        return (jnp.concatenate(parts, axis=1),
                jnp.concatenate(masks, axis=1))

    def decode(self, latent, attention_mask, enc, enc_mask, timestep,
               return_hidden: bool = False, q_tau: float = 1.0,
               q_tau_blocks: tuple = ()):
        """latent (b, c, 16, t) -> velocity (b, c, 16, t); optionally also
        the SSL-projected inner states (REPA losses,
        ace_step_transformer.py:419-525).

        ``q_tau``/``q_tau_blocks`` reproduce ERG diffusion guidance
        (pipeline_ace_step.py forward_diffusion_with_temperature: to_q
        output scaled by tau=0.01 on self+cross attention of blocks
        range(15, 20)) for the unconditional forward."""
        c = self.cfg
        output_length = latent.shape[-1]
        embedded_t = self.time_embedding(timestep)
        temb = self.t_block(nn.silu(embedded_t))
        x = self.proj_in(latent)
        cos, sin = rope_tables(x.shape[1], c.attention_head_dim,
                               c.rope_theta)
        cos_c, sin_c = rope_tables(enc.shape[1], c.attention_head_dim,
                                   c.rope_theta)
        inner = []
        for i, blk in enumerate(self.blocks):
            x = blk(x, enc, attention_mask, enc_mask, cos, sin, cos_c,
                    sin_c, temb,
                    q_scale=q_tau if i in q_tau_blocks else 1.0)
            for d in c.ssl_encoder_depths:
                if i == d:
                    inner.append(x)
        out = self.final_layer(x, embedded_t, output_length)
        if not return_hidden:
            return out
        proj = []
        for h, mlp in zip(inner, self.projectors):
            for j, lin in enumerate(mlp):
                h = lin(h) if j == len(mlp) - 1 else nn.silu(lin(h))
            proj.append(h)
        return out, proj

    def __call__(self, latent, attention_mask, text_hidden, text_mask,
                 speaker_embeds, timestep, lyric_hidden=None,
                 lyric_mask=None, return_hidden: bool = False):
        enc, enc_mask = self.encode(text_hidden, text_mask, speaker_embeds,
                                    lyric_hidden, lyric_mask)
        return self.decode(latent, attention_mask, enc, enc_mask, timestep,
                           return_hidden=return_hidden)


# ----------------------------------------------------------- lyric conformer

def espnet_rel_pe(seq_len: int, dim: int) -> jnp.ndarray:
    """Espnet relative positional table (lyric_encoder.py:715-810): rows for
    relative positions t-1 … -(t-1), sin/cos interleaved — (2t-1, dim)."""
    ft = jnp.result_type(0.0)
    rels = (seq_len - 1) - jnp.arange(2 * seq_len - 1, dtype=ft)
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=ft)
                  * (-math.log(10000.0) / dim))
    ang = rels[:, None] * div[None]
    return jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(
        2 * seq_len - 1, dim)


class RelPosSelfAttention(nn.Module):
    """Transformer-XL attention with espnet tables
    (lyric_encoder.py:325-440).  The upstream zero-pad/reshape rel-shift is
    replaced by a direct gather — bd_shifted[i, j] = bd[i, t-1-i+j] —
    which XLA lowers to one take_along_axis (validated against the
    pad-trick replica in tests/test_torch_parity_full)."""

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, pos, q_scale: float = 1.0):
        d_model = x.shape[-1]
        h = self.heads
        dk = d_model // h
        b, t, _ = x.shape
        # ERG lyric hook point: upstream scales linear_q's OUTPUT (before
        # the pos_bias_u/v additions) — forward_encoder_with_temperature
        q = nn.Dense(d_model, dtype=self.dtype, name="linear_q")(x) * q_scale
        k = nn.Dense(d_model, dtype=self.dtype, name="linear_k")(x)
        v = nn.Dense(d_model, dtype=self.dtype, name="linear_v")(x)
        p = nn.Dense(d_model, use_bias=False, dtype=self.dtype,
                     name="linear_pos")(pos)  # (2t-1, d_model)
        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(),
                       (h, dk))
        w = self.param("pos_bias_v", nn.initializers.xavier_uniform(),
                       (h, dk))
        q, k, v = (_split_heads(a, h) for a in (q, k, v))   # (b, h, t, dk)
        p = p.reshape(-1, h, dk).transpose(1, 0, 2)          # (h, 2t-1, dk)
        acc = jnp.promote_types(x.dtype, jnp.float32)
        ac = jnp.einsum("bhtd,bhsd->bhts", (q + u[None, :, None]).astype(acc),
                        k.astype(acc))
        bd = jnp.einsum("bhtd,hmd->bhtm", (q + w[None, :, None]).astype(acc),
                        p.astype(acc))                        # (b, h, t, 2t-1)
        idx = (t - 1) - jnp.arange(t)[:, None] + jnp.arange(t)[None]
        bd = jnp.take_along_axis(bd, idx[None, None], axis=-1)
        scores = (ac + bd) / math.sqrt(dk)
        if mask is not None:
            m = mask[:, None, None, :] > 0
            scores = jnp.where(m, scores, -jnp.inf)
            attn = jnp.where(m, jax.nn.softmax(scores, axis=-1), 0.0)
        else:
            attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v.astype(acc))
        out = _merge_heads(out).astype(x.dtype)
        return nn.Dense(d_model, dtype=self.dtype, name="linear_out")(out)


class LyricConformerEncoder(nn.Module):
    """ACE-Step's lyric encoder at its instantiated defaults
    (ace_step_transformer.py:295-298 -> lyric_encoder.py:902-1010:
    macaron_style=False, use_cnn_module=False, static_chunk_size=0) — a
    pre-norm rel-pos transformer: LinearEmbed (Linear + LayerNorm, then
    x·sqrt(d)), 6 blocks of [LN -> rel-pos MHA -> +res, LN -> SiLU FF ->
    +res], final LayerNorm."""

    dim: int = 1024
    heads: int = 16
    ffn_dim: int = 4096
    num_blocks: int = 6
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask=None, q_tau: float = 1.0,
                 q_tau_layers: tuple = ()):  # x (b, t, in_dim), mask (b, t)
        dt = jnp.dtype(self.dtype)
        x = nn.Dense(self.dim, dtype=dt, name="embed_lin")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="embed_norm")(x)
        x = x * math.sqrt(self.dim)
        pos = espnet_rel_pe(x.shape[1], self.dim).astype(dt)
        for i in range(self.num_blocks):
            h = nn.LayerNorm(epsilon=1e-5, name=f"norm_mha_{i}")(x)
            x = x + RelPosSelfAttention(self.heads, dt, name=f"attn_{i}")(
                h, mask, pos,
                q_scale=q_tau if i in q_tau_layers else 1.0)
            h = nn.LayerNorm(epsilon=1e-5, name=f"norm_ff_{i}")(x)
            h = nn.Dense(self.ffn_dim, dtype=dt, name=f"ff_w1_{i}")(h)
            h = nn.Dense(self.dim, dtype=dt, name=f"ff_w2_{i}")(nn.silu(h))
            x = x + h
        return nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)
