"""CLAP (laion_clap wheel) — checkpoint-layout-faithful pieces.

Text branch (vendored reference: the laion_clap wheel's
clap_module/model.py:505-514, 602-640 "roberta" path): a transformers
RobertaModel (BERT-arch with the RoBERTa position-id convention:
pad_id 1, positions start at pad_id+1 for non-pad tokens) whose
pooler_output feeds a Linear-ReLU-Linear projection into the 512-d joint
space.  Oracle-tested against the installed transformers RobertaModel in
tests/test_sao_parity.py.

The HTSAT swin audio branch remains a documented cut; text embeddings
alone already serve text-conditioned retrieval/ranking over audio
embeddings produced elsewhere.

Conversion: utils/convert.convert_clap_text.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ClapTextConfig:
    vocab_size: int = 50265
    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 514
    type_vocab: int = 1
    pad_id: int = 1
    joint_dim: int = 512


class _RobertaLayer(nn.Module):
    cfg: ClapTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        b, t, d = x.shape
        dk = d // c.heads
        q = nn.Dense(d, name="q")(x)
        k = nn.Dense(d, name="k")(x)
        v = nn.Dense(d, name="v")(x)
        q, k, v = (a.reshape(b, t, c.heads, dk).transpose(0, 2, 1, 3)
                   for a in (q, k, v))
        acc = jnp.promote_types(x.dtype, jnp.float32)
        w = jnp.einsum("bhid,bhjd->bhij", q.astype(acc), k.astype(acc))
        w = w / jnp.sqrt(jnp.asarray(dk, acc))
        w = jnp.where(mask[:, None, None, :] > 0, w,
                      jnp.finfo(acc).min)
        w = jax.nn.softmax(w, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", w, v.astype(acc)).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = nn.LayerNorm(epsilon=1e-5, name="attn_ln")(
            x + nn.Dense(d, name="attn_out")(o))
        h = nn.Dense(c.ffn_dim, name="ffn_in")(x)
        h = nn.gelu(h, approximate=False)
        return nn.LayerNorm(epsilon=1e-5, name="ffn_ln")(
            x + nn.Dense(d, name="ffn_out")(h))


class ClapTextBranch(nn.Module):
    """input_ids (b, t) + attention_mask (b, t) -> 512-d joint embedding
    (RobertaModel pooler -> text_projection)."""

    cfg: ClapTextConfig = ClapTextConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        c = self.cfg
        # RoBERTa position ids: cumsum over non-pad + pad_id
        mask = (input_ids != c.pad_id).astype(jnp.int32)
        pos = jnp.cumsum(mask, axis=1) * mask + c.pad_id
        x = nn.Embed(c.vocab_size, c.dim, name="word_emb")(input_ids)
        x = x + nn.Embed(c.max_positions, c.dim, name="pos_emb")(pos)
        x = x + nn.Embed(c.type_vocab, c.dim, name="type_emb")(
            jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=1e-5, name="emb_ln")(x)
        for i in range(c.layers):
            x = _RobertaLayer(c, name=f"layer_{i}")(x, attention_mask)
        pooled = jnp.tanh(nn.Dense(c.dim, name="pooler")(x[:, 0]))
        h = nn.Dense(c.joint_dim, name="proj0")(pooled)
        return nn.Dense(c.joint_dim, name="proj1")(nn.relu(h))


# --------------------------------------------------- HTSAT audio branch

import numpy as np  # noqa: E402  (static window-index/mask tables)


def _rel_position_index(w: int) -> np.ndarray:
    """Swin relative-position index table (htsat.py:299-313), (w*w, w*w)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def _shift_attn_mask(h: int, w_res: int, window: int,
                     shift: int) -> np.ndarray:
    """Shifted-window attention mask (htsat.py:408-427), (nW, n, n)."""
    img = np.zeros((h, w_res))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w_res // window,
                      window).transpose(0, 2, 1, 3).reshape(-1,
                                                            window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0)


class _SwinBlock(nn.Module):
    """htsat.py SwinTransformerBlock (norm_before_mlp='ln')."""

    dim: int
    resolution: tuple
    heads: int
    window: int
    shift: int

    @nn.compact
    def __call__(self, x):  # (b, H*W, C)
        h_res, w_res = self.resolution
        window, shift = self.window, self.shift
        if min(self.resolution) <= window:
            window, shift = min(self.resolution), 0
        b, n, c = x.shape
        dk = c // self.heads
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x.reshape(b, h_res, w_res, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        nwh, nww = h_res // window, w_res // window
        xw = x.reshape(b, nwh, window, nww, window, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b * nwh * nww, window * window, c)
        qkv = nn.Dense(3 * c, name="qkv")(xw)
        q, k, v = (a.reshape(xw.shape[0], -1, self.heads, dk
                             ).transpose(0, 2, 1, 3)
                   for a in jnp.split(qkv, 3, axis=-1))
        acc = jnp.promote_types(x.dtype, jnp.float32)
        att = jnp.einsum("whid,whjd->whij", q.astype(acc) * dk ** -0.5,
                         k.astype(acc))
        table = self.param(
            "rel_bias", nn.initializers.normal(0.02),
            ((2 * window - 1) ** 2, self.heads))
        idx = _rel_position_index(window)
        att = att + table[idx.reshape(-1)].reshape(
            window * window, window * window, self.heads
        ).transpose(2, 0, 1)[None]
        if shift > 0:
            amask = jnp.asarray(_shift_attn_mask(h_res, w_res, window,
                                                 shift), att.dtype)
            att = att.reshape(b, nwh * nww, self.heads, n // (nwh * nww),
                              -1) + amask[None, :, None]
            att = att.reshape(-1, self.heads, amask.shape[1],
                              amask.shape[2])
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("whij,whjd->whid", att, v.astype(acc)).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(xw.shape[0], -1, c)
        o = nn.Dense(c, name="proj")(o)
        o = o.reshape(b, nwh, nww, window, window, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, h_res, w_res, c)
        if shift > 0:
            o = jnp.roll(o, (shift, shift), axis=(1, 2))
        x = shortcut + o.reshape(b, n, c)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(self.dim * 4), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="fc2")(h)


@dataclass(frozen=True)
class ClapAudioConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    heads: tuple = (4, 8, 16, 32)
    window: int = 8
    joint_dim: int = 512


class ClapAudioBranch(nn.Module):
    """HTSAT forward_features 'embedding' path (htsat.py:774-860): patch
    embed -> 4 swin stages with patch merging -> final LN -> token mean
    -> audio_projection to the joint space.  Input: the reshaped mel
    'image' (b, spec, spec, 1) NHWC (torch (b, 1, spec, spec)).  The
    TSCAM classifier head is not replicated (unused by CLAP's
    get_audio_embedding).  Conversion: utils/convert.convert_clap_audio."""

    cfg: ClapAudioConfig = ClapAudioConfig()

    @nn.compact
    def __call__(self, mel_img):
        c = self.cfg
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_stride, c.patch_stride),
                    padding="VALID", name="patch_proj")(mel_img)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, c.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        res = (gh, gw)
        dim = c.embed_dim
        for li, (depth, heads) in enumerate(zip(c.depths, c.heads)):
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else c.window // 2
                x = _SwinBlock(dim, res, heads, c.window, shift,
                               name=f"l{li}_b{bi}")(x)
            if li < len(c.depths) - 1:
                h_res, w_res = res
                x = x.reshape(b, h_res, w_res, dim)
                x = jnp.concatenate(
                    [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                     x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
                x = x.reshape(b, (h_res // 2) * (w_res // 2), 4 * dim)
                x = nn.LayerNorm(epsilon=1e-5, name=f"merge_{li}_norm")(x)
                x = nn.Dense(2 * dim, use_bias=False,
                             name=f"merge_{li}_red")(x)
                res = (h_res // 2, w_res // 2)
                dim *= 2
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        emb = jnp.mean(x, axis=1)            # == avgpool over all tokens
        h = nn.Dense(c.joint_dim, name="proj0")(emb)
        return nn.Dense(c.joint_dim, name="proj1")(nn.relu(h))


def clap_mel_image(wav, sr: int = 48000, n_fft: int = 1024, hop: int = 480,
                   n_mels: int = 64, fmin: float = 50.0,
                   fmax: float = 14000.0, spec_size: int = 256):
    """CLAP audio front end: torchlibrosa-convention log-mel (power STFT,
    10*log10, amin 1e-10, slaney mel) + HTSAT reshape_wav2img
    (htsat.py:838-852): (b, t) -> (b, spec, spec, 1) image where the
    frequency axis is stacked freq_ratio times along H.

    wav must cover spec_size * freq_ratio frames (crop/pad upstream;
    the bicubic short-clip stretch is not replicated)."""
    from audiolab_tpu.kernels.mel import mel_filterbank
    from audiolab_tpu.kernels.stft import spectrogram

    spec = spectrogram(wav, n_fft=n_fft, hop=hop, center=True, power=2.0)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax,
                                    htk=False, norm="slaney"))
    logmel = 10.0 * jnp.log10(jnp.clip(spec @ fb, 1e-10, None))
    ratio = spec_size // n_mels
    target_t = spec_size * ratio
    t = logmel.shape[1]
    if t < target_t:
        logmel = jnp.pad(logmel, ((0, 0), (0, target_t - t), (0, 0)))
    else:
        logmel = logmel[:, :target_t]
    b = logmel.shape[0]
    x = logmel.transpose(0, 2, 1)                       # (b, F, T)
    x = x.reshape(b, n_mels, ratio, target_t // ratio)  # (b, F, r, T/r)
    x = x.transpose(0, 2, 1, 3)                         # (b, r, F, T/r)
    x = x.reshape(b, ratio * n_mels, target_t // ratio)
    return x[..., None]                                 # NHWC, C=1
