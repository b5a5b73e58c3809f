"""Whisper-class speech recognition for the transcription subsystem.

Reference behavior (layouts/transcribe.py:84-430, SURVEY §2.4): WhisperX /
openai-whisper engines — 30 s mel windows, encoder-decoder transformer,
timestamp tokens, word/segment output, diarization assignment, export to
JSON/TXT/SRT/VTT/LRC.  The reference also vendors a whisper copy inside RVC
(modules/rvc/whisper/).

Architecture notes (public Whisper design): log-mel 80×3000 -> 2 strided
convs -> transformer encoder with sinusoidal positions; text decoder with
learned positions, causal self-attention + cross-attention.  Weights load
through the torch converter (utils/convert.py); random init otherwise.

TPU design: encoder runs once per 30 s window (batched over windows);
decoding is the shared scan pattern with donated caches; timestamp tokens
give segment boundaries without a second alignment model."""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.attention import attention_reference, flash_attention
from audiolab_tpu.kernels.mel import log_mel, mel_spectrogram


@dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_audio_ctx: int = 1500        # frames after conv stride 2 (30 s @ 100Hz)
    dim: int = 384                 # tiny=384 base=512 small=768 medium=1024
    n_heads: int = 6
    n_audio_layers: int = 4
    n_text_layers: int = 4
    vocab_size: int = 51865
    n_text_ctx: int = 448
    # special tokens (whisper vocab layout)
    sot: int = 50258
    eot: int = 50257
    no_timestamps: int = 50363
    timestamp_base: int = 50364    # <|0.00|>; +1 per 0.02 s
    sr: int = 16000
    hop: int = 160


def sinusoids(length: int, dim: int) -> np.ndarray:
    inv = np.exp(-np.log(10000.0) * np.arange(dim // 2) / (dim // 2 - 1))
    pos = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(pos), np.cos(pos)], axis=1).astype(np.float32)


class ResidualBlock(nn.Module):
    dim: int
    n_heads: int
    cross: bool = False

    def setup(self):
        self.attn_ln = nn.LayerNorm(epsilon=1e-5, name="attn_ln")
        self.wq = nn.Dense(self.dim, name="wq")
        self.wk = nn.Dense(self.dim, use_bias=False, name="wk")
        self.wv = nn.Dense(self.dim, name="wv")
        self.wo = nn.Dense(self.dim, name="wo")
        if self.cross:
            self.cross_ln = nn.LayerNorm(epsilon=1e-5, name="cross_ln")
            self.cq = nn.Dense(self.dim, name="cq")
            self.ck = nn.Dense(self.dim, use_bias=False, name="ck")
            self.cv = nn.Dense(self.dim, name="cv")
            self.co = nn.Dense(self.dim, name="co")
        self.mlp_ln = nn.LayerNorm(epsilon=1e-5, name="mlp_ln")
        self.fc1 = nn.Dense(self.dim * 4, name="fc1")
        self.fc2 = nn.Dense(self.dim, name="fc2")

    def _attn(self, q, k, v, causal=False, mask=None):
        hd = self.dim // self.n_heads
        b, tq = q.shape[:2]
        tk = k.shape[1]
        qh = q.reshape(b, tq, self.n_heads, hd).swapaxes(1, 2)
        kh = k.reshape(b, tk, self.n_heads, hd).swapaxes(1, 2)
        vh = v.reshape(b, tk, self.n_heads, hd).swapaxes(1, 2)
        if mask is None and causal and tq > 1:
            o = flash_attention(qh, kh, vh, causal=True)
        else:
            o = attention_reference(qh, kh, vh, causal=causal and tq > 1, mask=mask)
        return o.swapaxes(1, 2).reshape(b, tq, self.dim)

    def __call__(self, x, xa=None, causal=False, kv_cache=None, pos=None):
        """kv_cache: dict(k,v,index) for causal self-attn decode."""
        h = self.attn_ln(x)
        q, k, v = self.wq(h), self.wk(h), self.wv(h)
        new_cache = None
        if kv_cache is not None:
            idx = kv_cache["index"]
            kf = jax.lax.dynamic_update_slice_in_dim(kv_cache["k"], k, idx, axis=1)
            vf = jax.lax.dynamic_update_slice_in_dim(kv_cache["v"], v, idx, axis=1)
            t_new = x.shape[1]
            new_cache = dict(k=kf, v=vf, index=idx + t_new)
            mask = (jnp.arange(kf.shape[1])[None, :] < idx + t_new)[:, None, None, :]
            x = x + self.wo(self._attn_raw(q, kf, vf, mask))
        else:
            x = x + self.wo(self._attn(q, k, v, causal=causal))
        if self.cross and xa is not None:
            h = self.cross_ln(x)
            x = x + self.co(self._attn(self.cq(h), self.ck(xa), self.cv(xa)))
        x = x + self.fc2(nn.gelu(self.fc1(self.mlp_ln(x)), approximate=False))
        return x, new_cache

    def _attn_raw(self, q, k, v, mask):
        hd = self.dim // self.n_heads
        b, tq = q.shape[:2]
        tk = k.shape[1]
        qh = q.reshape(b, tq, self.n_heads, hd).swapaxes(1, 2)
        kh = k.reshape(b, tk, self.n_heads, hd).swapaxes(1, 2)
        vh = v.reshape(b, tk, self.n_heads, hd).swapaxes(1, 2)
        o = attention_reference(qh, kh, vh, mask=mask)
        return o.swapaxes(1, 2).reshape(b, tq, self.dim)


class AudioEncoder(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(self, mel):
        """(b, t_mel, n_mels) -> (b, t_mel//2, dim)."""
        c = self.cfg
        # exact (erf) gelu and explicit stride-2 padding: torch's Conv1d
        # p=1 taps (2i-1, 2i, 2i+1) while flax SAME at stride 2 pads only
        # the right edge — off-by-one on every output frame
        h = nn.gelu(nn.Conv(c.dim, (3,), padding="SAME", name="conv1")(mel),
                    approximate=False)
        h = nn.gelu(nn.Conv(c.dim, (3,), strides=(2,), padding=((1, 1),),
                            name="conv2")(h), approximate=False)
        h = h + jnp.asarray(sinusoids(c.n_audio_ctx, c.dim))[: h.shape[1]]
        for i in range(c.n_audio_layers):
            h, _ = ResidualBlock(c.dim, c.n_heads, name=f"block_{i}")(h)
        return nn.LayerNorm(epsilon=1e-5, name="ln_post")(h)


class TextDecoder(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        c = self.cfg
        self.emb = nn.Embed(c.vocab_size, c.dim, name="emb")
        self.pos = self.param("pos", nn.initializers.normal(0.01),
                              (c.n_text_ctx, c.dim))
        self.blocks = [ResidualBlock(c.dim, c.n_heads, cross=True,
                                     name=f"block_{i}")
                       for i in range(c.n_text_layers)]
        self.ln = nn.LayerNorm(epsilon=1e-5, name="ln")

    def __call__(self, tokens, xa, caches=None, pos0=0):
        """tokens (b, t); xa encoder output. Returns (logits, caches)."""
        x = self.emb(tokens) + jax.lax.dynamic_slice_in_dim(
            self.pos, pos0, tokens.shape[1], axis=0)
        new_caches = []
        for i, blk in enumerate(self.blocks):
            cache = None if caches is None else caches[i]
            x, cache = blk(x, xa, causal=True, kv_cache=cache)
            new_caches.append(cache)
        x = self.ln(x)
        logits = self.emb.attend(x.astype(jnp.float32))
        return logits, (new_caches if caches is not None else None)


class WhisperModel(nn.Module):
    cfg: WhisperConfig = WhisperConfig()

    def setup(self):
        self.encoder = AudioEncoder(self.cfg, name="encoder")
        self.decoder = TextDecoder(self.cfg, name="decoder")

    def encode(self, mel):
        return self.encoder(mel)

    def decode(self, tokens, xa, caches=None, pos0=0):
        return self.decoder(tokens, xa, caches, pos0)

    def __call__(self, mel, tokens):
        return self.decoder(tokens, self.encoder(mel))[0]


def log_mel_30s(audio16k: np.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    """(n,) -> (n_windows, 3000, n_mels) padded 30 s mel windows (whisper
    front-end: log10 mel clamped to max-8, scaled)."""
    win = 30 * cfg.sr
    n = len(audio16k)
    n_win = max(1, -(-n // win))
    x = np.zeros(n_win * win, np.float32)
    x[:n] = audio16k
    xw = jnp.asarray(x.reshape(n_win, win))
    mel = mel_spectrogram(xw, sr=cfg.sr, n_fft=400, hop=cfg.hop, win_length=400,
                          n_mels=cfg.n_mels, power=2.0, center=True,
                          htk=False, norm="slaney")
    logm = jnp.log10(jnp.clip(mel, 1e-10, None))
    logm = jnp.maximum(logm, logm.max() - 8.0)
    logm = (logm + 4.0) / 4.0
    return logm[:, :3000]


def init_decode_caches(cfg: WhisperConfig, batch: int, max_len: int):
    return [
        dict(k=jnp.zeros((batch, max_len, cfg.dim)),
             v=jnp.zeros((batch, max_len, cfg.dim)),
             index=jnp.zeros((), jnp.int32))
        for _ in range(cfg.n_text_layers)
    ]


def transcribe_window(
    model: WhisperModel, params, mel: jnp.ndarray, max_tokens: int = 128,
    temperature: float = 0.0, rng=None,
):
    """Greedy/sampled decode of (b, 3000, n_mels) -> tokens (b, max_tokens).

    Stops propagating after EOT (emits EOT forever)."""
    c = model.cfg
    b = mel.shape[0]
    xa = model.apply({"params": params}, mel, method=WhisperModel.encode)
    caches = init_decode_caches(c, b, max_tokens + 2)
    sot = jnp.full((b, 1), c.sot, jnp.int32)
    logits, caches = model.apply({"params": params}, sot, xa, caches, 0,
                                 method=WhisperModel.decode)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def body(carry, i):
        last_logits, caches, done, rng = carry
        rng, key = jax.random.split(rng)
        lg = last_logits[:, -1]
        if temperature > 0:
            tok = jax.random.categorical(key, lg / temperature, axis=-1)
        else:
            tok = jnp.argmax(lg, axis=-1)
        tok = jnp.where(done, c.eot, tok).astype(jnp.int32)
        done = done | (tok == c.eot)
        logits, caches = model.apply(
            {"params": params}, tok[:, None], xa, caches, i + 1,
            method=WhisperModel.decode,
        )
        return (logits, caches, done, rng), tok

    (_, _, _, _), toks = jax.lax.scan(
        body, (logits, caches, jnp.zeros((b,), bool), rng),
        jnp.arange(max_tokens),
    )
    return jnp.swapaxes(toks, 0, 1)
