"""Checkpoint-compatible Chatterbox T3 + voice encoder.

The reference runs the published ``chatterbox-tts`` package
(layouts/tts.py:12,381-396): ``ChatterboxTTS.from_pretrained`` loads
four weight files — ``ve.safetensors`` (Resemblyzer-style LSTM voice
encoder), ``t3_cfg.safetensors`` (T3: a 520M-param LLaMA backbone token
LM over text + 25 Hz speech tokens with speaker/emotion conditioning),
``s3gen.safetensors`` (token→wav: flow-matching mel decoder + HiFT
vocoder, models/chatterbox_s3gen.py) and ``tokenizer.json`` (text BPE).

This module is the T3 + voice-encoder half, laid out so the published
safetensors fill it directly (utils/convert.convert_chatterbox_t3 /
convert_voice_encoder):

  T3 (topology per chatterbox-tts 0.1 ``models/t3/t3.py``):
    tfmr            LLaMA backbone — hidden 1024, 30 layers, 16 heads,
                    ffn 4096, SiLU gated MLP, RMSNorm eps 1e-6, rotary —
                    exactly ``transformers.LlamaModel(Llama_520M)``,
                    driven with input embeddings (the checkpoint's
                    ``tfmr.embed_tokens`` is a placeholder and unused)
    text_emb        Embedding(704, 1024)   + learned text pos-emb
    speech_emb      Embedding(8194, 1024)  + learned speech pos-emb
    cond_enc        speaker Linear(256→1024) ⊕ perceiver-resampled
                    speech-prompt embeddings ⊕ emotion Linear(1→1024)
    text_head / speech_head   Linear(1024→vocab)

  VoiceEncoder: LSTM(40 mel → 256, 3 layers) + Linear(256→256), ReLU,
  L2-normalised; utterance embedding = renormalised mean over 1.6 s
  partial windows (voice_encoder.py in the published package).

TPU mapping: the backbone runs through models/lm.TransformerLM (RoPE
layout identical to HF LLaMA's non-interleaved convention), so prefill +
`lax.scan` decode with a preallocated KV cache replace the reference's
per-token python loop; CFG runs as a single doubled batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.lm import LMConfig, TransformerLM, init_cache


@dataclass(frozen=True)
class T3CkptConfig:
    """Mirrors the published T3Config (t3/t3_config.py)."""

    text_vocab: int = 704
    speech_vocab: int = 8194
    start_text_token: int = 255
    stop_text_token: int = 0
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    max_text_tokens: int = 2048
    max_speech_tokens: int = 4096
    dim: int = 1024
    n_layers: int = 30
    n_heads: int = 16
    ffn_dim: int = 4096
    speaker_embed_size: int = 256
    perceiver_tokens: int = 32
    perceiver_heads: int = 4
    speech_cond_prompt_len: int = 150
    dtype: str = "float32"

    @property
    def text_pos_size(self) -> int:
        return self.max_text_tokens + 2

    @property
    def speech_pos_size(self) -> int:
        return self.max_speech_tokens + 4

    def lm(self, max_seq_len: int = 4096) -> LMConfig:
        return LMConfig(vocab_size=8, dim=self.dim, n_layers=self.n_layers,
                        n_heads=self.n_heads, n_kv_heads=self.n_heads,
                        ffn_dim=self.ffn_dim, norm_eps=1e-6,
                        max_seq_len=max_seq_len, dtype=self.dtype)


class CrossAttention(nn.Module):
    """Single cross-attention used by the perceiver resampler
    (to_q/to_k/to_v bias-free, to_out biased — perceiver.py)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, q_in, kv):
        h = self.heads
        hd = self.dim // h
        q = nn.Dense(self.dim, use_bias=False, name="to_q")(q_in)
        k = nn.Dense(self.dim, use_bias=False, name="to_k")(kv)
        v = nn.Dense(self.dim, use_bias=False, name="to_v")(kv)
        b, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(b, tq, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, tk, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, h, hd).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(a, axis=-1), v)
        o = o.transpose(0, 2, 1, 3).reshape(b, tq, self.dim)
        return nn.Dense(self.dim, name="to_out")(o)


class PerceiverResampler(nn.Module):
    """32 learned queries; ONE shared CrossAttention applied twice
    (query→ctx, then its output→ctx again), per the published
    t3/modules/perceiver.py."""

    cfg: T3CkptConfig

    @nn.compact
    def __call__(self, ctx):
        c = self.cfg
        q = self.param("pre_attention_query", nn.initializers.normal(0.02),
                       (1, c.perceiver_tokens, c.dim))
        attn = CrossAttention(c.dim, c.perceiver_heads, name="attn")
        q = jnp.broadcast_to(q, (ctx.shape[0],) + q.shape[1:])
        return attn(attn(q, ctx), ctx)


class T3CondEnc(nn.Module):
    """[speaker | resampled speech prompt | emotion] prefix embeddings
    (t3/modules/cond_enc.py)."""

    cfg: T3CkptConfig

    @nn.compact
    def __call__(self, speaker_emb, prompt_emb=None, emotion_adv=None):
        c = self.cfg
        spk = nn.Dense(c.dim, name="spkr_enc")(speaker_emb)[:, None]
        parts = [spk]
        if prompt_emb is not None:
            parts.append(
                PerceiverResampler(c, name="perceiver")(prompt_emb))
        if emotion_adv is None:
            emotion_adv = jnp.full((speaker_emb.shape[0],), 0.5)
        parts.append(
            nn.Dense(c.dim, name="emotion_adv_fc")(
                emotion_adv.reshape(-1, 1, 1)))
        return jnp.concatenate(parts, axis=1)


class T3(nn.Module):
    """Teacher-forced forward + prefill/step pair for scan decode."""

    cfg: T3CkptConfig
    max_seq_len: int = 4096

    def setup(self):
        c = self.cfg
        self.text_emb = nn.Embed(c.text_vocab, c.dim, name="text_emb")
        self.speech_emb = nn.Embed(c.speech_vocab, c.dim, name="speech_emb")
        self.text_pos_emb = nn.Embed(c.text_pos_size, c.dim,
                                     name="text_pos_emb")
        self.speech_pos_emb = nn.Embed(c.speech_pos_size, c.dim,
                                       name="speech_pos_emb")
        self.cond_enc = T3CondEnc(c, name="cond_enc")
        self.tfmr = TransformerLM(c.lm(self.max_seq_len), embed_input=False,
                                  with_head=False, name="tfmr")
        self.text_head = nn.Dense(c.text_vocab, name="text_head")
        self.speech_head = nn.Dense(c.speech_vocab, name="speech_head")

    def embed_prompt(self, prompt_tokens):
        """speech-token prompt -> embeddings fed to the perceiver
        (t3.py prepare_conditioning: speech_emb + speech_pos_emb)."""
        t = prompt_tokens.shape[1]
        return (self.speech_emb(prompt_tokens)
                + self.speech_pos_emb(jnp.arange(t))[None])

    def _context(self, text_ids, speech_ids, speaker_emb, prompt_tokens,
                 emotion_adv):
        prompt_emb = (self.embed_prompt(prompt_tokens)
                      if prompt_tokens is not None else None)
        cond = self.cond_enc(speaker_emb, prompt_emb, emotion_adv)
        tex = (self.text_emb(text_ids)
               + self.text_pos_emb(jnp.arange(text_ids.shape[1]))[None])
        spe = (self.speech_emb(speech_ids)
               + self.speech_pos_emb(jnp.arange(speech_ids.shape[1]))[None])
        return jnp.concatenate(
            [jnp.broadcast_to(cond, (tex.shape[0],) + cond.shape[1:]),
             tex, spe], axis=1), cond.shape[1]

    def __call__(self, text_ids, speech_ids, speaker_emb,
                 prompt_tokens=None, emotion_adv=None):
        """Teacher-forced: returns (text_logits, speech_logits)."""
        x, n_cond = self._context(text_ids, speech_ids, speaker_emb,
                                  prompt_tokens, emotion_adv)
        h, _ = self.tfmr(x)
        h = h.astype(jnp.float32)
        n_text = text_ids.shape[1]
        h_text = h[:, n_cond:n_cond + n_text]
        h_speech = h[:, n_cond + n_text:]
        return self.text_head(h_text), self.speech_head(h_speech)

    def prefill(self, text_ids, speaker_emb, prompt_tokens, emotion_adv,
                caches):
        """Context + BOS speech token; returns (logits, caches, seq_len)."""
        bos = jnp.full((text_ids.shape[0], 1), self.cfg.start_speech_token,
                       jnp.int32)
        x, _ = self._context(text_ids, bos, speaker_emb, prompt_tokens,
                             emotion_adv)
        h, caches = self.tfmr(x, pos=jnp.arange(x.shape[1]), caches=caches)
        return (self.speech_head(h[:, -1:].astype(jnp.float32)), caches,
                x.shape[1])

    def step(self, tokens, step_idx, pos, caches):
        """tokens (b,1) at speech position step_idx (1-based after BOS)."""
        x = self.speech_emb(tokens) + self.speech_pos_emb(step_idx)[None, None]
        h, caches = self.tfmr(x, pos=pos, caches=caches)
        return self.speech_head(h.astype(jnp.float32)), caches


def t3_init_cache(cfg: T3CkptConfig, batch: int, max_len: int):
    return init_cache(cfg.lm(max_len), batch, max_len)


def t3_generate(cfg: T3CkptConfig, params: dict, text_ids: np.ndarray,
                speaker_emb: np.ndarray, prompt_tokens=None,
                emotion_adv: float = 0.5, max_new_tokens: int = 600,
                cfg_weight: float = 0.5, temperature: float = 0.8,
                top_p: float = 0.8, repetition_penalty: float = 1.2,
                seed: int = 0) -> np.ndarray:
    """AR speech-token generation with CFG, mirroring the published
    inference contract (t3.py inference: doubled batch, merged logits
    ``cond + w*(cond - uncond)`` with the speaker row zeroed for the
    uncond branch, temperature/top-p sampling, repetition penalty 1.2,
    stop at stop_speech_token).  The reference loops per token in
    python; here prefill + ``lax.scan`` over a preallocated KV cache.

    text_ids (1, t) ALREADY wrapped in start/stop text tokens.
    Returns the generated speech tokens (valid prefix, stop trimmed)."""
    from audiolab_tpu.models.lm import sample_logits

    t3 = T3(cfg, max_seq_len=4096)
    text2 = jnp.concatenate([jnp.asarray(text_ids, jnp.int32)] * 2, axis=0)
    spk = jnp.asarray(speaker_emb, jnp.float32).reshape(1, -1)
    spk2 = jnp.concatenate([spk, jnp.zeros_like(spk)], axis=0)
    prompt2 = (jnp.concatenate(
        [jnp.asarray(prompt_tokens, jnp.int32)] * 2, axis=0)
        if prompt_tokens is not None else None)
    emo2 = jnp.full((2,), float(emotion_adv))

    n_prompt = 0 if prompt_tokens is None else prompt_tokens.shape[1]
    seq_len = 2 + n_prompt + text_ids.shape[1] + 1  # cond + text + BOS
    total = seq_len + max_new_tokens + 1
    caches = t3_init_cache(cfg, 2, total)

    def prefill_fn(p, caches):
        return t3.apply({"params": p}, text2, spk2, prompt2, emo2, caches,
                        method=T3.prefill)

    logits0, caches, _ = jax.jit(prefill_fn)(params, caches)

    def merge(logits, counts):
        lc, lu = logits[0:1, -1], logits[1:2, -1]
        lg = lc + cfg_weight * (lc - lu)
        # HF-style repetition penalty over already-emitted tokens
        pen = jnp.where(lg > 0, lg / repetition_penalty,
                        lg * repetition_penalty)
        return jnp.where(counts[None] > 0, pen, lg)

    def step_fn(p, carry, i):
        tok, caches, counts, done, rng = carry
        rng, key = jax.random.split(rng)
        logits, caches = t3.apply(
            {"params": p}, tok[:, None], i + 1,
            jnp.full((1,), seq_len + i, jnp.int32), caches, method=T3.step)
        lg = merge(logits, counts)
        nxt = sample_logits(lg, key, temperature, top_p=top_p)[0]
        nxt = jnp.where(done, cfg.stop_speech_token, nxt).astype(jnp.int32)
        done = done | (nxt == cfg.stop_speech_token)
        counts = counts.at[nxt].add(1)
        tok = jnp.full((2,), nxt, jnp.int32)
        return (tok, caches, counts, done, rng), nxt

    counts = jnp.zeros((cfg.speech_vocab,), jnp.int32)
    rng = jax.random.PRNGKey(seed)
    lg0 = merge(logits0, counts)
    rng, key0 = jax.random.split(rng)
    first = sample_logits(lg0, key0, temperature, top_p=top_p)[0].astype(
        jnp.int32)
    carry = (jnp.full((2,), first, jnp.int32), caches,
             counts.at[first].add(1), first == cfg.stop_speech_token, rng)

    @jax.jit
    def run(p, carry):
        return jax.lax.scan(lambda c, i: step_fn(p, c, i), carry,
                            jnp.arange(max_new_tokens))

    (_, _, _, _, _), toks = run(params, carry)
    out = np.concatenate([[int(first)], np.asarray(toks)])
    stop = np.nonzero(out == cfg.stop_speech_token)[0]
    if stop.size:
        out = out[: stop[0]]
    return out[None].astype(np.int32)


# ------------------------------------------------------------ voice encoder

@dataclass(frozen=True)
class VoiceEncoderConfig:
    n_mels: int = 40
    hidden: int = 256
    out: int = 256
    n_layers: int = 3
    sr: int = 16000
    n_fft: int = 400
    hop: int = 160
    partial_frames: int = 160


class VoiceEncoder(nn.Module):
    """Resemblyzer-layout speaker encoder: 3-layer LSTM over 40-mel
    frames, last hidden -> Linear -> ReLU -> L2 norm."""

    cfg: VoiceEncoderConfig = VoiceEncoderConfig()

    @nn.compact
    def __call__(self, mels):
        """mels (b, t, n_mels) -> (b, out) unit-norm embeddings."""
        c = self.cfg
        x = mels
        for i in range(c.n_layers):
            x = _LSTMLayer(c.hidden, name=f"lstm_l{i}")(x)
        h_last = x[:, -1]
        e = nn.relu(nn.Dense(c.out, name="proj")(h_last))
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True),
                               1e-8)


class _LSTMLayer(nn.Module):
    """Single torch-gate-order LSTM layer (i, f, g, o) as a lax.scan."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        h = self.hidden
        wi = self.param("w_ih", nn.initializers.normal(0.02),
                        (x.shape[-1], 4 * h))
        wh = self.param("w_hh", nn.initializers.normal(0.02), (h, 4 * h))
        bi = self.param("b_ih", nn.initializers.zeros, (4 * h,))
        bh = self.param("b_hh", nn.initializers.zeros, (4 * h,))

        def cell(carry, xt):
            hp, cp = carry
            g = xt @ wi + hp @ wh + bi + bh
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c = jax.nn.sigmoid(f) * cp + jax.nn.sigmoid(i) * jnp.tanh(gg)
            hn = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (hn, c), hn

        b = x.shape[0]
        z = jnp.zeros((b, h), x.dtype)
        (_, _), ys = jax.lax.scan(cell, (z, z), x.transpose(1, 0, 2))
        return ys.transpose(1, 0, 2)


def utterance_embedding(apply_fn, wav: np.ndarray, sr: int,
                        cfg: VoiceEncoderConfig = VoiceEncoderConfig()
                        ) -> np.ndarray:
    """Partial-window utterance embedding: 1.6 s windows, ~50% overlap,
    renormalised mean (voice_encoder.py embeds_from_wavs)."""
    from audiolab_tpu.kernels.mel import mel_spectrogram
    from audiolab_tpu.kernels.resample import resample

    if sr != cfg.sr:
        wav = np.asarray(resample(jnp.asarray(wav, jnp.float32), sr, cfg.sr))
    mel = mel_spectrogram(jnp.asarray(wav, jnp.float32)[None], sr=cfg.sr,
                          n_fft=cfg.n_fft, hop=cfg.hop, n_mels=cfg.n_mels)
    mel = jnp.log(jnp.clip(mel, 1e-10, None))  # (1, t, n_mels)
    t = mel.shape[1]
    win, hop = cfg.partial_frames, cfg.partial_frames // 2
    if t < win:
        mel = jnp.pad(mel, ((0, 0), (0, win - t), (0, 0)))
        t = win
    starts = list(range(0, max(t - win, 0) + 1, hop)) or [0]
    parts = jnp.concatenate([mel[:, s:s + win] for s in starts], axis=0)
    embeds = apply_fn(parts)
    mean = jnp.mean(embeds, axis=0)
    return np.asarray(mean / jnp.maximum(jnp.linalg.norm(mean), 1e-8))
