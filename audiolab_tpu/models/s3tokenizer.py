"""S3 speech tokenizer (v2, 25 Hz) — reference audio → FSQ speech-token
ids, checkpoint-compatible with the copy bundled in Chatterbox's
``s3gen.safetensors`` under ``tokenizer.`` (the published
chatterbox/CosyVoice2 packages run xingchensong's s3tokenizer
``speech_tokenizer_v2_25hz`` to produce the 6561-code 25 Hz tokens that
T3 and the S3Gen flow consume as reference prompts; reference
layouts/tts.py:381 loads it inside ChatterboxTTS.from_pretrained).

Published topology (mirrored by tests/torch_s3tokenizer_replica.py):

  encoder   AudioEncoderV2 — whisper-style 128-mel front end, two GELU
            convs (k3; strides 2 and 2 → 25 Hz), sinusoidal positions,
            N FSMN attention blocks, ln_post:
              FSMNMultiHeadAttention = whisper query/key/value/out
              (key bias-free, q·k each scaled d^-0.25) PLUS an FSMN
              memory branch: depthwise k31 conv over the value
              projection, residual, added to the attention output
              AFTER the out projection
              mlp = Linear(4x) → GELU → Linear, pre-LN throughout
  quantizer FSQ — Linear(n_state → 8), tanh, ×(1-1e-3), round to
            {-1,0,1}, +1, base-3 digits → id in [0, 6561)

The mel front end is whisper's log_mel_spectrogram at 128 mels
(slaney-norm librosa filterbank, log10, 8-dB dynamic-range floor,
(x+4)/4), without the 30 s padding (s3tokenizer utils.py).

TPU design: NTC convs, the depthwise FSMN conv as a feature-major
matmul-free lax conv, everything static-shape; tokenisation of a
reference clip is one jit.

Converter: utils/convert.convert_s3tokenizer (prefix ``tokenizer.`` for
s3gen.safetensors); parity: tests/test_s3tokenizer_parity.py."""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.whisper import sinusoids


@dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int = 128
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 12
    n_ctx: int = 1500
    fsmn_kernel: int = 31
    fsq_dim: int = 8
    fsq_level: int = 3
    conv1_stride: int = 2  # v2 25 Hz; v1 50 Hz uses 1


class FSMNAttention(nn.Module):
    """whisper MHA + FSMN memory over the value projection."""

    cfg: S3TokenizerConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d = c.n_state // c.n_head
        b, t, _ = x.shape
        q = nn.Dense(c.n_state, name="query")(x)
        k = nn.Dense(c.n_state, use_bias=False, name="key")(x)
        v = nn.Dense(c.n_state, name="value")(x)

        # FSMN memory: depthwise conv (k31, zero-padded same) + residual
        kernel = self.param("fsmn_kernel", nn.initializers.zeros,
                            (c.fsmn_kernel, c.n_state))
        left = (c.fsmn_kernel - 1) // 2
        vp = jnp.pad(v, ((0, 0), (left, c.fsmn_kernel - 1 - left), (0, 0)))
        fsm = jax.lax.conv_general_dilated(
            vp, kernel[:, None, :], window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=c.n_state) + v

        scale = d ** -0.25
        qh = (q.reshape(b, t, c.n_head, d) * scale).transpose(0, 2, 1, 3)
        kh = (k.reshape(b, t, c.n_head, d) * scale).transpose(0, 2, 3, 1)
        vh = v.reshape(b, t, c.n_head, d).transpose(0, 2, 1, 3)
        w = jax.nn.softmax(qh @ kh, axis=-1)
        o = (w @ vh).transpose(0, 2, 1, 3).reshape(b, t, c.n_state)
        return nn.Dense(c.n_state, name="out")(o) + fsm


class S3Block(nn.Module):
    cfg: S3TokenizerConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x + FSMNAttention(c, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="attn_ln")(x))
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_ln")(x)
        h = nn.Dense(c.n_state * 4, name="mlp_0")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(c.n_state, name="mlp_2")(h)


class S3AudioEncoder(nn.Module):
    cfg: S3TokenizerConfig

    @nn.compact
    def __call__(self, mel):
        """(b, t_mel, n_mels) -> (b, t_mel//4, n_state) for v2."""
        c = self.cfg
        h = nn.Conv(c.n_state, (3,), strides=(c.conv1_stride,),
                    padding=((1, 1),), name="conv1")(mel)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Conv(c.n_state, (3,), strides=(2,), padding=((1, 1),),
                    name="conv2")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = h + jnp.asarray(sinusoids(c.n_ctx, c.n_state),
                            h.dtype)[: h.shape[1]]
        for i in range(c.n_layer):
            h = S3Block(c, name=f"block_{i}")(h)
        return nn.LayerNorm(epsilon=1e-5, name="ln_post")(h)


class S3TokenizerV2(nn.Module):
    """(b, t_mel, 128) log-mel -> (b, t_tok) int32 FSQ ids."""

    cfg: S3TokenizerConfig = S3TokenizerConfig()

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        h = S3AudioEncoder(c, name="encoder")(mel)
        h = nn.Dense(c.fsq_dim, name="project_down")(h)
        h = jnp.tanh(h) * np.float32(0.9990000128746033)
        digits = jnp.round(h) + 1.0
        powers = jnp.asarray(
            float(c.fsq_level) ** np.arange(c.fsq_dim), h.dtype)
        return jnp.sum(digits * powers, axis=-1).astype(jnp.int32)


def s3_log_mel(audio16k, n_mels: int = 128) -> jnp.ndarray:
    """whisper log_mel_spectrogram without 30 s padding (s3tokenizer
    utils.py): (b, n) 16 kHz -> (b, frames, n_mels)."""
    from audiolab_tpu.kernels.mel import mel_spectrogram

    mel = mel_spectrogram(jnp.asarray(audio16k, jnp.float32),
                          sr=16000, n_fft=400, hop=160, n_mels=n_mels,
                          htk=False, norm="slaney", power=2.0, center=True)
    mel = mel[:, :-1]  # whisper drops the trailing stft frame
    log_spec = jnp.log10(jnp.clip(mel, 1e-10, None))
    mx = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, mx - 8.0)
    return (log_spec + 4.0) / 4.0


def tokenize_wav(params: dict, wav16k: np.ndarray,
                 cfg: S3TokenizerConfig = S3TokenizerConfig()) -> np.ndarray:
    """(n,) 16 kHz reference -> (1, t) 25 Hz speech-token ids."""
    ids = S3TokenizerV2(cfg).apply(
        {"params": params}, s3_log_mel(np.asarray(wav16k, np.float32)[None],
                                       cfg.n_mels))
    return np.asarray(ids, np.int32)
