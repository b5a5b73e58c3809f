"""Chatterbox-class TEST DOUBLE — NOT the checkpoint-faithful engine.

The production Chatterbox stack lives in ``chatterbox_t3.py`` /
``chatterbox_s3gen.py`` (T3 LM + VoiceEncoder + S3Gen flow decoder +
CAMPPlus + S3Tokenizer, all converting real resemble-ai weights).  This
module is a deliberately tiny engine with the same three-stage SHAPE
(LM -> flow decoder -> vocoder, exaggeration knob included) used only by
``pipelines.tts.random_chatterbox`` and the engine-API tests, where a
full-size model would make the suite minutes slower for no extra
coverage.  Do not count it as a second Chatterbox implementation.

Reference: resemble-ai Chatterbox engine, layouts/tts.py:381
run_chatterbox_tts.  Stage map shared with the real engine:

  T3-style LM        TransformerLM over [exaggeration | speaker | text |
                     speech tokens] (models/lm.py scan decode)
  S3-style decoder   flow-matching DiT: noisy mel + t -> velocity, cond on
                     speech-token features + speaker + exaggeration;
                     Euler integration, a handful of steps
  Vocoder            Vocos ConvNeXt -> iSTFT head (models/codecs.py) —
                     all-MXU, no transposed convs

The exaggeration scalar conditions BOTH the LM prefix and the decoder
(the reference exposes it as the engine's signature knob).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.mel import mel_spectrogram
from audiolab_tpu.models.codecs import Vocos, VocosConfig
from audiolab_tpu.models.dit import DiT, DiTConfig, timestep_embedding
from audiolab_tpu.models.lm import LMConfig, TransformerLM, decode, init_cache


@dataclass(frozen=True)
class ChatterboxConfig:
    text_vocab: int = 256
    n_units: int = 1000             # discrete speech units
    dim: int = 256
    n_layers: int = 4
    n_heads: int = 4
    mel_bins: int = 80
    frames_per_unit: int = 2        # mel frames per speech token
    sr: int = 24000
    max_seq_len: int = 2048
    flow_steps: int = 8
    dtype: str = "float32"

    @property
    def unit_start(self) -> int:
        return self.n_units

    @property
    def unit_stop(self) -> int:
        return self.n_units + 1

    @property
    def unit_vocab(self) -> int:
        return self.n_units + 2

    def lm(self) -> LMConfig:
        return LMConfig(vocab_size=self.unit_vocab, dim=self.dim,
                        n_layers=self.n_layers, n_heads=self.n_heads,
                        n_kv_heads=self.n_heads, ffn_dim=self.dim * 4,
                        max_seq_len=self.max_seq_len, dtype=self.dtype)


class T3(nn.Module):
    """Token LM: [exaggeration emb | speaker emb | text | units]."""

    cfg: ChatterboxConfig

    def setup(self):
        c = self.cfg
        self.text_emb = nn.Embed(c.text_vocab, c.dim, name="text_emb")
        self.unit_emb = nn.Embed(c.unit_vocab, c.dim, name="unit_emb")
        self.exag_proj = nn.Dense(c.dim, name="exag_proj")
        self.spk_proj = nn.Dense(c.dim, name="spk_proj")
        self.lm = TransformerLM(c.lm(), embed_input=False, with_head=False,
                                name="lm")
        self.head = nn.Dense(c.unit_vocab, use_bias=False, name="unit_head")

    def prefill(self, text_ids, spk, exaggeration, caches):
        c = self.cfg
        ex = self.exag_proj(timestep_embedding(exaggeration * 100.0, c.dim))
        prefix = jnp.stack([ex, self.spk_proj(spk)], axis=1)  # (b, 2, dim)
        bos = self.unit_emb(jnp.full((text_ids.shape[0], 1), c.unit_start,
                                     jnp.int32))
        x = jnp.concatenate([prefix, self.text_emb(text_ids), bos], axis=1)
        h, caches = self.lm(x, pos=jnp.arange(x.shape[1]), caches=caches)
        return self.head(h[:, -1:].astype(jnp.float32)), caches

    def step(self, tokens, pos, caches):
        h, caches = self.lm(self.unit_emb(tokens), pos=pos, caches=caches)
        return self.head(h.astype(jnp.float32)), caches


class S3Decoder(nn.Module):
    """Flow-matching mel decoder: units -> mel via a DiT velocity field."""

    cfg: ChatterboxConfig

    def setup(self):
        c = self.cfg
        self.unit_emb = nn.Embed(c.unit_vocab, c.dim, name="unit_emb")
        self.dit = DiT(DiTConfig(dim=c.dim, n_layers=3, n_heads=c.n_heads,
                                 cond_dim=c.dim, in_dim=c.mel_bins,
                                 out_dim=c.mel_bins, dtype=c.dtype),
                       name="dit")
        self.spk_proj = nn.Dense(c.dim, name="spk_proj")
        self.exag_proj = nn.Dense(c.dim, name="exag_proj")

    def velocity(self, x_t, t, units, spk, exaggeration):
        ctx = self.unit_emb(units)  # (b, s, dim)
        g = (self.spk_proj(spk)
             + self.exag_proj(timestep_embedding(exaggeration * 100.0,
                                                 self.cfg.dim)))
        return self.dit(x_t, t, context=ctx, global_cond=g)


class Chatterbox:
    """LM + flow decoder + Vocos; engine core with a jitted decode loop."""

    def __init__(self, cfg: ChatterboxConfig, params: dict):
        self.cfg = cfg
        self.t3 = T3(cfg)
        self.s3 = S3Decoder(cfg)
        self.vocos = Vocos(VocosConfig(dim=cfg.dim, n_layers=4,
                                       n_fft=1024, hop=256))
        self.params = params

    @classmethod
    def random_init(cls, cfg: ChatterboxConfig, seed: int = 0) -> "Chatterbox":
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        t3, s3 = T3(cfg), S3Decoder(cfg)
        caches = init_cache(cfg.lm(), 1, cfg.max_seq_len)
        params = {
            "t3": t3.init(k1, jnp.zeros((1, 4), jnp.int32),
                          jnp.zeros((1, cfg.dim)), jnp.zeros((1,)), caches,
                          method=T3.prefill)["params"],
            "s3": s3.init(k2, jnp.zeros((1, 8, cfg.mel_bins)),
                          jnp.zeros((1,)), jnp.zeros((1, 4), jnp.int32),
                          jnp.zeros((1, cfg.dim)), jnp.zeros((1,)),
                          method=S3Decoder.velocity)["params"],
            "vocos": Vocos(VocosConfig(dim=cfg.dim, n_layers=4, n_fft=1024,
                                       hop=256)).init(
                k3, jnp.zeros((1, 8, cfg.mel_bins)))["params"],
        }
        return cls(cfg, params)

    def embed_speaker(self, wav: np.ndarray, sr: int) -> jnp.ndarray:
        mel = mel_spectrogram(jnp.asarray(wav, jnp.float32)[None], sr=sr,
                              n_fft=1024, hop=256, n_mels=self.cfg.dim)
        mel = jnp.log(jnp.clip(mel, 1e-5, None)).mean(axis=1)
        return mel / jnp.maximum(jnp.linalg.norm(mel, axis=-1, keepdims=True),
                                 1e-6)

    @partial(jax.jit, static_argnums=(0, 5))
    def _generate_units(self, params, text_ids, spk, exaggeration, steps, rng):
        c = self.cfg
        caches = init_cache(c.lm(), text_ids.shape[0], c.max_seq_len)
        logits, caches = self.t3.apply({"params": params}, text_ids, spk,
                                       exaggeration, caches,
                                       method=T3.prefill)
        first = jnp.argmax(logits[:, -1], axis=-1)
        start = 2 + text_ids.shape[1] + 1

        def apply_fn(p, toks, pos, cch):
            return self.t3.apply({"params": p}, toks, pos, cch,
                                 method=T3.step)

        toks, _ = decode(apply_fn, params, caches, first, start, steps, rng,
                         temperature=0.8, top_k=50, stop_token=c.unit_stop)
        return toks

    @partial(jax.jit, static_argnums=(0,))
    def _flow_decode(self, params, units, spk, exaggeration, rng):
        """Euler integration of the velocity field from noise to mel."""
        c = self.cfg
        b, s = units.shape
        t_frames = s * c.frames_per_unit
        x = jax.random.normal(rng, (b, t_frames, c.mel_bins))
        dt = 1.0 / c.flow_steps

        def step(x, i):
            t = jnp.full((b,), i * dt)
            v = self.s3.apply({"params": params}, x, t, units, spk,
                              exaggeration, method=S3Decoder.velocity)
            return x + dt * v, None

        x, _ = jax.lax.scan(step, x, jnp.arange(c.flow_steps))
        return x

    def tts(self, text: str, exaggeration: float = 0.5,
            ref_wav: np.ndarray | None = None, ref_sr: int = 24000,
            max_units: int = 128, seed: int = 0) -> tuple[np.ndarray, int]:
        c = self.cfg
        ids = jnp.asarray([min(b, c.text_vocab - 1)
                           for b in text.encode("utf-8")], jnp.int32)[None]
        spk = (self.embed_speaker(ref_wav, ref_sr) if ref_wav is not None
               else jnp.zeros((1, c.dim)))
        ex = jnp.asarray([float(exaggeration)])
        rng = jax.random.PRNGKey(seed)
        units = self._generate_units(self.params["t3"], ids, spk, ex,
                                     max_units, rng)
        units = jnp.clip(units, 0, c.n_units - 1)
        mel = self._flow_decode(self.params["s3"], units, spk, ex,
                                jax.random.fold_in(rng, 1))
        wav = self.vocos.apply({"params": self.params["vocos"]}, mel)
        return np.asarray(wav[0]), c.sr
