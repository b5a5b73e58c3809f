"""WaveGrad-style score network for diffusion timbre transfer.

Reference behavior (modules/wavetransfer/, SURVEY §2.3):
  - WaveGrad UNet conditioned on mel + continuous noise level
    (modules/wavetransfer/model.py): DBlocks downsample the noisy waveform,
    UBlocks upsample the mel with FiLM modulation from the noise level and
    the DBlock features.
  - trained with L1 on predicted noise (learner.py), EMA weights
  - BDDM fast sampling with short learned schedules (bddm/sampler.py:38)

TPU design: the whole net is conv/matmul NWC; the sampler is ONE
`lax.scan` over the schedule (no per-step host sync); training uses the
continuous noise-level parameterization so schedules are a pure inference
choice."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class WaveGradConfig:
    n_mels: int = 128
    hop: int = 300                      # prod(factors)
    factors: Sequence[int] = (5, 5, 3, 2, 2)
    ublock_ch: Sequence[int] = (512, 512, 256, 128, 128)
    dblock_ch: Sequence[int] = (128, 128, 256, 512)
    base_ch: int = 32


def noise_level_embedding(scale: jnp.ndarray, dim: int = 512) -> jnp.ndarray:
    """Continuous sqrt-alpha-cumprod -> Fourier embedding (b, dim)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(1e4) * jnp.arange(half) / half)
    args = scale[:, None] * freqs[None, :] * 5000.0
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class FiLM(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, noise_emb):
        """x (b, t, c) conditioning features; noise_emb (b, d)."""
        h = nn.Conv(self.features, (3,), padding="SAME", name="conv")(x)
        e = nn.Dense(2 * self.features, name="emb")(nn.silu(noise_emb))
        shift, s = jnp.split(e[:, None, :], 2, axis=-1)
        return shift + h, s


class DBlock(nn.Module):
    features: int
    factor: int

    @nn.compact
    def __call__(self, x):
        res = nn.Conv(self.features, (1,), strides=(self.factor,), name="res")(x)
        h = x
        for i, d in enumerate((1, 2, 4)):
            h = nn.silu(h)
            h = nn.Conv(self.features, (3,), strides=(self.factor,) if i == 0 else (1,),
                        kernel_dilation=(d,), padding="SAME", name=f"c{i}")(h)
        return h + res


class UBlock(nn.Module):
    features: int
    factor: int

    @nn.compact
    def __call__(self, x, shift, scale):
        b, t, _ = x.shape
        up = jnp.repeat(x, self.factor, axis=1)
        res = nn.Conv(self.features, (1,), name="res")(up)
        h = nn.silu(x)
        h = jnp.repeat(h, self.factor, axis=1)
        h = nn.Conv(self.features, (3,), kernel_dilation=(1,), padding="SAME",
                    name="c0")(h)
        h = h * scale + shift[:, : h.shape[1]]
        h = nn.silu(h)
        h = nn.Conv(self.features, (3,), kernel_dilation=(2,), padding="SAME",
                    name="c1")(h)
        h = h + res
        h2 = h * scale + shift[:, : h.shape[1]]
        h2 = nn.silu(h2)
        h2 = nn.Conv(self.features, (3,), kernel_dilation=(4,), padding="SAME",
                     name="c2")(h2)
        h2 = nn.silu(h2)
        h2 = nn.Conv(self.features, (3,), kernel_dilation=(8,), padding="SAME",
                     name="c3")(h2)
        return h + h2


class WaveGrad(nn.Module):
    """eps = f(noisy_audio, mel, noise_scale)."""

    cfg: WaveGradConfig = WaveGradConfig()

    @nn.compact
    def __call__(self, audio, mel, noise_scale):
        """audio (b, t*hop), mel (b, t, n_mels), noise_scale (b,) in (0,1)."""
        c = self.cfg
        x = audio[..., None]
        emb = noise_level_embedding(noise_scale)

        # downsample the noisy waveform into FiLM conditioners; film j feeds
        # ublock n-1-j, so its width must match that ublock's channels
        n_up = len(c.factors)
        d = nn.Conv(c.base_ch, (5,), padding="SAME", name="d_in")(x)
        films = []
        film, s = FiLM(c.ublock_ch[n_up - 1], name="film_0")(d, emb)
        films.append((film, s))
        for i, (ch, f) in enumerate(zip(c.dblock_ch, c.factors[::-1][:-1])):
            d = DBlock(ch, f, name=f"dblock_{i}")(d)
            film, s = FiLM(c.ublock_ch[n_up - 2 - i], name=f"film_{i + 1}")(d, emb)
            films.append((film, s))

        # upsample mel to waveform rate with FiLM injections
        u = nn.Conv(c.ublock_ch[0], (3,), padding="SAME", name="u_in")(mel)
        for i, (ch, f) in enumerate(zip(c.ublock_ch, c.factors)):
            shift, s = films[len(films) - 1 - i]
            u = UBlock(ch, f, name=f"ublock_{i}")(u, shift, s)
        out = nn.Conv(1, (3,), padding="SAME", name="u_out")(u)
        return out[..., 0]


# ------------------------------------------------------------------ diffusion

def make_beta_schedule(n: int, start: float = 1e-4, end: float = 0.05) -> np.ndarray:
    return np.linspace(start, end, n, dtype=np.float64)


@dataclass(frozen=True)
class NoiseSchedule:
    betas: np.ndarray

    @property
    def alphas(self) -> np.ndarray:
        return 1.0 - self.betas

    @property
    def alpha_cum(self) -> np.ndarray:
        return np.cumprod(self.alphas)

    @property
    def sqrt_alpha_cum(self) -> np.ndarray:
        return np.sqrt(self.alpha_cum)


TRAIN_SCHEDULE = NoiseSchedule(make_beta_schedule(1000, 1e-6, 0.01))
FAST_6 = NoiseSchedule(np.array([1e-6, 1e-5, 1e-4, 1e-3, 1e-2, 1e-1]))
FAST_12 = NoiseSchedule(make_beta_schedule(12, 1e-6, 0.12))


def sample_noise_level(rng: jax.Array, batch: int,
                       schedule: NoiseSchedule = TRAIN_SCHEDULE) -> jnp.ndarray:
    """Continuous noise level: uniform in [sqrt_ac[s+1], sqrt_ac[s]] for a
    random segment s (WaveGrad training trick — schedule-free inference)."""
    sac = jnp.asarray(np.concatenate([[1.0], schedule.sqrt_alpha_cum]))
    k1, k2 = jax.random.split(rng)
    s = jax.random.randint(k1, (batch,), 0, len(schedule.betas))
    lo, hi = sac[s + 1], sac[s]
    u = jax.random.uniform(k2, (batch,))
    return lo + u * (hi - lo)


def diffusion_loss(model: WaveGrad, params, audio, mel, rng) -> jnp.ndarray:
    """L1(eps, eps_hat) with continuous noise level (learner.py loss)."""
    k1, k2 = jax.random.split(rng)
    b = audio.shape[0]
    scale = sample_noise_level(k1, b)[:, None]
    eps = jax.random.normal(k2, audio.shape)
    noisy = scale * audio + jnp.sqrt(1.0 - scale**2) * eps
    eps_hat = model.apply({"params": params}, noisy, mel, scale[:, 0])
    return jnp.mean(jnp.abs(eps - eps_hat))


def sample(
    model: WaveGrad,
    params,
    mel: jnp.ndarray,
    schedule: NoiseSchedule = FAST_6,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Full reverse process as ONE lax.scan -> audio (b, t*hop)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b, t, _ = mel.shape
    n = t * model.cfg.hop
    betas = jnp.asarray(schedule.betas, jnp.float32)
    alphas = 1.0 - betas
    acum = jnp.cumprod(alphas)
    sac = jnp.sqrt(acum)

    x = jax.random.normal(rng, (b, n))
    steps = np.arange(len(schedule.betas))[::-1].copy()

    def body(x, i):
        beta = betas[i]
        alpha = alphas[i]
        c1 = 1.0 / jnp.sqrt(alpha)
        c2 = beta / jnp.sqrt(1.0 - acum[i])
        eps_hat = model.apply({"params": params}, x,
                              mel, jnp.full((b,), sac[i]))
        mean = c1 * (x - c2 * eps_hat)
        key = jax.random.fold_in(rng, i)
        sigma = jnp.sqrt(beta) * (i > 0)
        x = mean + sigma * jax.random.normal(key, x.shape)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.asarray(steps))
    return jnp.clip(x, -1.0, 1.0)
