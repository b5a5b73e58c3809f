"""CREPE pitch estimator in flax (reference: torchcrepe, used by the
crepe/mangio-crepe f0 methods at modules/rvc/pitch_extraction.py:88-155).

Architecture parity with torchcrepe's Crepe('full'|'tiny') so the published
crepe.pth weights convert directly (utils/convert.crepe_mapping):

  1024-sample frames @16 kHz, per-frame mean/std normalization
  conv1 k(512,1) s4 pad(254,254) -> 5x conv k(64,1) pad(31,32)
  each: conv -> relu -> BN -> maxpool(2,1); classifier Linear -> sigmoid
  360 20-cent bins, same cents mapping as RMVPE

Decode: triangle-transition Viterbi over the 360 bins (torchcrepe's default
decoder) as a lax.scan — one jitted graph, device-resident; periodicity is
the decoded path's probability, median/mean filtered like the reference.

TPU notes: all frames batch through the conv stack at once (the reference
streams batches of 512); NHWC layout; BN folded to inference mode.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

WINDOW = 1024
N_CLASS = 360
_CHANNELS = {
    "full": (1024, 128, 128, 128, 256, 512),
    "tiny": (128, 16, 16, 16, 32, 64),
}


class Crepe(nn.Module):
    model: str = "full"

    @nn.compact
    def __call__(self, frames):
        """Normalized frames (b, 1024) -> salience (b, 360)."""
        x = frames[:, :, None, None]  # NHWC, h=1024
        for i, ch in enumerate(_CHANNELS[self.model]):
            if i == 0:
                x = jnp.pad(x, ((0, 0), (254, 254), (0, 0), (0, 0)))
                k, s = (512, 1), (4, 1)
            else:
                x = jnp.pad(x, ((0, 0), (31, 32), (0, 0), (0, 0)))
                k, s = (64, 1), (1, 1)
            x = nn.Conv(ch, k, strides=s, padding="VALID", name=f"conv{i + 1}")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=True, name=f"conv{i + 1}_BN")(x)
            x = nn.max_pool(x, (2, 1), strides=(2, 1))
        # torch flattens (b, c, h, 1) -> permute -> (b, h*c): h-major
        x = x[:, :, 0, :].reshape(x.shape[0], -1)
        return jax.nn.sigmoid(nn.Dense(N_CLASS, name="classifier")(x))


_CENTS = 20.0 * np.arange(N_CLASS) + 1997.3794084376191


def _transition() -> np.ndarray:
    """torchcrepe viterbi transition: triangle of width 12, row-normalized."""
    idx = np.arange(N_CLASS)
    t = np.maximum(12.0 - np.abs(idx[:, None] - idx[None, :]), 0.0)
    return t / t.sum(axis=1, keepdims=True)


@jax.jit
def viterbi_bins(probs: jnp.ndarray) -> jnp.ndarray:
    """(t, 360) salience -> decoded bin path (t,) via log-space Viterbi."""
    log_trans = jnp.asarray(np.log(_transition() + 1e-12), jnp.float32)
    obs = probs / jnp.maximum(probs.sum(axis=-1, keepdims=True), 1e-12)
    log_obs = jnp.log(obs + 1e-12)

    def fwd(score, lo):
        cand = score[:, None] + log_trans  # (from, to)
        ptr = jnp.argmax(cand, axis=0)
        score = jnp.max(cand, axis=0) + lo
        return score, ptr

    init = jnp.full((N_CLASS,), -np.log(N_CLASS)) + log_obs[0]
    final, ptrs = jax.lax.scan(fwd, init, log_obs[1:])

    def back(state, ptr):
        prev = ptr[state]
        return prev, prev

    last = jnp.argmax(final)
    _, path = jax.lax.scan(back, last, ptrs, reverse=True)
    return jnp.concatenate([path, last[None]])


def bins_to_f0(bins: jnp.ndarray) -> jnp.ndarray:
    cents = jnp.asarray(_CENTS, jnp.float32)[bins]
    return 10.0 * jnp.power(2.0, cents / 1200.0)


def _medfilt3(x: jnp.ndarray) -> jnp.ndarray:
    p = jnp.pad(x, 1, mode="edge")
    return jnp.median(jnp.stack([p[:-2], p[1:-1], p[2:]]), axis=0)


def _meanfilt3(x: jnp.ndarray) -> jnp.ndarray:
    p = jnp.pad(x, 1, mode="edge")
    return (p[:-2] + p[1:-1] + p[2:]) / 3.0


class CrepePredictor:
    """Audio -> f0, the torchcrepe.predict flow used by the reference:
    viterbi decode, median-filtered periodicity, mean-filtered f0,
    periodicity < 0.1 -> unvoiced (pitch_extraction.py:129-155)."""

    def __init__(self, params=None, batch_stats=None, model: str = "full"):
        self.model = Crepe(model=model)
        self.variables = None
        if params is not None:
            self.variables = {"params": params,
                              "batch_stats": batch_stats or {}}

    @classmethod
    def from_checkpoint(cls, path: str, model: str = "full"):
        from audiolab_tpu.utils.convert import load_crepe_checkpoint

        variables = load_crepe_checkpoint(path, model)
        return cls(variables["params"], variables["batch_stats"], model)

    def init(self, rng):
        self.variables = self.model.init(rng, jnp.zeros((1, WINDOW)))
        return self.variables

    @partial(jax.jit, static_argnums=(0,))
    def _salience(self, variables, frames):
        return self.model.apply(variables, frames)

    def predict(
        self,
        audio16k: jnp.ndarray,
        hop: int = 160,
        fmin: float = 50.0,
        fmax: float = 1100.0,
        threshold: float = 0.1,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(n,) 16 kHz audio -> (f0 (t,), periodicity (t,))."""
        if self.variables is None:
            self.init(jax.random.PRNGKey(0))
        x = jnp.asarray(audio16k, jnp.float32)
        n = x.shape[-1]
        t_frames = 1 + n // hop
        xp = jnp.pad(x, (WINDOW // 2, WINDOW // 2 + hop))
        idx = jnp.arange(t_frames)[:, None] * hop + jnp.arange(WINDOW)[None, :]
        frames = xp[idx]
        mu = frames.mean(axis=-1, keepdims=True)
        sd = frames.std(axis=-1, keepdims=True, ddof=1)
        frames = (frames - mu) / jnp.maximum(sd, 1e-10)

        probs = self._salience(self.variables, frames)  # (t, 360)
        # restrict to [fmin, fmax] bins (torchcrepe.postprocess)
        cents = jnp.asarray(_CENTS, jnp.float32)
        fhz = 10.0 * jnp.power(2.0, cents / 1200.0)
        probs = jnp.where((fhz >= fmin) & (fhz <= fmax), probs, 0.0)

        bins = viterbi_bins(probs)
        pd = jnp.take_along_axis(probs, bins[:, None], axis=-1)[:, 0]
        pd = _medfilt3(pd)
        f0 = _meanfilt3(bins_to_f0(bins))
        return jnp.where(pd >= threshold, f0, 0.0), pd

    def predict_mangio(
        self,
        audio16k: jnp.ndarray,
        hop: int = 160,
        fmin: float = 50.0,
        fmax: float = 1100.0,
    ) -> jnp.ndarray:
        """The fork's "mangio-crepe" flow (pitch_extraction.py:89-127):
        0.999-quantile peak normalization, plain viterbi decode with NO
        periodicity gating or f0/pd filters, then the curve linearly
        resampled to ``n // hop`` frames with unvoiced (< 1 mHz) samples
        zeroed."""
        x = np.asarray(audio16k, np.float32)
        q = np.quantile(np.abs(x), 0.999)
        x = x / (q if q > 0 else 1.0)
        if self.variables is None:
            self.init(jax.random.PRNGKey(0))
        xj = jnp.asarray(x)
        n = xj.shape[-1]
        t_frames = 1 + n // hop
        xp = jnp.pad(xj, (WINDOW // 2, WINDOW // 2 + hop))
        idx = jnp.arange(t_frames)[:, None] * hop + jnp.arange(WINDOW)[None]
        frames = xp[idx]
        mu = frames.mean(axis=-1, keepdims=True)
        sd = frames.std(axis=-1, keepdims=True, ddof=1)
        frames = (frames - mu) / jnp.maximum(sd, 1e-10)
        probs = self._salience(self.variables, frames)
        cents = jnp.asarray(_CENTS, jnp.float32)
        fhz = 10.0 * jnp.power(2.0, cents / 1200.0)
        probs = jnp.where((fhz >= fmin) & (fhz <= fmax), probs, 0.0)
        source = np.asarray(bins_to_f0(viterbi_bins(probs)), np.float64)
        source[source < 0.001] = np.nan
        p_len = max(n // hop, 1)
        pos = np.arange(0, len(source) * p_len, len(source)) / p_len
        target = np.interp(pos, np.arange(len(source)), source)
        return jnp.asarray(np.nan_to_num(target), jnp.float32)
