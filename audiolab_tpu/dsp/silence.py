"""Silence restoration / amplitude-profile transfer (reference:
handlers/noise_removal.py:6-136 ``restore_silence``).

The reference loops over analysis windows on the host; here the framewise
RMS envelopes, gains and masks are computed for all frames at once and
overlap-added in a single jitted graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.dsp.loudness import integrated_loudness
from audiolab_tpu.kernels.resample import resample


@partial(jax.jit, static_argnames=("silence_threshold", "window_size", "hop"))
def _restore_core(
    orig: jnp.ndarray,
    clone: jnp.ndarray,
    silence_threshold: float = 0.002,
    window_size: int = 1024,
    hop: int = 512,
) -> jnp.ndarray:
    """Per-channel framewise gain/mask transfer; both ``(c, n)``, same n."""
    n = orig.shape[-1]
    win = jnp.asarray(np.hanning(window_size).astype(np.float32))
    t_frames = max(1, 1 + (n - window_size) // hop)
    idx = jnp.arange(t_frames)[:, None] * hop + jnp.arange(window_size)[None, :]

    of = orig[:, idx] * win  # (c, T, W)
    cf = clone[:, idx] * win
    orms = jnp.sqrt(jnp.mean(of**2, axis=-1) + 1e-8)  # (c, T)
    crms = jnp.sqrt(jnp.mean(cf**2, axis=-1) + 1e-8)
    silent = orms < silence_threshold
    gain = jnp.where(silent, 1.0, jnp.minimum(orms / (crms + 1e-8), 10.0))
    mask = jnp.where(silent, 0.0, 1.0)

    # window-weighted overlap-add of the per-frame scalars -> sample envelopes
    def ola(vals):  # vals (c, T)
        contrib = vals[..., None] * win[None, None, :]  # (c, T, W)
        out = jnp.zeros((orig.shape[0], n + window_size), orig.dtype)
        out = out.at[:, idx].add(contrib)
        return out[:, :n]

    wsum = jnp.zeros((n + window_size,), orig.dtype).at[idx.reshape(-1)].add(
        jnp.tile(win, (t_frames,))
    )[:n]
    wsum = jnp.where(wsum > 1e-8, wsum, 1.0)
    gain_env = ola(gain) / wsum
    mask_env = ola(mask) / wsum
    return clone * gain_env * mask_env


def restore_silence(
    original: np.ndarray,
    cloned: np.ndarray,
    sr_original: int,
    sr_cloned: int,
    silence_threshold: float = 0.002,
    window_size: int = 1024,
    hop: int = 512,
) -> np.ndarray:
    """Match the clone's envelope/silences to the original's; arrays are
    ``(n,)`` or ``(channels, n)``; returns the original's shape/rate."""
    orig = np.atleast_2d(np.asarray(original, dtype=np.float32))
    clone = np.atleast_2d(np.asarray(cloned, dtype=np.float32))

    if sr_cloned != sr_original:
        clone = np.asarray(resample(jnp.asarray(clone), sr_cloned, sr_original))
    n = orig.shape[-1]
    if clone.shape[-1] > n:
        clone = clone[:, :n]
    elif clone.shape[-1] < n:
        clone = np.pad(clone, ((0, 0), (0, n - clone.shape[-1])))
    if clone.shape[0] != orig.shape[0]:
        clone = np.broadcast_to(clone[:1], orig.shape).copy()

    result = np.asarray(
        _restore_core(jnp.asarray(orig), jnp.asarray(clone), silence_threshold, window_size, hop)
    )

    # global loudness match (reference uses pyloudnorm BS.1770; ours in dsp/loudness)
    ol = integrated_loudness(orig, sr_original)
    pl = integrated_loudness(result, sr_original)
    if ol > -70.0 and pl > -70.0:
        result = result * (10.0 ** ((ol - pl) / 20.0))
    else:
        orms, rrms = np.sqrt(np.mean(orig**2)), np.sqrt(np.mean(result**2))
        if rrms > 1e-8:
            result = result * (orms / rrms)

    peak = np.max(np.abs(result)) if result.size else 0.0
    if peak > 0.98:
        result = result * (0.98 / peak)
    return result[0] if np.asarray(original).ndim == 1 else result
