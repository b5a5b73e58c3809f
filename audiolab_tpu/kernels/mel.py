"""Mel filterbank + log-mel spectrogram (librosa-compatible numerics).

The RVC training/eval path normalizes audio to log-mel with librosa's slaney
filterbank (reference: modules/rvc/infer/lib/train/mel_processing.py — uses
librosa_mel_fn then log(clamp(x, 1e-5))); RMVPE uses an htk-style 128-mel
front-end (modules/rvc/infer/lib/rmvpe.py:MelSpectrogram).  Both variants are
reproduced here and validated against librosa's published formulas in tests.

The mel projection is a (n_bins, n_mels) matmul that XLA fuses with the DFT
matmul in kernels/stft.py — spectrogram->mel is a single MXU pipeline.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.stft import spectrogram


def _hz_to_mel(f: np.ndarray | float, htk: bool = False) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    safe = np.maximum(f, 1e-10)
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) / logstep, mels
    )


def _mel_to_hz(m: np.ndarray, htk: bool = False) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=None)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank ``(n_bins, n_mels)`` (librosa.filters.mel.T)."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    elif norm == "inf":
        # librosa norm=np.inf: each filter scaled to unit peak (the RTLA
        # front end passes norm=np.inf, modules/rtla/config.py NORM)
        peak = np.maximum(weights.max(axis=1, keepdims=True), 1e-12)
        weights = weights / peak
    return weights.T.astype(np.float32)  # (n_bins, n_mels)


@partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "hop", "win_length", "n_mels", "fmin", "fmax", "htk", "norm", "power", "center"),
)
def mel_spectrogram(
    x: jnp.ndarray,
    sr: int = 48000,
    n_fft: int = 2048,
    hop: int = 480,
    win_length: int | None = None,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    power: float = 1.0,
    center: bool = True,
) -> jnp.ndarray:
    """Mel spectrogram ``(..., T, n_mels)``.

    power=1 on magnitude matches RVC's mel front-end (mel of |STFT|);
    power=2 matches librosa.feature.melspectrogram defaults.
    """
    spec = spectrogram(x, n_fft, hop, win_length, center=center, power=power)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm))
    return jnp.dot(spec, fb, precision=jax.lax.Precision.HIGHEST)


def log_mel(mel: jnp.ndarray, clip_val: float = 1e-5, c: float = 1.0) -> jnp.ndarray:
    """Dynamic-range compression log(clamp(x) * C) — the reference's
    spectral_normalize (mel_processing.py)."""
    return jnp.log(jnp.clip(mel, clip_val, None) * c)
