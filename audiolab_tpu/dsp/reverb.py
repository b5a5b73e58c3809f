"""Reverb IR extraction / application (reference: handlers/reverb.py).

- ``extract_reverb_params``: pre-delay via FFT cross-correlation (:57-68,127-133),
  RT60 via exponential fit of the dB envelope (:71-91), IR via Wiener
  deconvolution (:94-105), early/late energy split + diffusion + spectral
  centroid (:144-157).
- ``apply_reverb``: FFT convolution with the stored IR, pre-delay pad,
  dry + 0.7·wet mix, clip (:179-209).
- ``generate_ir``: synthetic IR for simulation/tests (:229-300).

Device work (FFT convolution over full songs) runs in JAX; the tiny RT60
curve fit stays on host (scipy).
"""

from __future__ import annotations

import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import curve_fit


def fft_xcorr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross-correlation corr[k] = sum a[n] b[n-k] via FFT (handlers/reverb.py:57-68)."""
    n = a.shape[-1] + b.shape[-1] - 1
    nfft = int(2 ** np.ceil(np.log2(n)))
    fa = jnp.fft.rfft(a, n=nfft)
    fb = jnp.fft.rfft(b, n=nfft)
    return jnp.fft.irfft(fa * jnp.conj(fb), n=nfft)[..., :n]


def wiener_deconvolution(signal: jnp.ndarray, kernel: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """Stable deconvolution H*Y/(|H|²+ε) (handlers/reverb.py:94-105)."""
    n = signal.shape[-1]
    h = jnp.fft.rfft(kernel, n=n)
    y = jnp.fft.rfft(signal, n=n)
    return jnp.fft.irfft(jnp.conj(h) * y / (jnp.abs(h) ** 2 + epsilon), n=n)


def estimate_rt60(signal: np.ndarray, sr: int, maxfev: int = 5000) -> float:
    """RT60-style decay time from an exponential fit of the dB envelope
    (handlers/reverb.py:71-91; decay_time = 3/b of a·exp(-b t)+c)."""
    eps = 1e-10
    sig = np.asarray(signal)
    env = (np.sqrt(np.sum(sig**2, axis=-1 if sig.ndim == 1 else 0)) + eps) if sig.ndim == 2 else np.abs(sig) + eps
    if sig.ndim == 2:
        env = np.sqrt(np.sum(sig**2, axis=0)) + eps
    env_db = 20.0 * np.log10(env)
    t = np.linspace(0, len(env_db) / sr, len(env_db))

    def exp_decay(x, a, b, c):
        return a * np.exp(-b * x) + c

    try:
        popt, _ = curve_fit(exp_decay, t, env_db, maxfev=maxfev)
        decay = 3.0 / popt[1] if popt[1] != 0 else 0.5
    except Exception:
        decay = 0.5
    return max(float(decay), 0.01)


def extract_reverb_params(
    dry: np.ndarray,
    wet: np.ndarray,
    sr: int,
    wiener_epsilon: float = 1e-6,
    curve_fit_maxfev: int = 5000,
) -> dict:
    """Estimate IR + descriptors from a dry/wet pair; arrays are ``(n,)`` or
    ``(channels, n)`` (handlers/reverb.py:112-172 with in-memory I/O)."""
    dry_m = jnp.asarray(dry if dry.ndim == 1 else dry.mean(axis=0), jnp.float32)
    wet_m = jnp.asarray(wet if wet.ndim == 1 else wet.mean(axis=0), jnp.float32)

    corr = np.asarray(fft_xcorr(wet_m, dry_m))
    best_shift = max(int(np.argmax(corr)) - (dry_m.shape[-1] - 1), 0)
    pre_delay = best_shift / sr

    decay_time = estimate_rt60(np.asarray(wet), sr, maxfev=curve_fit_maxfev)

    ir = np.asarray(wiener_deconvolution(wet_m, dry_m, epsilon=wiener_epsilon))
    ir = ir[: int(sr * 2)]

    early = int(0.05 * sr)
    early_e = float(np.sum(ir[:early] ** 2))
    total_e = float(np.sum(ir**2)) + 1e-10
    fft_ir = np.abs(np.fft.rfft(ir))
    freqs = np.fft.rfftfreq(len(ir), d=1.0 / sr)

    return {
        "sample_rate": sr,
        "pre_delay": float(pre_delay),
        "decay_time": float(decay_time),
        "early_reflection_ratio": early_e / total_e,
        "late_reverb_ratio": (total_e - early_e) / total_e,
        "diffusion": float(np.var(np.abs(ir))),
        "spectral_centroid": float(np.sum(freqs * fft_ir) / (np.sum(fft_ir) + 1e-10)),
        "impulse_response": ir.tolist(),
    }


@partial(jax.jit, static_argnames=("pre_delay_samples",))
def _convolve_mix(dry: jnp.ndarray, ir: jnp.ndarray, pre_delay_samples: int) -> jnp.ndarray:
    n = dry.shape[-1]
    m = ir.shape[-1]
    nfft = int(2 ** np.ceil(np.log2(n + m - 1)))
    wet = jnp.fft.irfft(jnp.fft.rfft(dry, n=nfft) * jnp.fft.rfft(ir, n=nfft), n=nfft)
    if pre_delay_samples:
        wet = jnp.pad(wet, [(0, 0)] * (wet.ndim - 1) + [(pre_delay_samples, 0)])
    wet = wet[..., :n]
    return jnp.clip(dry + 0.7 * wet, -1.0, 1.0)


def apply_reverb(dry: np.ndarray, params: dict) -> np.ndarray:
    """Convolve dry ``(n,)``/``(channels, n)`` with the stored IR
    (handlers/reverb.py:179-209)."""
    sr = params["sample_rate"]
    ir = jnp.asarray(np.asarray(params["impulse_response"], dtype=np.float32))
    pre = int(params["pre_delay"] * sr)
    return np.asarray(_convolve_mix(jnp.asarray(dry, jnp.float32), ir, pre))


def save_params(params: dict, path: str) -> str:
    with open(path, "w") as f:
        json.dump(params, f)
    return path


def load_params(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def generate_ir(
    sr: int,
    pre_delay: float,
    decay_time: float,
    early_reflection_ratio: float,
    diffusion: float,
    spectral_centroid: float,
    length: float = 2.0,
    seed: int = 0,
) -> np.ndarray:
    """Synthetic IR: pre-delay + sparse early reflections + noisy exponential
    tail with crude centroid-matched lowpass (handlers/reverb.py:229-300)."""
    rng = np.random.default_rng(seed)
    total = int(sr * length)
    pre = int(pre_delay * sr)
    early_len = int(0.05 * sr)
    tail_len = total - pre - early_len

    ir = np.zeros(total, dtype=np.float32)
    early = np.zeros(early_len, dtype=np.float32)
    for _ in range(rng.integers(3, 7)):
        early[rng.integers(0, early_len)] += rng.uniform(0.1, 1.0)
    e = np.sum(early**2)
    if e > 0:
        early *= np.sqrt(early_reflection_ratio / e)
    ir[pre : pre + early_len] = early

    t = np.linspace(0, tail_len / sr, tail_len, endpoint=False)
    tail = np.exp(-t / decay_time) + diffusion * rng.standard_normal(tail_len)
    alpha = max(0.0, (spectral_centroid - 4000) / 10000)
    if alpha > 0:
        k = max(1, int(sr * 0.005))
        kern = np.exp(-np.linspace(0, k - 1, k) / (alpha * k))
        kern /= kern.sum()
        tail = np.convolve(tail, kern, mode="same")
    te = np.sum(tail**2)
    if te > 0:
        tail *= np.sqrt((1 - early_reflection_ratio) / te)
    ir[pre + early_len :] = tail
    peak = np.max(np.abs(ir))
    return ir / peak if peak > 0 else ir
