"""Kaldi-compatible log-mel fbank front end.

The reference's Chatterbox/CosyVoice S3Gen embeds reference audio with
CAMPPlus over ``torchaudio.compliance.kaldi.fbank(num_mel_bins=80,
dither=0, sample_frequency=16000)`` (chatterbox s3gen speaker encoder
``inference``).  Kaldi framing differs from the librosa/hifigan mel in
kernels/mel.py on every step: snip-edges strided frames, per-frame DC
removal, pre-emphasis 0.97 with the first sample replicated, the
"povey" window (hann**0.85), zero-pad to the next power of two, POWER
spectrum, and triangular mel banks computed in the MEL domain over
htk-mel break points 20 Hz..nyquist (librosa interpolates in Hz), with
the nyquist bin dropped.  log(max(x, eps)) at float-eps.

TPU mapping: framing is one reshape-free gather-as-strided slice, the
DFT is the kernels/stft.py matmul pattern (frames @ cos/sin bases fused
with the mel projection on the MXU), everything static-shape."""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1.1920928955078125e-07  # float32 machine epsilon (kaldi EPSILON)


def povey_window(n: int) -> np.ndarray:
    """Kaldi 'povey' window: hann(n, periodic=False) ** 0.85."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * i / (n - 1))) ** 0.85


def _mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


@lru_cache(maxsize=None)
def kaldi_mel_banks(n_mels: int, padded_window: int, sr: int,
                    low_freq: float = 20.0,
                    high_freq: float = 0.0) -> np.ndarray:
    """Kaldi mel banks (feat/mel-computations.cc, torchaudio
    get_mel_banks): triangles linear in MEL space, over fft bins
    0..padded_window/2 - 1; returns (n_bins+1, n_mels) with a zero
    nyquist row appended (the kaldi matrix excludes nyquist)."""
    if high_freq <= 0.0:
        high_freq = sr / 2.0 + high_freq
    n_bins = padded_window // 2
    fft_bin_width = sr / padded_window
    mel_low, mel_high = _mel(low_freq), _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)
    left = mel_low + np.arange(n_mels)[:, None] * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    mel_of_bin = _mel(fft_bin_width * np.arange(n_bins))[None, :]
    up = (mel_of_bin - left) / (center - left)
    down = (right - mel_of_bin) / (right - center)
    w = np.maximum(0.0, np.minimum(up, down))
    w = np.concatenate([w, np.zeros((n_mels, 1))], axis=1)  # nyquist col
    return w.T  # (n_bins+1, n_mels), float64 (jnp.asarray downcasts)


@partial(jax.jit, static_argnames=("sr", "n_mels", "frame_length",
                                   "frame_shift", "preemph",
                                   "remove_dc_offset"))
def kaldi_fbank(x: jnp.ndarray, sr: int = 16000, n_mels: int = 80,
                frame_length: int = 400, frame_shift: int = 160,
                preemph: float = 0.97,
                remove_dc_offset: bool = True) -> jnp.ndarray:
    """(b, n) 16 kHz waveform -> (b, frames, n_mels) kaldi log-fbank
    (dither=0, snip_edges, povey window, power spectrum)."""
    b, n = x.shape
    n_frames = 1 + (n - frame_length) // frame_shift
    idx = (jnp.arange(n_frames)[:, None] * frame_shift
           + jnp.arange(frame_length)[None, :])
    frames = x[:, idx]  # (b, frames, flen)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - preemph * prev
    frames = frames * jnp.asarray(povey_window(frame_length), x.dtype)

    padded = 1 << (frame_length - 1).bit_length()
    k = np.arange(padded // 2 + 1)
    t = np.arange(frame_length)
    ang = 2.0 * np.pi * k[None, :] * t[:, None] / padded
    cos_b = jnp.asarray(np.cos(ang), x.dtype)  # (flen, bins)
    sin_b = jnp.asarray(np.sin(ang), x.dtype)
    re = frames @ cos_b
    im = -(frames @ sin_b)
    power = re * re + im * im  # (b, frames, padded/2+1)

    fb = jnp.asarray(kaldi_mel_banks(n_mels, padded, sr), x.dtype)
    mel = jnp.dot(power, fb, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, _EPS))
