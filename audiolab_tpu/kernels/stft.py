"""STFT / iSTFT engineered for the TPU MXU.

The reference computes spectrograms with torch.stft / librosa (e.g. RVC mel
front-end modules/rvc/infer/lib/train/mel_processing.py, RMVPE's custom STFT
modules/rvc/infer/lib/rmvpe.py, separator STFT front-ends).  On TPU the
fastest formulation for audio-sized FFTs (n_fft ≤ 4096) is not an FFT at all:
frame the signal and multiply by a windowed DFT matrix — one big bf16/f32
matmul that lands on the 128×128 systolic array and fuses with the mel
projection that usually follows.  O(F²) beats O(F log F) here because the MXU
delivers ~100× the VPU's FLOPs and XLA fuses the window, DFT, power and mel
stages into one pass over VMEM.

Conventions match librosa/torch.stft: hann window (periodic), center-padding
(reflect), onesided bins F//2+1.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Periodic Hann, identical to torch.hann_window / scipy hann(sym=False)."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1))
    return w[:win_length].astype(np.float32)


@lru_cache(maxsize=None)
def _dft_basis(n_fft: int, win_length: int, window: str) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT analysis basis: two (n_fft, n_bins) matrices.

    frames @ cos_basis = Re(STFT), frames @ sin_basis = -Im ... we fold the
    window into the basis so framing -> matmul is the whole transform.
    """
    if window == "hann":
        win = hann_window(win_length)
    elif window == "hamming":
        # periodic Hamming, identical to torch.hamming_window default
        win = (0.54 - 0.46 * np.cos(
            2.0 * np.pi * np.arange(win_length) / win_length)
        ).astype(np.float32)
    elif window == "ones":
        win = np.ones(win_length, dtype=np.float32)
    else:
        raise ValueError(f"unknown window {window}")
    if win_length < n_fft:  # zero-pad window to n_fft, centered (librosa style)
        pad = (n_fft - win_length) // 2
        win = np.pad(win, (pad, n_fft - win_length - pad))
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None] * np.arange(n_bins)[None, :] * (2.0 * np.pi / n_fft)
    cos_b = (np.cos(t) * win[:, None]).astype(np.float32)
    sin_b = (-np.sin(t) * win[:, None]).astype(np.float32)
    return cos_b, sin_b


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """``(..., n) -> (..., T, frame_length)`` overlapping frames.

    When ``hop`` divides ``frame_length`` (every config in this repo:
    2048/512, 1024/256, 400/160, ...) the frames are assembled from
    R = frame_length/hop contiguous hop-block slices — dense reshapes and
    static slices only.  The (T, frame_length) index gather this replaces
    was the profiled bottleneck of the STFT on TPU (XLA lowers big 2-D
    takes far worse than slices).  Gather fallback otherwise."""
    n = x.shape[-1]
    t = 1 + (n - frame_length) // hop if n >= frame_length else 0
    if t <= 0:
        raise ValueError(f"signal length {n} < frame {frame_length}")
    if frame_length % hop == 0:
        r_blocks = frame_length // hop
        nb = t + r_blocks - 1
        xb = x[..., : nb * hop].reshape(*x.shape[:-1], nb, hop)
        return jnp.concatenate(
            [xb[..., r : r + t, :] for r in range(r_blocks)], axis=-1)
    idx = np.arange(t)[:, None] * hop + np.arange(frame_length)[None, :]
    return jnp.take(x, jnp.asarray(idx), axis=-1)


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "window", "center"))
def stft(
    x: jnp.ndarray,
    n_fft: int = 2048,
    hop: int = 512,
    win_length: int | None = None,
    window: str = "hann",
    center: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real STFT of ``(..., n)`` -> (real, imag) each ``(..., T, n_bins)``.

    Returned as a real pair (not complex64) so downstream Pallas kernels and
    bf16 matmuls consume it directly.
    """
    if win_length is None:
        win_length = n_fft
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, n_fft, hop)
    cos_b, sin_b = _dft_basis(n_fft, win_length, window)
    # full-f32 MXU passes: spectral fidelity gates the mel-L1 target, and the
    # 3-pass bf16x3 mode XLA uses for "highest" is still MXU-bound and cheap.
    real = jnp.dot(frames, jnp.asarray(cos_b), precision=jax.lax.Precision.HIGHEST)
    imag = jnp.dot(frames, jnp.asarray(sin_b), precision=jax.lax.Precision.HIGHEST)
    return real, imag


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "win_length", "window", "center", "power", "eps"),
)
def spectrogram(
    x: jnp.ndarray,
    n_fft: int = 2048,
    hop: int = 512,
    win_length: int | None = None,
    window: str = "hann",
    center: bool = True,
    power: float = 2.0,
    eps: float = 1e-9,
) -> jnp.ndarray:
    """Magnitude (power=1) or power (power=2) spectrogram ``(..., T, n_bins)``."""
    real, imag = stft(x, n_fft, hop, win_length, window, center)
    p = real * real + imag * imag
    if power == 2.0:
        return p
    if power == 1.0:
        return jnp.sqrt(p + eps)
    return jnp.power(p + eps, power / 2.0)


@lru_cache(maxsize=None)
def _idft_basis(n_fft: int, win_length: int, window: str) -> np.ndarray:
    """(2*n_bins, n_fft) inverse basis mapping [real, imag] rows to a
    windowed time frame (synthesis window folded in)."""
    n_bins = n_fft // 2 + 1
    if window == "hann":
        win = hann_window(win_length)
    else:
        win = np.ones(win_length, dtype=np.float32)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        win = np.pad(win, (pad, n_fft - win_length - pad))
    k = np.arange(n_bins)[:, None]
    t = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * t / n_fft
    # irfft with hermitian symmetry: interior bins count twice
    scale = np.full((n_bins, 1), 2.0 / n_fft, dtype=np.float64)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    basis_r = np.cos(ang) * scale
    basis_i = -np.sin(ang) * scale  # imag stored as-is; stft returns -sin conv.
    full = np.concatenate([basis_r, basis_i], axis=0) * win[None, :]
    return full.astype(np.float32)


@partial(
    jax.jit, static_argnames=("n_fft", "hop", "win_length", "window", "center", "length")
)
def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int = 2048,
    hop: int = 512,
    win_length: int | None = None,
    window: str = "hann",
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT of (real, imag) ``(..., T, n_bins)`` -> ``(..., n)``.

    Overlap-add with squared-window normalization (matches torch.istft /
    librosa.istft COLA handling).
    """
    if win_length is None:
        win_length = n_fft
    t_frames = real.shape[-2]
    basis = jnp.asarray(_idft_basis(n_fft, win_length, window))
    spec = jnp.concatenate([real, imag], axis=-1)  # (..., T, 2*n_bins)
    frames = jnp.dot(spec, basis, precision=jax.lax.Precision.HIGHEST)  # (..., T, n_fft)

    out_len = (t_frames - 1) * hop + n_fft
    sig = jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype)
    # window-sum for COLA normalization
    if window == "hann":
        win = hann_window(win_length)
    else:
        win = np.ones(win_length, dtype=np.float32)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        win = np.pad(win, (pad, n_fft - win_length - pad))
    wsum = np.zeros(out_len, dtype=np.float32)
    w2 = win * win
    for i in range(t_frames):
        wsum[i * hop : i * hop + n_fft] += w2
    if n_fft % hop == 0:
        # scatter-free overlap-add: with R = n_fft/hop, frame i's r-th
        # hop-block lands at output block i+r, so the OLA is R shifted
        # dense copies summed — pads and adds only (the indexed
        # scatter-add this replaces was the profiled iSTFT bottleneck
        # on TPU: a (T, n_fft) index scatter serializes badly)
        r_blocks = n_fft // hop
        lead = frames.shape[:-2]
        blocks = frames.reshape(*lead, t_frames, r_blocks, hop)
        pad_lead = [(0, 0)] * len(lead)
        sig = sum(
            jnp.pad(blocks[..., :, r, :].reshape(*lead, t_frames * hop),
                    pad_lead + [(r * hop, (r_blocks - 1 - r) * hop)])
            for r in range(r_blocks))
    else:
        # general hop: static frame count unrolls into dynamic-update-slices
        idx = np.arange(t_frames)[:, None] * hop + np.arange(n_fft)[None, :]
        sig = sig.at[..., jnp.asarray(idx)].add(frames)
    wsum = np.where(wsum > 1e-10, wsum, 1.0)
    sig = sig / jnp.asarray(wsum)

    if center:
        sig = sig[..., n_fft // 2 :]
        if length is not None:
            sig = sig[..., :length]
        else:
            sig = sig[..., : sig.shape[-1] - n_fft // 2]
    elif length is not None:
        sig = sig[..., :length]
    return sig
