"""Pitch shifting / time stretching, TPU-first.

The reference pitch-shifts through librosa.effects.pitch_shift inside a host
loop over segments (handlers/autotune.py:137-158, handlers/harmony.py:49-53).
Here the workhorse is ``pitch_shift_granular``: a single jitted pass that
applies a *per-frame* pitch ratio with windowed-grain resampling + COLA
overlap-add — the whole track is one gather + matmul-free vector op, no host
round trips, and the shift contour can vary continuously (what autotune
actually needs).  A phase-vocoder ``time_stretch``/``pitch_shift`` pair is
also provided for API parity with librosa semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.stft import stft, istft, hann_window

_NOTE_NAMES = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]


def note_to_hz(note: str) -> float:
    """'A4' -> 440.0 (12-TET, A4=440)."""
    name = note[:-1]
    octave = int(note[-1])
    semis = _NOTE_NAMES.index(name) + (octave + 1) * 12  # MIDI number
    return 440.0 * 2.0 ** ((semis - 69) / 12.0)


def hz_to_note(hz: float) -> str:
    midi = int(round(69 + 12 * np.log2(max(hz, 1e-6) / 440.0)))
    return f"{_NOTE_NAMES[midi % 12]}{midi // 12 - 1}"


def autotune_f0(f0: jnp.ndarray) -> jnp.ndarray:
    """Snap voiced f0 values to the nearest 12-TET semitone (behavioral
    equivalent of modules/rvc/infer/lib/audio.py autotune_f0)."""
    f0 = jnp.asarray(f0)
    midi = 69.0 + 12.0 * jnp.log2(jnp.clip(f0, 1e-6, None) / 440.0)
    snapped = 440.0 * 2.0 ** ((jnp.round(midi) - 69.0) / 12.0)
    return jnp.where(f0 > 1.0, snapped, f0)


@partial(jax.jit, static_argnames=("frame", "hop"))
def pitch_shift_granular(
    x: jnp.ndarray,
    factors: jnp.ndarray,
    periods: jnp.ndarray | None = None,
    frame: int = 2048,
    hop: int = 512,
) -> jnp.ndarray:
    """Duration-preserving, time-varying pitch shift in one device pass.

    x:       ``(n,)`` signal
    factors: ``(T,)`` per-frame pitch ratio (>1 = shift up), T = n // hop + 1
    periods: optional ``(T,)`` local pitch period in samples (sr/f0, 0 where
             unvoiced).  When given, each grain's read position is advanced
             by a period-locked offset so adjacent grains overlap in phase
             (TD-PSOLA-style); without it, plain SOLA grains carry a phase
             mismatch of hop·(1-factor) per grain which skews the output
             pitch for tonal content.

    Each output grain t re-reads the input around its own center at sample
    spacing ``factors[t]`` (local resampling ⇒ pitch scales by the factor,
    global timing unchanged), then hann-windowed grains overlap-add with
    window-sum normalization.
    """
    n = x.shape[-1]
    t_frames = n // hop + 1
    win = jnp.asarray(hann_window(frame))

    centers = jnp.arange(t_frames) * hop  # grain centers in samples
    offs = jnp.arange(frame) - frame // 2
    factors = jnp.clip(factors[:t_frames], 0.25, 4.0)
    if factors.shape[0] < t_frames:
        factors = jnp.pad(factors, (0, t_frames - factors.shape[0]), constant_values=1.0)

    if periods is not None:
        p = periods[:t_frames]
        # phase-continuity: delta_{t+1} - delta_t = -hop(1-f_t)  (mod period)
        drift = jnp.cumsum(-hop * (1.0 - factors))
        drift = jnp.concatenate([jnp.zeros((1,)), drift[:-1]])
        delta = jnp.where(p > 0, jnp.mod(drift, jnp.maximum(p, 1e-3)), 0.0)
    else:
        delta = jnp.zeros((t_frames,))

    pos = (centers + delta)[:, None] + offs[None, :] * factors[:, None]  # (T, frame)
    pos = jnp.clip(pos, 0.0, n - 1.001)
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0
    grains = x[i0] * (1.0 - frac) + x[i0 + 1] * frac
    grains = grains * win[None, :]

    out_len = (t_frames - 1) * hop + frame
    pad_lo = frame // 2
    idx = centers[:, None] + offs[None, :] + pad_lo  # shift so indices >= 0
    out = jnp.zeros(out_len + frame, x.dtype).at[idx].add(grains)
    wsum = jnp.zeros(out_len + frame, x.dtype).at[idx].add(win[None, :] * jnp.ones_like(grains))
    out = out / jnp.where(wsum > 1e-8, wsum, 1.0)
    return out[pad_lo : pad_lo + n]


@partial(jax.jit, static_argnames=("rate", "n_fft", "hop"))
def time_stretch(x: jnp.ndarray, rate: float, n_fft: int = 2048, hop: int = 512) -> jnp.ndarray:
    """Phase-vocoder time stretch: output duration = input / rate.

    ``rate`` is static (compile-cache key); for continuously-varying control
    use ``pitch_shift_granular``.
    """
    real, imag = stft(x, n_fft=n_fft, hop=hop)
    mag = jnp.sqrt(real * real + imag * imag + 1e-12)
    phase = jnp.arctan2(imag, real)
    t_in = mag.shape[-2]
    n_bins = n_fft // 2 + 1

    steps = np.arange(0, t_in, rate)  # static because rate is static
    phi_advance = jnp.asarray(
        np.linspace(0, np.pi * hop, n_bins, dtype=np.float32)
    )

    i0 = np.clip(np.floor(steps).astype(np.int32), 0, t_in - 1)
    i1 = np.clip(i0 + 1, 0, t_in - 1)
    alpha = jnp.asarray((steps - i0).astype(np.float32))[:, None]
    mag_out = mag[..., i0, :] * (1 - alpha) + mag[..., i1, :] * alpha

    dphase = phase[..., i1, :] - phase[..., i0, :] - phi_advance
    dphase = dphase - 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))

    def scan_fn(acc, inp):
        d = inp
        acc_new = acc + phi_advance + d
        return acc_new, acc

    init = phase[..., i0[0], :]
    _, phases = jax.lax.scan(scan_fn, init, jnp.moveaxis(dphase, -2, 0))
    phase_out = jnp.moveaxis(phases, 0, -2)

    out_len = int(round(x.shape[-1] / rate))
    return istft(
        mag_out * jnp.cos(phase_out),
        mag_out * jnp.sin(phase_out),
        n_fft=n_fft,
        hop=hop,
        length=out_len,
    )


def pitch_shift(
    x: jnp.ndarray, sr: int, n_steps: float, n_fft: int = 2048, hop: int = 512
) -> jnp.ndarray:
    """librosa.effects.pitch_shift semantics: constant shift, same length.

    Implemented via the granular engine with period-locked grains (single
    compile for any shift amount, unlike phase-vocoder whose rate is a
    compile key).  Local periods come from the YIN tracker so tonal content
    stays phase-coherent across grains.
    """
    from audiolab_tpu.dsp.f0 import f0_autocorr  # local import: avoid cycle

    n = x.shape[-1]
    t_frames = n // hop + 1
    factor = 2.0 ** (jnp.asarray(n_steps, jnp.float32) / 12.0)
    f0, _ = f0_autocorr(
        x, sr=sr, hop=hop, fmin=50.0, fmax=min(1100.0, sr / 4), frame_length=min(n_fft, n)
    )
    periods = jnp.where(f0 > 0, sr / jnp.maximum(f0, 1e-3), 0.0)
    return pitch_shift_granular(
        x, jnp.full((t_frames,), factor), periods=periods, frame=n_fft, hop=hop
    )
