"""Remaster processor — reference-track mastering
(reference: wrappers/remaster.py:14-88, which wraps Matchering 2.0).

Matchering's core recipe, reimplemented on-device:
  1. match integrated loudness (RMS stage)
  2. match the smoothed magnitude spectrum via an FFT-designed matching EQ
  3. brickwall-limit to the reference's peak

All three stages are jitted JAX ops (the FIR matching filter is one FFT
multiply over the whole track).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.core.audio_io import read_audio, write_audio
from audiolab_tpu.core.project import ProjectFiles
from audiolab_tpu.dsp.loudness import integrated_loudness
from audiolab_tpu.kernels.stft import spectrogram
from audiolab_tpu.pipelines.base import (
    BaseProcessor,
    ProgressFn,
    TypedInput,
    null_progress,
    register_processor,
)


def _smooth_spectrum(x: jnp.ndarray, n_fft: int = 4096) -> jnp.ndarray:
    """Time-averaged 1/3-octave-smoothed magnitude spectrum (n_bins,)."""
    mono = x.mean(axis=0) if x.ndim == 2 else x
    spec = spectrogram(mono, n_fft=n_fft, hop=n_fft // 2, power=1.0)
    mag = jnp.mean(spec, axis=0)  # (n_bins,)
    # log-domain smoothing with a running boxcar ~1/3 octave
    n_bins = mag.shape[0]
    k = max(3, n_bins // 96)
    kern = jnp.ones((k,)) / k
    sm = jnp.convolve(jnp.log(mag + 1e-8), kern, mode="same")
    return jnp.exp(sm)


@partial(jax.jit, static_argnames=("n_fft",))
def match_spectrum(target: jnp.ndarray, reference: jnp.ndarray, n_fft: int = 4096) -> jnp.ndarray:
    """EQ `target` so its smoothed spectrum matches `reference`'s."""
    ts = _smooth_spectrum(target, n_fft)
    rs = _smooth_spectrum(reference, n_fft)
    gain = jnp.clip(rs / (ts + 1e-8), 0.1, 10.0)  # (n_bins,)
    # zero-phase FIR via irfft of the gain curve, windowed
    h = jnp.fft.irfft(gain.astype(jnp.complex64), n=n_fft)
    h = jnp.roll(h, n_fft // 2)
    win = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    h = h * win
    n = target.shape[-1]
    nfft2 = int(2 ** np.ceil(np.log2(n + n_fft)))
    H = jnp.fft.rfft(h, n=nfft2)
    Y = jnp.fft.rfft(target, n=nfft2) * H[None, :]
    y = jnp.fft.irfft(Y, n=nfft2)[..., n_fft // 2 : n_fft // 2 + n]
    return y


def soft_limit(x: np.ndarray, ceiling: float = 0.985) -> np.ndarray:
    """tanh-knee brickwall at the ceiling (matchering's limiter role)."""
    over = np.abs(x) > ceiling * 0.9
    if not over.any():
        return x
    return np.tanh(x / ceiling) * ceiling


class Remaster(BaseProcessor):
    title = "Remaster"
    priority = 7
    description = "Master the track to match a reference recording."
    allowed_kwargs = {
        "reference_file": TypedInput(
            default=None, description="Reference track to match", type=str
        ),
        "target_lufs": TypedInput(
            default=-14.0, description="Fallback loudness when no reference given",
            type=float, ge=-36.0, le=-6.0,
        ),
    }

    def process_audio(
        self, inputs: list[ProjectFiles], callback: ProgressFn = null_progress, **kw
    ) -> list[ProjectFiles]:
        ref_path = kw.get("reference_file")
        target_lufs = float(kw.get("target_lufs", -14.0))
        ref = read_audio(ref_path) if ref_path else None

        for proj in inputs:
            outputs = []
            stage = proj.stage_dir("remastered")
            for i, f in enumerate(proj.last_outputs):
                callback(i, f"Remastering {os.path.basename(f)}", len(proj.last_outputs))
                a = read_audio(f)
                x = a.samples
                if ref is not None:
                    rx = ref.samples
                    if ref.sample_rate != a.sample_rate:
                        from audiolab_tpu.kernels.resample import resample_poly_np

                        rx = resample_poly_np(rx, ref.sample_rate, a.sample_rate)
                    y = np.asarray(match_spectrum(jnp.asarray(x), jnp.asarray(rx)))
                    # loudness match to reference
                    lr = integrated_loudness(rx, a.sample_rate)
                    ly = integrated_loudness(y, a.sample_rate)
                    if np.isfinite(lr) and np.isfinite(ly):
                        y = y * 10.0 ** ((lr - ly) / 20.0)
                else:
                    ly = integrated_loudness(x, a.sample_rate)
                    y = x * 10.0 ** ((target_lufs - ly) / 20.0) if np.isfinite(ly) else x
                y = soft_limit(np.asarray(y, dtype=np.float32))
                base = os.path.splitext(os.path.basename(f))[0]
                out = os.path.join(stage, f"{base}_remastered.wav")
                write_audio(out, y, a.sample_rate)
                outputs.append(out)
            proj.add_output("remastered", outputs)
        return inputs


register_processor(Remaster())
