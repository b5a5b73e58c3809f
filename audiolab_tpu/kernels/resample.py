"""Sample-rate conversion.

The reference resamples with librosa.resample / torchaudio functional
(e.g. modules/rvc pipeline resampling to 16 kHz for HuBERT and back to the
model rate, wrappers/super_res.py loudness-matched 48 kHz upsample).  Here:

- ``resample``          device-side polyphase FIR expressed as a single
                        ``lax.conv_general_dilated`` (lhs_dilation=L, stride=M)
                        — XLA lowers it onto the MXU as a strided matmul.
- ``resample_poly_np``  host-side scipy.signal.resample_poly for file I/O.

FIR design follows scipy.signal.resample_poly's default: Kaiser(5.0) windowed
sinc, 10 taps per phase, cutoff at min(1/L, 1/M)·π.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps


@lru_cache(maxsize=None)
def _poly_filter(up: int, down: int) -> np.ndarray:
    """Kaiser-windowed sinc lowpass for polyphase up/down conversion."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = sps.firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return (h * up).astype(np.float32)


@partial(jax.jit, static_argnames=("orig_sr", "target_sr"))
def resample(x: jnp.ndarray, orig_sr: int, target_sr: int) -> jnp.ndarray:
    """Polyphase resample ``(..., n) -> (..., ceil(n*target/orig))`` on device."""
    if orig_sr == target_sr:
        return x
    g = math.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    h = _poly_filter(up, down)
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)

    lead = x.shape[:-1]
    xr = x.reshape((-1, 1, n_in))  # (N, C=1, W)
    k = jnp.asarray(h)[None, None, :]  # (O=1, I=1, W)
    half = (len(h) - 1) // 2
    # lhs_dilation=up inserts up-1 zeros between samples; stride=down decimates.
    # out_len = (dilated + padL + padR - kernel)//down + 1; solve padR for n_out.
    dilated = up * n_in - (up - 1)
    pad_r = (n_out - 1) * down + len(h) - half - dilated
    y = jax.lax.conv_general_dilated(
        xr,
        k,
        window_strides=(down,),
        padding=[(half, max(pad_r, 0))],
        lhs_dilation=(up,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    y = y[..., :n_out]
    return y.reshape(lead + (n_out,))


def resample_poly_np(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Host-side resample (numpy in/out) for decode-time rate conversion."""
    if orig_sr == target_sr:
        return np.asarray(x)
    g = math.gcd(orig_sr, target_sr)
    return sps.resample_poly(np.asarray(x), target_sr // g, orig_sr // g, axis=-1).astype(
        np.float32
    )
