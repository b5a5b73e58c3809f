"""DSP f0 estimation (YIN) — fully vectorized on device.

The reference offers 11 f0 methods (modules/rvc/pitch_extraction.py:24-352):
pm/harvest/dio are C++ host libraries, crepe/rmvpe are neural.  Per SURVEY
§2.5 the portable plan is: neural RMVPE (models/rmvpe.py) as default + this
pure-DSP YIN as the dependency-free baseline/fallback and for harmony's pyin
role (handlers/harmony.py:9-20).

All frames are processed in parallel: framing -> FFT cross-correlation ->
cumulative-mean-normalized difference -> thresholded lag pick, one jitted
graph, no per-frame host loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("sr", "hop", "fmin", "fmax", "frame_length", "threshold"))
def f0_autocorr(
    x: jnp.ndarray,
    sr: int = 16000,
    hop: int = 160,
    fmin: float = 50.0,
    fmax: float = 1100.0,
    frame_length: int = 1024,
    threshold: float = 0.15,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """YIN f0 of ``(n,)`` -> (f0 Hz ``(T,)``, voiced probability ``(T,)``).

    Unvoiced frames return 0 Hz (reference convention: pitch_extraction.py
    leaves f0=0 where unvoiced).
    """
    tau_min = max(2, int(sr / fmax))
    tau_max = int(np.ceil(sr / fmin))
    w = frame_length
    span = w + tau_max

    n = x.shape[-1]
    t_frames = n // hop + 1
    pad = span  # generous tail pad so every frame has full support
    xp = jnp.pad(x, (w // 2, pad))
    idx = jnp.arange(t_frames)[:, None] * hop + jnp.arange(span)[None, :]
    frames = xp[idx]  # (T, span)

    # r(tau) = sum_{j<w} x_j x_{j+tau} via FFT cross-correlation
    nfft = int(2 ** np.ceil(np.log2(span + w)))
    head = frames[:, :w]
    f_full = jnp.fft.rfft(frames, n=nfft)
    f_head = jnp.fft.rfft(head, n=nfft)
    r = jnp.fft.irfft(f_full * jnp.conj(f_head), n=nfft)[:, : tau_max + 1]

    # energy terms via cumulative sums
    cs = jnp.cumsum(frames * frames, axis=-1)
    cs = jnp.pad(cs, ((0, 0), (1, 0)))
    e0 = cs[:, w] - cs[:, 0]  # (T,)
    taus = jnp.arange(tau_max + 1)
    e_tau = cs[:, taus + w] - cs[:, taus]  # (T, tau)

    d = e0[:, None] + e_tau - 2.0 * r  # difference function
    d = jnp.maximum(d, 0.0)
    # cumulative mean normalized difference
    csum = jnp.cumsum(d[:, 1:], axis=-1)
    cmnd = jnp.concatenate(
        [jnp.ones((t_frames, 1)), d[:, 1:] * taus[1:][None, :] / (csum + 1e-9)], axis=-1
    )

    # restrict to [tau_min, tau_max]
    valid = (taus >= tau_min)[None, :]
    cmnd_v = jnp.where(valid, cmnd, jnp.inf)

    # first *local minimum* below threshold (YIN step 4): a plain first
    # crossing sits on the dip's left edge and biases f0 sharp by ~8 %.
    nxt = jnp.concatenate([cmnd_v[:, 1:], jnp.full((t_frames, 1), jnp.inf)], axis=-1)
    is_min = (cmnd_v < threshold) & (cmnd_v <= nxt)
    any_below = is_min.any(axis=-1)
    first_below = jnp.argmax(is_min, axis=-1)
    global_min = jnp.argmin(cmnd_v, axis=-1)
    tau_star = jnp.where(any_below, first_below, global_min)

    # parabolic interpolation around tau_star for sub-sample lag
    tm = jnp.clip(tau_star, tau_min + 1, tau_max - 1)
    dm1 = jnp.take_along_axis(cmnd, (tm - 1)[:, None], axis=-1)[:, 0]
    d0 = jnp.take_along_axis(cmnd, tm[:, None], axis=-1)[:, 0]
    dp1 = jnp.take_along_axis(cmnd, (tm + 1)[:, None], axis=-1)[:, 0]
    denom = dm1 - 2.0 * d0 + dp1
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (dm1 - dp1) / denom, 0.0)
    tau_f = tm.astype(jnp.float32) + jnp.clip(delta, -1.0, 1.0)

    f0 = sr / jnp.clip(tau_f, 1.0, None)
    min_cmnd = jnp.min(cmnd_v, axis=-1)
    voiced_prob = jnp.clip(1.0 - min_cmnd, 0.0, 1.0)
    has_energy = e0 > 1e-6 * w  # silence gate (zero frames have cmnd 0/0)
    voiced = (min_cmnd < 0.5) & has_energy
    voiced_prob = jnp.where(has_energy, voiced_prob, 0.0)
    f0 = jnp.where(voiced & (f0 >= fmin) & (f0 <= fmax), f0, 0.0)
    return f0, voiced_prob


def coarse_f0(f0: jnp.ndarray, f0_min: float = 50.0, f0_max: float = 1100.0) -> jnp.ndarray:
    """Quantize f0 to the RVC 1-255 mel-scale bins (reference:
    modules/rvc/pitch_extraction.py get_f0 coarse mapping)."""
    f0_mel_min = 1127.0 * np.log(1.0 + f0_min / 700.0)
    f0_mel_max = 1127.0 * np.log(1.0 + f0_max / 700.0)
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - f0_mel_min) * 254.0 / (f0_mel_max - f0_mel_min) + 1.0
    scaled = jnp.where(f0_mel > 0.0, scaled, 1.0)
    return jnp.clip(jnp.rint(scaled), 1, 255).astype(jnp.int32)


def merge_f0(stack: jnp.ndarray, merge_type: str = "median") -> jnp.ndarray:
    """Merge an (m, ...) stack of f0 tracks (reference hybrid merge,
    pitch_extraction.py:279-286 via get_merge_func).

    Unvoiced frames (0 Hz) are excluded from the merge: a plain median over
    [0, f, f'] would halve pitch at any single-method dropout."""
    voiced = stack > 0.0
    n_voiced = voiced.sum(axis=0)
    if merge_type == "mean":
        s = jnp.where(voiced, stack, 0.0).sum(axis=0)
        merged = s / jnp.maximum(n_voiced, 1)
    else:
        # median over voiced entries: sort with unvoiced pushed to +inf,
        # then index the middle of the voiced prefix
        big = jnp.where(voiced, stack, jnp.inf)
        srt = jnp.sort(big, axis=0)
        m = stack.shape[0]
        lo = jnp.clip((n_voiced - 1) // 2, 0, m - 1)
        hi = jnp.clip(n_voiced // 2, 0, m - 1)
        merged = 0.5 * (jnp.take_along_axis(srt, lo[None], axis=0)[0]
                        + jnp.take_along_axis(srt, hi[None], axis=0)[0])
    # a frame counts as voiced if the majority of methods agree
    return jnp.where(n_voiced * 2 > stack.shape[0], merged, 0.0)


def f0_dio(
    x: np.ndarray,
    sr: int = 16000,
    hop: int = 160,
    fmin: float = 50.0,
    fmax: float = 1100.0,
) -> np.ndarray:
    """Host (numpy) DIO-class estimator: zero-crossing candidates from
    octave-spaced low-pass bands + normalized-autocorrelation scoring and
    parabolic refinement (a portable stand-in for pyworld.dio+stonemask,
    reference pitch_extraction.py:172-191; kept host-side for parity
    testing and the hybrid merge, per SURVEY §2.5)."""
    x = np.asarray(x, np.float64)
    n = len(x)
    t_frames = n // hop + 1
    centers = np.arange(t_frames) * hop

    # candidate bands: low-pass at fc, f0 candidate from rising-zero-crossing
    # intervals interpolated to frame times
    spec = np.fft.rfft(x)
    freqs_bin = np.fft.rfftfreq(n, 1.0 / sr)
    n_bands = max(2, int(np.ceil(np.log2(fmax / fmin))) + 1)
    cand = np.zeros((n_bands, t_frames))
    for bi in range(n_bands):
        fc = fmin * (2.0 ** (bi + 1))
        lp = np.fft.irfft(np.where(freqs_bin <= fc, spec, 0.0), n)
        sgn = lp > 0
        rise = np.nonzero(~sgn[:-1] & sgn[1:])[0]
        if len(rise) < 2:
            continue
        # sub-sample crossing positions
        frac = lp[rise] / (lp[rise] - lp[rise + 1])
        pos = rise + frac
        periods = np.diff(pos)
        mid = 0.5 * (pos[:-1] + pos[1:])
        f0c = sr / np.maximum(periods, 1e-6)
        cand[bi] = np.interp(centers, mid, f0c,
                             left=f0c[0], right=f0c[-1])

    # score candidates by normalized autocorrelation at the candidate lag
    w = 2 * hop * 4
    xp = np.pad(x, (w // 2, w))
    frames = xp[centers[:, None] + np.arange(w)[None, :]]
    frames = frames - frames.mean(axis=1, keepdims=True)
    e = (frames * frames).sum(axis=1) + 1e-12

    best = np.zeros(t_frames)
    best_score = np.full(t_frames, -1.0)
    for bi in range(n_bands):
        f0c = cand[bi]
        valid = (f0c >= fmin) & (f0c <= fmax)
        lag = np.clip((sr / np.maximum(f0c, 1.0)).astype(int), 1, w // 2)
        idx = np.arange(w - w // 2)
        shifted = frames[np.arange(t_frames)[:, None], idx[None, :] + lag[:, None]]
        head = frames[:, : w - w // 2]
        r = (head * shifted).sum(axis=1)
        score = np.where(valid, r / e, -1.0)
        take = score > best_score
        best[take] = f0c[take]
        best_score[take] = score[take]

    voiced = best_score > 0.35
    return np.where(voiced, best, 0.0)


def f0_pm(
    x: np.ndarray,
    sr: int = 16000,
    hop: int = 160,
    fmin: float = 50.0,
    fmax: float = 1100.0,
    voicing_threshold: float = 0.45,
    silence_threshold: float = 0.03,
    octave_cost: float = 0.01,
    octave_jump_cost: float = 0.35,
    vuv_cost: float = 0.14,
    max_candidates: int = 4,
) -> np.ndarray:
    """Praat's autocorrelation pitch algorithm (Boersma 1993) — the
    reference's ``pm`` method (pitch_extraction.py:157-171 via
    parselmouth ``to_pitch_ac``), host-side numpy.

    Per frame: local-mean removal, Hann window, FFT autocorrelation
    normalized by the WINDOW's own autocorrelation (the paper's key
    correction), candidate peaks with octave-cost-penalized strengths and
    an unvoiced candidate from the local/global peak ratio, then a
    Viterbi path with octave-jump and voicing-transition costs.  Peak
    lags get parabolic refinement (Praat uses sinc interpolation — the
    one documented approximation).  Returns f0 (t,) with 0 for unvoiced.
    """
    x = np.asarray(x, np.float64)
    n = len(x)
    win_len = int(np.ceil(3.0 / fmin * sr))          # 3 longest periods
    win_len += win_len % 2
    half = win_len // 2
    t_frames = n // hop + 1
    centers = np.arange(t_frames) * hop
    global_peak = np.abs(x - x.mean()).max() + 1e-12

    xp = np.pad(x, (half, half + win_len))
    frames = xp[centers[:, None] + np.arange(win_len)[None, :]]
    frames = frames - frames.mean(axis=1, keepdims=True)
    local_peak = np.abs(frames).max(axis=1)
    win = np.hanning(win_len)
    fw = frames * win

    # autocorrelation via FFT, normalized by the window autocorrelation
    nfft = int(2 ** np.ceil(np.log2(2 * win_len)))
    spec = np.fft.rfft(fw, nfft)
    ac = np.fft.irfft(spec * np.conj(spec), nfft)[:, :win_len]
    ac0 = ac[:, :1] + 1e-12
    wspec = np.fft.rfft(win, nfft)
    wac = np.fft.irfft(wspec * np.conj(wspec), nfft)[:win_len]
    wac = wac / (wac[0] + 1e-12)
    r = (ac / ac0) / np.maximum(wac[None, :], 1e-3)   # (t, win_len)

    lag_min = max(2, int(sr / fmax))
    lag_max = min(win_len - 2, int(np.ceil(sr / fmin)))
    lags = np.arange(lag_min, lag_max)
    seg = r[:, lag_min:lag_max]
    # local maxima of r over the admissible lag range
    is_peak = np.zeros_like(seg, bool)
    is_peak[:, 1:-1] = (seg[:, 1:-1] > seg[:, :-2]) & \
        (seg[:, 1:-1] >= seg[:, 2:])

    # per frame: top-K peak candidates (freq, strength) + unvoiced cand
    k = max_candidates
    cand_f0 = np.zeros((t_frames, k + 1))
    cand_str = np.full((t_frames, k + 1), -1e9)
    peak_vals = np.where(is_peak, seg, -np.inf)
    order = np.argsort(-peak_vals, axis=1)[:, :k]
    rows = np.arange(t_frames)[:, None]
    vals = peak_vals[rows, order]
    lag_sel = lags[order].astype(np.float64)
    # parabolic refinement around each selected peak
    lm = seg[rows, np.maximum(order - 1, 0)]
    lp = seg[rows, np.minimum(order + 1, seg.shape[1] - 1)]
    denom = lm - 2 * vals + lp
    shift = np.where(np.abs(denom) > 1e-12,
                     0.5 * (lm - lp) / np.where(np.abs(denom) > 1e-12,
                                                denom, 1.0), 0.0)
    shift = np.clip(shift, -0.5, 0.5)
    lag_ref = lag_sel + shift
    val_ref = vals - 0.25 * (lm - lp) * shift
    f0s = sr / np.maximum(lag_ref, 1.0)
    ok = np.isfinite(vals) & (f0s >= fmin) & (f0s <= fmax)
    # Boersma: R = r(tau) - OctaveCost * log2(MinimumPitch * tau)
    strength = np.where(
        ok, val_ref - octave_cost * np.log2(
            np.maximum(fmin * lag_ref / sr, 1e-6)), -1e9)
    cand_f0[:, :k] = np.where(ok, f0s, 0.0)
    cand_str[:, :k] = strength
    # unvoiced candidate (Boersma eq. 23)
    ratio = local_peak / global_peak
    cand_str[:, k] = voicing_threshold + np.maximum(
        0.0, 2.0 - (ratio / (silence_threshold
                             / (1.0 + voicing_threshold))))
    cand_f0[:, k] = 0.0

    # Viterbi over candidates
    trans_cost = np.zeros((k + 1, k + 1))
    score = cand_str[0].copy()
    ptr = np.zeros((t_frames, k + 1), np.int64)
    for t in range(1, t_frames):
        f_prev = cand_f0[t - 1]
        f_cur = cand_f0[t]
        pv = f_prev[:, None] > 0
        cv = f_cur[None, :] > 0
        both = pv & cv
        jump = np.where(
            both, octave_jump_cost * np.abs(np.log2(
                np.maximum(f_prev[:, None], 1e-6)
                / np.maximum(f_cur[None, :], 1e-6))), 0.0)
        vuv = np.where(pv ^ cv, vuv_cost, 0.0)
        trans_cost = jump + vuv
        total = score[:, None] - trans_cost
        ptr[t] = np.argmax(total, axis=0)
        score = total[ptr[t], np.arange(k + 1)] + cand_str[t]

    path = np.zeros(t_frames, np.int64)
    path[-1] = int(np.argmax(score))
    for t in range(t_frames - 1, 0, -1):
        path[t - 1] = ptr[t, path[t]]
    return cand_f0[np.arange(t_frames), path]
