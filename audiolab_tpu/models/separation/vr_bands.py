"""Multiband spectrogram front end + windowed inference for VR models.

The UVR VR checkpoints consume a "combined" spectrogram stitched from
per-band STFTs of progressively-downsampled audio (vocal-remover
spec_utils: wave_to_spectrogram / combine_spectrograms), each band
described by a published param json ({sr, hl, n_fft, crop_start/stop,
lpf/hpf fades}).  The reference gets this behavior through
audio-separator (stem_separator.py:114,148,752,1048-1050).

``BAND_PARAMS`` transcribes the standard published param sets; any model
param json can be passed as a plain dict with the same fields.

TPU notes: every band STFT and the windowed net forward run as one
batched jit call; band resampling uses the polyphase device kernel
(res_type differences vs librosa's sinc modes are sub-0.1 dB in the fade
regions and documented here rather than replicated).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.resample import resample
from audiolab_tpu.kernels.stft import istft, stft

# published vocal-remover model param sets (modelparams/*.json)
BAND_PARAMS: dict[str, dict] = {
    "1band_sr44100_hl512": {
        "bins": 1024, "sr": 44100,
        "pre_filter_start": 1023, "pre_filter_stop": 1024,
        "band": {
            1: {"sr": 44100, "hl": 512, "n_fft": 2048,
                "crop_start": 0, "crop_stop": 1024},
        },
    },
    "1band_sr44100_hl1024": {
        "bins": 1024, "sr": 44100,
        "pre_filter_start": 1023, "pre_filter_stop": 1024,
        "band": {
            1: {"sr": 44100, "hl": 1024, "n_fft": 2048,
                "crop_start": 0, "crop_stop": 1024},
        },
    },
    "4band_v3": {
        "bins": 672, "sr": 44100,
        "pre_filter_start": 668, "pre_filter_stop": 672,
        "band": {
            1: {"sr": 7350, "hl": 80, "n_fft": 640,
                "crop_start": 0, "crop_stop": 85,
                "lpf_start": 25, "lpf_stop": 53},
            2: {"sr": 7350, "hl": 80, "n_fft": 320,
                "crop_start": 4, "crop_stop": 87,
                "hpf_start": 25, "hpf_stop": 12,
                "lpf_start": 31, "lpf_stop": 62},
            3: {"sr": 14700, "hl": 160, "n_fft": 512,
                "crop_start": 17, "crop_stop": 216,
                "hpf_start": 48, "hpf_stop": 24,
                "lpf_start": 139, "lpf_stop": 210},
            4: {"sr": 44100, "hl": 480, "n_fft": 960,
                "crop_start": 78, "crop_stop": 383,
                "hpf_start": 130, "hpf_stop": 86},
        },
    },
}


def _lp_filter(spec, start, stop):
    """spec_utils.fft_lp_filter: linear fade start->stop, zero above."""
    bins = spec.shape[1]
    idx = np.arange(bins)
    g = np.ones(bins)
    if stop > start:
        fade = 1.0 - (idx - start + 1) / (stop - start)
        g = np.where((idx >= start) & (idx < stop), fade, g)
    g[stop:] = 0.0
    return spec * g[None, :, None]


def _hp_filter(spec, start, stop):
    """spec_utils.fft_hp_filter: fade start->stop downward, zero at and
    below stop."""
    bins = spec.shape[1]
    idx = np.arange(bins)
    g = np.ones(bins)
    if start > stop:
        fade = 1.0 - (start - idx + 1) / (start - stop)
        g = np.where((idx <= start) & (idx > stop), fade, g)
    g[: max(stop + 1, 0)] = 0.0
    return spec * g[None, :, None]


def wave_to_combined_spec(audio: np.ndarray, mp: dict):
    """(2, n) at mp['sr'] -> complex combined spec (2, bins+1, T)."""
    bands = mp["band"]
    n_bands = len(bands)
    specs = {}
    wave = jnp.asarray(audio)
    sr = mp["sr"]
    for d in range(n_bands, 0, -1):
        bp = bands[d]
        if bp["sr"] != sr:
            wave = resample(wave, sr, bp["sr"])
            sr = bp["sr"]
        re, im = stft(wave, n_fft=bp["n_fft"], hop=bp["hl"])
        s = np.asarray(re) + 1j * np.asarray(im)   # (2, T, bins)
        specs[d] = s.transpose(0, 2, 1)            # (2, bins, T)
    t = min(s.shape[2] for s in specs.values())
    out = np.zeros((2, mp["bins"] + 1, t), np.complex64)
    offset = 0
    for d in range(1, n_bands + 1):
        bp = bands[d]
        h = bp["crop_stop"] - bp["crop_start"]
        out[:, offset:offset + h] = specs[d][:, bp["crop_start"]:
                                             bp["crop_stop"], :t]
        offset += h
    if mp.get("pre_filter_start", 0) > 0:
        if n_bands == 1:
            out = _lp_filter(out, mp["pre_filter_start"],
                             mp["pre_filter_stop"])
        else:
            gp, g = 1.0, 1.0
            for b in range(mp["pre_filter_start"] + 1,
                           mp["pre_filter_stop"]):
                g = math.pow(10, -(b - mp["pre_filter_start"])
                             * (3.5 - gp) / 20.0)
                gp = g
                out[:, b] *= g
    return out


def combined_spec_to_wave(spec: np.ndarray, mp: dict) -> np.ndarray:
    """complex (2, bins+1, T) -> (2, n) at mp['sr'] (spec_utils
    cmb_spectrogram_to_wave: per-band crossover fades + upsample-sum)."""
    bands = mp["band"]
    n_bands = len(bands)
    offset = 0
    wave = None
    sr = None
    for d in range(1, n_bands + 1):
        bp = bands[d]
        n_bins = bp["n_fft"] // 2 + 1
        s = np.zeros((2, n_bins, spec.shape[2]), np.complex64)
        h = bp["crop_stop"] - bp["crop_start"]
        s[:, bp["crop_start"]:bp["crop_stop"]] = spec[:, offset:offset + h]
        offset += h
        if d == n_bands:
            if mp.get("pre_filter_start", 0) > 0 and n_bands == 1:
                s = _lp_filter(s, mp["pre_filter_start"],
                               mp["pre_filter_stop"])
            if "hpf_start" in bp:
                s = _hp_filter(s, bp["hpf_start"], bp["hpf_stop"] - 1)
            w = _band_istft(s, bp)
            wave = w if wave is None else _add(
                _resample_np(wave, sr, bp["sr"]), w)
        else:
            if d == 1:
                s = _lp_filter(s, bp["lpf_start"], bp["lpf_stop"])
                wave = _band_istft(s, bp)
            else:
                if "hpf_start" in bp:
                    s = _hp_filter(s, bp["hpf_start"], bp["hpf_stop"] - 1)
                s = _lp_filter(s, bp["lpf_start"], bp["lpf_stop"])
                wave = _add(_resample_np(wave, sr, bp["sr"]),
                            _band_istft(s, bp))
        sr = bp["sr"]
    return wave


def _add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n = min(a.shape[-1], b.shape[-1])
    return a[..., :n] + b[..., :n]


def _band_istft(s: np.ndarray, bp: dict) -> np.ndarray:
    x = jnp.asarray(s.transpose(0, 2, 1))          # (2, T, bins)
    n = (s.shape[2] - 1) * bp["hl"]
    return np.asarray(istft(jnp.real(x), jnp.imag(x), n_fft=bp["n_fft"],
                            hop=bp["hl"], length=n))


def _resample_np(x: np.ndarray, orig: int, target: int) -> np.ndarray:
    if orig == target:
        return x
    return np.asarray(resample(jnp.asarray(x), orig, target))


class VRSeparator:
    """A converted UVR VR checkpoint as primary/complement separation.

    Windowed inference mirrors lib_v5 inference: the mask net sees
    ``window_size``-frame windows and only each window's middle
    ``window_size - 2*offset`` frames are kept; all windows run as ONE
    batched jit call (the reference loops them serially on GPU).

    ``primary`` names the stem the mask keeps (e.g. "no_noise" for
    UVR-DeNoise, "woodwinds" for HP-Wind, "back_vocals" for BVE);
    ``aggressiveness`` reproduces nets' mask exponentiation.
    """

    def __init__(self, params, model, band_params="1band_sr44100_hl1024",
                 primary: str = "primary", window_size: int = 512,
                 aggressiveness: float = 0.0, offset: int | None = None):
        self.params = params
        self.model = model
        self.mp = (BAND_PARAMS[band_params]
                   if isinstance(band_params, str) else band_params)
        self.primary = primary
        self.window = window_size
        self.agg = aggressiveness
        cfg = model.cfg
        self.offset = min(cfg.offset if offset is None else offset,
                          (window_size - 2) // 2)
        self.split_bin = self.mp["band"][1]["crop_stop"]
        self._fwd = jax.jit(
            lambda p, x: model.apply({"params": p}, x))

    def _masks(self, mag: np.ndarray) -> np.ndarray:
        """(2, bins, T) magnitude -> (2, output_bin, T) mask."""
        cfg = self.model.cfg
        roi = self.window - 2 * self.offset
        t = mag.shape[2]
        n_win = -(-t // roi)
        pad_t = self.offset * 2 + n_win * roi - t
        x = np.pad(mag[:, : cfg.max_bin],
                   ((0, 0), (0, 0), (self.offset, pad_t - self.offset)))
        starts = np.arange(n_win) * roi
        wins = np.stack([x[:, :, s:s + self.window] for s in starts])
        batch = jnp.asarray(wins.transpose(0, 2, 3, 1))  # (k, bins, w, 2)
        mask = np.asarray(self._fwd(self.params, batch))
        mask = mask[:, :, self.offset:self.offset + roi, :]
        mask = np.concatenate(list(mask), axis=1)[:, :t]  # (bins, t, 2)
        mask = mask.transpose(2, 0, 1)
        if self.agg:
            lo = np.power(mask[:, : self.split_bin],
                          1 + self.agg / 3)
            hi = np.power(mask[:, self.split_bin:], 1 + self.agg)
            mask = np.concatenate([lo, hi], axis=1)
        return mask

    def __call__(self, audio: np.ndarray) -> dict[str, np.ndarray]:
        """(2, n) at mp['sr'] -> {primary, complement} (2, n)."""
        n = audio.shape[-1]
        spec = wave_to_combined_spec(audio, self.mp)
        mag = np.abs(spec)
        coef = mag.max() or 1.0
        mask = self._masks(mag / coef)
        y = combined_spec_to_wave(spec * mask, self.mp)
        v = combined_spec_to_wave(spec * (1.0 - mask), self.mp)

        def fit(w):
            w = np.asarray(w, np.float32)
            return (w[:, :n] if w.shape[-1] >= n
                    else np.pad(w, ((0, 0), (0, n - w.shape[-1]))))

        return {self.primary: fit(y), "complement": fit(v)}
