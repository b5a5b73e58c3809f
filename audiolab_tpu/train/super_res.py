"""AudioSR-class super-resolution training (reference
wrappers/super_res.py:42-50: a pretrained diffusion model upscales to
48 kHz; here the model is trainable in-framework instead of downloaded).

Task setup mirrors AudioSR: the diffusion enhancer (WaveGrad) is
conditioned on the mel of a BAND-LIMITED version of the segment and
denoises toward the fullband waveform; the cutoff is randomized per
segment (2-12 kHz) so one model serves any input bandwidth.  Training
reuses the wavetransfer loop (EMA, orbax checkpoints, dp sharding,
cancellation) via its ``segment_gen`` hook; inference plugs the EMA
weights into pipelines/super_res.make_wavegrad_enhancer.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from audiolab_tpu.core.audio_io import read_audio
from audiolab_tpu.train.wavetransfer import (
    CancellationToken,
    WTConfig,
    _mel_of,
    train_model,
)


@dataclass
class SRTrainConfig:
    wt: WTConfig = field(default_factory=lambda: WTConfig(sr=48000))
    cutoff_lo_hz: float = 2000.0
    cutoff_hi_hz: float = 12000.0


def band_limit(wav: np.ndarray, sr: int, cutoff_hz: float) -> np.ndarray:
    """Brickwall FFT low-pass (the degradation AudioSR trains against)."""
    spec = np.fft.rfft(wav, axis=-1)
    freqs = np.fft.rfftfreq(wav.shape[-1], 1.0 / sr)
    return np.fft.irfft(np.where(freqs <= cutoff_hz, spec, 0.0),
                        wav.shape[-1], axis=-1).astype(np.float32)


def _pair_batches(files: list[str], cfg: SRTrainConfig,
                  rng: np.random.Generator):
    """Yields (fullband audio (b, n), band-limited mel (b, t, n_mels))."""
    wt = cfg.wt
    seg = wt.seg_frames * wt.model.hop
    tracks = []
    for f in files:
        a = read_audio(f)
        x = a.samples.mean(axis=0) if a.samples.ndim == 2 else a.samples
        if a.sample_rate != wt.sr:
            from audiolab_tpu.kernels.resample import resample_poly_np

            x = resample_poly_np(np.asarray(x, np.float32),
                                 a.sample_rate, wt.sr)
        if len(x) >= seg:
            tracks.append(np.asarray(x, np.float32))
    if not tracks:
        raise ValueError("no usable training audio (all shorter than one "
                         f"segment of {seg} samples)")
    while True:
        full = np.stack([
            t[(s := rng.integers(0, len(t) - seg + 1)) : s + seg]
            for t in (tracks[i] for i in
                      rng.integers(0, len(tracks), wt.batch_size))
        ])
        cut = float(rng.uniform(cfg.cutoff_lo_hz, cfg.cutoff_hi_hz))
        low = band_limit(full, wt.sr, cut)
        mel = _mel_of(jnp.asarray(low), wt)
        yield jnp.asarray(full), mel


def train_superres(
    data_dir: str,
    cfg: SRTrainConfig | None = None,
    token: CancellationToken | None = None,
    callback=None,
) -> dict:
    """Train the enhancer on every audio file under ``data_dir``;
    checkpoints land in ``data_dir``/ckpt (resumable)."""
    cfg = cfg or SRTrainConfig()
    files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.lower().endswith((".wav", ".flac")))
    gen = _pair_batches(files, cfg, np.random.default_rng(0))
    return train_model(data_dir, cfg.wt, token, callback, segment_gen=gen)


def load_enhancer(data_dir: str, cfg: SRTrainConfig | None = None,
                  schedule=None):
    """Checkpointed EMA weights -> enhancer_fn for super_resolve."""
    import jax

    from audiolab_tpu.models.wavegrad import WaveGrad
    from audiolab_tpu.pipelines.super_res import make_wavegrad_enhancer
    from audiolab_tpu.train.checkpoint import (
        checkpoint_manager,
        restore_train_state,
    )

    cfg = cfg or SRTrainConfig()
    wt = cfg.wt
    model = WaveGrad(wt.model)
    mgr = checkpoint_manager(os.path.join(data_dir, "ckpt"))
    seg = wt.seg_frames * wt.model.hop
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, seg)),
        jnp.zeros((1, wt.seg_frames, wt.n_mels)), jnp.ones((1,)))["params"]
    import optax

    opt = optax.adam(wt.lr).init(params)
    tmpl = {"params": params, "opt": opt, "ema": params, "step": 0}
    restored = restore_train_state(mgr, tmpl)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {data_dir}/ckpt")
    return make_wavegrad_enhancer(model, restored["ema"], wt,
                                  schedule=schedule)
