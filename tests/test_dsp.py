"""DSP layer tests: stereo, f0, pitch shift, autotune, reverb, silence, loudness."""

import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.dsp.stereo import stereo_to_ms, ms_to_stereo, resample_side
from audiolab_tpu.dsp.f0 import f0_autocorr, coarse_f0
from audiolab_tpu.dsp.pitch import (
    pitch_shift,
    pitch_shift_granular,
    time_stretch,
    autotune_f0,
    note_to_hz,
    hz_to_note,
)
from audiolab_tpu.dsp.autotune import detect_key, group_pitch_shift_factors
from audiolab_tpu.dsp.reverb import (
    generate_ir,
    extract_reverb_params,
    apply_reverb,
    wiener_deconvolution,
)
from audiolab_tpu.dsp.silence import restore_silence
from audiolab_tpu.dsp.loudness import integrated_loudness, normalize_loudness


def tone(freq, sr, dur, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def dominant_freq(x, sr):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.fft.rfftfreq(len(x), 1 / sr)[spec.argmax()]


def test_stereo_ms_roundtrip(rng):
    st = rng.standard_normal((2, 1000)).astype(np.float32)
    mid, side = stereo_to_ms(jnp.asarray(st))
    back = ms_to_stereo(mid, side)
    np.testing.assert_allclose(np.asarray(back), st, atol=1e-6)


def test_resample_side_length():
    side = jnp.asarray(np.sin(np.linspace(0, 10, 1000)).astype(np.float32))
    out = resample_side(side, 1500)
    assert out.shape == (1500,)


def test_note_hz_roundtrip():
    assert abs(note_to_hz("A4") - 440.0) < 1e-6
    assert hz_to_note(440.0) == "A4"
    assert hz_to_note(261.63) == "C4"


def test_autotune_f0_snaps():
    f0 = jnp.asarray([445.0, 0.0, 262.0])
    out = np.asarray(autotune_f0(f0))
    np.testing.assert_allclose(out[0], 440.0, rtol=1e-4)
    assert out[1] == 0.0
    np.testing.assert_allclose(out[2], note_to_hz("C4"), rtol=1e-3)


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
def test_f0_autocorr_tone(freq):
    x = tone(freq, 16000, 1.0)
    f0, vp = f0_autocorr(jnp.asarray(x), sr=16000, hop=160)
    f0 = np.asarray(f0)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert abs(np.median(voiced) - freq) / freq < 0.03


def test_f0_autocorr_silence():
    x = np.zeros(16000, dtype=np.float32)
    f0, _ = f0_autocorr(jnp.asarray(x), sr=16000)
    assert (np.asarray(f0) == 0).all()


def test_coarse_f0_range():
    f0 = jnp.asarray([0.0, 50.0, 440.0, 1100.0])
    c = np.asarray(coarse_f0(f0))
    assert c.min() >= 1 and c.max() <= 255
    assert c[0] == 1


def test_pitch_shift_up_octave():
    sr = 16000
    x = tone(220.0, sr, 1.0)
    y = np.asarray(pitch_shift(jnp.asarray(x), sr, 12.0))
    assert y.shape == x.shape
    f = dominant_freq(y[2048:-2048], sr)
    assert abs(f - 440.0) < 15.0


def test_pitch_shift_granular_varying():
    sr = 16000
    x = tone(220.0, sr, 1.0)
    t_frames = len(x) // 512 + 1
    factors = jnp.ones((t_frames,)) * 1.5
    periods = jnp.full((t_frames,), sr / 220.0)
    y = np.asarray(pitch_shift_granular(jnp.asarray(x), factors, periods=periods))
    f = dominant_freq(y[2048:-2048], sr)
    assert abs(f - 330.0) < 8.0


def test_time_stretch_length():
    sr = 16000
    x = tone(220.0, sr, 1.0)
    y = np.asarray(time_stretch(jnp.asarray(x), 2.0))
    assert abs(len(y) - len(x) // 2) < 10
    f = dominant_freq(np.asarray(y)[1024:-1024], sr)
    assert abs(f - 220.0) < 15.0  # pitch preserved


def test_detect_key_c_major_triad():
    sr = 22050
    x = sum(tone(note_to_hz(n), sr, 2.0, 0.3) for n in ["C4", "E4", "G4", "C5"])
    key, scale = detect_key(x.astype(np.float32), sr)
    assert key == "C"


def test_group_shift_factors():
    t = np.arange(10) * 0.01
    s = np.array([1.0] * 5 + [1.5] * 5)
    groups = group_pitch_shift_factors(t, s)
    assert len(groups) == 2
    assert groups[0][2] == 1.0 and groups[1][2] == 1.5


def test_wiener_deconv_recovers_kernel():
    rng = np.random.default_rng(1)
    dry = rng.standard_normal(8000).astype(np.float32)
    ir = np.zeros(100, dtype=np.float32)
    ir[0], ir[50] = 1.0, 0.5
    wet = np.convolve(dry, ir)[: len(dry)]
    est = np.asarray(wiener_deconvolution(jnp.asarray(wet), jnp.asarray(dry)))
    np.testing.assert_allclose(est[0], 1.0, atol=0.05)
    np.testing.assert_allclose(est[50], 0.5, atol=0.05)
    assert np.abs(est[100:200]).max() < 0.05


def test_reverb_extract_apply_roundtrip(rng):
    sr = 16000
    dry = rng.standard_normal(sr * 2).astype(np.float32) * 0.1
    ir = generate_ir(sr, pre_delay=0.01, decay_time=0.5, early_reflection_ratio=0.3,
                     diffusion=0.005, spectral_centroid=5000, length=0.5)
    wet = np.convolve(dry, ir)[: len(dry)].astype(np.float32)
    params = extract_reverb_params(dry, wet, sr)
    assert abs(params["pre_delay"] - 0.01) < 0.02
    out = apply_reverb(dry, params)
    assert out.shape == dry.shape
    assert np.abs(out).max() <= 1.0


def test_restore_silence_masks_silent_regions(rng):
    sr = 16000
    orig = tone(220, sr, 1.0)
    orig[: sr // 2] = 0.0  # first half silent
    clone = tone(220, sr, 1.0, amp=0.8)
    out = restore_silence(orig, clone, sr, sr)
    assert out.shape == orig.shape
    assert np.abs(out[: sr // 4]).max() < 0.05  # silence restored
    assert np.abs(out[3 * sr // 4 :]).max() > 0.1  # voiced region kept


def test_integrated_loudness_sine():
    # a full-scale 997 Hz sine is about -3.01 LUFS per BS.1770
    sr = 48000
    x = tone(997.0, sr, 2.0, amp=1.0)
    lufs = integrated_loudness(x, sr)
    assert abs(lufs - (-3.01)) < 0.5


def test_normalize_loudness():
    sr = 48000
    x = tone(997.0, sr, 2.0, amp=0.1)
    y = normalize_loudness(x, sr, -14.0)
    assert abs(integrated_loudness(y, sr) - (-14.0)) < 0.3


def test_wavegrad_enhancer_slot():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiolab_tpu.models.wavegrad import FAST_6, WaveGrad, WaveGradConfig
    from audiolab_tpu.pipelines.super_res import make_wavegrad_enhancer, super_resolve
    from audiolab_tpu.train.wavetransfer import WTConfig

    mc = WaveGradConfig(n_mels=16, hop=12, factors=(3, 2, 2),
                        ublock_ch=(16, 16, 8), dblock_ch=(8, 16), base_ch=4)
    model = WaveGrad(mc)
    cfg = WTConfig(sr=48000, n_mels=16, model=mc)
    audio = jnp.zeros((1, 8 * mc.hop))
    mel = jnp.zeros((1, 8, mc.n_mels))
    params = model.init(jax.random.PRNGKey(0), audio, mel, jnp.ones((1,)))["params"]

    enh = make_wavegrad_enhancer(model, params, cfg, FAST_6)
    x = (np.random.default_rng(0).standard_normal(24000) * 0.1).astype(np.float32)
    y, sr = super_resolve(x, 24000, enhancer_fn=enh, chunk_seconds=0.25,
                          overlap_seconds=0.05)
    assert sr == 48000 and np.isfinite(y).all()


# --------------------------------------------------------------- remaster

def test_matchering_levels_and_limiter():
    """Level stage matches loudest-piece RMS to the reference within ~1 dB;
    limiter keeps the peak at/below the ceiling (wrappers/remaster.py role)."""
    import numpy as np

    from audiolab_tpu.pipelines.processors.remaster import (
        limiter_lookahead,
        loudest_pieces,
        matchering_master,
        ms_encode,
        piece_rms,
    )

    sr = 8000
    rng = np.random.default_rng(0)
    t = np.arange(sr * 6) / sr
    # quiet, dull target (lowpassed-ish tone); loud, bright reference
    tgt = np.stack([0.05 * np.sin(2 * np.pi * 220 * t)] * 2)
    tgt[:, : sr] = 0.001  # a quiet piece that must be excluded from analysis
    ref = np.stack([
        0.5 * np.sin(2 * np.pi * 220 * t) + 0.3 * np.sin(2 * np.pi * 3000 * t)
    ] * 2)
    out = matchering_master(tgt.astype(np.float32), ref.astype(np.float32), sr)

    assert out.shape == tgt.shape and np.isfinite(out).all()
    assert np.abs(out).max() <= 0.99
    om, _ = ms_encode(out)
    rm, _ = ms_encode(ref)
    o_rms = piece_rms(om, sr, loudest_pieces(om, sr))
    r_rms = piece_rms(rm, sr, loudest_pieces(rm, sr))
    db = 20 * np.log2(o_rms / r_rms + 1e-12) / np.log2(10)
    assert abs(db) < 1.5, db

    # spectral tilt moved toward the bright reference
    def hf_ratio(x):
        sp = np.abs(np.fft.rfft(x[0]))
        f = np.fft.rfftfreq(x.shape[1], 1 / sr)
        return sp[f > 2000].sum() / (sp[f < 1000].sum() + 1e-9)

    assert hf_ratio(out) > hf_ratio(tgt) * 5

    # limiter: a 2x-over-ceiling impulse train comes back at the ceiling
    x = np.zeros((1, sr), np.float32)
    x[0, ::1000] = 2.0
    y = limiter_lookahead(x, sr, ceiling=0.9)
    assert np.abs(y).max() <= 0.9 + 1e-4
    # and quiet material passes untouched
    q = (0.1 * np.sin(2 * np.pi * 100 * t[:sr]))[None].astype(np.float32)
    np.testing.assert_allclose(limiter_lookahead(q, sr), q, atol=1e-6)
