"""Accuracy gates for the WORLD-family host f0 estimators.

The reference's dio/harvest methods are pyworld C++ calls followed by
stonemask (modules/rvc/pitch_extraction.py:172-191); no pyworld wheel
exists in this environment, so `dsp/f0.py` implements the published WORLD
algorithms directly.  These tests gate them the only independent way
available: synthetic signals with exactly known f0 contours.
"""

import numpy as np
import pytest

from audiolab_tpu.dsp.f0 import f0_dio, f0_harvest, f0_pm, stonemask

SR = 16000
HOP = 160


def _sawtooth(f0_track: np.ndarray, sr: int = SR, hop: int = HOP) -> np.ndarray:
    """Harmonic-rich signal whose instantaneous f0 follows f0_track
    (one value per hop)."""
    per_sample = np.repeat(f0_track, hop)[: len(f0_track) * hop]
    phase = 2.0 * np.pi * np.cumsum(per_sample) / sr
    x = np.zeros_like(phase)
    for h in range(1, 9):
        x += np.sin(h * phase) / h
    return (x / np.abs(x).max()).astype(np.float64)


def _cents_err(est: np.ndarray, truth: np.ndarray) -> float:
    m = (est > 0) & (truth > 0)
    assert m.mean() > 0.5, "estimator reported mostly-unvoiced on a tone"
    return float(np.median(np.abs(1200.0 * np.log2(est[m] / truth[m]))))


@pytest.fixture(scope="module")
def vibrato():
    t = np.arange(300)  # 3 s of frames
    truth = 220.0 * 2.0 ** (0.3 * np.sin(2 * np.pi * t * HOP / SR * 5.0) / 12.0)
    return _sawtooth(truth), truth


def test_dio_tracks_vibrato(vibrato):
    x, truth = vibrato
    est = f0_dio(x, sr=SR, hop=HOP)[: len(truth)]
    assert _cents_err(est, truth) < 15.0


def test_harvest_tracks_vibrato(vibrato):
    x, truth = vibrato
    est = f0_harvest(x, sr=SR, hop=HOP)[: len(truth)]
    assert _cents_err(est, truth) < 12.0


def test_pm_tracks_vibrato(vibrato):
    x, truth = vibrato
    est = f0_pm(x, sr=SR, hop=HOP)[: len(truth)]
    assert _cents_err(est, truth) < 15.0


def test_stonemask_refines_raw_dio(vibrato):
    """StoneMask must not degrade, and should tighten, the raw DIO track —
    the property pyworld.stonemask provides in the reference."""
    x, truth = vibrato
    raw = f0_dio(x, sr=SR, hop=HOP, refine=False)[: len(truth)]
    ref = stonemask(x, raw, sr=SR, hop=HOP)
    assert _cents_err(ref, truth) <= _cents_err(raw, truth) + 1e-9


def test_octave_sweep_no_halving():
    """A one-octave glide: estimators must follow without octave errors."""
    t = np.arange(400)
    truth = 110.0 * 2.0 ** (t / 400.0)
    x = _sawtooth(truth)
    for fn in (f0_dio, f0_harvest):
        est = fn(x, sr=SR, hop=HOP)[: len(truth)]
        m = (est > 0) & (truth > 0)
        octed = np.abs(1200.0 * np.log2(est[m] / truth[m])) > 600.0
        assert octed.mean() < 0.05, fn.__name__


def test_silence_is_unvoiced():
    x = np.random.default_rng(0).normal(scale=1e-5, size=SR)
    for fn in (f0_dio, f0_harvest, f0_pm):
        est = fn(x, sr=SR, hop=HOP)
        assert (est > 0).mean() < 0.2, fn.__name__


def test_unvoiced_gap_detected():
    """tone | silence | tone: the gap must come back unvoiced, the tones
    voiced — the voicing decision the RVC pipeline depends on."""
    truth = np.concatenate([
        np.full(120, 196.0), np.zeros(80), np.full(120, 261.63)])
    x = _sawtooth(np.where(truth > 0, truth, 1.0))
    x[120 * HOP:200 * HOP] = 0.0
    for fn in (f0_dio, f0_harvest):
        est = fn(x, sr=SR, hop=HOP)[: len(truth)]
        gap = est[130:190]
        tones = np.concatenate([est[10:110], est[210:310]])
        assert (gap > 0).mean() < 0.3, fn.__name__
        assert (tones > 0).mean() > 0.7, fn.__name__


# --------------------------------------------------------------------------
# Native-oracle parity (VERDICT r3 item 6): native/world_f0.cpp is an
# INDEPENDENT per-frame C++ transcription of the WORLD algorithm flow
# (SURVEY §2.5: "keep a C++ host op for parity testing").  The vectorized
# NumPy implementations must agree with it on speech-like signals — on
# voicing decisions and on f0 within a few percent — which exercises the
# contour-fix heuristics far harder than the known-truth gates above.
# --------------------------------------------------------------------------


def _speechlike(seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Phrase-like signal: two voiced stretches with glide + vibrato +
    jitter, separated by an aspirated (noisy) gap, with an amplitude
    envelope — the texture the heuristics were designed around."""
    rng = np.random.default_rng(seed)
    seg1 = 130.0 * 2.0 ** (np.linspace(0.0, 0.4, 140) / 2.0)
    seg2 = 200.0 * 2.0 ** (0.4 * np.sin(2 * np.pi * np.arange(160) * HOP / SR * 5.5) / 12.0)
    truth = np.concatenate([seg1, np.zeros(50), seg2])
    truth_j = truth * (1.0 + 0.003 * rng.standard_normal(len(truth)))
    x = _sawtooth(np.where(truth_j > 0, truth_j, 1.0))
    x[140 * HOP:190 * HOP] = 0.02 * rng.standard_normal(50 * HOP)
    env = 0.4 + 0.6 * np.abs(np.sin(np.pi * np.arange(len(x)) / len(x)))
    return (x * env).astype(np.float64), truth


@pytest.fixture(scope="module")
def native_lib():
    from audiolab_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native


@pytest.mark.parametrize("mode,fn", [("dio", f0_dio), ("harvest", f0_harvest)])
def test_native_oracle_parity(native_lib, mode, fn):
    x, truth = _speechlike()
    est = fn(x, sr=SR, hop=HOP)
    orc = native_lib.world_f0(x, SR, HOP, mode=mode)
    assert orc is not None
    n = min(len(est), len(orc), len(truth))
    est, orc = est[:n], orc[:n]
    both = (est > 0) & (orc > 0)
    either = (est > 0) | (orc > 0)
    # voicing decisions must substantially agree
    assert both.sum() / max(either.sum(), 1) > 0.75, mode
    # and the voiced f0 values must match the oracle closely
    rel = np.abs(est[both] - orc[both]) / orc[both]
    assert np.median(rel) < 0.02, (mode, float(np.median(rel)))
    assert np.percentile(rel, 90) < 0.08, (mode, float(np.percentile(rel, 90)))


def test_native_oracle_stonemask_parity(native_lib):
    """StoneMask refinement itself: both implementations refine the SAME
    raw track; refined values must agree (independent IF estimators:
    FFT-bin vs exact-DTFT Flanagan)."""
    x, truth = _speechlike(3)
    raw = f0_dio(x, sr=SR, hop=HOP, refine=False)
    py = stonemask(x, raw, sr=SR, hop=HOP)
    cc = native_lib.world_stonemask(x, raw, SR, HOP)
    assert cc is not None
    v = raw > 0
    rel = np.abs(py[v] - cc[v]) / np.maximum(cc[v], 1e-6)
    assert np.median(rel) < 0.01, float(np.median(rel))


def test_native_oracle_matches_truth(native_lib):
    """The oracle itself must be accurate — otherwise parity is vacuous."""
    x, truth = _speechlike(7)
    for mode in ("dio", "harvest"):
        orc = native_lib.world_f0(x, SR, HOP, mode=mode)[: len(truth)]
        m = (orc > 0) & (truth > 0)
        assert m.mean() > 0.5
        cents = np.abs(1200.0 * np.log2(orc[m] / truth[m]))
        assert np.median(cents) < 15.0, mode


def test_rvc_dispatch_uses_world(monkeypatch):
    """pipelines/rvc.py must route 'harvest' to f0_harvest and 'dio' to
    f0_dio (pitch_extraction.py:172-191 routes to pyworld equivalents)."""
    import audiolab_tpu.dsp.f0 as f0mod
    from audiolab_tpu.pipelines import rvc as rvc_mod

    calls = []
    monkeypatch.setattr(f0mod, "f0_harvest",
                        lambda *a, **k: calls.append("harvest") or np.zeros(5))
    monkeypatch.setattr(f0mod, "f0_dio",
                        lambda *a, **k: calls.append("dio") or np.zeros(5))

    pipe = rvc_mod.VoiceConverter.__new__(rvc_mod.VoiceConverter)
    pipe.cfg = type("C", (), {"f0_method": "harvest", "f0_min": 50.0,
                              "f0_max": 1100.0})()
    pipe._f0_one_method("harvest", np.zeros((1, 1600), np.float32))
    pipe._f0_one_method("dio", np.zeros((1, 1600), np.float32))
    assert calls == ["harvest", "dio"]
