"""Forced-alignment tests (VERDICT r1 item 6): CTC trellis correctness and
energy alignment tracking actual onsets on a synthetic speech fixture."""

import numpy as np

from audiolab_tpu.pipelines.forced_align import (
    ctc_forced_align,
    energy_align_words,
)


def test_ctc_align_recovers_planted_spans():
    """Posteriors with clear per-token ridges -> spans match the ridges."""
    t, v = 60, 6
    lp = np.full((t, v), np.log(0.02))
    # blank elsewhere
    lp[:, 0] = np.log(0.6)
    plant = [(5, 15, 2), (20, 32, 3), (40, 55, 2)]  # incl. repeated label
    for a, b, tok in plant:
        lp[a:b, 0] = np.log(0.05)
        lp[a:b, tok] = np.log(0.9)
    spans = ctc_forced_align(lp, np.array([2, 3, 2]))
    assert len(spans) == 3
    for (s0, s1), (a, b, _) in zip(spans, plant):
        assert abs(s0 - a) <= 2 and abs(s1 - b) <= 2, (spans, plant)


def test_ctc_align_monotonic_and_total():
    rng = np.random.default_rng(0)
    lp = np.log(rng.dirichlet(np.ones(5), size=40))
    spans = ctc_forced_align(lp, np.array([1, 2, 3, 4]))
    assert len(spans) == 4
    last = 0
    for s0, s1 in spans:
        assert s0 >= last and s1 > s0
        last = s0


def _bursty_speech(sr=16000, bursts=((0.1, 0.5), (0.8, 1.2), (1.5, 2.1))):
    n = int(2.4 * sr)
    x = np.zeros(n, np.float32)
    rng = np.random.default_rng(1)
    t = np.arange(n) / sr
    for a, b in bursts:
        i0, i1 = int(a * sr), int(b * sr)
        x[i0:i1] = 0.4 * np.sin(2 * np.pi * 180 * t[i0:i1]) + \
            0.05 * rng.standard_normal(i1 - i0).astype(np.float32)
    return x


def test_energy_align_tracks_onsets():
    """Three tone bursts, three words: starts land on burst onsets, NOT on
    the uniform-interpolation grid."""
    sr = 16000
    bursts = ((0.1, 0.5), (0.8, 1.2), (1.5, 2.1))
    x = _bursty_speech(sr, bursts)
    words = energy_align_words(x, sr, 0.0, 2.4, ["foo", "bar", "baz"])
    assert len(words) == 3
    for w, (a, b) in zip(words, bursts):
        assert abs(w["start"] - a) < 0.08, (w, a)
        assert w["end"] <= b + 0.35
    # uniform grid would put word 1 at 0.8s and word 2 at 1.6s exactly when
    # bursts start at 0.8/1.5 — also check monotone non-overlap
    for k in range(1, 3):
        assert words[k]["start"] >= words[k - 1]["end"]


def test_energy_align_all_silence_falls_back_uniform():
    sr = 8000
    x = np.zeros(sr * 2, np.float32)
    words = energy_align_words(x, sr, 0.0, 2.0, ["a", "b"])
    assert [w["word"] for w in words] == ["a", "b"]
    assert words[0]["start"] == 0.0 and words[1]["end"] == 2.0


def test_transcriber_words_use_alignment():
    """End-to-end: the random engine emits segments whose word timings come
    from the energy aligner (monotone, within the segment)."""
    from audiolab_tpu.pipelines.transcribe import random_transcriber

    x = _bursty_speech()
    tr = random_transcriber()
    out = tr.transcribe(x, sr=16000, max_tokens=16)
    for seg in out["segments"]:
        prev_end = seg["start"] - 1e-6
        for w in seg["words"]:
            assert w["start"] >= prev_end - 1e-6
            prev_end = w["end"]
