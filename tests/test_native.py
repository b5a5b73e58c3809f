"""Native audiohost tests: build, WAV codec round trip vs the python
codec, resampler vs scipy, hashing, levels."""

import numpy as np
import pytest
from scipy import signal as sps

from audiolab_tpu import native
from audiolab_tpu.core.audio_io import read_audio, write_wav


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_hash64_stable():
    a = native.hash64(b"hello")
    assert a == native.hash64(b"hello")
    assert a != native.hash64(b"hellp")


def test_wav_roundtrip_native():
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal((2, 5000)) * 0.3, -0.99, 0.99).astype(np.float32)
    data = native.wav_encode_pcm16(x, 22050)
    assert data is not None and data[:4] == b"RIFF"
    decoded, sr = native.wav_decode(data)
    assert sr == 22050 and decoded.shape == x.shape
    np.testing.assert_allclose(decoded, x, atol=1e-4)  # PCM16 quantization


def test_wav_decode_matches_python_codec(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(4000) * 0.2).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    py = read_audio(p)
    nat, sr = native.wav_decode(open(p, "rb").read())
    assert sr == py.sample_rate
    np.testing.assert_allclose(nat[0], np.asarray(py.samples[0]), atol=1e-4)


def test_resample_matches_scipy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(3000).astype(np.float32)
    y = native.resample(x, 3, 2)
    ref = sps.resample_poly(x, 3, 2).astype(np.float32)
    assert y is not None and len(y) == len(ref)
    # interior agreement (window designs differ slightly at the edges)
    err = np.abs(y[50:-50] - ref[50:-50])
    assert err.max() < 5e-2, err.max()
    # spectral check: a tone survives resampling at the right frequency
    t = np.arange(8000) / 8000.0
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    up = native.resample(tone, 2, 1)
    spec = np.abs(np.fft.rfft(up * np.hanning(len(up))))
    f = np.fft.rfftfreq(len(up), 1 / 16000.0)[spec.argmax()]
    assert abs(f - 440.0) < 2.0


def test_levels():
    x = np.asarray([0.0, 0.5, -1.0, 0.0], np.float32)
    peak, rms = native.levels(x)
    assert abs(peak - 1.0) < 1e-6
    assert abs(rms - np.sqrt(np.mean(x**2))) < 1e-6
