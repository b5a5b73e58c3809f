"""STFT/iSTFT/mel numerics vs independent numpy-FFT ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.kernels.stft import stft, istft, spectrogram, hann_window
from audiolab_tpu.kernels.mel import mel_filterbank, mel_spectrogram, log_mel


def ref_stft(x, n_fft, hop, center=True):
    """Ground truth via np.fft.rfft (independent of the DFT-matmul path)."""
    if center:
        pad = n_fft // 2
        x = np.pad(x, (pad, pad), mode="reflect")
    win = hann_window(n_fft)
    t = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop : i * hop + n_fft] * win for i in range(t)])
    return np.fft.rfft(frames, axis=-1)


@pytest.mark.parametrize("n_fft,hop", [(512, 128), (2048, 480), (1024, 256)])
def test_stft_matches_fft(rng, n_fft, hop):
    x = rng.standard_normal(16000).astype(np.float32)
    real, imag = stft(jnp.asarray(x), n_fft=n_fft, hop=hop)
    ref = ref_stft(x, n_fft, hop)
    assert real.shape == ref.shape
    np.testing.assert_allclose(np.asarray(real), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(imag), ref.imag, atol=2e-3)


def test_stft_batched(rng):
    x = rng.standard_normal((2, 3, 8000)).astype(np.float32)
    real, imag = stft(jnp.asarray(x), n_fft=512, hop=128)
    r0, i0 = stft(jnp.asarray(x[1, 2]), n_fft=512, hop=128)
    # batch rank changes XLA's fp32 dot accumulation splits by ~2e-5 on
    # O(10) spectral values; a framing/layout bug would be O(1)
    np.testing.assert_allclose(np.asarray(real[1, 2]), np.asarray(r0),
                               atol=1e-4, rtol=1e-5)


def test_istft_roundtrip(rng):
    x = rng.standard_normal(12000).astype(np.float32)
    real, imag = stft(jnp.asarray(x), n_fft=1024, hop=256)
    y = istft(real, imag, n_fft=1024, hop=256, length=12000)
    np.testing.assert_allclose(np.asarray(y), x, atol=5e-3)


def test_istft_roundtrip_hop_quarter(rng):
    x = rng.standard_normal(48000).astype(np.float32)
    real, imag = stft(jnp.asarray(x), n_fft=2048, hop=512)
    y = istft(real, imag, n_fft=2048, hop=512, length=48000)
    np.testing.assert_allclose(np.asarray(y), x, atol=5e-3)


def test_spectrogram_power(rng):
    x = rng.standard_normal(8000).astype(np.float32)
    p = spectrogram(jnp.asarray(x), n_fft=512, hop=128, power=2.0)
    ref = np.abs(ref_stft(x, 512, 128)) ** 2
    np.testing.assert_allclose(np.asarray(p), ref, atol=1e-2, rtol=1e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(48000, 2048, n_mels=128)  # (n_bins, n_mels)
    assert fb.shape == (1025, 128)
    assert (fb >= 0).all()
    # each filter has nonzero support and unit-area-ish slaney norm
    assert (fb.sum(axis=0) > 0).all()
    # filters are ordered in frequency
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_mel_filterbank_htk_vs_slaney_differ():
    a = mel_filterbank(16000, 1024, n_mels=64, htk=False)
    b = mel_filterbank(16000, 1024, n_mels=64, htk=True, norm=None)
    assert not np.allclose(a, b)


def test_mel_spectrogram_sine(rng):
    # a pure 1 kHz tone should concentrate energy near the matching mel band
    sr, n_fft = 16000, 1024
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    m = mel_spectrogram(jnp.asarray(x), sr=sr, n_fft=n_fft, hop=256, n_mels=80, power=2.0)
    m = np.asarray(m).mean(axis=0)
    fb = mel_filterbank(sr, n_fft, 80)
    bin_1k = int(round(1000.0 * n_fft / sr))
    expected_band = fb[bin_1k].argmax()
    assert abs(int(m.argmax()) - int(expected_band)) <= 1


def test_log_mel_clip():
    m = jnp.asarray([[0.0, 1.0, 1e-9]])
    lm = np.asarray(log_mel(m))
    assert np.isfinite(lm).all()
    np.testing.assert_allclose(lm[0, 1], 0.0, atol=1e-6)
