"""VR multiband front end + windowed VRSeparator inference (spec_utils
equivalents for the UVR .pth models the reference runs via
audio-separator)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolab_tpu.models.separation.vr import VRConfig, make_vr_net
from audiolab_tpu.models.separation.vr_bands import (
    BAND_PARAMS,
    VRSeparator,
    combined_spec_to_wave,
    wave_to_combined_spec,
)


def _tone_mix(sr, seconds, freqs=(300.0, 3000.0)):
    t = np.arange(int(sr * seconds)) / sr
    x = sum(np.sin(2 * np.pi * f * t) / len(freqs) for f in freqs)
    return np.stack([x, 0.8 * x]).astype(np.float32)


def test_1band_roundtrip_identity():
    mp = BAND_PARAMS["1band_sr44100_hl512"]
    x = _tone_mix(44100, 1.0)
    spec = wave_to_combined_spec(x, mp)
    assert spec.shape[1] == mp["bins"] + 1
    y = combined_spec_to_wave(spec, mp)
    n = min(x.shape[-1], y.shape[-1])
    # pre-filter only touches the top bin; audible band is identity
    np.testing.assert_allclose(y[:, :n], x[:, :n], atol=5e-3)


def test_4band_roundtrip_preserves_signal():
    mp = BAND_PARAMS["4band_v3"]
    x = _tone_mix(44100, 1.0)
    spec = wave_to_combined_spec(x, mp)
    assert spec.shape[1] == mp["bins"] + 1
    y = combined_spec_to_wave(spec, mp)
    n = min(x.shape[-1], y.shape[-1])
    a, b = x[0, 2000:n - 2000], np.asarray(y)[0, 2000:n - 2000]
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert corr > 0.9, corr
    assert 0.5 < np.linalg.norm(b) / np.linalg.norm(a) < 1.5


@pytest.mark.parametrize("band", ["1band_sr44100_hl1024", "4band_v3"])
def test_vr_separator_mask_partition(band):
    """primary + complement == the front end's reconstruction of the
    input (masks m and 1-m partition the spectrogram exactly)."""
    mp = BAND_PARAMS[band]
    cfg = VRConfig(arch="cascaded_net",
                   n_fft=2 * mp["bins"] if mp["bins"] % 16 == 0 else 1344,
                   nout=8, nout_lstm=8,
                   dilations_new=((1, 1), (2, 1), (3, 2)))
    model = make_vr_net(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.max_bin, 32, 2)))["params"]
    sep = VRSeparator(params, model, band_params=mp, primary="no_noise",
                      window_size=64)
    x = _tone_mix(44100, 0.6)
    out = sep(x)
    assert set(out) == {"no_noise", "complement"}
    y = out["no_noise"] + out["complement"]
    ref = combined_spec_to_wave(wave_to_combined_spec(x, mp), mp)
    n = min(y.shape[-1], ref.shape[-1], x.shape[-1])
    np.testing.assert_allclose(y[:, :n], np.asarray(ref)[:, :n], atol=1e-3)
    assert np.isfinite(out["no_noise"]).all()


def test_vr_separator_aggressiveness_sharpens_mask():
    mp = BAND_PARAMS["1band_sr44100_hl512"]
    cfg = VRConfig(arch="cascaded_net", n_fft=2 * mp["bins"], nout=8,
                   nout_lstm=8, dilations_new=((1, 1), (2, 1), (3, 2)))
    model = make_vr_net(cfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, cfg.max_bin, 32, 2)))["params"]
    x = _tone_mix(44100, 0.4)
    plain = VRSeparator(params, model, band_params=mp, window_size=64)(x)
    agg = VRSeparator(params, model, band_params=mp, window_size=64,
                      aggressiveness=0.5)(x)
    # exponentiating the sigmoid mask strictly reduces primary energy
    assert (np.linalg.norm(agg["primary"])
            < np.linalg.norm(plain["primary"]))
