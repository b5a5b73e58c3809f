"""Cloning tests: tone-color conversion shapes + chunked convert,
diarization turns, speaker split, facade dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.models.openvoice import ToneColorConfig, ToneColorConverter
from audiolab_tpu.models.zonos import SpeakerEncoder
from audiolab_tpu.pipelines.cloning import (
    CloningFacade,
    OpenVoiceCloneConfig,
    OpenVoiceCloner,
    diarize,
    split_speakers,
)


def tiny_tc_cfg():
    return ToneColorConfig(
        sr=8000, n_fft=256, hop=64, spec_channels=129, inter_channels=16,
        hidden_channels=16, gin_channels=16, n_mels_ref=20,
        upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=32,
    )


@pytest.fixture(scope="module")
def cloner():
    cfg = tiny_tc_cfg()
    model = ToneColorConverter(cfg)
    spec = jnp.zeros((1, 8, cfg.spec_channels))
    ref = jnp.zeros((1, 10, cfg.spec_channels))  # SE comes from the linear
    params = model.init(jax.random.PRNGKey(0), spec,                # spec
                        jnp.full((1,), 8, jnp.int32), ref, ref)["params"]
    return OpenVoiceCloner(cfg, params, OpenVoiceCloneConfig(
        chunk_seconds=0.5, overlap_seconds=0.1))


def test_convert_chunked(cloner):
    rng = np.random.default_rng(0)
    src = (0.2 * np.sin(2 * np.pi * 220 * np.arange(8000) / 8000)).astype(np.float32)
    ref = rng.standard_normal(4000).astype(np.float32) * 0.1
    y, sr = cloner.convert(src, 8000, ref, 8000)
    assert sr == 8000 and len(y) == len(src)
    assert np.isfinite(y).all()


def test_speaker_embedding_deterministic(cloner):
    x = np.random.default_rng(1).standard_normal(4000).astype(np.float32)
    e1 = cloner.extract_se(x, 8000)
    e2 = cloner.extract_se(x, 8000)
    assert np.isfinite(e1).all() and np.allclose(e1, e2)


@pytest.fixture(scope="module")
def spk():
    se = SpeakerEncoder(out_dim=16)
    mel = jnp.zeros((1, 20, 80))
    params = se.init(jax.random.PRNGKey(1), mel)["params"]
    return se, params


def test_diarize_and_split(spk):
    se, params = spk
    rng = np.random.default_rng(2)
    sr = 16000
    # two "speakers": distinct spectral content halves
    a = 0.3 * np.sin(2 * np.pi * 200 * np.arange(sr * 3) / sr)
    b = 0.1 * rng.standard_normal(sr * 3)
    wav = np.concatenate([a, b]).astype(np.float32)
    turns = diarize(wav, sr, se, params, n_speakers=2)
    assert turns and all(t1 > t0 for t0, t1, _ in turns)
    parts = split_speakers(wav, sr, turns)
    assert len(parts) >= 1
    assert sum(len(v) for v in parts.values()) > 0


def test_facade(cloner, spk):
    se, params = spk
    fac = CloningFacade(openvoice=cloner, spk_encoder=se, spk_params=params)
    assert fac.methods == ["openvoice", "tts"]
    src = np.zeros(4000, np.float32)
    ref = np.zeros(4000, np.float32)
    y, sr = fac.clone_voice_openvoice(src, 8000, ref, 8000)
    assert len(y) == len(src)
    with pytest.raises(NotImplementedError):
        fac.clone_voice_tts("hi", ref, 8000)
    chosen, turns = fac.choose_speaker(
        np.random.default_rng(3).standard_normal(32000).astype(np.float32), 16000)
    assert len(chosen) > 0
