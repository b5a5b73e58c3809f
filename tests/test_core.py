"""Audio I/O, resampling, chunk planner, mesh tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sps

from audiolab_tpu.core.audio_io import read_wav, write_wav, read_audio, AudioData
from audiolab_tpu.core.chunking import plan_chunks, extract_chunks, stitch_chunks
from audiolab_tpu.core.mesh import get_mesh, local_mesh
from audiolab_tpu.kernels.resample import resample, resample_poly_np


@pytest.mark.parametrize("subtype", ["PCM_16", "PCM_24", "FLOAT"])
def test_wav_roundtrip(tmp_path, rng, subtype):
    x = np.clip(rng.standard_normal((2, 4800)) * 0.3, -0.99, 0.99).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, x, 48000, subtype=subtype)
    a = read_wav(p)
    assert a.sample_rate == 48000
    assert a.samples.shape == (2, 4800)
    tol = {"PCM_16": 1e-4, "PCM_24": 1e-6, "FLOAT": 1e-7}[subtype]
    np.testing.assert_allclose(a.samples, x, atol=tol)


def test_wav_mono_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(1000) * 0.5).astype(np.float32)
    p = tmp_path / "m.wav"
    write_wav(p, x, 16000)
    a = read_wav(p)
    assert a.samples.shape == (1, 1000)


def test_read_audio_resamples(tmp_path, rng):
    x = (rng.standard_normal((1, 48000)) * 0.3).astype(np.float32)
    p = tmp_path / "r.wav"
    write_wav(p, x, 48000, subtype="FLOAT")
    a = read_audio(p, sample_rate=16000)
    assert a.sample_rate == 16000
    assert abs(a.num_samples - 16000) <= 1


@pytest.mark.parametrize("orig,target", [(48000, 16000), (16000, 48000), (44100, 48000)])
def test_resample_matches_scipy(rng, orig, target):
    x = rng.standard_normal(orig).astype(np.float32)  # 1 second
    y = np.asarray(resample(jnp.asarray(x), orig, target))
    ref = resample_poly_np(x, orig, target)
    assert abs(y.shape[-1] - ref.shape[-1]) <= 1
    n = min(y.shape[-1], ref.shape[-1])
    # interior only: edge handling differs slightly from scipy's
    np.testing.assert_allclose(y[100 : n - 100], ref[100 : n - 100], atol=5e-4)


def test_resample_preserves_tone(rng):
    sr, target = 16000, 48000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), sr, target))
    f, p = sps.periodogram(y[1000:-1000], fs=target)
    assert abs(f[p.argmax()] - 440.0) < 5.0


def test_chunk_plan_exact():
    plan = plan_chunks(100, 40, overlap=10)
    assert plan.hop == 30
    assert (plan.count - 1) * plan.hop + plan.chunk >= 100


def test_chunk_roundtrip_identity(rng):
    x = rng.standard_normal(10000).astype(np.float32)
    plan = plan_chunks(10000, 2048, overlap=512)
    ch = extract_chunks(jnp.asarray(x), plan)
    assert ch.shape == (plan.count, 2048)
    y = stitch_chunks(ch, plan)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


def test_chunk_roundtrip_multichannel(rng):
    x = rng.standard_normal((2, 5000)).astype(np.float32)
    plan = plan_chunks(5000, 1024, overlap=256)
    ch = extract_chunks(jnp.asarray(x), plan)
    assert ch.shape == (plan.count, 2, 1024)
    y = stitch_chunks(ch, plan)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


def test_mesh_axes():
    mesh = get_mesh()
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.size == len(jax.devices())


def test_local_mesh_tp():
    mesh = local_mesh(8, tp=2)
    assert mesh.shape["tp"] == 2
    assert mesh.shape["dp"] == 4
