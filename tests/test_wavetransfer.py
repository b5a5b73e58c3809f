"""WaveTransfer tests: model shapes, diffusion loss finiteness, project
preprocess -> short train -> generate round trip, cancellation."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.core.audio_io import write_wav
from audiolab_tpu.models.wavegrad import (
    FAST_6,
    WaveGrad,
    WaveGradConfig,
    diffusion_loss,
    sample,
)
from audiolab_tpu.train import wavetransfer as WT


def tiny_model_cfg():
    return WaveGradConfig(
        n_mels=16, hop=12, factors=(3, 2, 2), ublock_ch=(16, 16, 8),
        dblock_ch=(8, 16), base_ch=4,
    )


def tiny_cfg():
    return WT.WTConfig(
        sr=8000, n_mels=16, seg_frames=16, batch_size=2, lr=1e-3,
        steps=4, ckpt_every=2, model=tiny_model_cfg(),
    )


def test_model_shapes_and_loss():
    mc = tiny_model_cfg()
    model = WaveGrad(mc)
    b, t = 2, 8
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((b, t * mc.hop)),
                        jnp.float32)
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((b, t, mc.n_mels)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), audio, mel, jnp.ones((b,)))["params"]
    eps = model.apply({"params": params}, audio, mel, jnp.full((b,), 0.5))
    assert eps.shape == audio.shape
    loss = diffusion_loss(model, params, audio, mel, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_sampler_shape():
    mc = tiny_model_cfg()
    model = WaveGrad(mc)
    b, t = 1, 6
    mel = jnp.zeros((b, t, mc.n_mels))
    audio = jnp.zeros((b, t * mc.hop))
    params = model.init(jax.random.PRNGKey(0), audio, mel, jnp.ones((b,)))["params"]
    y = sample(model, params, mel, FAST_6, jax.random.PRNGKey(1))
    assert y.shape == (b, t * mc.hop)
    assert float(jnp.abs(y).max()) <= 1.0


@pytest.fixture
def project(tmp_path):
    proj = tmp_path / "proj"
    (proj / "data").mkdir(parents=True)
    rng = np.random.default_rng(0)
    sr = 16000  # resampled to 8000 by preprocess
    for i in range(2):
        t = np.arange(sr) / sr
        x = 0.3 * np.sin(2 * np.pi * (220 + 110 * i) * t)
        write_wav(str(proj / "data" / f"clip{i}.wav"), x.astype(np.float32), sr)
    return str(proj)


def test_train_and_generate(project):
    cfg = tiny_cfg()
    n = WT.preprocess_project(project, cfg)
    assert n == 2
    res = WT.train_model(project, cfg)
    assert np.isfinite(res["loss"])
    src = (0.2 * np.sin(2 * np.pi * 330 * np.arange(4000) / 8000)).astype(np.float32)
    y, sr = WT.generate(project, src, 8000, cfg, FAST_6, chunk_frames=32)
    assert sr == 8000 and len(y) == len(src)
    assert np.isfinite(y).all()


def test_cancellation(project):
    cfg = tiny_cfg()
    WT.preprocess_project(project, cfg)
    token = WT.CancellationToken()
    token.cancel()
    res = WT.train_model(project, cfg, token=token)
    assert res["steps"] == cfg.steps  # returns without crashing


def test_train_dp_sharded(project):
    """batch divisible by device count -> dp-sharded step engages."""
    cfg = tiny_cfg()
    cfg.batch_size = 8
    cfg.steps = 2
    cfg.ckpt_every = 2
    WT.preprocess_project(project, cfg)
    res = WT.train_model(project, cfg)
    assert np.isfinite(res["loss"])
