"""Stable Audio tests: VAE round-trip shapes, DiT denoiser, full
generate_audio with CFG + init audio on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.models.dit import DiTConfig
from audiolab_tpu.models.stable_audio import (
    OobleckConfig,
    StableAudioConfig,
    StableAudioModel,
    generate_audio,
    tokenize_prompt,
)


@pytest.fixture(scope="module")
def setup():
    cfg = StableAudioConfig(
        sr=8000,
        max_seconds=4.0,
        vae=OobleckConfig(channels=1, latent_dim=8, base_ch=8, ratios=(4, 4)),
        dit=DiTConfig(dim=32, n_layers=2, n_heads=4, cond_dim=32, in_dim=8,
                      out_dim=8, dtype="float32"),
        text_dim=32,
        text_layers=1,
    )
    model = StableAudioModel(cfg)
    audio = jnp.zeros((1, cfg.vae.hop * 4, 1))
    ids = jnp.asarray(tokenize_prompt("piano"))[None]
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, audio, ids, jnp.zeros((1,)),
        method=StableAudioModel.full_init,
    )["params"]
    return cfg, model, params


def test_vae_roundtrip_shapes(setup):
    cfg, model, params = setup
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, cfg.vae.hop * 6, 1)), jnp.float32
    )
    z = model.apply({"params": params}, audio, method=StableAudioModel.encode_audio)
    assert z.shape == (2, 6, cfg.vae.latent_dim)
    y = model.apply({"params": params}, z, method=StableAudioModel.decode_audio)
    assert y.shape == audio.shape


def test_generate_audio(setup):
    cfg, model, params = setup
    out = generate_audio(model, params, "warm pad", negative_prompt="noise",
                         seconds_total=1.0, steps=3, cfg_scale=4.0, seed=1)
    t_lat = int(round(1.0 * cfg.sr / cfg.vae.hop))
    assert out.shape == (1, t_lat * cfg.vae.hop, 1)
    assert np.isfinite(out).all()


def test_generate_with_init_audio(setup):
    cfg, model, params = setup
    init = np.random.default_rng(1).standard_normal((1, cfg.vae.hop * 8, 1)).astype(
        np.float32) * 0.1
    out = generate_audio(model, params, "variation", seconds_total=1.0, steps=2,
                         init_audio=init, init_strength=0.5, seed=2)
    assert np.isfinite(out).all()


def test_seconds_clamp(setup):
    cfg, model, params = setup
    out = generate_audio(model, params, "long", seconds_total=999.0, steps=1)
    assert out.shape[1] <= int(cfg.max_seconds * cfg.sr) + cfg.vae.hop
