"""Dia TTS tests: teacher-forcing shapes, prefill/step consistency,
generation with audio prompt, byte tokenizer."""

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.dia import (
    DiaConfig,
    DiaModel,
    generate,
    tokenize_dialogue,
)


def tiny_cfg():
    return DiaConfig(
        dim_enc=32, dim_dec=32, n_layers_enc=2, n_layers_dec=2, n_heads=4,
        n_codebooks=3, codebook_size=20, max_text_len=32, max_audio_len=64,
    )


def test_tokenizer():
    t = tokenize_dialogue("[S1] hi")
    assert t.dtype == np.int32 and t[0] == ord("[")


def test_teacher_forcing_shapes():
    cfg = tiny_cfg()
    model = DiaModel(cfg)
    text = jnp.asarray(tokenize_dialogue("[S1] test"))[None]
    codes = jnp.asarray(
        np.random.default_rng(0).integers(0, 16, (1, cfg.n_codebooks, 8)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), text, codes)["params"]
    logits = model.apply({"params": params}, text, codes)
    assert logits.shape == (1, cfg.n_codebooks, cfg.codebook_size)


def test_prefill_step_matches_longer_prefill():
    cfg = tiny_cfg()
    model = DiaModel(cfg)
    rng = np.random.default_rng(1)
    text = jnp.asarray(tokenize_dialogue("[S1] hello"))[None]
    codes8 = jnp.asarray(rng.integers(0, 16, (1, cfg.n_codebooks, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), text, codes8)["params"]

    enc = model.apply({"params": params}, text, None, method=DiaModel.encode_text)
    # prefill 7, step the 8th token -> must equal prefill of all 8
    l7, caches, cross = model.apply(
        {"params": params}, codes8[:, :, :7], enc, None, method=DiaModel.prefill
    )
    l_step, _ = model.apply(
        {"params": params}, codes8[:, :, 7], jnp.asarray([7]), caches, cross, None,
        method=DiaModel.step,
    )
    l8, _, _ = model.apply(
        {"params": params}, codes8, enc, None, method=DiaModel.prefill
    )
    np.testing.assert_allclose(np.asarray(l_step), np.asarray(l8),
                               rtol=2e-3, atol=2e-3)


def test_generate_with_audio_prompt():
    cfg = tiny_cfg()
    model = DiaModel(cfg)
    text = jnp.asarray(tokenize_dialogue("[S1] one [S2] two"))[None]
    codes = jnp.asarray(
        np.random.default_rng(2).integers(0, 16, (1, cfg.n_codebooks, 4)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), text, codes)["params"]
    out = generate(model, params, text, max_frames=5, audio_prompt=codes,
                   rng=jax.random.PRNGKey(3))
    assert out.shape == (1, cfg.n_codebooks, 5)
    assert np.asarray(out).max() < cfg.codebook_size
