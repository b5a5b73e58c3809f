"""Chatterbox S3Gen checkpoint-layout parity vs the seeded torch replica
(tests/torch_s3gen_replica.py, mirroring the published chatterbox-tts
models/s3gen layout that ``s3gen.safetensors`` serializes).

Covers the flow (upsample conformer encoder + causal CFM with CFG) end
to end, the HiFT decode path (source-injected, since the NSF source is
stochastic), the f0 predictor, and the m_source merge."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiolab_tpu.models.chatterbox_s3gen import (  # noqa: E402
    CausalMaskedDiffWithXvec, FlowConfig, HiFTConfig, HiFTGenerator,
    S3Token2Wav)
from audiolab_tpu.utils.convert import (  # noqa: E402
    convert_hift, convert_s3gen_flow)

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def _snap_f32(model):
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.08)
            p.copy_(p.float().double())
    return model


TINY_FLOW = FlowConfig(token_vocab=30, dim=32, mel_dim=8, xvector_dim=12,
                       heads=2, ffn_dim=64, n_layers=2, n_up_layers=1,
                       est_channels=16, est_mid_blocks=2, est_n_blocks=1,
                       est_heads=2, est_head_dim=4, n_timesteps=2)

TINY_HIFT = HiFTConfig(in_channels=8, base_channels=16,
                       f0_cond_channels=12)


def _flow_pair():
    from tests.torch_s3gen_replica import FlowReplica

    torch.manual_seed(710)
    t_model = _snap_f32(FlowReplica().double().eval())
    f_model = CausalMaskedDiffWithXvec(TINY_FLOW)
    template = jax.eval_shape(
        lambda: f_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32),
            jnp.zeros((1, 12)), jnp.zeros((1, 2, 8)),
            jnp.zeros((1, 6, 8)))["params"])
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = convert_s3gen_flow(sd, template, strict=True)
    params = jax.tree.map(lambda a: a.astype(np.float64), params)
    return t_model, f_model, params


def test_flow_parity():
    """tokens + xvector + prompt mel -> mel through 2 Euler CFM steps."""
    jax.config.update("jax_enable_x64", True)
    try:
        t_model, f_model, params = _flow_pair()
        rng = np.random.default_rng(11)
        tokens = rng.integers(0, 30, (2, 5))
        xvec = rng.standard_normal((2, 12))
        prompt = rng.standard_normal((2, 3, 8)) * 0.3
        noise = rng.standard_normal((2, 10, 8))
        with torch.no_grad():
            ref = t_model(torch.from_numpy(tokens),
                          torch.from_numpy(xvec),
                          torch.from_numpy(prompt),
                          torch.from_numpy(noise), n_timesteps=2).numpy()
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(tokens), jnp.asarray(xvec),
            jnp.asarray(prompt), jnp.asarray(noise), n_timesteps=2))
        # espnet pos-emb tables are built in f32 on the flax side
        np.testing.assert_allclose(out, ref, atol=5e-6)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_flow_no_prompt():
    jax.config.update("jax_enable_x64", True)
    try:
        t_model, f_model, params = _flow_pair()
        rng = np.random.default_rng(3)
        tokens = rng.integers(0, 30, (1, 4))
        xvec = rng.standard_normal((1, 12))
        noise = rng.standard_normal((1, 8, 8))
        with torch.no_grad():
            ref = t_model(torch.from_numpy(tokens), torch.from_numpy(xvec),
                          None, torch.from_numpy(noise),
                          n_timesteps=2).numpy()
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(tokens), jnp.asarray(xvec),
            None, jnp.asarray(noise), n_timesteps=2))
        np.testing.assert_allclose(out, ref, atol=5e-6)
    finally:
        jax.config.update("jax_enable_x64", False)


def _hift_pair():
    from tests.torch_s3gen_replica import HiFTReplica

    torch.manual_seed(55)
    t_model = HiFTReplica().double().eval()
    for p in t_model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.05)
            p.copy_(p.float().double())
    f_model = HiFTGenerator(TINY_HIFT)
    template = jax.eval_shape(
        lambda: f_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8)),
                             jax.random.PRNGKey(1))["params"])
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = convert_hift(sd, template, strict=True)
    params = jax.tree.map(lambda a: a.astype(np.float64), params)
    return t_model, f_model, params


def test_hift_decode_parity():
    """mel + injected NSF source -> waveform (conv stack + ISTFT head)."""
    jax.config.update("jax_enable_x64", True)
    try:
        t_model, f_model, params = _hift_pair()
        rng = np.random.default_rng(9)
        t_mel = 6
        mel = rng.standard_normal((2, t_mel, 8)) * 0.5
        source = rng.standard_normal((2, t_mel * 480)) * 0.1
        with torch.no_grad():
            ref = t_model.decode(
                torch.from_numpy(mel).transpose(1, 2),
                torch.from_numpy(source)).numpy()
        s_stft = f_model.apply({"params": params}, jnp.asarray(source),
                               method=HiFTGenerator.source_stft)
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(mel), s_stft,
            method=HiFTGenerator.decode))
        assert out.shape == ref.shape
        # snake + the matmul (i)stft run their hot path in f32
        np.testing.assert_allclose(out, ref, atol=2e-4)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_hift_f0_and_source_parity():
    jax.config.update("jax_enable_x64", True)
    try:
        t_model, f_model, params = _hift_pair()
        rng = np.random.default_rng(4)
        mel = rng.standard_normal((1, 7, 8))
        with torch.no_grad():
            ref_f0 = t_model.f0_predictor(
                torch.from_numpy(mel).transpose(1, 2)).numpy()
        out_f0 = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(mel),
            method=lambda m, x: m.f0_predictor(x)))
        np.testing.assert_allclose(out_f0, ref_f0, atol=1e-10)

        sines = rng.standard_normal((1, 40, 9))
        with torch.no_grad():
            ref_s = t_model.m_source(torch.from_numpy(sines)).numpy()[..., 0]
        out_s = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(sines),
            method=lambda m, x: jnp.tanh(m.m_source_linear(x))[..., 0]))
        np.testing.assert_allclose(out_s, ref_s, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_s3token2wav_shapes():
    """Full assembly: tokens -> wav, 2× token->mel ratio, 480× mel->wav."""
    f_flow = CausalMaskedDiffWithXvec(TINY_FLOW)
    flow_p = f_flow.init(jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32),
                         jnp.zeros((1, 12)), None,
                         jnp.zeros((1, 6, 8)))["params"]
    f_hift = HiFTGenerator(TINY_HIFT)
    hift_p = f_hift.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8)),
                         jax.random.PRNGKey(2))["params"]
    eng = S3Token2Wav(TINY_FLOW, flow_p, TINY_HIFT, hift_p)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 30, (1, 5)))
    xvec = jnp.asarray(np.random.default_rng(1).standard_normal((1, 12)))
    wav = eng.tokens_to_wav(tokens, xvec)
    assert wav.shape == (1, 5 * 2 * 480)
    prompt = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 2, 8)) * 0.1)
    wav2 = eng.tokens_to_wav(tokens, xvec, prompt_mel=prompt)
    assert wav2.shape == (1, (5 * 2 - 2) * 480)
