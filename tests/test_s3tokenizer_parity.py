"""S3TokenizerV2 checkpoint-layout parity vs the seeded replica
(tests/torch_s3tokenizer_replica.py, mirroring the published
s3tokenizer model_v2 layout bundled in chatterbox s3gen.safetensors)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiolab_tpu.models.s3tokenizer import (  # noqa: E402
    S3AudioEncoder, S3TokenizerConfig, S3TokenizerV2)
from audiolab_tpu.utils.convert import convert_s3tokenizer  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")

TINY = S3TokenizerConfig(n_mels=12, n_state=32, n_head=4, n_layer=2,
                         n_ctx=64, fsmn_kernel=7)


def _pair(seed=77):
    from tests.torch_s3tokenizer_replica import S3TokenizerV2Replica

    torch.manual_seed(seed)
    t_model = S3TokenizerV2Replica(n_mels=12, n_state=32, n_head=4,
                                   n_layer=2,
                                   kernel_size=7).double().eval()
    for p in t_model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.2)
            p.copy_(p.float().double())
    f_model = S3TokenizerV2(TINY)
    tpl = jax.eval_shape(
        lambda: f_model.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 16, 12)))["params"])
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = convert_s3tokenizer(sd, tpl, strict=True)
    params = jax.tree.map(lambda a: a.astype(np.float64), params)
    return t_model, f_model, params


def test_encoder_parity():
    """mel -> encoder hidden states (pre-FSQ), fp64.  The replica's
    fsmn kernel is 31 wide by default vs TINY's 7 — both sides built at
    7 via the conv module, so this also pins the depthwise layout."""
    jax.config.update("jax_enable_x64", True)
    try:
        t_model, f_model, params = _pair()
        rng = np.random.default_rng(2)
        mel = rng.standard_normal((2, 12, 21))  # (b, n_mels, t) torch
        with torch.no_grad():
            ref = t_model.encoder(torch.from_numpy(mel)).numpy()
        enc = S3AudioEncoder(TINY)
        out = np.asarray(enc.apply({"params": params["encoder"]},
                                   jnp.asarray(mel.transpose(0, 2, 1))))
        assert out.shape == ref.shape == (2, 6, 32)
        # both sides round the sinusoid table through f32, but at
        # different points -> ~1e-8 floor
        np.testing.assert_allclose(out, ref, atol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_token_ids_parity():
    """Full tokenize path: identical FSQ ids."""
    jax.config.update("jax_enable_x64", True)
    try:
        t_model, f_model, params = _pair()
        rng = np.random.default_rng(4)
        mel = rng.standard_normal((2, 12, 33))
        with torch.no_grad():
            ref = t_model(torch.from_numpy(mel)).numpy()
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(mel.transpose(0, 2, 1))))
        assert out.shape == ref.shape
        assert (out == ref.astype(np.int32)).all()
        assert (out >= 0).all() and (out < 3 ** 8).all()
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fsq_f32_agreement():
    """FSQ ids computed in f32 agree with the fp64 oracle nearly
    everywhere (borderline rounds may rarely flip)."""
    t_model, f_model, params = _pair(seed=11)
    rng = np.random.default_rng(6)
    mel = rng.standard_normal((1, 12, 25))
    with torch.no_grad():
        ref = t_model(torch.from_numpy(mel)).numpy()
    out32 = np.asarray(f_model.apply(
        {"params": jax.tree.map(lambda a: a.astype(np.float32), params)},
        jnp.asarray(mel.transpose(0, 2, 1), jnp.float32)))
    agree = (out32 == ref.astype(np.int32)).mean()
    assert agree > 0.95


def test_tokenize_wav_shapes():
    from audiolab_tpu.models.s3tokenizer import s3_log_mel, tokenize_wav

    cfg = S3TokenizerConfig(n_mels=128, n_state=32, n_head=4, n_layer=1,
                            n_ctx=256, fsmn_kernel=7)
    f_model = S3TokenizerV2(cfg)
    params = f_model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 20, 128)))["params"]
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    mel = s3_log_mel(wav[None])
    assert mel.shape[-1] == 128 and np.isfinite(np.asarray(mel)).all()
    ids = tokenize_wav(params, wav, cfg)
    # 1 s -> 100 mel frames -> /4 -> 25 tokens
    assert ids.shape == (1, 25)
    assert (ids >= 0).all() and (ids < 6561).all()
