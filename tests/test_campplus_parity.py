"""CAMPPlus checkpoint-layout parity vs the seeded 3D-Speaker-layout
replica (tests/torch_campplus_replica.py), plus the kaldi fbank
cross-check — the chatterbox s3gen.safetensors speaker_encoder."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiolab_tpu.models.campplus import CAMPPlus, CAMPPlusConfig  # noqa: E402
from audiolab_tpu.utils.convert import convert_campplus  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")

TINY = CAMPPlusConfig(feat_dim=16, embedding_size=12, growth_rate=4,
                      bn_size=2, init_channels=8, m_channels=4,
                      block_layers=(2, 3), block_kernels=(3, 3),
                      block_dilations=(1, 2), seg_len=5)


def _pair(seed=31):
    from tests.torch_campplus_replica import CAMPPlusReplica

    torch.manual_seed(seed)
    t_model = CAMPPlusReplica(feat_dim=16, embedding_size=12,
                              growth_rate=4, bn_size=2, init_channels=8,
                              block_layers=(2, 3), block_dilations=(1, 2),
                              m_channels=4).double().eval()
    for p in t_model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.15)
            p.copy_(p.float().double())
    for mod in t_model.modules():
        if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                mod.running_mean.copy_(
                    (torch.randn_like(mod.running_mean) * 0.1)
                    .float().double())
                mod.running_var.copy_(
                    (torch.rand_like(mod.running_var) + 0.5)
                    .float().double())
    f_model = CAMPPlus(TINY)
    tpl = jax.eval_shape(
        lambda: f_model.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 24, 16)))["params"])
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = convert_campplus(sd, tpl, strict=True)
    params = jax.tree.map(lambda a: a.astype(np.float64), params)
    return t_model, f_model, params


def test_campplus_parity():
    jax.config.update("jax_enable_x64", True)
    try:
        t_model, f_model, params = _pair()
        rng = np.random.default_rng(5)
        # t=23: odd length exercises the ceil-mode tail segment (seg 5)
        feat = rng.standard_normal((2, 23, 16))
        with torch.no_grad():
            ref = t_model(torch.from_numpy(feat)).numpy()
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(feat)))
        assert out.shape == ref.shape == (2, 12)
        np.testing.assert_allclose(out, ref, atol=1e-8)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_campplus_seg_multiple():
    """Exact segment multiple (no ceil tail)."""
    jax.config.update("jax_enable_x64", True)
    try:
        t_model, f_model, params = _pair(seed=7)
        rng = np.random.default_rng(9)
        feat = rng.standard_normal((1, 40, 16))
        with torch.no_grad():
            ref = t_model(torch.from_numpy(feat)).numpy()
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(feat)))
        np.testing.assert_allclose(out, ref, atol=1e-8)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_kaldi_fbank_parity():
    from audiolab_tpu.kernels.kaldi import kaldi_fbank
    from tests.torch_campplus_replica import torch_kaldi_fbank

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(3)
        wav = (rng.standard_normal(16000) * 0.3).astype(np.float64)
        ref = torch_kaldi_fbank(torch.from_numpy(wav)).numpy()
        out = np.asarray(kaldi_fbank(jnp.asarray(wav)[None])[0])
        assert out.shape == ref.shape == (98, 80)
        np.testing.assert_allclose(out, ref, atol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_campplus_xvector_shapes():
    from audiolab_tpu.models.campplus import campplus_xvector

    f_model = CAMPPlus(TINY)
    params = f_model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 24, 16)))["params"]
    wav = np.random.default_rng(0).standard_normal(8000).astype(np.float32)
    emb = campplus_xvector(params, wav, TINY)
    assert emb.shape == (12,) and np.isfinite(emb).all()
