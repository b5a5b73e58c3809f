"""DCAE (diffusers AutoencoderDC) parity vs the seeded torch replica in
torch_dcae_replica.py (diffusers itself is not installed in this image —
the replica mirrors diffusers/models/autoencoders/autoencoder_dc.py
op-for-op with checkpoint key names, so convert_dcae consumes a real
music_dcae_f8c8 state dict identically).  Reference use:
modules/acestep/acestep/music_dcae/music_dcae_pipeline.py:40,105."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiolab_tpu.models.dcae import AutoencoderDC, DCAEConfig  # noqa: E402
from audiolab_tpu.utils.convert import convert_dcae  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def _cfg(down: str, up: str) -> DCAEConfig:
    return DCAEConfig(
        in_channels=2, latent_channels=4, attention_head_dim=4,
        encoder_block_types=("ResBlock", "EfficientViTBlock"),
        encoder_block_out_channels=(8, 16),
        encoder_layers_per_block=(1, 2),
        encoder_qkv_multiscales=((), (5,)),
        decoder_block_types=("ResBlock", "EfficientViTBlock"),
        decoder_block_out_channels=(8, 16),
        decoder_layers_per_block=(2, 2),
        decoder_qkv_multiscales=((), (5,)),
        downsample_block_type=down, upsample_block_type=up)


@pytest.mark.parametrize("down,up", [("conv", "interpolate"),
                                     ("pixel_unshuffle", "pixel_shuffle")])
def test_dcae_roundtrip_parity(down, up):
    """Full encode+decode parity in fp64, both down/upsample modes.
    atol 1e-5: RMSNorm and the linear attention normalizer run through
    fp32 casts in the torch source (mirrored here)."""
    from tests.torch_dcae_replica import AutoencoderDC as TorchDCAE

    cfg = _cfg(down, up)
    torch.manual_seed(99 + len(down))
    t_model = TorchDCAE(cfg).double().eval()
    f_model = AutoencoderDC(cfg)

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 2, 16, 24)) * 0.5   # NCHW
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 8, 8, 2)))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_dcae(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)

        with torch.no_grad():
            z_ref = t_model.encoder(torch.from_numpy(x)).numpy()
            y_ref = t_model.decoder(torch.from_numpy(z_ref)).numpy()
        xf = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        z = f_model.apply({"params": params}, xf,
                          method=AutoencoderDC.encode)
        y = f_model.apply({"params": params}, z,
                          method=AutoencoderDC.decode)
        z_np = np.transpose(np.asarray(z), (0, 3, 1, 2))
        y_np = np.transpose(np.asarray(y), (0, 3, 1, 2))
        assert z_np.shape == z_ref.shape, (z_np.shape, z_ref.shape)
        np.testing.assert_allclose(z_np, z_ref, atol=1e-5)
        assert y_np.shape == y_ref.shape
        np.testing.assert_allclose(y_np, y_ref, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_dcae_quadratic_attention_parity():
    """Tiny spatial grid (N <= head_dim) exercises the quadratic-attention
    branch of SanaMultiscaleLinearAttention."""
    from tests.torch_dcae_replica import (
        SanaMultiscaleLinearAttention as TorchAttn,
    )

    from audiolab_tpu.models.dcae import SanaMultiscaleLinearAttention

    torch.manual_seed(7)
    t_attn = TorchAttn(16, 16, attention_head_dim=16,
                       kernel_sizes=(3,)).double().eval()
    f_attn = SanaMultiscaleLinearAttention(16, attention_head_dim=16,
                                           kernel_sizes=(3,))
    jax.config.update("jax_enable_x64", True)
    try:
        x = np.random.default_rng(1).standard_normal((1, 16, 2, 2))
        template = jax.eval_shape(
            lambda: f_attn.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 2, 2, 16)))["params"])
        from audiolab_tpu.utils.convert import fill_tree

        m = {}
        for q in ("to_q", "to_k", "to_v", "to_out"):
            m[f"{q}/kernel"] = ("dense_w", q)
        m["to_qkv_multiscale_0/proj_in/kernel"] = (
            "conv2_w", "to_qkv_multiscale.0.proj_in")
        m["to_qkv_multiscale_0/proj_out/kernel"] = (
            "conv2_w", "to_qkv_multiscale.0.proj_out")
        m["norm_out/weight"] = ("w", "norm_out")
        m["norm_out/bias"] = ("b", "norm_out")
        sd = {k: v.detach().numpy() for k, v in t_attn.state_dict().items()}
        params = fill_tree(template, m, sd, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_attn(torch.from_numpy(x)).numpy()
        out = np.asarray(f_attn.apply(
            {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
        np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref,
                                   atol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_config_from_json(tmp_path):
    import json

    cfgd = {"in_channels": 2, "latent_channels": 8,
            "encoder_block_out_channels": [64, 128],
            "encoder_layers_per_block": [2, 2],
            "encoder_qkv_multiscales": [[], [5]],
            "decoder_block_out_channels": [64, 128],
            "decoder_layers_per_block": [2, 2],
            "decoder_qkv_multiscales": [[], [5]],
            "downsample_block_type": "pixel_unshuffle"}
    (tmp_path / "config.json").write_text(json.dumps(cfgd))
    from audiolab_tpu.models.dcae import config_from_json, spatial_compression

    cfg = config_from_json(str(tmp_path))
    assert cfg.encoder_block_out_channels == (64, 128)
    assert cfg.encoder_qkv_multiscales == ((), (5,))
    assert cfg.downsample_block_type == "pixel_unshuffle"
    assert spatial_compression(cfg) == 2
