"""MDX23C (TFC-TDF v3) parity vs the seeded torch replica with checkpoint
key names (audio-separator is not installed; the reference runs
MDX23C-8KFFT-InstVoc_HQ.ckpt and the DrumSep variant through it,
stem_separator.py:111,113,379-386,534-541)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiolab_tpu.models.separation.mdx23c import (  # noqa: E402
    MDX23CConfig,
    TFCTDFNetV3,
)
from audiolab_tpu.utils.convert import convert_mdx23c  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def _tiny_cfg(**kw) -> MDX23CConfig:
    base = dict(
        sample_rate=8000, n_fft=256, hop_length=64, dim_f=128,
        num_channels=2, num_subbands=2, num_scales=2, scale=(2, 2),
        num_blocks_per_scale=1, channels=8, growth=8,
        bottleneck_factor=2, norm="InstanceNorm", act="gelu",
        instruments=("Vocals", "Instrumental"), target_instrument=None)
    base.update(kw)
    return MDX23CConfig(**base)


def _run_parity(cfg, seed, atol=1e-7):
    from tests.torch_mdx23c_replica import TFC_TDF_net

    torch.manual_seed(seed)
    t_model = TFC_TDF_net(cfg).double().eval()
    with torch.no_grad():  # snap to f32-representable values
        for p in t_model.parameters():
            p.copy_(p.float().double())

    f_model = TFCTDFNetV3(cfg)
    n = f_model.good_length(0.25)
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(seed)
        mix = (rng.standard_normal((2, cfg.num_channels, n)) * 0.3)
        mix = mix.astype(np.float32).astype(np.float64)
        template = jax.eval_shape(
            lambda: f_model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.num_channels, n)))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_mdx23c(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(mix)).numpy()
        out = np.asarray(f_model.apply({"params": params}, jnp.asarray(mix)))
        if cfg.num_targets == 1:
            out = out[:, 0]
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=atol)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_mdx23c_full_parity_two_instruments():
    """InstVoc layout: two instruments, subbands, InstanceNorm, gelu."""
    _run_parity(_tiny_cfg(), seed=11)


def test_mdx23c_target_instrument_and_deeper_tdf():
    """target_instrument collapses the head to one source; 2 blocks per
    scale exercises the in_c != c first block of each TFC_TDF stack."""
    _run_parity(
        _tiny_cfg(num_blocks_per_scale=2, target_instrument="Vocals",
                  num_subbands=4, dim_f=64, n_fft=256), seed=13)


def test_mdx23c_member_end_to_end():
    """mdx23c_member separates through the ensemble engine on arbitrary
    lengths (framing pads to the net's divisibility constraint)."""
    from audiolab_tpu.pipelines.separate import StemSeparator, mdx23c_member

    cfg = _tiny_cfg()
    f_model = TFCTDFNetV3(cfg)
    n = f_model.good_length(0.25)
    params = f_model.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, cfg.num_channels, n)))["params"]
    member = mdx23c_member(params, cfg)
    rng = np.random.default_rng(5)
    audio = rng.standard_normal((2, 3 * 8000)).astype(np.float32) * 0.2
    sep = StemSeparator([member], sr=cfg.sample_rate, chunk_seconds=0.5,
                        overlap_seconds=0.1, device_batch=2)
    stems = sep.separate(audio)
    assert set(stems) >= {"vocals", "instrumental"}
    for s in stems.values():
        assert s.shape == audio.shape
        assert np.isfinite(s).all()
