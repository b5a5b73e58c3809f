"""HTDemucs (demucs v4 hybrid transformer) parity vs the seeded torch
replica with checkpoint key names (the demucs package is not installed;
reference loads htdemucs_6s via audio-separator,
stem_separator.py:459,466)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiolab_tpu.models.separation.htdemucs import (  # noqa: E402
    HTDemucs,
    HTDemucsConfig,
)
from audiolab_tpu.utils.convert import convert_htdemucs  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def _tiny_cfg(**kw) -> HTDemucsConfig:
    base = dict(
        sources=("vocals", "other"), audio_channels=2, channels=4,
        growth=2, nfft=128, depth=2, kernel_size=8, stride=4,
        norm_starts=4, norm_groups=2, dconv_depth=2, dconv_comp=2,
        bottom_channels=8, t_layers=3, t_heads=2, t_hidden_scale=2.0,
        segment_seconds=1.0, samplerate=800)
    base.update(kw)
    return HTDemucsConfig(**base)


@pytest.mark.parametrize("norm_starts", [4, 0])
def test_htdemucs_full_parity(norm_starts):
    """Full forward parity in fp64.  norm_starts=4 is the published
    config's no-GroupNorm regime; norm_starts=0 exercises the GroupNorm
    branches of HEnc/HDecLayer too."""
    from tests.torch_htdemucs_replica import HTDemucs as TorchHTDemucs

    cfg = _tiny_cfg(norm_starts=norm_starts)
    torch.manual_seed(21 + norm_starts)
    t_model = TorchHTDemucs(cfg).double().eval()
    # nudge LayerScale gammas off their init so they participate
    with torch.no_grad():
        for p_name, p in t_model.named_parameters():
            if p_name.endswith(("gamma_1.scale", "gamma_2.scale", ".6.scale")):
                p.add_(torch.randn_like(p) * 0.05)

    f_model = HTDemucs(cfg)
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(8)
        mix = rng.standard_normal((1, 2, 800)) * 0.3
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 2, 800)))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_htdemucs(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(mix)).numpy()
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(mix)))
        assert out.shape == ref.shape == (1, 2, 2, 800)
        np.testing.assert_allclose(out, ref, atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_htdemucs_short_input_pads_to_segment():
    """Inputs below the training segment pad up and trim back
    (htdemucs.py use_train_segment inference path)."""
    from tests.torch_htdemucs_replica import HTDemucs as TorchHTDemucs

    cfg = _tiny_cfg()
    torch.manual_seed(31)
    t_model = TorchHTDemucs(cfg).double().eval()
    f_model = HTDemucs(cfg)
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(9)
        mix = rng.standard_normal((1, 2, 500)) * 0.3
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 2, 500)))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_htdemucs(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(mix)).numpy()
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(mix)))
        assert out.shape == ref.shape == (1, 2, 2, 500)
        np.testing.assert_allclose(out, ref, atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_htdemucs_member_multistem():
    """htdemucs_member drives StemSeparator.separate_multistem end-to-end:
    six named stems, reconstruction residual folded into 'other'."""
    from audiolab_tpu.pipelines.separate import StemSeparator, htdemucs_member

    cfg = _tiny_cfg(
        sources=("drums", "bass", "other", "vocals", "guitar", "piano"))
    model_member_params = HTDemucs(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 800)))["params"]
    member = htdemucs_member(model_member_params, cfg)
    sep = StemSeparator([member], sr=800, chunk_seconds=1.0,
                        overlap_seconds=0.25, device_batch=2)
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal((2, 1600)) * 0.3).astype(np.float32)
    stems = sep.separate_multistem(audio, member)
    assert set(stems) >= {"drums", "bass", "other", "vocals", "guitar",
                          "piano"}
    total = sum(stems[s] for s in
                ("drums", "bass", "other", "vocals", "guitar", "piano"))
    np.testing.assert_allclose(total, audio, atol=1e-3)
