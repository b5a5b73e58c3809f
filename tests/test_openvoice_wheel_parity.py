"""OpenVoice tone-color converter parity against the ACTUAL openvoice_cli
package (the wheel the reference ships at wheels/openvoice_cli-0.0.6) as
the oracle — stronger than the seeded replica in torch_ref_models: the
converter consumes the real upstream module's state_dict and the flax
voice-conversion output must match (reference use:
modules/cloning/openvoice.py via openvoice_cli)."""

import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")

WHEEL = "/root/reference/wheels/openvoice_cli-0.0.6-py3-none-any.whl"


@pytest.fixture(scope="module")
def ovc(tmp_path_factory):
    d = tmp_path_factory.mktemp("ov_wheel")
    try:
        subprocess.run([sys.executable, "-m", "zipfile", "-e", WHEEL,
                        str(d)], check=True, capture_output=True)
    except Exception:
        pytest.skip("openvoice_cli wheel unavailable")
    sys.path.insert(0, str(d))
    try:
        from openvoice_cli.models import SynthesizerTrn
    except Exception as e:  # pragma: no cover
        pytest.skip(f"openvoice_cli import failed: {e}")
    yield SynthesizerTrn
    sys.path.remove(str(d))


def test_openvoice_wheel_full_parity(ovc):
    """Upstream SynthesizerTrn (n_speakers=0 -> the tone-converter branch
    with ref_enc, models.py:453) -> convert_openvoice -> flax
    ToneColorConverter: full spec -> converted-waveform path in fp64 at
    tau=0 (the deterministic posterior the conversion API uses)."""
    from audiolab_tpu.models.openvoice import (
        ToneColorConfig,
        ToneColorConverter,
    )
    from audiolab_tpu.utils.convert import convert_openvoice

    torch.manual_seed(77)
    t_model = ovc(
        n_vocab=0, spec_channels=129, inter_channels=8, hidden_channels=16,
        filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
        p_dropout=0.0, resblock="1",
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        upsample_rates=[4, 4, 2, 2], upsample_initial_channel=32,
        upsample_kernel_sizes=[8, 8, 4, 4], n_speakers=0,
        gin_channels=16).double().eval()
    with torch.no_grad():   # snap fp64 values to f32-representable
        for p in t_model.parameters():
            p.copy_(p.float().double())

    cfg = ToneColorConfig(sr=8000, n_fft=256, hop=64, spec_channels=129,
                          inter_channels=8, hidden_channels=16,
                          gin_channels=16, upsample_rates=(4, 4, 2, 2),
                          upsample_kernel_sizes=(8, 8, 4, 4),
                          upsample_initial_channel=32)
    f_model = ToneColorConverter(cfg)

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(78)
        spec = np.abs(rng.standard_normal((1, 12, 129))) * 0.5
        ref_a = np.abs(rng.standard_normal((1, 70, 129))) * 0.5
        ref_b = np.abs(rng.standard_normal((1, 70, 129))) * 0.5
        lengths = np.array([12], np.int64)

        template = jax.eval_shape(
            lambda: f_model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 8, 129), jnp.float64),
                jnp.full((1,), 8, jnp.int32),
                jnp.zeros((1, 9, 129), jnp.float64),
                jnp.zeros((1, 9, 129), jnp.float64)))["params"]
        sd = {k: v.detach().numpy()
              for k, v in t_model.state_dict().items()}
        params = convert_openvoice(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)

        with torch.no_grad():
            g_src = t_model.ref_enc(torch.from_numpy(ref_a)).unsqueeze(-1)
            g_tgt = t_model.ref_enc(torch.from_numpy(ref_b)).unsqueeze(-1)
            ref, _, _ = t_model.voice_conversion(
                torch.from_numpy(spec.transpose(0, 2, 1)),
                torch.from_numpy(lengths), g_src, g_tgt, tau=0.0)
        ref = ref.numpy()[:, 0]
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(spec),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(ref_a),
            jnp.asarray(ref_b)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_base_speaker_embeddings_load(ovc, tmp_path_factory):
    """The wheel bundles REAL base-speaker tone embeddings
    (checkpoints/base_speakers/ses/*.pth) — the only pretrained weights
    shipped in this environment; they must load as (gin, 1) vectors."""
    import glob
    import os

    root = None
    for p in sys.path:
        c = os.path.join(p, "openvoice_cli", "checkpoints",
                         "base_speakers", "ses")
        if os.path.isdir(c):
            root = c
            break
    if root is None:
        pytest.skip("ses embeddings not found")
    from audiolab_tpu.utils.convert import torch_load_weights

    files = sorted(glob.glob(os.path.join(root, "*.pth")))
    assert len(files) >= 10     # en-* variants + es/fr/jp/kr/zh
    for f in files[:3]:
        se = torch_load_weights(f)
        t = se if not isinstance(se, dict) else next(iter(se.values()))
        arr = np.asarray(t.float() if hasattr(t, "float") else t,
                         np.float32)
        assert arr.size == 256          # gin_channels of the published model
        assert np.isfinite(arr).all()
