"""PyanNet (pyannote segmentation-3.0) parity vs the seeded torch replica
with checkpoint key names (pyannote.audio is not installed; reference use
is modules/cloning/speaker_separation.py:39-45)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def test_pyannet_full_parity():
    from tests.torch_pyannet_replica import PyanNet as TorchPyanNet

    from audiolab_tpu.models.pyannet import PyanNet, PyanNetConfig
    from audiolab_tpu.utils.convert import convert_pyannet

    torch.manual_seed(11)
    t_model = TorchPyanNet(lstm_hidden=16, lstm_layers=2, linear_dim=12,
                           num_classes=7).double().eval()
    # perturb the sinc cutoffs so parity isn't tested at the mel init only
    with torch.no_grad():
        t_model.sincnet.conv1d[0].filterbank.low_hz_.add_(
            torch.randn_like(t_model.sincnet.conv1d[0].filterbank.low_hz_)
            * 10)
        t_model.sincnet.conv1d[0].filterbank.band_hz_.add_(
            torch.randn_like(t_model.sincnet.conv1d[0].filterbank.band_hz_)
            * 10)

    cfg = PyanNetConfig(lstm_hidden=16, lstm_layers=2, linear_dim=12)
    f_model = PyanNet(cfg)

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(4)
        wav = (rng.standard_normal((2, 8000)) * 0.2)
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 4000)))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()
              if not k.endswith(("window_", "n_"))}
        params = convert_pyannet(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(wav)[:, None, :]).numpy()
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(wav)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-8)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_powerset_to_multilabel():
    from audiolab_tpu.models.pyannet import powerset_to_multilabel

    lp = np.full((1, 4, 7), -10.0, np.float32)
    lp[0, 0, 0] = 0.0   # silence
    lp[0, 1, 2] = 0.0   # speaker 1
    lp[0, 2, 4] = 0.0   # speakers 0+1
    lp[0, 3, 6] = 0.0   # speakers 1+2
    ml = np.asarray(powerset_to_multilabel(jnp.asarray(lp)))
    np.testing.assert_array_equal(
        ml[0], [[0, 0, 0], [0, 1, 0], [1, 1, 0], [0, 1, 1]])


def test_pyannet_frame_rate():
    from audiolab_tpu.models.pyannet import PyanNet, PyanNetConfig

    cfg = PyanNetConfig(lstm_hidden=8, lstm_layers=1, linear_dim=8)
    m = PyanNet(cfg)
    wav = jnp.zeros((1, 16000))
    p = m.init(jax.random.PRNGKey(0), wav)["params"]
    out = m.apply({"params": p}, wav)
    assert cfg.frame_hop == 270
    # 1 s at 16 kHz -> about 58 frames after stride 10 + three pool(3)
    assert 50 <= out.shape[1] <= 60, out.shape
