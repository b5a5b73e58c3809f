"""RTLA CRNN parity vs a seeded torch replica with the published
checkpoint's key names (reference modules/rtla/CRNN_model.py:63-160,
loaded from pretrained-model.safetensors by modules/rtla/utils.py:30-50)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


class TorchConvStack(nn.Module):
    """modules/rtla/CRNN_model.py:63-92 with the exact Sequential indices."""

    def __init__(self, input_features, output_features):
        super().__init__()
        self.cnn = nn.Sequential(
            nn.Conv2d(1, output_features // 16, (3, 3), padding=1),
            nn.BatchNorm2d(output_features // 16),
            nn.ReLU(),
            nn.Conv2d(output_features // 16, output_features // 16, (3, 3),
                      padding=1),
            nn.BatchNorm2d(output_features // 16),
            nn.ReLU(),
            nn.MaxPool2d((1, 2)),
            nn.Dropout(0.25),
            nn.Conv2d(output_features // 16, output_features // 8, (3, 3),
                      padding=1),
            nn.BatchNorm2d(output_features // 8),
            nn.ReLU(),
            nn.MaxPool2d((1, 2)),
            nn.Dropout(0.25),
        )
        self.fc = nn.Sequential(
            nn.Linear((output_features // 8) * (input_features // 4),
                      output_features),
            nn.Dropout(0.5),
        )

    def forward(self, data):
        x = self.cnn(data)
        x = x.transpose(1, 2).flatten(-2)
        return self.fc(x)


class TorchLSTMWrap(nn.Module):
    """CRNN_model.py:96-122 'BiLSTM' (actually uni-directional): the LSTM
    lives under ``self.rnn`` — that nesting is where the checkpoint's
    ``model.1.rnn.*`` key prefix comes from."""

    def __init__(self, input_features, recurrent_features):
        super().__init__()
        self.rnn = nn.LSTM(input_features, recurrent_features,
                           batch_first=True, bidirectional=False)

    def forward(self, x):
        return self.rnn(x)[0]


class TorchCRNN(nn.Module):
    def __init__(self, n_mels, num_lbl, complexity):
        super().__init__()
        ms = complexity * 16
        self.model = nn.Sequential(
            TorchConvStack(n_mels, ms),
            TorchLSTMWrap(ms, ms),
            nn.Linear(ms, num_lbl),
        )

    def forward(self, data):  # (N, 1, T, F)
        return self.model(data)


def test_rtla_crnn_parity():
    from audiolab_tpu.models.rtla import RtlaCRNN, RtlaCRNNConfig
    from audiolab_tpu.utils.convert import convert_rtla_crnn

    torch.manual_seed(2)
    n_mels, num_lbl, complexity = 66, 9, 2   # published mel count
    t_model = TorchCRNN(n_mels, num_lbl, complexity).double().eval()
    # randomize BN running stats so bnfold parity isn't vacuous
    g = torch.Generator().manual_seed(6)
    for mod in t_model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.add_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.3)
                mod.running_var.mul_(
                    torch.rand(mod.running_var.shape, generator=g) + 0.5)
    with torch.no_grad():   # snap to f32-representable for exact parity
        for p in t_model.parameters():
            p.copy_(p.float().double())
        for b in t_model.buffers():
            if b.dtype.is_floating_point:
                b.copy_(b.float().double())

    cfg = RtlaCRNNConfig(n_mels=n_mels, num_lbl=num_lbl,
                         model_complexity=complexity)
    f_model = RtlaCRNN(cfg)

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(1)
        feat = rng.standard_normal((2, 23, n_mels))
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 8, n_mels)))["params"])
        sd = {k: v.detach().numpy()
              for k, v in t_model.state_dict().items()
              if not k.endswith("num_batches_tracked")}
        params = convert_rtla_crnn(sd, template, strict=True)
        params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(feat)[:, None]).numpy()
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(feat)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_rtla_crnn_pt_bundle_load(tmp_path):
    """load_rtla_crnn_checkpoint reads the legacy .pt bundle layout
    ({model_state_dict, config, consts}, modules/rtla/utils.py:42-50)."""
    from audiolab_tpu.utils.convert import load_rtla_crnn_checkpoint

    t_model = TorchCRNN(66, 9, 2).eval()
    p = str(tmp_path / "pretrained-model.pt")
    torch.save({"model_state_dict": t_model.state_dict(),
                "config": {"n_mels": 66, "num_lbl": 9,
                           "model_complexity": 2},
                "consts": {}}, p)
    model, params = load_rtla_crnn_checkpoint(p)
    out = model.apply({"params": params}, jnp.zeros((1, 12, 66)))
    assert out.shape == (1, 12, 9)
    assert np.isfinite(np.asarray(out)).all()
