"""Golden numerical tests against real torch (CPU) — validate the weight
converter's layout rules with actual torch layer semantics (SURVEY §4b:
golden tests vs the PyTorch reference).

Each test builds a torch layer, converts its weights through
utils/convert.extract, runs the flax equivalent, and compares outputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiolab_tpu.utils.convert import extract, fold_weight_norm  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def test_conv1d_layout_matches_torch():
    t_conv = torch.nn.Conv1d(4, 8, 5, padding=2)
    x = torch.randn(2, 4, 32)
    with torch.no_grad():
        ref = t_conv(x).numpy()

    sd = {k: v.numpy() for k, v in t_conv.state_dict().items()}
    kernel = extract("conv_w", "", {".weight": sd["weight"]})
    f_conv = nn.Conv(8, (5,), padding=[(2, 2)])
    params = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(sd["bias"])}
    out = f_conv.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(out.transpose(0, 2, 1), ref, atol=1e-5)


def test_linear_layout_matches_torch():
    t_lin = torch.nn.Linear(6, 3)
    x = torch.randn(5, 6)
    with torch.no_grad():
        ref = t_lin(x).numpy()
    sd = {k: v.numpy() for k, v in t_lin.state_dict().items()}
    out = jnp.asarray(x.numpy()) @ jnp.asarray(extract("dense_w", "", {".weight": sd["weight"]})) + sd["bias"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_conv_transpose_layout_matches_torch():
    """Validates the converter's convTwn_w rule (transpose + spatial flip)
    against real torch through the same VALID+crop scheme used by
    models/layers.ConvTranspose1d (pad = (k - s) // 2)."""
    k, s = 8, 4
    pad = (k - s) // 2
    t_ct = torch.nn.ConvTranspose1d(6, 3, k, stride=s, padding=pad)
    x = torch.randn(1, 6, 16)
    with torch.no_grad():
        ref = t_ct(x).numpy()
    sd = {k2: v.numpy() for k2, v in t_ct.state_dict().items()}
    kernel = extract("convTwn_w", "", {".weight": sd["weight"]})

    f_ct = nn.ConvTranspose(3, (k,), strides=(s,), padding="VALID")
    params = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(sd["bias"])}
    out = f_ct.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    out = np.asarray(out).transpose(0, 2, 1)[:, :, pad:-pad]
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_weight_norm_fold_matches_torch():
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 3))
    with torch.no_grad():
        effective = conv.weight.detach().numpy()  # g * v / ||v||
    sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    g = sd.get("weight_g", sd.get("parametrizations.weight.original0"))
    v = sd.get("weight_v", sd.get("parametrizations.weight.original1"))
    folded = fold_weight_norm(g, v, dim=0)
    np.testing.assert_allclose(folded, effective, atol=1e-6)


def test_layernorm_gamma_matches_torch():
    ln = torch.nn.LayerNorm(10)
    with torch.no_grad():
        ln.weight.mul_(1.7)
        ln.bias.add_(0.3)
    x = torch.randn(4, 10)
    with torch.no_grad():
        ref = ln(x).numpy()
    out = nn.LayerNorm(epsilon=1e-5).apply(  # torch LN eps
        {"params": {"scale": jnp.asarray(ln.weight.detach().numpy()),
                    "bias": jnp.asarray(ln.bias.detach().numpy())}},
        jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
