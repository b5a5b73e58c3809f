"""k-diffusion sampler fidelity (models/ksampler.py) vs an in-test torch
replica of the published algorithms: get_sigmas_polyexponential,
external.VDenoiser, and DPM-Solver++(3M) SDE as configured by the
reference's Stable-Audio path (stable_audio_tools sample_k:
sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500, rho=1)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from audiolab_tpu.models.ksampler import (
    sample_dpmpp_3m_sde,
    sigmas_polyexponential,
    v_denoiser,
)

import pytest

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def _torch_sigmas_polyexp(n, smin, smax, rho=1.0):
    ramp = torch.linspace(1, 0, n) ** rho
    sig = torch.exp(ramp * (math.log(smax) - math.log(smin))
                    + math.log(smin))
    return torch.cat([sig, sig.new_zeros(1)])


def _torch_dpmpp_3m_sde(model, x, sigmas, eta=0.0):
    """k-diffusion sample_dpmpp_3m_sde with a zero noise sampler
    (eta=0 -> fully deterministic), written independently."""
    denoised_1 = denoised_2 = None
    h_1 = h_2 = None
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        if sigmas[i + 1] == 0:
            x = denoised
        else:
            t, s = -sigmas[i].log(), -sigmas[i + 1].log()
            h = s - t
            h_eta = h * (eta + 1)
            x = torch.exp(-h_eta) * x + (-h_eta).expm1().neg() * denoised
            if h_2 is not None:
                r0, r1 = h_1 / h, h_2 / h
                d1_0 = (denoised - denoised_1) / r0
                d1_1 = (denoised_1 - denoised_2) / r1
                d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
                d2 = (d1_0 - d1_1) / (r0 + r1)
                phi_2 = h_eta.neg().expm1() / h_eta + 1
                phi_3 = phi_2 / h_eta - 0.5
                x = x + phi_2 * d1 - phi_3 * d2
            elif h_1 is not None:
                r = h_1 / h
                d = (denoised - denoised_1) / r
                phi_2 = h_eta.neg().expm1() / h_eta + 1
                x = x + phi_2 * d
        denoised_1, denoised_2 = denoised, denoised_1
        h_1, h_2 = h, h_1
    return x


def test_polyexponential_sigmas():
    got = np.asarray(sigmas_polyexponential(100, 0.3, 500.0))
    want = _torch_sigmas_polyexp(100, 0.3, 500.0).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5)
    assert got[0] == np.float32(500.0) and got[-1] == 0.0
    assert abs(got[-2] - 0.3) < 1e-5


def test_vdenoiser_scalings():
    """VDenoiser: d = model(x*c_in, atan(s)*2/pi)*c_out + x*c_skip."""
    captured = {}

    def model_v(x, t):
        captured["t"] = float(t) if np.ndim(t) == 0 else float(np.asarray(t))
        captured["x"] = np.asarray(x)
        return 2.0 * x

    d = v_denoiser(model_v)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 3)),
                    jnp.float32)
    s = 5.0
    got = np.asarray(d(x, jnp.asarray(s)))
    c_skip = 1 / (s * s + 1)
    c_out = -s / math.sqrt(s * s + 1)
    c_in = 1 / math.sqrt(s * s + 1)
    want = (2.0 * np.asarray(x) * c_in) * c_out + np.asarray(x) * c_skip
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert captured["t"] == np.float32(math.atan(s) / math.pi * 2)
    np.testing.assert_allclose(captured["x"], np.asarray(x) * c_in,
                               rtol=1e-6)


def test_dpmpp_3m_sde_matches_torch_eta0():
    """Deterministic (eta=0) 3M trajectory parity with the torch replica
    over an affine 'denoiser' — exercises the 1st/2nd/3rd-order ramp-up
    and the final zero-sigma step."""
    rng = np.random.default_rng(1)
    shape = (1, 6, 4)
    x0 = rng.standard_normal(shape).astype(np.float32)
    w = rng.standard_normal(shape).astype(np.float32) * 0.05
    sig_t = _torch_sigmas_polyexp(12, 0.3, 500.0)

    def model_t(x, sigma):
        # x0-prediction toy model: pull toward a fixed target + small
        # sigma-dependent perturbation
        return torch.tensor(w) * x + torch.tensor(x0) * (
            1.0 / (1.0 + sigma))

    want = _torch_dpmpp_3m_sde(
        model_t, torch.tensor(x0) * sig_t[0], sig_t, eta=0.0).numpy()

    sig_j = sigmas_polyexponential(12, 0.3, 500.0)

    def model_j(x, sigma):
        return jnp.asarray(w) * x + jnp.asarray(x0) * (1.0 / (1.0 + sigma))

    got = np.asarray(sample_dpmpp_3m_sde(
        model_j, jnp.asarray(x0) * sig_j[0], sig_j, eta=0.0))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dpmpp_3m_sde_eta1_finite_and_seeded():
    sig = sigmas_polyexponential(8, 0.3, 500.0)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 5, 3)),
                    jnp.float32) * float(sig[0])

    def model(xx, s):
        return xx / (1.0 + s)

    a = np.asarray(sample_dpmpp_3m_sde(model, x, sig, eta=1.0,
                                       rng=jax.random.PRNGKey(7)))
    b = np.asarray(sample_dpmpp_3m_sde(model, x, sig, eta=1.0,
                                       rng=jax.random.PRNGKey(7)))
    c = np.asarray(sample_dpmpp_3m_sde(model, x, sig, eta=1.0,
                                       rng=jax.random.PRNGKey(8)))
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
