"""k-diffusion-compatible samplers for v-objective latent diffusion.

The reference's Stable-Audio path samples with k-diffusion's
``sample_dpmpp_3m_sde`` over a polyexponential sigma schedule wrapped in a
``VDenoiser`` (stable_audio_tools/inference/sampling.py:330-386 sample_k
with sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500, rho=1.0 —
invoked from /root/reference/modules/stable_audio/model.py:277-289).  This
module reimplements those exact semantics on JAX:

  - :func:`sigmas_polyexponential` — k-diffusion
    ``get_sigmas_polyexponential``: sigma_i = exp(ramp_i^rho * (ln smax -
    ln smin) + ln smin) for ramp = linspace(1, 0, n), 0 appended.
  - :func:`v_denoiser` — k-diffusion ``external.VDenoiser`` scalings for a
    model trained on the v objective with t = atan(sigma) * 2/pi:
    c_skip = 1/(s^2+1), c_out = -s/sqrt(s^2+1), c_in = 1/sqrt(s^2+1).
  - :func:`sample_dpmpp_3m_sde` — DPM-Solver++(3M) SDE (Lu et al. 2022,
    k-diffusion formulation): exponential-integrator multistep in
    lambda = -ln sigma with eta-controlled stochastic churn.  k-diffusion
    draws the noise from a Brownian tree for cross-step-count
    reproducibility; the increments are unit Gaussians, reproduced here
    with jax.random (distribution-equivalent).

The whole trajectory runs as one ``lax.scan``; the multistep history
(denoised_1/denoised_2, h_1/h_2) rides in the carry with order ramp-up
masked by the step index.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def sigmas_polyexponential(n: int, sigma_min: float, sigma_max: float,
                           rho: float = 1.0) -> jnp.ndarray:
    ramp = np.linspace(1.0, 0.0, n) ** rho
    sig = np.exp(ramp * (math.log(sigma_max) - math.log(sigma_min))
                 + math.log(sigma_min))
    return jnp.asarray(np.concatenate([sig, [0.0]]), jnp.float32)


def v_denoiser(model_v_fn):
    """Wrap a v-prediction ``model_v_fn(x, t_01) -> v`` into a k-diffusion
    denoiser ``d(x, sigma) -> x0`` (external.VDenoiser)."""

    def denoise(x, sigma):
        c_skip = 1.0 / (sigma ** 2 + 1.0)
        c_out = -sigma / jnp.sqrt(sigma ** 2 + 1.0)
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
        t = jnp.arctan(sigma) / math.pi * 2.0
        return model_v_fn(x * c_in, t) * c_out + x * c_skip

    return denoise


def sample_dpmpp_3m_sde(denoise_fn, x: jnp.ndarray, sigmas: jnp.ndarray,
                        eta: float = 1.0, s_noise: float = 1.0,
                        rng: jax.Array | None = None) -> jnp.ndarray:
    """DPM-Solver++(3M) SDE; ``denoise_fn(x, sigma_scalar) -> x0_estimate``.

    ``sigmas`` is (n+1,) ending in 0; the final 0-sigma step returns the
    last denoised estimate, as in k-diffusion."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = int(sigmas.shape[0]) - 1

    def body(carry, i):
        x, d1, d2, h1, h2, rng = carry
        s_cur, s_next = sigmas[i], sigmas[i + 1]
        denoised = denoise_fn(x, s_cur)

        t, s = -jnp.log(s_cur), -jnp.log(jnp.maximum(s_next, 1e-20))
        h = s - t
        h_eta = h * (eta + 1.0)
        x_new = jnp.exp(-h_eta) * x - jnp.expm1(-h_eta) * denoised

        # third-order correction (needs two history points)
        r0 = h1 / h
        r1 = h2 / h
        d1_0 = (denoised - d1) / r0
        d1_1 = (d1 - d2) / r1
        d1c = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
        d2c = (d1_0 - d1_1) / (r0 + r1)
        phi_2 = jnp.expm1(-h_eta) / h_eta + 1.0
        phi_3 = phi_2 / h_eta - 0.5
        x3 = x_new + phi_2 * d1c - phi_3 * d2c
        # second-order correction (one history point)
        x2 = x_new + phi_2 * ((denoised - d1) / r0)

        x_new = jnp.where(i >= 2, x3, jnp.where(i >= 1, x2, x_new))

        if eta:
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(k, x.shape, x.dtype)
            x_new = x_new + (noise * s_next * s_noise
                             * jnp.sqrt(-jnp.expm1(-2.0 * h * eta)))

        # sigma_next == 0 (the final step): the solution is the denoised
        # estimate itself
        x_new = jnp.where(s_next > 0, x_new, denoised)
        return (x_new, denoised, d1, h, h1, rng), None

    # history starts as benign placeholders; the i>=1 / i>=2 masks keep
    # them out of the result until real values exist
    carry = (x, jnp.zeros_like(x), jnp.zeros_like(x),
             jnp.ones(()), jnp.ones(()), rng)
    (x, _, _, _, _, _), _ = jax.lax.scan(body, carry, jnp.arange(n))
    return x
