"""Checkpoint-sampler fidelity for ACE-Step: the pieces that shape what
published weights actually see at inference (reference
modules/acestep/acestep/pipeline_ace_step.py:848-1330 text2music loop):

  - APG guidance exactly as apg_guidance.py:33-57 (momentum filter,
    per-channel norm clip over torch dims [-1,-2], projection onto
    PRED_COND) — verified against an in-test torch replica.
  - the shift-3 sigma schedule of the customized
    FlowMatchEulerDiscreteScheduler (set_timesteps:198-217).
  - the omega mean-shift Euler step (scheduler step:290-336,
    logistic(omega, L=0.9, U=1.1, k=0.1)).
  - the guidance interval (:1065-1066): CFG only on the middle fraction.
  - ERG temperature guidance: q_tau scaling equals scaling the q
    projection weights themselves (the forward-hook upstream registers on
    to_q / linear_q / SelfAttention.q outputs).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audiolab_tpu.models.acestep import acestep_sigmas, apg, fm_sample

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


# ------------------------------------------------------------ torch oracle

class _MomentumBuffer:
    def __init__(self, momentum=-0.75):
        self.momentum = momentum
        self.running_average = 0

    def update(self, value):
        self.running_average = value + self.momentum * self.running_average


def _torch_apg(pred_cond, pred_uncond, guidance_scale, buf,
               eta=0.0, norm_threshold=2.5, dims=(-1, -2)):
    """apg_guidance.apg_forward semantics, independently written."""
    diff = pred_cond - pred_uncond
    buf.update(diff)
    diff = buf.running_average
    n = diff.norm(p=2, dim=dims, keepdim=True)
    diff = diff * torch.minimum(torch.ones_like(diff), norm_threshold / n)
    v1 = torch.nn.functional.normalize(pred_cond.double(), dim=dims)
    par = (diff.double() * v1).sum(dim=dims, keepdim=True) * v1
    orth = diff.double() - par
    upd = (orth + eta * par).float()
    return pred_cond + (guidance_scale - 1.0) * upd


def test_apg_matches_torch_oracle():
    """Three successive guided steps (momentum accumulates) on the torch
    (b, c, h, t) layout vs ours on (b, t, c*h) with channels=c."""
    rng = np.random.default_rng(0)
    b, c, h, t = 2, 8, 16, 12
    buf = _MomentumBuffer()
    mom = jnp.zeros((b, t, c * h))
    for step in range(3):
        cond_t = torch.tensor(
            rng.standard_normal((b, c, h, t)), dtype=torch.float32)
        unc_t = torch.tensor(
            rng.standard_normal((b, c, h, t)), dtype=torch.float32)
        want = _torch_apg(cond_t, unc_t, 15.0, buf)
        # torch (b, c, h, t) -> ours (b, t, c*h)
        to_ours = lambda x: jnp.asarray(  # noqa: E731
            x.numpy().transpose(0, 3, 1, 2).reshape(b, t, c * h))
        got, mom = apg(to_ours(cond_t), to_ours(unc_t), 15.0, mom,
                       channels=c)
        got_t = np.asarray(got).reshape(b, t, c, h).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got_t, want.numpy(), atol=2e-4,
                                   rtol=1e-4)


def test_acestep_sigma_schedule():
    """shift-3 schedule: s' = 3s/(1+2s) over linspace(1, 1e-3, S), then 0
    appended (set_timesteps:198-217 with shift=3, train steps 1000)."""
    s = np.asarray(acestep_sigmas(60, 3.0))
    assert s.shape == (61,)
    base = np.linspace(1.0, 1.0 / 1000, 60)
    want = 3.0 * base / (1.0 + 2.0 * base)
    np.testing.assert_allclose(s[:-1], want, atol=1e-6)
    assert s[-1] == 0.0
    assert s[0] == pytest.approx(1.0)
    assert np.all(np.diff(s) < 0)


def test_omega_mean_shift_euler_step():
    """fm_sample's euler step with omega_scale: dx = dt*v mean-shifted by
    logistic(omega) (scheduler step:290-336).  Constant-velocity closure
    makes the result hand-computable."""
    b, t, f = 1, 3, 4
    v0 = np.arange(b * t * f, dtype=np.float32).reshape(b, t, f) / 10.0
    vfn = lambda z, tb: jnp.asarray(v0)  # noqa: E731
    sig = jnp.asarray([1.0, 0.4, 0.0])
    z0 = jnp.zeros((b, t, f))
    got = fm_sample(
        None, None, jnp.zeros((2 * b, 1, 1)), t, use_apg=False,
        guidance_scale=1.0, z_init=z0, sigmas=sig, omega_scale=10.0,
        velocity_cond_fn=vfn, velocity_uncond_fn=vfn)
    om = 0.9 + 0.2 / (1.0 + math.exp(-0.1 * 10.0))
    z = np.zeros((b, t, f), np.float32)
    for s_cur, s_next in [(1.0, 0.4), (0.4, 0.0)]:
        dx = (s_next - s_cur) * v0
        m = dx.mean()
        z = z + (dx - m) * om + m
    np.testing.assert_allclose(np.asarray(got), z, atol=1e-6)


def test_guidance_interval_phases():
    """4 uniform steps, interval 0.5 -> steps 1..2 guided, 0 and 3
    conditional-only (pipeline_ace_step.py:1065-1066 index math)."""
    b, t, f = 1, 2, 2
    ones = np.ones((b, t, f), np.float32)
    vc = lambda z, tb: jnp.asarray(ones)            # noqa: E731
    vu = lambda z, tb: jnp.asarray(-ones)           # noqa: E731
    sig = jnp.asarray([1.0, 0.75, 0.5, 0.25, 0.0])
    got = fm_sample(
        None, None, jnp.zeros((2 * b, 1, 1)), t, use_apg=False,
        guidance_scale=3.0, z_init=jnp.zeros((b, t, f)), sigmas=sig,
        guidance_interval=0.5, velocity_cond_fn=vc, velocity_uncond_fn=vu)
    # guided v = vu + 3 (vc - vu) = -1 + 6 = 5; cond-only v = 1
    want = -0.25 * (1 + 5 + 5 + 1) * ones
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_guidance_interval_decay_scales():
    """Linear decay inside the interval (:1200-1211): step scales follow
    guidance - (guidance-min)*progress*decay."""
    b, t, f = 1, 2, 2
    calls = []

    sig = jnp.asarray([1.0, 0.8, 0.6, 0.4, 0.2, 0.0])  # 5 steps, all guided
    vc = lambda z, tb: jnp.ones((b, t, f))     # noqa: E731
    vu = lambda z, tb: jnp.zeros((b, t, f))    # noqa: E731
    got = fm_sample(
        None, None, jnp.zeros((2 * b, 1, 1)), t, use_apg=False,
        guidance_scale=15.0, z_init=jnp.zeros((b, t, f)), sigmas=sig,
        guidance_interval=1.0, guidance_interval_decay=1.0,
        min_guidance_scale=3.0, velocity_cond_fn=vc, velocity_uncond_fn=vu)
    # guided v at step i = scale_i (since vu=0, vc=1); dt = -0.2 each
    scales = [15.0 - 12.0 * (i / 4) for i in range(5)]
    want = -0.2 * sum(scales) * np.ones((b, t, f), np.float32)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    del calls


# ------------------------------------------------------ ERG q-scaling

def _scale_tree(params, path, factor):
    """Return params with the Dense at ``path`` scaled (kernel and, when
    present, bias) — scaling a linear layer's weights == scaling its
    output, which is what upstream's forward hook does."""
    import copy

    p = copy.deepcopy(jax.tree.map(np.asarray, params))
    node = p
    for k in path[:-1]:
        node = node[k]
    leaf = node[path[-1]]
    leaf["kernel"] = leaf["kernel"] * factor
    if "bias" in leaf:
        leaf["bias"] = leaf["bias"] * factor
    return p


def test_dit_q_tau_equals_weight_scaling():
    from audiolab_tpu.pipelines.acestep import random_checkpoint_acestep

    pipe = random_checkpoint_acestep(seed=3)
    b, t = 1, 4
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((b, 2, 4, t)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((b, 3, 16)), jnp.float32)
    em = jnp.ones((b, 3))
    am = jnp.ones((b, t))
    ts = jnp.full((b,), 500.0)
    M = type(pipe.model)
    base = pipe.model.apply({"params": pipe.params}, lat, am, enc, em, ts,
                            method=M.decode, q_tau=0.01, q_tau_blocks=(0,))
    scaled = _scale_tree(
        _scale_tree(pipe.params, ("block_0", "attn", "to_q"), 0.01),
        ("block_0", "cross_attn", "to_q"), 0.01)
    want = pipe.model.apply({"params": scaled}, lat, am, enc, em, ts,
                            method=M.decode)
    np.testing.assert_allclose(np.asarray(base), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # and tau must actually change the output
    plain = pipe.model.apply({"params": pipe.params}, lat, am, enc, em, ts,
                             method=M.decode)
    assert not np.allclose(np.asarray(base), np.asarray(plain))


def test_conformer_q_tau_equals_weight_scaling():
    from audiolab_tpu.models.acestep_dit import LyricConformerEncoder

    enc = LyricConformerEncoder(dim=16, heads=2, ffn_dim=32, num_blocks=2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)
    mask = jnp.ones((1, 5))
    params = enc.init(jax.random.PRNGKey(0), x, mask)["params"]
    base = enc.apply({"params": params}, x, mask, q_tau=0.01,
                     q_tau_layers=(1,))
    scaled = _scale_tree(params, ("attn_1", "linear_q"), 0.01)
    want = enc.apply({"params": scaled}, x, mask)
    np.testing.assert_allclose(np.asarray(base), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_t5_q_tau_equals_weight_scaling():
    from audiolab_tpu.models.t5 import T5Config, T5Encoder

    cfg = T5Config(vocab_size=64, dim=16, d_kv=4, heads=2, d_ff=32,
                   layers=2)
    model = T5Encoder(cfg)
    ids = jnp.asarray([[3, 5, 7, 1]])
    mask = jnp.ones((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    base = model.apply({"params": params}, ids, mask, q_tau=0.01,
                       q_tau_layers=(1,))
    scaled = _scale_tree(params, ("attn_1", "q"), 0.01)
    want = model.apply({"params": scaled}, ids, mask)
    np.testing.assert_allclose(np.asarray(base), np.asarray(want),
                               atol=1e-6, rtol=1e-5)


def test_checkpoint_pcfg_defaults():
    """The checkpoint pipeline defaults mirror ACEStepPipeline.__call__
    (pipeline_ace_step.py:1425-1442)."""
    from audiolab_tpu.pipelines.acestep import checkpoint_pcfg

    p = checkpoint_pcfg()
    assert (p.steps, p.guidance_scale, p.shift, p.omega_scale,
            p.guidance_interval) == (60, 15.0, 3.0, 10.0, 0.5)
    assert p.use_erg_tag and p.use_erg_lyric and p.use_erg_diffusion
