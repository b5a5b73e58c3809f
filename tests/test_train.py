"""RVC GAN train-step test on the virtual 8-device CPU mesh (SURVEY §4).

One combined test (tiny nets, 2 discriminator periods) — CPU compile of the
full 8-period stack is minutes-slow and adds nothing numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.core.mesh import local_mesh
from audiolab_tpu.models.rvc.synthesizer import SynthesizerConfig
from audiolab_tpu.train.rvc import create_train_state, make_train_step


def tiny_cfg():
    return SynthesizerConfig(
        spec_channels=129,
        segment_size=3840,  # 8 frames * upp(480)
        inter_channels=16,
        hidden_channels=16,
        filter_channels=32,
        n_heads=2,
        n_layers=1,
        upsample_initial_channel=32,
        spk_embed_dim=4,
        gin_channels=16,
        sr=48000,
        feat_channels=32,
    )


def make_batch(cfg, b=8, t=16, rng=None):
    rng = rng or np.random.default_rng(0)
    return dict(
        phone=jnp.asarray(rng.standard_normal((b, t, cfg.feat_channels)), jnp.float32),
        phone_lengths=jnp.full((b,), t, jnp.int32),
        pitch=jnp.asarray(rng.integers(1, 255, (b, t)), jnp.int32),
        pitchf=jnp.asarray(rng.uniform(80, 400, (b, t)), jnp.float32),
        spec=jnp.asarray(rng.standard_normal((b, t, cfg.spec_channels)) ** 2, jnp.float32),
        spec_lengths=jnp.full((b,), t, jnp.int32),
        wave=jnp.asarray(rng.standard_normal((b, t * cfg.upp)) * 0.1, jnp.float32),
        sid=jnp.zeros((b,), jnp.int32),
    )


def test_train_step_dp_sharded_two_steps():
    cfg = tiny_cfg()
    mesh = local_mesh(8)
    state, gen, disc = create_train_state(
        cfg, jax.random.PRNGKey(0), batch_size=8, spec_frames=16, periods=(2, 3)
    )
    step = make_train_step(cfg, gen, disc, mesh=mesh)
    batch = make_batch(cfg, b=8)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    m1 = {k: float(v) for k, v in metrics.items()}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    m2 = {k: float(v) for k, v in metrics.items()}
    for k, v in m2.items():
        assert np.isfinite(v), f"{k} not finite"
    assert int(state.step) == 2
    assert m2["loss_mel"] > 0
    # optimisation on a fixed batch should move the generator losses
    assert m1 != m2


@pytest.mark.slow  # two full compiles of the GAN step (~5 min on XLA:CPU)
def test_train_dp_sharding_is_semantically_invariant():
    """The dp=8 sharded step and the unsharded step must trace the SAME
    loss curve on the same data (sharding changes layout, not semantics) —
    the scaling gate VERDICT r4 item 6 asks for: curve over steps, not
    wall time.  Tolerance covers fp32 reduction-order drift only."""
    cfg = tiny_cfg()
    batch = make_batch(cfg, b=8)

    def run(mesh, steps=3):
        state, gen, disc = create_train_state(
            cfg, jax.random.PRNGKey(0), batch_size=8, spec_frames=16,
            periods=(2, 3))
        step = make_train_step(cfg, gen, disc, mesh=mesh)
        curve = []
        for _ in range(steps):
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
            curve.append({k: float(v) for k, v in metrics.items()})
        return curve

    sharded = run(local_mesh(8))
    unsharded = run(None)
    for s, u in zip(sharded, unsharded):
        for k in s:
            assert np.isfinite(s[k]) and np.isfinite(u[k])
            assert abs(s[k] - u[k]) <= 5e-3 * max(1.0, abs(u[k])), (
                f"{k}: sharded {s[k]} vs unsharded {u[k]}")
