"""Full-size v2-48k GAN train step: dp-sharding SHAPE check (no FLOPs).

The multi-chip dryrun (__graft_entry__.dryrun_multichip) exercises the
sharded step end-to-end at toy scale; this gate traces/lowers the step at
the REAL checkpoint scale (reference modules/rvc/configs/v2/48k.json:
segment_size 17280, feat 768, spec 1025) over the virtual 8-device dp
mesh — eval_shape/lower cost seconds and catch sharding-rule regressions
(a batch axis that stops dividing, a param that picks up a device axis)
that the toy dryrun cannot see.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from audiolab_tpu.models.rvc.discriminator import MultiPeriodDiscriminatorV2
from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn, config_for
from audiolab_tpu.train.rvc import (RVCTrainState, create_train_state,
                                    make_train_step)

BATCH, FRAMES = 8, 400  # reference train default batch, ~4 s spec window


def _state_shapes(cfg, batch, frames):
    """Abstract RVCTrainState at full scale — eval_shape'd init, no arrays."""

    def build(rng):
        return create_train_state(cfg, rng, batch_size=batch,
                                  spec_frames=frames)[0]

    return jax.eval_shape(build, jax.random.key(0))


def test_v2_48k_dp_train_step_lowers_at_full_scale():
    cfg = config_for(48000, "v2")
    assert cfg.segment_size == 17280  # configs/v2/48k.json
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("dp",))

    state_sds = _state_shapes(cfg, BATCH, FRAMES)
    gen, disc = SynthesizerTrn(cfg), MultiPeriodDiscriminatorV2()
    step = make_train_step(cfg, gen, disc, mesh=mesh)

    f32, i32 = jnp.float32, jnp.int32
    sd = jax.ShapeDtypeStruct
    batch_sds = dict(
        phone=sd((BATCH, FRAMES, cfg.feat_channels), f32),
        phone_lengths=sd((BATCH,), i32),
        pitch=sd((BATCH, FRAMES), i32),
        pitchf=sd((BATCH, FRAMES), f32),
        spec=sd((BATCH, FRAMES, cfg.spec_channels), f32),
        spec_lengths=sd((BATCH,), i32),
        wave=sd((BATCH, FRAMES * cfg.upp), f32),
        sid=sd((BATCH,), i32),
    )
    rng_sd = sd((2,), jnp.uint32)

    # .lower() runs the FULL trace + SPMD sharding propagation at the real
    # scale without invoking the backend compiler
    lowered = step.lower(state_sds, batch_sds, rng_sd)
    assert lowered is not None

    out_state, metrics = jax.eval_shape(step, state_sds, batch_sds, rng_sd)
    assert isinstance(out_state, RVCTrainState)
    # params/opt stay replicated; every metric reduces to a scalar
    chex_tree = jax.tree.leaves(out_state.g_params)
    assert all(l.shape == r.shape for l, r in zip(
        chex_tree, jax.tree.leaves(state_sds.g_params)))
    for name, m in metrics.items():
        assert m.shape == (), name


def test_v2_48k_batch_must_divide_dp_mesh():
    """A batch that does not divide the dp axis must fail loudly at
    lowering — silent revert to replication would destroy scaling."""
    cfg = config_for(48000, "v2")
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("dp",))
    gen, disc = SynthesizerTrn(cfg), MultiPeriodDiscriminatorV2()
    step = make_train_step(cfg, gen, disc, mesh=mesh)
    state_sds = _state_shapes(cfg, BATCH, 64)

    f32, i32 = jnp.float32, jnp.int32
    sd = jax.ShapeDtypeStruct
    bad = dict(
        phone=sd((3, 64, cfg.feat_channels), f32),
        phone_lengths=sd((3,), i32),
        pitch=sd((3, 64), i32),
        pitchf=sd((3, 64), f32),
        spec=sd((3, 64, cfg.spec_channels), f32),
        spec_lengths=sd((3,), i32),
        wave=sd((3, 64 * cfg.upp), f32),
        sid=sd((3,), i32),
    )
    with pytest.raises(ValueError):
        step.lower(state_sds, bad, sd((2,), jnp.uint32))
