"""StableAudioCheckpointPipeline end-to-end smoke on tiny random weights:
the published sampler path (dpmpp-3m-sde over polyexponential sigmas,
VDenoiser, zero-embed CFG with shared global seconds embedding —
stable_audio_tools sample_k / dit.py:324-410 semantics) produces finite
audio of the right geometry; the negative prompt replaces the null
embedding and changes the output; v-ddim stays available."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    from audiolab_tpu.models.stable_audio import NumberEmbedder
    from audiolab_tpu.models.stable_audio_dit import (
        OobleckConfig,
        OobleckDecoder,
        SAODiTConfig,
        StableAudioDiT,
    )
    from audiolab_tpu.models.t5 import T5Config, T5Encoder
    from audiolab_tpu.pipelines.music import StableAudioCheckpointPipeline
    from audiolab_tpu.utils.spm import build_model_proto

    dit_cfg = SAODiTConfig(io_channels=8, embed_dim=32, depth=2,
                           num_heads=2, cond_token_dim=16,
                           global_cond_dim=32)
    vae_cfg = OobleckConfig(out_channels=1, channels=8, latent_dim=8,
                            c_mults=(1, 2), strides=(2, 2))
    t5_cfg = T5Config(vocab_size=8, dim=16, d_kv=4, heads=2, d_ff=32,
                      layers=1)

    k0, k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 5)
    dit_p = StableAudioDiT(dit_cfg).init(
        k0, jnp.zeros((1, 4, 8)), jnp.zeros((1,)),
        jnp.zeros((1, 3, 16)), jnp.zeros((1, 32)))["params"]
    dec_p = OobleckDecoder(vae_cfg).init(
        k1, jnp.zeros((1, 4, 8)))["params"]
    t5_p = T5Encoder(t5_cfg).init(
        k2, jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4),
                                                   jnp.int32))["params"]
    ne = NumberEmbedder(features=16)
    ss_p = ne.init(k3, jnp.zeros((1,)))["params"]
    st_p = ne.init(k4, jnp.zeros((1,)))["params"]

    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2),
              ("▁", -2.0, 1), ("▁a", -1.0, 1), ("▁b", -1.5, 1)]
    model = tmp_path_factory.mktemp("spm") / "t5.model"
    model.write_bytes(build_model_proto(pieces, model_type=1, unk_id=2,
                                        bos_id=-1, eos_id=1, pad_id=0))
    return StableAudioCheckpointPipeline(
        dit_p, dec_p, t5_p, ss_p, st_p, str(model),
        dit_cfg=dit_cfg, vae_cfg=vae_cfg, t5_cfg=t5_cfg,
        sr=400, max_seconds=2.0)


def test_generate_dpmpp(pipe):
    y, sr = pipe.generate("a b", seconds_total=1.0, steps=6, seed=0)
    assert sr == 400
    hop = 4
    assert y.shape == (round(1.0 * 400 / hop) * hop,)
    assert np.isfinite(y).all()
    y2, _ = pipe.generate("a b", seconds_total=1.0, steps=6, seed=0)
    np.testing.assert_array_equal(y, y2)


def test_negative_prompt_changes_output(pipe):
    base, _ = pipe.generate("a", seconds_total=1.0, steps=4, seed=1)
    neg, _ = pipe.generate("a", negative_prompt="b", seconds_total=1.0,
                           steps=4, seed=1)
    assert base.shape == neg.shape
    assert not np.allclose(base, neg)


def test_v_ddim_path(pipe):
    y, sr = pipe.generate("a", seconds_total=1.0, steps=4, seed=2,
                          sampler_type="v-ddim")
    assert np.isfinite(y).all() and len(y) > 0
