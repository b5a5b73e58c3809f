"""YuE tests: vocab layout, stage-1 interleaved generation with range
masking + CFG, stage-2 block upsampling, end-to-end generate_music."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.models.yue import YuEVocab, random_yue, stage2_generate


def test_vocab_layout():
    """Default layout == the published mm-v0.2 table
    (codecmanipulator.py:36-47)."""
    v = YuEVocab()
    assert v.special("eod") == 32000
    assert v.special("soa") == 32001
    assert v.special("eoa") == 32002
    assert v.special("stage1") == 32013
    assert v.special("xcodec") == 32016
    assert v.special("stage2") == 32017
    assert v.xcodec_base == 45334           # xcodec global_offset
    assert v.codebook_base(1) == 46358      # stage-2 mask lower bound
    assert v.codebook_base(8) == 53526      # stage-2 mask upper bound
    assert v.vocal_base == v.inst_base == v.xcodec_base  # interleaved cb0
    assert v.size == 83734                  # metadata.len


@pytest.fixture(scope="module")
def pipe():
    return random_yue()


def test_stage2_shapes(pipe):
    codes0 = jnp.asarray(
        np.random.default_rng(0).integers(0, 32, (2, 20)), jnp.int32
    )
    full = stage2_generate(pipe.s2, pipe.s2_params, codes0, pipe.cfg.vocab,
                           n_q=pipe.cfg.n_q, block=pipe.cfg.stage2_block)
    assert full.shape == (2, pipe.cfg.n_q, 20)
    # codebook 0 passes through unchanged
    np.testing.assert_array_equal(np.asarray(full[:, 0]), np.asarray(codes0))
    assert np.asarray(full).min() >= 0
    assert np.asarray(full[:, 1:]).max() < pipe.cfg.vocab.codebook_size


def test_generate_music_end_to_end(pipe):
    out = pipe.generate_music("pop upbeat", "la la la\n\nsecond verse",
                              n_segments=2, seed=0)
    assert out["sr"] == 16000
    for k in ("mix", "vocal", "inst"):
        assert np.isfinite(out[k]).all() and len(out[k]) > 0
    assert len(out["mix"]) == len(out["vocal"]) == len(out["inst"])
    assert np.abs(out["mix"]).max() <= 0.995


def test_serve_protocol(pipe):
    y, sr = pipe.generate("rock", lyrics="test", n_segments=1)
    assert sr == 16000 and np.isfinite(y).all()


def test_generate_with_vocos_head():
    from audiolab_tpu.models.yue import random_yue

    pipe = random_yue(with_vocos=True)
    out = pipe.generate_music("jazz", "doo wop", n_segments=1, seed=1)
    # vocos output rate = codec frame_rate * vocos hop
    assert out["sr"] == int(round(pipe.codec.cfg.frame_rate * pipe.vocos.cfg.hop))
    assert np.isfinite(out["mix"]).all() and len(out["mix"]) > 0


def test_yue_pipeline_xcodec_decode_path():
    """The checkpoint-faithful XCodecDecoder plugs into the pipeline."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiolab_tpu.models.codecs import XCodecConfig, XCodecDecoder
    from audiolab_tpu.models.yue import random_yue

    eng = random_yue()
    pipe = eng.pipeline if hasattr(eng, "pipeline") else eng
    xc = XCodecDecoder(XCodecConfig(n_q=pipe.cfg.n_q, codebook_size=16,
                                    dim=12, acoustic_dim=4, decoder_dim=16,
                                    rates=(2, 5)))
    pipe.xcodec = xc
    pipe.xcodec_params = xc.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, pipe.cfg.n_q, 4), jnp.int32))["params"]
    out = pipe.generate_music("pop", "la la la", n_segments=1,
                              seconds_per_segment=0.3)
    assert np.isfinite(out["mix"]).all()
    assert out["sr"] == int(round(pipe.codec.cfg.frame_rate * 10))


def test_stage1_reference_sampling_semantics(pipe):
    """The published model.generate args (infer.py:493-509) are live:
    tail-mode uncond row is exactly the last cond token, left pads are
    attention-masked via valid_from, repetition penalty + nucleus top_p
    shape the draw.  Determinism per seed; outputs stay in codebook
    range."""
    from audiolab_tpu.models.yue import stage1_generate

    prompt, valid_from = pipe._prompt("jazz", "la la la")
    t = prompt.shape[1]
    # tail uncond: one valid token, equal to the cond row's last token
    assert valid_from[1] == t - 1
    assert int(prompt[1, -1]) == int(prompt[0, -1])
    assert pipe.pcfg.uncond_mode == "tail"

    codes = stage1_generate(
        pipe.s1, pipe.s1_params, prompt, 6, pipe.cfg.vocab,
        cfg_scale=1.5, top_p=0.93, repetition_penalty=1.2,
        valid_from=valid_from, rng=jax.random.PRNGKey(3))
    assert codes.shape == (2, 6)
    assert int(codes.min()) >= 0
    assert int(codes.max()) < pipe.cfg.vocab.codebook_size
    codes2 = stage1_generate(
        pipe.s1, pipe.s1_params, prompt, 6, pipe.cfg.vocab,
        cfg_scale=1.5, top_p=0.93, repetition_penalty=1.2,
        valid_from=valid_from, rng=jax.random.PRNGKey(3))
    assert bool(jnp.all(codes == codes2))
    # pad masking is live: treating the pads as real context changes the
    # distribution the model sees
    codes3 = stage1_generate(
        pipe.s1, pipe.s1_params, prompt, 6, pipe.cfg.vocab,
        cfg_scale=1.5, top_p=0.93, repetition_penalty=1.2,
        valid_from=None, rng=jax.random.PRNGKey(3))
    assert not bool(jnp.all(codes == codes3))
