"""ChatterboxCheckpointEngine end-to-end smoke: text -> T3 scan decode
(CFG + repetition penalty) -> speech tokens -> S3Gen flow+HiFT -> wav,
at tiny scale with random weights (the converters fill real
ve/t3_cfg/s3gen safetensors; parity lives in test_chatterbox_parity /
test_s3gen_parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.chatterbox_s3gen import (CausalMaskedDiffWithXvec,
                                                  HiFTGenerator)
from audiolab_tpu.models.chatterbox_t3 import T3, T3CkptConfig, t3_generate
from audiolab_tpu.pipelines.tts import (ChatterboxCheckpointEngine,
                                        chatterbox_punc_norm)
from tests.test_s3gen_parity import TINY_FLOW, TINY_HIFT

TINY_T3 = T3CkptConfig(text_vocab=40, speech_vocab=36, dim=32, n_layers=2,
                       n_heads=4, ffn_dim=64, max_text_tokens=64,
                       max_speech_tokens=64, speaker_embed_size=8,
                       perceiver_tokens=4, perceiver_heads=2,
                       start_text_token=38, stop_text_token=0,
                       start_speech_token=30, stop_speech_token=31)


def _engine():
    t3 = T3(TINY_T3, max_seq_len=256)
    t3_p = t3.init(jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32),
                   jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 8)),
                   jnp.zeros((1, 2), jnp.int32), jnp.zeros((1,)))["params"]
    flow = CausalMaskedDiffWithXvec(TINY_FLOW)
    flow_p = flow.init(jax.random.PRNGKey(1), jnp.zeros((1, 3), jnp.int32),
                       jnp.zeros((1, 12)), None,
                       jnp.zeros((1, 6, 8)))["params"]
    hift = HiFTGenerator(TINY_HIFT)
    hift_p = hift.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 8)),
                       jax.random.PRNGKey(3))["params"]
    return ChatterboxCheckpointEngine(TINY_T3, t3_p, TINY_FLOW, flow_p,
                                      TINY_HIFT, hift_p)


def test_punc_norm():
    assert chatterbox_punc_norm("hello world") == "Hello world."
    assert chatterbox_punc_norm("Hi there!") == "Hi there!"
    assert chatterbox_punc_norm("a…b") == "A, b."
    assert chatterbox_punc_norm("") != ""


def test_t3_generate_stops_and_shapes():
    eng = _engine()
    ids = np.asarray([[38, 5, 6, 7, 0]], np.int32)
    toks = t3_generate(TINY_T3, eng.t3_params, ids, np.zeros(8, np.float32),
                       max_new_tokens=12, seed=0)
    assert toks.ndim == 2 and toks.shape[0] == 1
    assert toks.shape[1] <= 13
    assert (toks < TINY_T3.speech_vocab).all()
    assert not (toks == TINY_T3.stop_speech_token).any()


def test_synthesize_end_to_end():
    eng = _engine()
    wav, sr = eng.synthesize("test", max_tokens=6, seed=1)
    assert sr == 24000
    assert wav.ndim == 1 and wav.shape[0] > 0
    # mel->wav total upsample is 480; token->mel ratio 2
    assert wav.shape[0] % 480 == 0
    assert np.isfinite(wav).all()


def test_synthesize_with_builtin_ref_dict():
    eng = _engine()
    eng.builtin = {
        "speaker_emb": np.zeros(8, np.float32),
        "prompt_tokens": np.asarray([[1, 2]], np.int32),
        "ref_tokens": np.asarray([[3, 4]], np.int32),
        "ref_mel": np.zeros((1, 4, 8), np.float32),
        "ref_xvector": np.ones(12, np.float32),
    }
    wav, sr = eng.synthesize("prompted", max_tokens=5, seed=2)
    assert sr == 24000 and wav.shape[0] > 0 and np.isfinite(wav).all()


def test_synthesize_cloning_path():
    """ref audio -> VoiceEncoder spk emb + CAMPPlus xvector + S3
    tokenizer ref prompts -> synth."""
    from audiolab_tpu.models.campplus import CAMPPlus
    from audiolab_tpu.models.chatterbox_t3 import (VoiceEncoder,
                                                   VoiceEncoderConfig)
    from audiolab_tpu.models.s3tokenizer import (S3TokenizerConfig,
                                                 S3TokenizerV2)
    from tests.test_campplus_parity import TINY as TINY_CP

    eng = _engine()
    ve = VoiceEncoder(VoiceEncoderConfig())
    eng.ve_params = ve.init(jax.random.PRNGKey(7),
                            jnp.zeros((1, 20, 40)))["params"]
    eng.campplus_params = CAMPPlus(TINY_CP).init(
        jax.random.PRNGKey(8), jnp.zeros((1, 24, 16)))["params"]
    eng.campplus_cfg = TINY_CP
    # tiny S3 tokenizer emitting ids inside the flow vocab (30) so ref
    # prompts are consumable end to end
    st_cfg = S3TokenizerConfig(n_mels=128, n_state=32, n_head=4,
                               n_layer=1, n_ctx=256, fsmn_kernel=7,
                               fsq_dim=3)
    eng.s3tok_params = S3TokenizerV2(st_cfg).init(
        jax.random.PRNGKey(9), jnp.zeros((1, 20, 128)))["params"]
    eng.s3tok_cfg = st_cfg
    ref = np.random.default_rng(4).standard_normal(16000).astype(np.float32)
    spk, rd = eng.conditioning(ref, 16000)
    assert spk.shape == (256,) and rd["ref_xvector"].shape == (12,)
    assert rd["ref_tokens"].shape[1] > 0
    assert rd["ref_mel"].shape[1] == 2 * rd["ref_tokens"].shape[1]
    assert (rd["ref_tokens"] < 27).all()  # 3^3 fsq codes
    # the real checkpoint's T3 takes the 256-d VoiceEncoder embedding
    # directly; the tiny test config is 8-d, so feed the (spk, rd)
    # tuple path with a sliced embedding
    wav, sr = eng.synthesize("clone me", speaker_emb=(spk[:8], rd),
                             max_tokens=5, seed=3)
    assert sr == 24000 and wav.shape[0] > 0 and np.isfinite(wav).all()
