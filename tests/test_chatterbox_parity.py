"""Chatterbox T3 / voice-encoder checkpoint-layout parity.

The T3 backbone oracle is the INSTALLED transformers LlamaModel — the
same class the published chatterbox-tts package wraps (models/t3/t3.py)
— so ``tfmr.*`` naming and numerics are independent of this repo.  The
wrapper modules are checked against the seeded replica in
torch_chatterbox_replica.py which mirrors the published module layout."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiolab_tpu.models.chatterbox_t3 import (  # noqa: E402
    T3, T3CkptConfig, VoiceEncoder, VoiceEncoderConfig)
from audiolab_tpu.utils.convert import (  # noqa: E402
    convert_chatterbox_t3, convert_voice_encoder)

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def _snap_f32(model):
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(p.float().double())
    return model


def test_t3_teacher_forced_parity():
    from tests.torch_chatterbox_replica import T3Replica

    torch.manual_seed(402)
    t_model = _snap_f32(T3Replica().double().eval())
    cfg = T3CkptConfig(text_vocab=50, speech_vocab=90, dim=64, n_layers=2,
                       n_heads=4, ffn_dim=128, max_text_tokens=32,
                       max_speech_tokens=48, speaker_embed_size=16,
                       perceiver_tokens=8, perceiver_heads=4,
                       dtype="float64")
    f_model = T3(cfg, max_seq_len=128)

    rng = np.random.default_rng(7)
    text = rng.integers(1, 50, (2, 9))
    speech = rng.integers(0, 90, (2, 13))
    prompt = rng.integers(0, 90, (2, 6))
    spk = rng.standard_normal((2, 16)).astype(np.float32)
    emo = np.asarray([0.5, 0.9], np.float32)

    jax.config.update("jax_enable_x64", True)
    try:
        template = jax.eval_shape(
            lambda: f_model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                jnp.zeros((1, 5), jnp.int32), jnp.zeros((1, 16)),
                jnp.zeros((1, 3), jnp.int32), jnp.zeros((1,)))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_chatterbox_t3(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)

        with torch.no_grad():
            rt, rs = t_model(torch.from_numpy(text),
                             torch.from_numpy(speech),
                             torch.from_numpy(spk).double(),
                             torch.from_numpy(prompt),
                             torch.from_numpy(emo).double())
        ot, os_ = f_model.apply({"params": params}, jnp.asarray(text),
                                jnp.asarray(speech), jnp.asarray(spk),
                                jnp.asarray(prompt), jnp.asarray(emo))
        assert np.asarray(ot).shape == rt.numpy().shape
        # rope angles go through an fp32 cast on both sides -> 1e-5 floor
        np.testing.assert_allclose(np.asarray(ot), rt.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(os_), rs.numpy(), atol=2e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_t3_no_prompt_branch():
    """Without a speech prompt the cond prefix is [spk, emotion] only."""
    cfg = T3CkptConfig(text_vocab=20, speech_vocab=30, dim=32, n_layers=1,
                       n_heads=2, ffn_dim=64, max_text_tokens=16,
                       max_speech_tokens=16, speaker_embed_size=8,
                       perceiver_tokens=4, perceiver_heads=2)
    m = T3(cfg, max_seq_len=64)
    text = jnp.asarray([[1, 2, 3]])
    speech = jnp.asarray([[4, 5]])
    spk = jnp.zeros((1, 8))
    p = m.init(jax.random.PRNGKey(0), text, speech, spk,
               jnp.zeros((1, 2), jnp.int32), jnp.asarray([0.5]))["params"]
    lt, ls = m.apply({"params": p}, text, speech, spk, None, None)
    assert lt.shape == (1, 3, 20) and ls.shape == (1, 2, 30)


def test_t3_prefill_step_matches_forward():
    """Scan-decode path: prefill+step logits == teacher-forced logits."""
    from audiolab_tpu.models.chatterbox_t3 import t3_init_cache

    cfg = T3CkptConfig(text_vocab=20, speech_vocab=30, dim=32, n_layers=2,
                       n_heads=2, ffn_dim=64, max_text_tokens=16,
                       max_speech_tokens=16, speaker_embed_size=8,
                       perceiver_tokens=4, perceiver_heads=2,
                       start_speech_token=25)
    m = T3(cfg, max_seq_len=64)
    text = jnp.asarray([[1, 2, 3, 4]])
    spk = jax.random.normal(jax.random.PRNGKey(3), (1, 8))
    prompt = jnp.asarray([[7, 8, 9]])
    emo = jnp.asarray([0.7])
    speech = jnp.asarray([[cfg.start_speech_token, 11, 12, 13]])
    p = m.init(jax.random.PRNGKey(0), text, speech, spk, prompt,
               emo)["params"]

    # teacher-forced logits for positions after each speech token
    lt, ls = m.apply({"params": p}, text, speech, spk, prompt, emo)

    m2 = m
    caches = t3_init_cache(cfg, 1, 64)
    logits, caches, seqlen = m2.apply({"params": p}, text, spk, prompt, emo,
                                      caches, method=T3.prefill)
    np.testing.assert_allclose(np.asarray(logits[0, 0]), np.asarray(ls[0, 0]),
                               atol=2e-4)
    for i, tok in enumerate([11, 12, 13]):
        logits, caches = m2.apply(
            {"params": p}, jnp.asarray([[tok]]), jnp.asarray(i + 1),
            jnp.asarray([seqlen + i]), caches, method=T3.step)
        np.testing.assert_allclose(np.asarray(logits[0, 0]),
                                   np.asarray(ls[0, i + 1]), atol=2e-4)


def test_voice_encoder_parity():
    from tests.torch_chatterbox_replica import VoiceEncoderReplica

    torch.manual_seed(31)
    t_model = _snap_f32(VoiceEncoderReplica(n_mels=12, hidden=20, out=16,
                                            n_layers=3).double().eval())
    f_model = VoiceEncoder(VoiceEncoderConfig(n_mels=12, hidden=20, out=16,
                                              n_layers=3))
    mels = np.random.default_rng(5).standard_normal((3, 25, 12))
    jax.config.update("jax_enable_x64", True)
    try:
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 4, 12)))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_voice_encoder(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(mels)).numpy()
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(mels)))
        np.testing.assert_allclose(out, ref, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_utterance_embedding_shape():
    from audiolab_tpu.models.chatterbox_t3 import utterance_embedding

    cfg = VoiceEncoderConfig(n_mels=12, hidden=16, out=16, n_layers=1,
                             partial_frames=20)
    m = VoiceEncoder(cfg)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 12)))["params"]
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    emb = utterance_embedding(
        lambda mels: m.apply({"params": p}, mels), wav, 16000, cfg)
    assert emb.shape == (16,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)
