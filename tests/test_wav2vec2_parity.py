"""wav2vec2-CTC parity vs the INSTALLED transformers Wav2Vec2ForCTC (the
class behind WhisperX's alignment models — reference
layouts/transcribe.py:89-112), plus CTCWordAligner behavior."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tfm = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def test_wav2vec2_ctc_parity():
    """Full-stack logits parity (conv extractor + projection + pos-conv +
    post-LN encoder + lm_head) in fp64.  Conv stack is the standard
    512-wide 7-layer geometry (hardcoded on both sides); the transformer
    is shrunk.  atol 1e-6: the conv feature extractor runs ~7 cascaded
    VALID convs whose XLA reduce order differs from torch's."""
    torch.manual_seed(432)
    tcfg = tfm.Wav2Vec2Config(
        vocab_size=11, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        feat_extract_norm="group", conv_bias=False,
        do_stable_layer_norm=False, hidden_act="gelu",
        feat_extract_activation="gelu",
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, apply_spec_augment=False)
    t_model = tfm.Wav2Vec2ForCTC(tcfg).double().eval()

    from audiolab_tpu.models.hubert import HubertConfig
    from audiolab_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2CTC
    from audiolab_tpu.utils.convert import convert_wav2vec2

    fcfg = Wav2Vec2Config(
        vocab_size=11,
        encoder=HubertConfig(dim=64, ffn_dim=128, heads=4, layers=2))
    f_model = Wav2Vec2CTC(fcfg)

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(5)
        wav = (rng.standard_normal((1, 6400)) * 0.1)
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3200)))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_wav2vec2(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(wav)).logits.numpy()
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(wav)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_ctc_word_aligner_structure():
    """Aligner output contract: one entry per word, monotonic
    non-overlapping spans inside [start, end]+frame, deterministic."""
    from audiolab_tpu.models.wav2vec2 import random_ctc_aligner

    al = random_ctc_aligner(seed=3, vocab_size=32, layers=1)
    rng = np.random.default_rng(0)
    sr = 16000
    audio = (rng.standard_normal(sr * 2) * 0.1).astype(np.float32)
    words = ["hello", "brave", "new", "world"]
    out1 = al.align_words(audio, sr, 0.1, 1.9, words)
    out2 = al.align_words(audio, sr, 0.1, 1.9, words)
    assert [w["word"] for w in out1] == words
    assert out1 == out2
    prev_end = 0.0
    for w in out1:
        assert 0.1 - 1e-6 <= w["start"] < w["end"] <= 1.9 + 0.05
        assert w["start"] >= prev_end - 0.021  # token spans don't overlap
        prev_end = w["end"]


def test_ctc_word_aligner_short_segment_falls_back():
    from audiolab_tpu.models.wav2vec2 import random_ctc_aligner

    al = random_ctc_aligner(seed=3, vocab_size=32, layers=1)
    audio = np.zeros(16000, np.float32)
    out = al.align_words(audio, 16000, 0.5, 0.51, ["hi"])
    assert len(out) == 1 and out[0]["word"] == "hi"
