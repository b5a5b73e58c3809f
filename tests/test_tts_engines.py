"""TTS engine registry + Dia engine + checkpoint merge tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.models.codecs import DACConfig, DACDecoder
from audiolab_tpu.models.dia import DiaConfig, DiaModel, tokenize_dialogue
from audiolab_tpu.pipelines.tts import DiaTTSEngine, register_default_backends


@pytest.fixture(scope="module")
def dia_engine():
    cfg = DiaConfig(dim_enc=32, dim_dec=32, n_layers_enc=1, n_layers_dec=1,
                    n_heads=4, n_codebooks=2, codebook_size=20,
                    max_text_len=32, max_audio_len=64)
    model = DiaModel(cfg)
    text = jnp.asarray(tokenize_dialogue("[S1] x"))[None]
    codes = jnp.zeros((1, 2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), text, codes)["params"]
    dcfg = DACConfig(dim=16, rates=(4, 2), n_q=2, codebook_size=20,
                     codebook_dim=4)
    dac = DACDecoder(dcfg)
    dp = dac.init(jax.random.PRNGKey(1), codes)["params"]
    return DiaTTSEngine(model, params, dac, dp, sr=8000, frames_per_word=4)


def test_dia_engine_generate(dia_engine):
    y, sr = dia_engine.generate("[S1] hello there [S2] hi", speed=1.0)
    assert sr == 8000 and len(y) > 0 and np.isfinite(y).all()


def test_register_default_backends(dia_engine):
    from audiolab_tpu.serve import tts_api

    tts_api._BACKENDS.clear()
    register_default_backends(tts_api, zonos=None, dia=dia_engine)
    assert set(tts_api._BACKENDS) == {"dia", "chatterbox"}


def test_merge_models(tmp_path):
    from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn
    from audiolab_tpu.train.checkpoint import export_generator, load_generator, merge_models
    from tests.test_train import tiny_cfg

    cfg = tiny_cfg()
    model = SynthesizerTrn(cfg)

    def init_params(seed):
        return model.init(
            {"params": jax.random.PRNGKey(seed)}, jnp.zeros((1, 8, 32)),
            jnp.full((1,), 8, jnp.int32), jnp.ones((1, 8), jnp.int32),
            jnp.full((1, 8), 200.0), jnp.zeros((1,), jnp.int32), None,
            method=SynthesizerTrn.infer)["params"]

    pa, pb = init_params(0), init_params(1)
    a = export_generator(str(tmp_path / "a.npz"), pa, cfg)
    b = export_generator(str(tmp_path / "b.npz"), pb, cfg)
    m = merge_models(a, b, str(tmp_path / "m.npz"), alpha=0.25)
    pm, _ = load_generator(m)
    k = "emb_g"
    expected = 0.25 * np.asarray(pa[k]["embedding"]) + 0.75 * np.asarray(pb[k]["embedding"])
    np.testing.assert_allclose(pm[k]["embedding"], expected, rtol=1e-6)


# ---------------------------------------------------- XTTS / Chatterbox

def test_xtts_engine_generates_and_clones():
    """XTTS-class: distinct stack (GPT over VQ codes + BigVGAN), voice
    cloning from reference audio changes the output."""
    import numpy as np

    from audiolab_tpu.pipelines.tts import random_xtts

    eng = random_xtts()
    wav, sr = eng.generate("hello world", seed=1)
    assert sr == 24000 and wav.ndim == 1 and len(wav) > 1000
    assert np.isfinite(wav).all()

    ref = (0.2 * np.sin(2 * np.pi * 150 * np.arange(24000) / 24000)
           ).astype(np.float32)
    eng.add_voice("alice", ref, 24000)
    assert "alice" in eng.voices
    wav2, _ = eng.generate("hello world", voice="alice", seed=1)
    assert not np.allclose(wav[: min(len(wav), len(wav2))],
                           wav2[: min(len(wav), len(wav2))])


def test_chatterbox_engine_exaggeration_knob():
    """random_chatterbox is the REAL checkpoint-faithful T3+S3Gen stack at
    tiny scale; the exaggeration scalar conditions the T3 LM through
    T3CondEnc.emotion_adv (logit-level check — at random init the flow's
    zero-init projection hides conditioning in the waveform)."""
    import jax.numpy as jnp
    import numpy as np

    from audiolab_tpu.models.chatterbox_t3 import T3
    from audiolab_tpu.pipelines.tts import random_chatterbox

    eng = random_chatterbox()
    w1, sr = eng.generate("test sentence", seed=2, exaggeration=0.1,
                          cfg_weight=0.0)
    assert sr == 24000 and np.isfinite(w1).all() and len(w1) > 0

    c = eng.t3_cfg
    t3 = T3(c, max_seq_len=256)
    ids = jnp.zeros((1, 4), jnp.int32)
    speech = jnp.zeros((1, 2), jnp.int32)
    spk = jnp.zeros((1, c.speaker_embed_size))

    def logits(ex):
        _, sl = t3.apply({"params": eng.t3_params}, ids, speech, spk,
                         None, jnp.asarray([ex]))
        return np.asarray(sl)

    assert not np.allclose(logits(0.1), logits(0.9))


def test_four_distinct_engines_registered():
    """register_default_backends wires 4 DISTINCT engines when provided
    (reference layouts/tts.py:570)."""
    from audiolab_tpu.pipelines.tts import (
        random_chatterbox,
        random_xtts,
        register_default_backends,
    )
    from audiolab_tpu.serve import tts_api

    saved = dict(tts_api._BACKENDS)
    try:
        tts_api._BACKENDS.clear()
        x, cb = random_xtts(), random_chatterbox()
        register_default_backends(tts_api, zonos=object(), dia=object(),
                                  xtts=x, chatterbox=cb)
        b = tts_api._BACKENDS
        assert set(b) >= {"zonos", "coqui", "dia", "chatterbox"}
        assert b["coqui"] is x and b["chatterbox"] is cb
        assert len({id(v) for v in b.values()}) == 4
    finally:
        tts_api._BACKENDS.clear()
        tts_api._BACKENDS.update(saved)


def test_xtts_gpt2_generate_to_audio():
    """Converted-layout XTTS decode: text -> AR mel codes -> final-norm
    latents -> HiFi decoder audio; deterministic per rng."""
    import numpy as np

    from audiolab_tpu.models.xtts import (
        XttsGPT2,
        XttsHifiganDecoder,
        xtts_gpt2_generate,
    )

    model = XttsGPT2(layers=2, dim=32, heads=2, n_text=20, n_audio=26,
                     max_text=8, max_mel=12, start_text=18, stop_text=0)
    b = 2
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(0, 20, (b, 5)))
    cond = jnp.asarray(rng.standard_normal((b, 3, 32)), jnp.float32) * 0.3
    params = model.init(jax.random.PRNGKey(0), text,
                        jnp.zeros((b, 4), jnp.int32), cond)["params"]
    codes, lat, lengths = xtts_gpt2_generate(
        model, params, text, cond, max_steps=8, rng=jax.random.PRNGKey(7))
    assert codes.shape == (b, 8) and lat.shape == (b, 8, 32)
    assert lengths.shape == (b,)
    assert int(codes.max()) < 26
    # latents past the first EOS are zero-masked (no post-stop junk tail)
    for r in range(b):
        n = int(lengths[r])
        if n < 8:
            assert bool(jnp.all(lat[r, n:] == 0.0))
    c2, l2, _ = xtts_gpt2_generate(model, params, text, cond, max_steps=8,
                                   rng=jax.random.PRNGKey(7))
    assert bool(jnp.all(codes == c2)) and bool(jnp.all(lat == l2))
    dec = XttsHifiganDecoder(input_dim=32, cond_dim=16, initial_channel=32)
    g = jnp.asarray(rng.standard_normal((b, 16)), jnp.float32) * 0.3
    dp = dec.init(jax.random.PRNGKey(1), lat, g)["params"]
    wav = dec.apply({"params": dp}, lat, g)
    assert wav.shape == (b, 8 * 256) and bool(jnp.all(jnp.isfinite(wav)))


def test_xtts_checkpoint_engine_clone():
    """Full converted-layout XTTS-v2 facade: 7 s reference (2 conditioning
    chunks) -> cloned synthesis at 24 kHz; deterministic and
    reference-sensitive."""
    import numpy as np

    from audiolab_tpu.pipelines.tts import random_xtts_checkpoint

    eng = random_xtts_checkpoint()
    sr = 22050
    t = np.arange(int(sr * 7.0)) / sr
    ref = (0.3 * np.sin(2 * np.pi * 200 * t)
           * (1 + 0.2 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    wav, out_sr = eng.synthesize("hello there", ref_wav=ref, ref_sr=sr,
                                 max_steps=12)
    assert out_sr == 24000 and wav.ndim == 1 and np.isfinite(wav).all()
    wav2, _ = eng.synthesize("hello there", ref_wav=ref, ref_sr=sr,
                             max_steps=12)
    assert np.array_equal(wav, wav2)
    ref2 = (0.3 * np.sin(2 * np.pi * 700 * t)).astype(np.float32)
    wav3, _ = eng.synthesize("hello there", ref_wav=ref2, ref_sr=sr,
                             max_steps=12)
    assert not np.array_equal(wav, wav3)


def test_xtts_tokenizer_bpe_semantics():
    """XttsTokenizer: [lang] prefix + [SPACE] substitution + English
    number/abbreviation expansion, round-trip decode."""
    import json
    import tempfile

    from audiolab_tpu.pipelines.tts import XttsTokenizer, _int_words

    assert _int_words(21) == "twenty one"
    assert _int_words(2036) == "two thousand thirty six"
    vocab = {c: i for i, c in enumerate(
        ["[STOP]", "[UNK]", "[SPACE]", "[en]", "h", "e", "l", "o", "w",
         "r", "d", "t", "y", "n", "i", "s", "a", "m", "c", "g", "u", "x",
         "f", "v"])}
    tok_json = {
        "version": "1.0", "truncation": None, "padding": None,
        "added_tokens": [
            {"id": vocab[t], "content": t, "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False,
             "special": True}
            for t in ("[STOP]", "[UNK]", "[SPACE]", "[en]")],
        "normalizer": None, "pre_tokenizer": None, "post_processor": None,
        "decoder": None,
        "model": {"type": "BPE", "dropout": None, "unk_token": "[UNK]",
                  "continuing_subword_prefix": None,
                  "end_of_word_suffix": None, "fuse_unk": False,
                  "byte_fallback": False, "vocab": vocab, "merges": []},
    }
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(tok_json, f)
        path = f.name
    tok = XttsTokenizer(path)
    ids = tok.encode("Hello world", lang="en")
    assert ids[0] == vocab["[en]"] and vocab["[SPACE]"] in ids
    assert tok.decode(ids) == "[en]hello world"
    # "Dr." and "10" expand before BPE
    ids2 = tok.encode("Dr. who saw 10 cats", lang="en")
    assert tok.decode(ids2) == "[en]doctor who saw ten cats"
