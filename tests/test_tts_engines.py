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
