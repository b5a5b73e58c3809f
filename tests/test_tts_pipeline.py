"""Zonos TTS pipeline tests: emotion chunk parser, end-to-end synthesize
with random weights, speech API endpoint through the router."""

import numpy as np
import pytest

from audiolab_tpu.models.zonos import ZonosConfig
from audiolab_tpu.pipelines.tts import (
    EMOTIONS,
    ZonosTTSConfig,
    parse_emotion_chunks,
    random_zonos,
)


def test_parse_emotion_chunks():
    chunks = parse_emotion_chunks(
        "Hello there. [happiness] What a day! [sadness] Oh no."
    )
    assert [c[0] for c in chunks] == ["Hello there.", "What a day!", "Oh no."]
    assert chunks[0][1][-1] == 1.0                       # neutral default
    assert chunks[1][1][EMOTIONS.index("happiness")] == 1.0
    assert chunks[2][1][EMOTIONS.index("sadness")] == 1.0


def test_parse_plain_text_multi_sentence():
    chunks = parse_emotion_chunks("One. Two. Three.")
    assert len(chunks) == 3


@pytest.fixture(scope="module")
def tts():
    cfg = ZonosConfig(dim=32, n_layers=2, attn_every=2, n_heads=4, d_state=4,
                      n_codebooks=2, codebook_size=34, spk_dim=16)
    t = random_zonos(cfg)
    t.cfg = ZonosTTSConfig(max_seconds=0.25, frame_rate=16.0)
    return t


def test_synthesize_end_to_end(tts):
    audio, sr = tts.synthesize("hi there")
    assert sr == 44100
    assert audio.ndim == 1 and len(audio) > 0
    assert np.isfinite(audio).all()


def test_speaker_embedding_from_audio(tts):
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    e = tts.make_speaker_embedding(wav, 16000)
    assert e.shape == (16,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-3)


def test_speech_api_endpoint(tts):
    from audiolab_tpu.serve import tts_api
    from audiolab_tpu.serve.http import Router

    router = Router()
    tts_api.register_backend("zonos", tts)
    tts_api.register(router)
    code, resp = router.dispatch(
        "POST", "/api/v1/audio/speech", {"model": "zonos", "input": "test"}
    )
    assert code == 200
    assert resp["format"] == "wav" and len(resp["audio"]) > 100
    code, resp = router.dispatch("GET", "/api/v1/audio/speech/models", {})
    assert "zonos" in resp["loaded"]
