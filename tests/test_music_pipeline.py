"""Music pipeline backend tests: stable-audio generate/variations/continue
and the /api/v1/audio/generate endpoint."""

import numpy as np
import pytest

from audiolab_tpu.pipelines.music import random_stable_audio


@pytest.fixture(scope="module")
def pipe():
    return random_stable_audio()


def test_generate(pipe):
    y, sr = pipe.generate("test tone", seconds_total=1.0, steps=2)
    assert sr == pipe.cfg.sr
    assert y.ndim == 1 and len(y) > 0 and np.isfinite(y).all()


def test_variations_and_continue(pipe):
    base = np.random.default_rng(0).standard_normal(pipe.cfg.sr).astype(np.float32) * 0.1
    v, sr = pipe.variations(base, "variation", strength=0.5, steps=2)
    assert np.isfinite(v).all()
    j, sr = pipe.continue_audio(base, "more", seconds_total=1.0, steps=2)
    assert len(j) > len(base)


def test_generate_endpoint(pipe):
    from audiolab_tpu.serve import music_api
    from audiolab_tpu.serve.http import Router

    router = Router()
    music_api.register_backend("stable_audio", pipe)
    music_api.register(router)
    code, resp = router.dispatch(
        "POST", "/api/v1/audio/generate",
        {"prompt": "bells", "settings": {"seconds_total": 1.0, "steps": 2}},
    )
    assert code == 200 and resp["format"] == "wav"
