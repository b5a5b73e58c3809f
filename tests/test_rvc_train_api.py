"""End-to-end REST RVC training: upload dataset -> async job -> polled to
completion -> model + index registered (layouts/rvc_train.py train1key
behind /api/v1/rvc/train, SURVEY §3.4)."""

import base64
import time

import numpy as np
import pytest

from audiolab_tpu.core.audio_io import write_wav
from audiolab_tpu.serve.api import create_app


def test_rest_train_job(tmp_path):
    router = create_app(str(tmp_path / "process"))
    sr = 48000
    t = np.arange(int(sr * 2.0)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, wav, sr)
    files = [{"filename": "a.wav",
              "content": base64.b64encode(open(p, "rb").read()).decode()}]
    settings = {
        "epochs": 1, "batch_size": 2, "sr": 48000, "feat_channels": 32,
        "slice_seconds": 0.8,
        "synth_overrides": {
            "spec_channels": 1025, "segment_size": 3840, "inter_channels": 16,
            "hidden_channels": 16, "filter_channels": 32, "n_heads": 2,
            "n_layers": 1, "upsample_initial_channel": 32, "spk_embed_dim": 4,
            "gin_channels": 16,
        },
    }
    code, resp = router.dispatch(
        "POST", "/api/v1/rvc/train",
        {"files": files, "name": "tinyvoice", "settings": settings})
    assert code == 200
    job = resp["job_id"]
    deadline = time.time() + 420
    status = {}
    while time.time() < deadline:
        time.sleep(5)
        code, status = router.dispatch("GET", f"/api/v1/rvc/job/{job}", {})
        if status["status"] in ("done", "error"):
            break
    assert status["status"] == "done", status
    code, models = router.dispatch("GET", "/api/v1/rvc/models", {})
    assert "tinyvoice.npz" in models["models"]
    assert "tinyvoice.index.npz" in models["models"]
