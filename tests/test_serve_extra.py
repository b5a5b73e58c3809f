"""Tests for the extended REST surface: wavetransfer, clone, downloads,
rvc analyze/upload, load_project."""

import base64
import os

import numpy as np
import pytest

from audiolab_tpu.core.audio_io import write_wav
from audiolab_tpu.serve.api import create_app


@pytest.fixture(scope="module")
def router(tmp_path_factory):
    root = tmp_path_factory.mktemp("out")
    return create_app(str(root / "process"))


def _wav_b64(tmp_path, name="a.wav", seconds=0.5, sr=16000):
    p = str(tmp_path / name)
    t = np.arange(int(seconds * sr)) / sr
    write_wav(p, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    return {"filename": name, "content": base64.b64encode(open(p, "rb").read()).decode()}


def test_wavetransfer_listing(router):
    code, resp = router.dispatch("GET", "/api/v1/wavetransfer/projects", {})
    assert code == 200 and "projects" in resp
    code, resp = router.dispatch("GET", "/api/v1/wavetransfer/schedule", {})
    assert code == 200 and "fast6" in resp["schedules"]


def test_clone_endpoints(router):
    code, resp = router.dispatch("GET", "/api/v1/clone/methods", {})
    assert code == 200 and "openvoice" in resp["methods"]
    code, resp = router.dispatch("GET", "/api/v1/clone/voices", {})
    assert code == 200 and resp["voices"] == []


def test_rvc_analyze(router, tmp_path):
    body = {"files": [_wav_b64(tmp_path)]}
    code, resp = router.dispatch("POST", "/api/v1/rvc/analyze", body)
    assert code == 200
    assert resp["analysis"] and 150 < resp["analysis"][0]["median_hz"] < 300


def test_rvc_upload_download(router):
    content = base64.b64encode(b"fake npz").decode()
    code, resp = router.dispatch(
        "POST", "/api/v1/rvc/upload",
        {"files": [{"filename": "v.npz", "content": content}]})
    assert code == 200 and resp["saved"] == ["v.npz"]
    code, resp = router.dispatch("GET", "/api/v1/rvc/download/v.npz", {})
    # raw-bytes contract (reference FileResponse semantics)
    assert code == 200 and resp.body == b"fake npz"
    assert "v.npz" in resp.headers.get("Content-Disposition", "")
    code, resp = router.dispatch("GET", "/api/v1/rvc/models", {})
    assert "v.npz" in resp["models"]


def test_load_project_missing(router):
    code, resp = router.dispatch("POST", "/api/v1/process/load_project",
                                 {"project": "nope"})
    assert code >= 400


def test_file_registry_roundtrip(tmp_path):
    from audiolab_tpu.serve.files import file_response, register_file

    p = str(tmp_path / "x.bin")
    open(p, "wb").write(b"hello")
    fid = register_file(p)
    resp = file_response(fid)
    assert resp.body == b"hello"
    assert "x.bin" in resp.headers["Content-Disposition"]


def test_align_endpoint(router, tmp_path):
    """POST /api/v1/align: master + take -> aligned take the master's
    length, with a sentence-match report (layouts/align.py surface)."""
    import base64

    import numpy as np

    from audiolab_tpu.core.audio_io import write_audio

    sr = 16000
    t = np.arange(sr * 2) / sr
    burst = (np.sin(2 * np.pi * 300 * t) *
             (np.sin(2 * np.pi * 1.5 * t) > 0)).astype(np.float32) * 0.4
    master = tmp_path / "master.wav"
    take = tmp_path / "take.wav"
    write_audio(str(master), burst, sr)
    # the take: same content shifted a touch
    write_audio(str(take), np.roll(burst, sr // 10), sr)

    def b64(p):
        return base64.b64encode(p.read_bytes()).decode()

    code, out = router.dispatch("POST", "/api/v1/align", {"files": [
        {"filename": "master.wav", "content": b64(master)},
        {"filename": "take.wav", "content": b64(take)},
    ]})
    assert code == 200, out
    assert len(out["results"]) == 1
    res = out["results"][0]
    assert res["filename"] == "aligned_1.wav"
    assert "master_sentences" in res["report"]
    wav = base64.b64decode(res["content"])
    assert len(wav) > 1000


def test_acestep_task_endpoints(router, tmp_path):
    """Retake/repaint/edit/extend routes (reference layouts/acestep.py
    specialized tabs) against the tiny random pipeline."""
    from audiolab_tpu.pipelines.acestep import random_acestep
    from audiolab_tpu.serve import music_api

    music_api.register_backend("acestep", random_acestep())
    clip = _wav_b64(tmp_path, "src.wav", seconds=1.0, sr=8000)

    code, resp = router.dispatch(
        "POST", "/api/v1/acestep/task",
        {"task": "retake", "prompt": "synth", "files": [clip],
         "settings": {"variance": 0.4, "seed": 1}})
    assert code == 200 and resp["task"] == "retake" and resp["audio"]

    code, resp = router.dispatch(
        "POST", "/api/v1/acestep/task",
        {"task": "repaint", "prompt": "synth", "files": [clip],
         "settings": {"start_s": 0.2, "end_s": 0.6}})
    assert code == 200 and resp["task"] == "repaint" and resp["audio"]

    code, resp = router.dispatch(
        "POST", "/api/v1/acestep/task",
        {"task": "extend", "prompt": "synth", "files": [clip],
         "settings": {"right_s": 0.5}})
    assert code == 200 and resp["task"] == "extend"

    code, resp = router.dispatch(
        "POST", "/api/v1/acestep/task",
        {"task": "nope", "files": [clip]})
    assert code >= 400


def test_rvc_resume_requires_dataset(router):
    code, resp = router.dispatch("POST", "/api/v1/rvc/resume",
                                 {"name": "never-trained"})
    assert code == 404


def test_acestep_lora_train_endpoint(router, tmp_path):
    """/api/v1/acestep/lora/train: async LoRA job over uploaded clips
    (reference layouts/acestep.py LoRA train tab :1609)."""
    import time

    from audiolab_tpu.pipelines.acestep import random_acestep
    from audiolab_tpu.serve import music_api

    music_api.register_backend("acestep", random_acestep())
    clip = _wav_b64(tmp_path, "train.wav", seconds=1.0, sr=8000)
    code, resp = router.dispatch(
        "POST", "/api/v1/acestep/lora/train",
        {"clips": [{"content": clip["content"], "prompt": "synth",
                    "lyrics": "[inst]"}],
         "settings": {"steps": 2, "rank": 2}})
    assert code == 200 and resp["job_id"]

    deadline = time.time() + 120
    info = None
    while time.time() < deadline:
        code, info = router.dispatch(
            "GET", f"/api/v1/rvc/job/{resp['job_id']}", {})
        assert code == 200
        if info["status"] in ("done", "error"):
            break
        time.sleep(0.5)
    assert info and info["status"] == "done", info
    assert os.path.exists(info["result"]["lora_path"])
    assert np.isfinite(info["result"]["loss"])

    # no clips -> client error
    code, _ = router.dispatch("POST", "/api/v1/acestep/lora/train",
                              {"clips": []})
    assert code >= 400

    # the trained adapter actually merges into generation
    code, gen = router.dispatch(
        "POST", "/api/v1/acestep/lora/generate",
        {"prompt": "synth", "lora_file_id": info["result"]["file_id"],
         "settings": {"duration": 1.0}})
    assert code == 200 and gen["audio"]
