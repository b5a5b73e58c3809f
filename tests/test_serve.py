"""REST API contract tests against the live stdlib server."""

import base64
import json
import urllib.request

import numpy as np
import pytest

from audiolab_tpu.core.audio_io import write_wav
from audiolab_tpu.serve.api import create_app
from audiolab_tpu.serve.http import serve_background


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_out")
    router = create_app(output_root=str(root))
    srv, port = serve_background(router)
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _b64_wav(tmp_path, name="in.wav", seconds=1.0, sr=16000):
    t = np.arange(int(sr * seconds)) / sr
    x = np.stack([0.4 * np.sin(2 * np.pi * 220 * t)] * 2).astype(np.float32)
    p = tmp_path / name
    write_wav(p, x, sr)
    return {"filename": name, "content": base64.b64encode(p.read_bytes()).decode()}


def test_processors_listing(server):
    status, body = _get(f"{server}/api/v1/process/processors")
    assert status == 200
    titles = [p["title"] for p in body["processors"]]
    assert {"Separate", "Clone", "Merge", "Remaster", "Convert", "Export", "Compare"} <= set(titles)
    sep = [p for p in body["processors"] if p["title"] == "Separate"][0]
    for f in ("reverb_removal", "noise_removal", "separate_bg_vocals",
              "vocals_only", "store_reverb_ir", "separate_drums"):
        assert f in sep["properties"], f


def test_openapi_document(server):
    status, body = _get(f"{server}/openapi.json")
    assert status == 200
    assert "/api/v1/process/chain" in body["paths"]
    assert "/api/v1/audio/speech" in body["paths"]
    assert "/api/v1/rvc/train" in body["paths"]


def test_process_separate_roundtrip(server, tmp_path):
    payload = {"files": [_b64_wav(tmp_path)], "settings": {"noise_removal": "Nothing"}}
    status, body = _post(f"{server}/api/v1/process/separate", payload)
    assert status == 200
    names = [f["filename"] for f in body["files"]]
    assert any("(Vocals)" in n for n in names)
    # returned content decodes to a valid wav
    import io, struct

    raw = base64.b64decode(body["files"][0]["content"])
    assert raw[:4] == b"RIFF"


def test_chain_endpoint(server, tmp_path):
    payload = {
        "files": [_b64_wav(tmp_path)],
        "processors": ["Separate", "Merge"],
        "settings": {"Separate": {"noise_removal": "Nothing"}},
    }
    status, body = _post(f"{server}/api/v1/process/chain", payload)
    assert status == 200
    assert len(body["files"]) == 1
    assert body["files"][0]["filename"].endswith("_merged.wav")


def test_missing_files_is_400(server):
    status, body = _post(f"{server}/api/v1/process/separate", {"files": []})
    assert status == 400
    assert "error" in body


def test_unknown_route_404(server):
    status, body = _post(f"{server}/api/v1/does/not/exist", {})
    assert status == 404


def test_tts_unloaded_501(server):
    status, body = _post(
        f"{server}/api/v1/audio/speech", {"model": "zonos", "input": "hello"}
    )
    assert status == 501
    assert "not loaded" in body["error"]


def test_generation_unloaded_501(server):
    status, body = _post(f"{server}/api/v1/yue/generate", {"prompt": "pop song"})
    assert status == 501


def test_rvc_models_empty(server):
    status, body = _get(f"{server}/api/v1/rvc/models")
    assert status == 200
    assert body["models"] == []


def test_rvc_job_unknown_404(server):
    try:
        status, _ = _get(f"{server}/api/v1/rvc/job/nope")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404
