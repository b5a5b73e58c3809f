"""REST API surface (reference endpoint table: SURVEY §2.4).

Implements the same base64-file-in/base64-file-out JSON convention as the
reference (wrappers/base_wrapper.py:427-509): POST bodies carry
``{"files": [{"filename": ..., "content": <b64>}], "settings": {...}}`` and
responses return the produced files the same way.

One endpoint per registered processor is generated from its TypedInput
schema (the reference's register_api_endpoint codegen, base_wrapper.py:
248-339), plus /chain, /processors, /projects and the module endpoints
(tts, transcriptions, generation) which return 501 until their model
backends are configured.
"""

from __future__ import annotations

import base64
import os
import tempfile

from audiolab_tpu.pipelines.base import all_processors, get_processor
from audiolab_tpu.pipelines.chain import run_chain
from audiolab_tpu.serve.http import Router


def _decode_files(body: dict, workdir: str) -> list[str]:
    paths = []
    for f in body.get("files", []):
        name = os.path.basename(f.get("filename", "input.wav"))
        path = os.path.join(workdir, name)
        with open(path, "wb") as fh:
            fh.write(base64.b64decode(f["content"]))
        paths.append(path)
    if not paths:
        raise ValueError("no input files provided")
    return paths


def _encode_files(paths: list[str]) -> dict:
    out = []
    for p in paths:
        with open(p, "rb") as fh:
            out.append(
                {
                    "filename": os.path.basename(p),
                    "content": base64.b64encode(fh.read()).decode(),
                }
            )
    return {"files": out}


def create_app(output_root: str = "outputs/process") -> Router:
    router = Router()

    @router.get("/api/v1/process/processors", "List processors and their option schemas")
    def processors(_params, _body):
        return {
            "processors": [p.json_schema() | {"priority": p.priority} for p in all_processors()]
        }

    @router.get("/api/v1/process/projects", "List existing project directories")
    def projects(_params, _body):
        if not os.path.isdir(output_root):
            return {"projects": []}
        return {"projects": sorted(os.listdir(output_root))}

    @router.post("/api/v1/process/chain", "Run a processor chain")
    def chain(_params, body):
        with tempfile.TemporaryDirectory() as tmp:
            inputs = _decode_files(body, tmp)
            titles = body.get("processors", ["Separate"])
            settings = body.get("settings", {})
            projs = run_chain(titles, inputs, settings, output_root=output_root)
            outs = []
            for proj in projs:
                outs.extend(proj.last_outputs)
            return _encode_files(outs)

    def _make_single(title: str):
        def single(_params, body, _title=title):
            with tempfile.TemporaryDirectory() as tmp:
                inputs = _decode_files(body, tmp)
                settings = {_title: body.get("settings", {})}
                projs = run_chain([_title], inputs, settings, output_root=output_root)
                outs = []
                for proj in projs:
                    outs.extend(proj.last_outputs)
                return _encode_files(outs)

        return single

    for proc in all_processors():
        slug = proc.title.lower().replace(" ", "_")
        router.add(
            "POST",
            f"/api/v1/process/{slug}",
            _make_single(proc.title),
            f"Run the {proc.title} processor",
        )

    # ---------------- module endpoints ------------------------------------

    # RVC training + models (layouts/rvc_train.py REST surface)
    from audiolab_tpu.serve import rvc_api

    rvc_api.register(router, output_root)

    # TTS (OpenAI-compatible /api/v1/audio/speech, layouts/tts.py:840)
    from audiolab_tpu.serve import tts_api

    tts_api.register(router)

    # music generation (yue / acestep / stable-audio)
    from audiolab_tpu.serve import music_api

    music_api.register(router)

    # transcription
    from audiolab_tpu.serve import transcribe_api

    transcribe_api.register(router)

    # wavetransfer project training/inference
    from audiolab_tpu.serve import wavetransfer_api

    wavetransfer_api.set_project_root(
        os.path.join(os.path.dirname(output_root), "wavetransfer"))
    wavetransfer_api.register(router)

    # clone voices/methods (wrappers/clone.py:615,637)
    from audiolab_tpu.serve import clone_api

    clone_api.register(router)

    # multi-take alignment (layouts/align.py)
    from audiolab_tpu.serve import align_api

    align_api.register(router)

    @router.post("/api/v1/process/load_project", "Re-enumerate an existing project")
    def load_project(_params, body):
        """Reference: layouts/process.py:502-530 project reload."""
        name = body.get("project")
        if not name:
            raise ValueError("missing 'project'")
        path = os.path.join(output_root, os.path.basename(name))
        if not os.path.isdir(path):
            raise FileNotFoundError(name)
        files = []
        for root, _dirs, fnames in os.walk(path):
            for fn in sorted(fnames):
                files.append(os.path.relpath(os.path.join(root, fn), path))
        return {"project": name, "files": files}

    @router.get("/openapi.json", "OpenAPI document")
    def openapi(_params, _body):
        return router.openapi()

    @router.get("/", "Web UI")
    def index(_params, _body):
        from audiolab_tpu.serve.http import RawResponse

        ui = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "ui", "index.html")
        with open(ui, "rb") as f:
            return RawResponse(f.read(), "text/html; charset=utf-8")

    return router
