"""Music generation endpoints (reference: layouts/music.py /api/v1/yue/*,
layouts/acestep.py /api/v1/acestep/*, layouts/stable_audio.py
/api/v1/audio/generate)."""

from __future__ import annotations

import base64

_BACKENDS: dict[str, object] = {}


def register_backend(name: str, backend) -> None:
    """backend: .generate(prompt, **kw) -> (samples, sr)."""
    _BACKENDS[name] = backend


def _generate(name: str, body: dict) -> dict:
    if name not in _BACKENDS:
        raise NotImplementedError(
            f"generation backend {name!r} not loaded; available: {sorted(_BACKENDS)}"
        )
    return _generate_with(_BACKENDS[name], body, name=name)


def _generate_with(backend, body: dict, name: str = "gen") -> dict:
    prompt = body.get("prompt") or body.get("tags") or ""
    from audiolab_tpu.serve.inference_lock import INFERENCE_LOCK

    # the reference's request models put generation knobs at the TOP level
    # (modules/acestep/api.py GenerateRequest:20-34, layouts/music.py) —
    # merge them with the nested settings dict and keep only what the
    # backend's generate() actually accepts
    import inspect

    settings = dict(body.get("settings", {}))
    for k, v in body.items():
        if k not in ("prompt", "tags", "settings", "model") and \
                k not in settings:
            settings[k] = v
    try:
        params = inspect.signature(backend.generate).parameters
        if not any(p.kind is p.VAR_KEYWORD for p in params.values()):
            settings = {k: v for k, v in settings.items() if k in params}
    except (TypeError, ValueError):
        pass

    with INFERENCE_LOCK:
        samples, sr = backend.generate(prompt, **settings)
    from audiolab_tpu.core.audio_io import write_wav
    from audiolab_tpu.serve.files import register_file
    import os, tempfile

    out_dir = os.path.join(tempfile.gettempdir(), "audiolab_generated")
    os.makedirs(out_dir, exist_ok=True)
    import uuid

    path = os.path.join(out_dir, f"{name}_{uuid.uuid4().hex[:8]}.wav")
    write_wav(path, samples, sr)
    with open(path, "rb") as f:
        data = f.read()
    fid = register_file(path)
    return {"audio": base64.b64encode(data).decode(), "format": "wav",
            "sample_rate": sr, "file_id": fid}


def register(router) -> None:
    @router.post("/api/v1/yue/generate", "YuE lyrics-to-song generation")
    def yue(_params, body):
        return _generate("yue", body)

    @router.post("/api/v1/acestep/generate", "ACE-Step text-to-music")
    def acestep(_params, body):
        return _generate("acestep", body)

    @router.post("/api/v1/acestep/lora/generate", "ACE-Step with LoRA adapter")
    def acestep_lora(_params, body):
        """Merge a trained adapter (path or file_id from /lora/train) into
        the DiT for this request (reference pipeline_ace_step.py:1408
        load_lora), then generate."""
        lp = body.get("lora_path")
        fid = body.get("lora_file_id") or body.get("file_id")
        if not lp and fid:
            from audiolab_tpu.serve.files import get_file

            lp = get_file(fid)
        if not lp:
            return _generate("acestep", body)  # no adapter -> base weights
        be = _BACKENDS.get("acestep")
        if be is None or not hasattr(be, "base_params"):
            raise NotImplementedError("acestep backend not loaded")
        import copy

        from audiolab_tpu.train.acestep_lora import load_lora, lora_apply

        alpha = float(body.get("settings", {}).get("lora_alpha", 1.0))
        adapted = copy.copy(be)
        merged = dict(be.base_params)
        merged["dit"] = lora_apply(be.base_params["dit"], load_lora(lp),
                                   alpha)
        adapted.params = merged
        return _generate_with(adapted, body)

    @router.post("/api/v1/acestep/task",
                 "ACE-Step retake/repaint/edit/extend on an input clip")
    def acestep_task(_params, body):
        """Reference layouts/acestep.py Retake/Repaint/Edit/Extend tabs
        (process_retake/process_repaint/process_edit/process_extend):
        task-specific re-generation anchored to an uploaded clip."""
        import base64 as b64
        import os
        import tempfile
        import uuid

        import numpy as np

        task = body.get("task", "retake")
        if task not in ("retake", "repaint", "edit", "extend"):
            raise ValueError(f"unknown acestep task {task!r}")
        be = _BACKENDS.get("acestep")
        if be is None or not hasattr(be, task):
            raise NotImplementedError(
                f"acestep backend not loaded or lacks {task!r}")
        files = body.get("files", [])
        if not files:
            raise ValueError("no input clip")
        from audiolab_tpu.core.audio_io import read_audio, write_wav
        from audiolab_tpu.serve.files import register_file
        from audiolab_tpu.serve.inference_lock import INFERENCE_LOCK

        s = dict(body.get("settings", {}))
        prompt = body.get("prompt") or body.get("tags") or ""
        lyrics = s.pop("lyrics", "")
        seed = int(s.pop("seed", 0))
        with tempfile.TemporaryDirectory() as tmp:
            p = os.path.join(tmp, "in.wav")
            with open(p, "wb") as fh:
                fh.write(b64.b64decode(files[0]["content"]))
            audio = np.asarray(read_audio(p).to_mono().samples[0])
        with INFERENCE_LOCK:
            if task == "retake":
                y, sr = be.retake(audio, prompt, lyrics,
                                  variance=float(s.get("variance", 0.5)),
                                  seed=seed)
            elif task == "repaint":
                y, sr = be.repaint(audio, prompt,
                                   float(s.get("start_s", 0.0)),
                                   float(s.get("end_s", 5.0)),
                                   lyrics, seed=seed)
            elif task == "edit":
                y, sr = be.edit(audio, prompt, lyrics,
                                strength=float(s.get("strength", 0.7)),
                                seed=seed)
            else:
                y, sr = be.extend(audio, prompt,
                                  left_s=float(s.get("left_s", 0.0)),
                                  right_s=float(s.get("right_s", 10.0)),
                                  lyrics=lyrics, seed=seed)
        out_dir = os.path.join(tempfile.gettempdir(), "audiolab_generated")
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, f"acestep_{task}_{uuid.uuid4().hex[:8]}.wav")
        write_wav(out, y, sr)
        return {"audio": b64.b64encode(open(out, "rb").read()).decode(),
                "format": "wav", "sample_rate": sr, "task": task,
                "file_id": register_file(out)}

    @router.post("/api/v1/acestep/lora/train",
                 "Train an ACE-Step LoRA adapter (async job)")
    def acestep_lora_train(_params, body):
        """Reference layouts/acestep.py LoRA train tab (:1609, trainer.py):
        clips + prompts -> flow-match LoRA fine-tune of the DiT, returned
        as a downloadable adapter.  Poll /api/v1/rvc/job/{id}."""
        import base64 as b64
        import os
        import tempfile
        import uuid

        import numpy as np

        be = _BACKENDS.get("acestep")
        if be is None or not hasattr(be, "base_params"):
            raise NotImplementedError("acestep backend not loaded")
        clips = body.get("clips") or []
        if not clips:
            raise ValueError("no training clips (clips: [{content, prompt, "
                             "lyrics}])")
        from audiolab_tpu.core.audio_io import read_audio
        from audiolab_tpu.serve.files import register_file
        from audiolab_tpu.serve.rvc_api import submit_job, update_job

        dataset = []
        with tempfile.TemporaryDirectory() as tmp:
            for i, c in enumerate(clips):
                p = os.path.join(tmp, f"clip_{i}.wav")
                with open(p, "wb") as fh:
                    fh.write(b64.b64decode(c["content"]))
                audio = np.asarray(read_audio(p).to_mono().samples[0])
                dataset.append((audio, c.get("prompt", ""),
                                c.get("lyrics", "[inst]")))

        s = dict(body.get("settings", {}))
        steps = int(s.get("steps", 100))
        rank = int(s.get("rank", 8))
        lr = float(s.get("lr", 1e-4))

        def run(job_id=None):
            from audiolab_tpu.serve.inference_lock import INFERENCE_LOCK
            from audiolab_tpu.train.acestep_lora import (
                LoRATrainConfig,
                save_lora,
                train_lora,
            )

            cfg = LoRATrainConfig(steps=steps, rank=rank, lr=lr,
                                  ssl_coeff=0.0)
            with INFERENCE_LOCK:
                out = train_lora(
                    be, dataset, cfg,
                    callback=lambda i, msg, total: update_job(
                        job_id, i / max(total, 1), msg))
            out_dir = os.path.join(tempfile.gettempdir(),
                                   "audiolab_generated")
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir,
                                f"acestep_lora_{uuid.uuid4().hex[:8]}.npz")
            save_lora(path, out["lora"])
            return {"loss": out["loss"], "lora_path": path,
                    "file_id": register_file(path)}

        return {"job_id": submit_job(run)}

    @router.post("/api/v1/audio/generate", "Stable-Audio text-to-audio")
    def stable_audio(_params, body):
        return _generate("stable_audio", body)

    @router.get("/api/v1/audio/models", "List generation backends")
    def models(_params, _body):
        return {"models": sorted(_BACKENDS)}

    @router.get("/api/v1/audio/formats", "List output formats")
    def formats(_params, _body):
        return {"formats": ["wav", "mp3", "flac"]}

    @router.post("/api/v1/audio/continue", "Extend an existing clip (stable-audio)")
    def continue_audio(_params, body):
        import base64 as b64
        import tempfile, os

        be = _BACKENDS.get("stable_audio")
        if be is None or not hasattr(be, "continue_audio"):
            raise NotImplementedError("stable_audio backend not loaded")
        files = body.get("files", [])
        if not files:
            raise ValueError("no input clip")
        from audiolab_tpu.core.audio_io import read_audio, write_wav
        from audiolab_tpu.serve.files import register_file

        with tempfile.TemporaryDirectory() as tmp:
            p = os.path.join(tmp, "in.wav")
            with open(p, "wb") as fh:
                fh.write(b64.b64decode(files[0]["content"]))
            a = read_audio(p).to_mono()
            import numpy as np

            y, sr = be.continue_audio(np.asarray(a.samples[0]),
                                      body.get("prompt", ""),
                                      **body.get("settings", {}))
            out = os.path.join(tempfile.gettempdir(), "audiolab_generated",
                               "continue.wav")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            write_wav(out, y, sr)
        return {"audio": b64.b64encode(open(out, "rb").read()).decode(),
                "format": "wav", "sample_rate": sr,
                "file_id": register_file(out)}

    @router.get("/api/v1/yue/stream/{file_id}", "Download a generated file")
    @router.get("/api/v1/audio/download/{file_id}", "Download a generated file")
    def stream(params, _body):
        from audiolab_tpu.serve.files import file_response

        return file_response(params["file_id"])
