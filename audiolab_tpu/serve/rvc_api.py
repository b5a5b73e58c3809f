"""RVC REST endpoints (reference: layouts/rvc_train.py /api/v1/rvc/*
including the async in-memory job store :1537-1568)."""

from __future__ import annotations

import base64
import os
import tempfile
import threading
import uuid

_JOBS: dict[str, dict] = {}
_JOBS_LOCK = threading.Lock()


def submit_job(fn, *args, **kwargs) -> str:
    job_id = uuid.uuid4().hex[:12]
    with _JOBS_LOCK:
        _JOBS[job_id] = {"status": "running", "progress": 0.0, "message": "started"}

    def run():
        try:
            result = fn(*args, job_id=job_id, **kwargs)
            with _JOBS_LOCK:
                _JOBS[job_id].update(status="done", progress=1.0, result=result)
        except Exception as e:  # noqa: BLE001
            with _JOBS_LOCK:
                _JOBS[job_id].update(status="error", message=str(e))

    threading.Thread(target=run, daemon=True).start()
    return job_id


def update_job(job_id: str, progress: float, message: str) -> None:
    with _JOBS_LOCK:
        if job_id in _JOBS:
            _JOBS[job_id].update(progress=progress, message=message)


def register(router, output_root: str) -> None:
    models_dir = os.path.join(os.path.dirname(output_root), "models", "rvc")

    @router.get("/api/v1/rvc/models", "List trained voice models")
    def models(_params, _body):
        if not os.path.isdir(models_dir):
            return {"models": []}
        return {
            "models": sorted(
                f for f in os.listdir(models_dir) if f.endswith((".npz", ".msgpack"))
            )
        }

    @router.get("/api/v1/rvc/job/{job_id}", "Poll an async training job")
    def job(params, _body):
        with _JOBS_LOCK:
            info = _JOBS.get(params["job_id"])
        if info is None:
            raise FileNotFoundError(f"unknown job {params['job_id']}")
        return info

    @router.post("/api/v1/rvc/train", "Start RVC training (async job)")
    def train(_params, body):
        from audiolab_tpu.train.rvc_train import train_from_request

        with tempfile.TemporaryDirectory() as tmp:
            files = []
            for f in body.get("files", []):
                p = os.path.join(tmp, os.path.basename(f.get("filename", "in.wav")))
                with open(p, "wb") as fh:
                    fh.write(base64.b64decode(f["content"]))
                files.append(p)
            # copy to a persistent dataset dir before the tempdir vanishes
            dataset_dir = os.path.join(
                os.path.dirname(output_root), "datasets", body.get("name", "voice")
            )
            os.makedirs(dataset_dir, exist_ok=True)
            import shutil

            persisted = []
            for p in files:
                dst = os.path.join(dataset_dir, os.path.basename(p))
                shutil.copy2(p, dst)
                persisted.append(dst)

        # SECURITY: request settings must never control filesystem paths
        # (a client-supplied path reaching torch.load is code execution —
        # ADVICE r1).  Weights resolve server-side via AUDIOLAB_WEIGHTS_DIR.
        settings = {k: v for k, v in dict(body.get("settings", {})).items()
                    if not k.endswith(("_path", "_dir"))}
        job_id = submit_job(
            train_from_request,
            persisted,
            body.get("name", "voice"),
            models_dir,
            settings,
        )
        return {"job_id": job_id}

    @router.post("/api/v1/rvc/resume", "Resume training an existing voice")
    def resume(_params, body):
        """Reference layouts/rvc_train.py: training restarts from the
        latest checkpoint in the experiment dir (train/trainer.py
        restore_train_state) — re-run with the persisted dataset, more
        epochs, no re-upload."""
        from audiolab_tpu.train.rvc_train import train_from_request

        name = body.get("name", "voice")
        dataset_dir = os.path.join(os.path.dirname(output_root),
                                   "datasets", name)
        if not os.path.isdir(dataset_dir) or not os.listdir(dataset_dir):
            raise FileNotFoundError(
                f"no persisted dataset for {name!r}; train first")
        files = [os.path.join(dataset_dir, f)
                 for f in sorted(os.listdir(dataset_dir))]
        settings = {k: v for k, v in dict(body.get("settings", {})).items()
                    if not k.endswith(("_path", "_dir"))}
        job_id = submit_job(train_from_request, files, name, models_dir,
                            settings)
        return {"job_id": job_id, "resumed": True}

    @router.post("/api/v1/rvc/build_index", "Build a retrieval index from an exp dir")
    def build_index(_params, body):
        from audiolab_tpu.train.trainer import build_index as _build

        exp = body.get("exp_dir") or os.path.join(
            os.path.dirname(output_root), "exp", body.get("name", "voice"))
        return {"index": _build(exp)}

    @router.post("/api/v1/rvc/upload", "Upload a trained voice model (.npz)")
    def upload(_params, body):
        os.makedirs(models_dir, exist_ok=True)
        saved = []
        for f in body.get("files", []):
            name = os.path.basename(f.get("filename", "model.npz"))
            p = os.path.join(models_dir, name)
            with open(p, "wb") as fh:
                fh.write(base64.b64decode(f["content"]))
            saved.append(name)
        if not saved:
            raise ValueError("no files")
        return {"saved": saved}

    @router.get("/api/v1/rvc/download/{name}", "Download a trained voice model")
    def download(params, _body):
        from audiolab_tpu.serve.http import RawResponse

        p = os.path.join(models_dir, os.path.basename(params["name"]))
        if not os.path.exists(p):
            raise FileNotFoundError(params["name"])
        with open(p, "rb") as fh:
            # raw bytes, like the reference's FileResponse download routes
            return RawResponse(
                fh.read(), content_type="application/octet-stream",
                headers={"Content-Disposition":
                         f'attachment; filename="{params["name"]}"'})

    @router.post("/api/v1/rvc/analyze", "Pitch-range analysis of uploaded audio")
    def analyze(_params, body):
        """Reference: layouts/rvc_train.py:233 pitch-range analysis — median
        f0 + range so the UI can suggest a transpose."""
        import numpy as np

        import jax.numpy as jnp

        from audiolab_tpu.core.audio_io import read_audio
        from audiolab_tpu.dsp.f0 import f0_autocorr
        from audiolab_tpu.kernels.resample import resample_poly_np

        files = body.get("files", [])
        if not files:
            raise ValueError("no files")
        stats = []
        with tempfile.TemporaryDirectory() as tmp:
            for f in files:
                p = os.path.join(tmp, os.path.basename(f.get("filename", "a.wav")))
                with open(p, "wb") as fh:
                    fh.write(base64.b64decode(f["content"]))
                a = read_audio(p).to_mono()
                x = np.asarray(a.samples[0], np.float32)
                if a.sample_rate != 16000:
                    x = resample_poly_np(x, a.sample_rate, 16000)
                f0, voiced = f0_autocorr(jnp.asarray(x), sr=16000, hop=160)
                f0 = np.asarray(f0)
                f0 = f0[np.asarray(voiced) > 0] if np.asarray(voiced).any() else f0
                f0 = f0[f0 > 0]
                if len(f0):
                    stats.append(
                        {"file": f.get("filename"),
                         "median_hz": float(np.median(f0)),
                         "min_hz": float(np.percentile(f0, 5)),
                         "max_hz": float(np.percentile(f0, 95))})
        return {"analysis": stats}
