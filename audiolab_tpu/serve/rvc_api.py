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

        job_id = submit_job(
            train_from_request,
            persisted,
            body.get("name", "voice"),
            models_dir,
            dict(body.get("settings", {})),
        )
        return {"job_id": job_id}

    @router.post("/api/v1/rvc/build_index", "Build a retrieval index from features")
    def build_index(_params, body):
        raise NotImplementedError("index build runs as part of /api/v1/rvc/train")
