"""WaveTransfer endpoints (reference: layouts/wavetransfer.py
/api/v1/wavetransfer/{train,generate,schedule,projects} with threaded
training + cancellation)."""

from __future__ import annotations

import base64
import os

_PROJECT_ROOT = ["outputs/wavetransfer"]
_TOKENS: dict[str, object] = {}


def set_project_root(path: str) -> None:
    _PROJECT_ROOT[0] = path


def register(router) -> None:
    from audiolab_tpu.serve.rvc_api import submit_job, update_job

    @router.get("/api/v1/wavetransfer/projects", "List WaveTransfer projects")
    def projects(_params, _body):
        root = _PROJECT_ROOT[0]
        if not os.path.isdir(root):
            return {"projects": []}
        return {"projects": sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))}

    @router.get("/api/v1/wavetransfer/schedule", "List inference noise schedules")
    def schedule(_params, _body):
        from audiolab_tpu.models import wavegrad as WG

        return {"schedules": {
            "fast6": [float(b) for b in WG.FAST_6.betas],
            "fast12": [float(b) for b in WG.FAST_12.betas],
            "train1000": {"steps": len(WG.TRAIN_SCHEDULE.betas)},
        }}

    @router.post("/api/v1/wavetransfer/train", "Start training (async job)")
    def train(_params, body):
        from audiolab_tpu.train import wavetransfer as WT

        name = body.get("project", "default")
        proj = os.path.join(_PROJECT_ROOT[0], name)
        os.makedirs(os.path.join(proj, "data"), exist_ok=True)
        for f in body.get("files", []):
            p = os.path.join(proj, "data", os.path.basename(
                f.get("filename", "clip.wav")))
            with open(p, "wb") as fh:
                fh.write(base64.b64decode(f["content"]))

        s = body.get("settings", {})
        cfg = WT.WTConfig(
            sr=int(s.get("sr", 24000)),
            steps=int(s.get("steps", 1000)),
            batch_size=int(s.get("batch_size", 8)),
            ckpt_every=int(s.get("ckpt_every", 500)),
        )
        token = WT.CancellationToken()
        _TOKENS[name] = token

        def run(job_id=None):
            WT.preprocess_project(proj, cfg)
            return WT.train_model(
                proj, cfg, token=token,
                callback=lambda i, msg, total: update_job(
                    job_id, min(0.99, i / max(total, 1)), msg),
            )

        return {"job_id": submit_job(run), "project": name}

    @router.post("/api/v1/wavetransfer/cancel", "Cancel a running training")
    def cancel(_params, body):
        name = body.get("project", "default")
        token = _TOKENS.get(name)
        if token is None:
            raise FileNotFoundError(f"no running training for {name}")
        token.cancel()
        return {"cancelled": name}

    @router.post("/api/v1/wavetransfer/generate", "Timbre transfer inference")
    def generate(_params, body):
        import numpy as np

        from audiolab_tpu.core.audio_io import read_audio, write_wav
        from audiolab_tpu.models import wavegrad as WG
        from audiolab_tpu.train import wavetransfer as WT
        import tempfile

        name = body.get("project", "default")
        proj = os.path.join(_PROJECT_ROOT[0], name)
        files = body.get("files", [])
        if not files:
            raise ValueError("no source file")
        with tempfile.TemporaryDirectory() as tmp:
            p = os.path.join(tmp, "src.wav")
            with open(p, "wb") as fh:
                fh.write(base64.b64decode(files[0]["content"]))
            a = read_audio(p).to_mono()
            s = body.get("settings", {})
            sched = {"fast6": WG.FAST_6, "fast12": WG.FAST_12}.get(
                s.get("schedule", "fast6"), WG.FAST_6)
            cfg = WT.WTConfig(sr=int(s.get("sr", 24000)))
            y, sr = WT.generate(proj, np.asarray(a.samples[0]), a.sample_rate,
                                cfg, sched)
            out = os.path.join(tmp, "out.wav")
            write_wav(out, y, sr)
            data = open(out, "rb").read()
        return {"audio": base64.b64encode(data).decode(), "format": "wav",
                "sample_rate": sr}
