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
    prompt = body.get("prompt") or body.get("tags") or ""
    samples, sr = _BACKENDS[name].generate(prompt, **body.get("settings", {}))
    from audiolab_tpu.core.audio_io import write_wav
    import os, tempfile

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as tmp:
        path = tmp.name
    try:
        write_wav(path, samples, sr)
        with open(path, "rb") as f:
            data = f.read()
    finally:
        os.unlink(path)
    return {"audio": base64.b64encode(data).decode(), "format": "wav", "sample_rate": sr}


def register(router) -> None:
    @router.post("/api/v1/yue/generate", "YuE lyrics-to-song generation")
    def yue(_params, body):
        return _generate("yue", body)

    @router.post("/api/v1/acestep/generate", "ACE-Step text-to-music")
    def acestep(_params, body):
        return _generate("acestep", body)

    @router.post("/api/v1/acestep/lora/generate", "ACE-Step with LoRA adapter")
    def acestep_lora(_params, body):
        return _generate("acestep", body)

    @router.post("/api/v1/audio/generate", "Stable-Audio text-to-audio")
    def stable_audio(_params, body):
        return _generate("stable_audio", body)

    @router.get("/api/v1/audio/models", "List generation backends")
    def models(_params, _body):
        return {"models": sorted(_BACKENDS)}

    @router.get("/api/v1/audio/formats", "List output formats")
    def formats(_params, _body):
        return {"formats": ["wav", "mp3", "flac"]}
