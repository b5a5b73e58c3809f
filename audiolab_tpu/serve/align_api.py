"""Multi-take alignment endpoint (reference: layouts/align.py — align one
or more takes to a master track via word timings, sentence matching and
time warping).

POST /api/v1/align with base64 WAV files: the first file is the master,
the rest are takes.  Word timings come from the registered transcription
backend when available, else the energy aligner over a single synthetic
segment (pipelines/forced_align.py)."""

from __future__ import annotations

import base64
import os
import tempfile


_TRANSCRIBER: list[object] = []


def register_transcriber(backend) -> None:
    """Optional: word timings from a real transcription engine."""
    _TRANSCRIBER[:] = [backend]


def _words_of(path: str) -> tuple["np.ndarray", int, list[dict]]:
    import numpy as np

    from audiolab_tpu.core.audio_io import read_audio

    a = read_audio(path).to_mono()
    x = np.asarray(a.samples[0], np.float32)
    if _TRANSCRIBER:
        res = _TRANSCRIBER[0].transcribe(path)
        words = [w for s in res.get("segments", []) for w in s.get("words", [])]
        if words:
            return x, a.sample_rate, words
    # no transcriber: pseudo-words from energy so structural alignment
    # still works (each voiced region becomes a "word")
    from audiolab_tpu.pipelines.forced_align import energy_align_words

    n_pseudo = max(4, int(len(x) / a.sample_rate * 2))
    words = energy_align_words(x, a.sample_rate, 0.0,
                               len(x) / a.sample_rate,
                               [f"w{i}" for i in range(n_pseudo)])
    return x, a.sample_rate, words


def register(router) -> None:
    @router.post("/api/v1/align", "Align takes to a master track")
    def align(_params, body):
        import numpy as np

        from audiolab_tpu.core.audio_io import write_audio
        from audiolab_tpu.pipelines.align import align_take

        files = body.get("files", [])
        if len(files) < 2:
            raise ValueError("need a master file and at least one take")
        out = []
        with tempfile.TemporaryDirectory() as tmp:
            paths = []
            for f in files:
                p = os.path.join(tmp, os.path.basename(
                    f.get("filename", f"in{len(paths)}.wav")))
                with open(p, "wb") as fh:
                    fh.write(base64.b64decode(f["content"]))
                paths.append(p)
            from audiolab_tpu.serve.inference_lock import INFERENCE_LOCK

            with INFERENCE_LOCK:
                master, sr, mwords = _words_of(paths[0])
                for i, p in enumerate(paths[1:], 1):
                    take, tsr, twords = _words_of(p)
                    if tsr != sr:
                        from audiolab_tpu.kernels.resample import (
                            resample_poly_np,
                        )

                        take = np.asarray(
                            resample_poly_np(take, tsr, sr), np.float32)
                    aligned, report = align_take(master, take, sr,
                                                 mwords, twords)
                    op = os.path.join(tmp, f"aligned_{i}.wav")
                    write_audio(op, aligned, sr)
                    with open(op, "rb") as fh:
                        content = base64.b64encode(fh.read()).decode()
                    out.append({"filename": f"aligned_{i}.wav",
                                "content": content, "report": report})
        return {"results": out}
