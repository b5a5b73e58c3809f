"""Super Resolution processor (reference: wrappers/super_res.py)."""

from __future__ import annotations

import os

from audiolab_tpu.core.audio_io import read_audio, write_audio
from audiolab_tpu.core.project import ProjectFiles
from audiolab_tpu.pipelines.base import (
    BaseProcessor,
    ProgressFn,
    TypedInput,
    null_progress,
    register_processor,
)
from audiolab_tpu.pipelines.super_res import super_resolve


class SuperResolution(BaseProcessor):
    title = "Super Resolution"
    priority = 8
    description = "Upscale audio to 48 kHz with high-band enhancement."
    allowed_kwargs = {
        "chunk_seconds": TypedInput(
            default=10.24, description="Chunk length in seconds", type=float,
            ge=1.0, le=30.0,
        ),
        "crossover_hz": TypedInput(
            default=0.0, description="Crossover frequency (0 = auto)", type=float,
            ge=0.0, le=24000.0,
        ),
    }

    enhancer_fn = None  # slot for a neural enhancer model

    def process_audio(
        self, inputs: list[ProjectFiles], callback: ProgressFn = null_progress, **kw
    ) -> list[ProjectFiles]:
        chunk_s = float(kw.get("chunk_seconds", 10.24))
        fc = float(kw.get("crossover_hz", 0.0)) or None
        for proj in inputs:
            outputs = []
            stage = proj.stage_dir("super_res")
            for i, f in enumerate(proj.last_outputs):
                callback(i, f"Upscaling {os.path.basename(f)}", len(proj.last_outputs))
                a = read_audio(f)
                y, sr = super_resolve(
                    a.samples, a.sample_rate,
                    enhancer_fn=self.enhancer_fn,
                    chunk_seconds=chunk_s, crossover_hz=fc,
                )
                base = os.path.splitext(os.path.basename(f))[0]
                out = os.path.join(stage, f"{base}_48k.wav")
                write_audio(out, y, sr)
                outputs.append(out)
            proj.add_output("super_res", outputs)
        return inputs


register_processor(SuperResolution())
