"""Convert processor (reference: wrappers/convert.py — ffmpeg format
conversion, default MP3 320k; WAV path native)."""

from __future__ import annotations

import os

from audiolab_tpu.core.audio_io import read_audio, write_audio
from audiolab_tpu.core.project import ProjectFiles
from audiolab_tpu.pipelines.base import (
    audio_inputs,
    BaseProcessor,
    ProgressFn,
    TypedInput,
    null_progress,
    register_processor,
)


class Convert(BaseProcessor):
    title = "Convert"
    priority = 10
    description = "Convert audio to a target container format."
    allowed_kwargs = {
        "format": TypedInput(
            default="wav",
            description="Output format",
            choices=["wav", "mp3", "flac", "ogg", "m4a"],
            type=str,
        ),
        "bitrate": TypedInput(
            default="320k", description="Bitrate for lossy formats", type=str
        ),
    }

    def process_audio(
        self, inputs: list[ProjectFiles], callback: ProgressFn = null_progress, **kw
    ) -> list[ProjectFiles]:
        fmt = kw.get("format", "wav")
        bitrate = kw.get("bitrate", "320k")
        for proj in inputs:
            outputs = []
            stage = proj.stage_dir("converted")
            targets = audio_inputs(proj.last_outputs)
            for i, f in enumerate(targets):
                callback(i, f"Converting {os.path.basename(f)}", len(targets))
                base = os.path.splitext(os.path.basename(f))[0]
                out = os.path.join(stage, f"{base}.{fmt}")
                if f.lower().endswith(f".{fmt}"):
                    if os.path.abspath(f) != os.path.abspath(out):
                        import shutil

                        shutil.copy2(f, out)
                else:
                    audio = read_audio(f)
                    write_audio(out, audio.samples, audio.sample_rate, fmt=fmt, bitrate=bitrate)
                outputs.append(out)
            proj.add_output("converted", outputs)
        return inputs


register_processor(Convert())
