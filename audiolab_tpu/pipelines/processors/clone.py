"""Clone processor (reference: wrappers/clone.py) — voice conversion of
"(Vocals)" stems via the RVC pipeline.

Reference behaviors reproduced: input filtering to vocal stems (:73-120),
stereo preservation via mid/side (clone mid only, :200-270), pitch shift
option threaded to Merge/Export by the chain, silence restore after
conversion (pipeline.py:469-535).

The VoiceConverter (models + weights) is injected via ``configure``; without
one the processor raises a clear error listing how to load a model.
"""

from __future__ import annotations

import os

import numpy as np

from audiolab_tpu.core.audio_io import read_audio, write_audio
from audiolab_tpu.core.project import ProjectFiles
from audiolab_tpu.dsp.silence import restore_silence
from audiolab_tpu.dsp.stereo import ms_to_stereo, resample_side, stereo_to_ms
from audiolab_tpu.kernels.resample import resample_poly_np
from audiolab_tpu.pipelines.base import (
    BaseProcessor,
    ProgressFn,
    TypedInput,
    null_progress,
    register_processor,
)

import jax.numpy as jnp


class Clone(BaseProcessor):
    title = "Clone"
    priority = 2
    description = "Convert vocal stems to a target voice (RVC)."
    default_enabled = True
    allowed_kwargs = {
        "voice_model": TypedInput(
            default=None, description="Trained RVC voice model name", type=str
        ),
        "pitch_shift": TypedInput(
            default=0, description="Semitone transpose", type=int, ge=-24, le=24
        ),
        "index_rate": TypedInput(
            default=0.75, description="Retrieval blend strength", type=float, ge=0.0, le=1.0
        ),
        "protect": TypedInput(
            default=0.33, description="Consonant protection", type=float, ge=0.0, le=0.5
        ),
        "preserve_stereo": TypedInput(
            default=True, description="Clone mid channel, restore side", type=bool
        ),
        "clone_bg_vocals": TypedInput(
            default=False, description="Also clone background vocal stems", type=bool
        ),
    }

    converter = None  # injected VoiceConverter

    @classmethod
    def configure(cls, converter) -> None:
        cls.converter = converter

    def _select_inputs(self, files: list[str], clone_bg: bool) -> list[str]:
        """Vocal-stem filtering conventions (base_wrapper.py:745-821)."""
        vocals = [f for f in files if "(Vocals)" in f or "vocal" in os.path.basename(f).lower()]
        if not clone_bg:
            vocals = [f for f in vocals if "(BG" not in f and "back" not in os.path.basename(f).lower()]
        return vocals or files[:1]

    def process_audio(
        self, inputs: list[ProjectFiles], callback: ProgressFn = null_progress, **kw
    ) -> list[ProjectFiles]:
        if self.converter is None:
            raise RuntimeError(
                "No voice model loaded. Load one with "
                "audiolab_tpu.pipelines.processors.clone.Clone.configure(VoiceConverter(...)) "
                "or via serve's /api/v1/rvc endpoints."
            )
        transpose = int(kw.get("pitch_shift", 0) or 0)
        index_rate = float(kw.get("index_rate", 0.75))
        protect = float(kw.get("protect", 0.33))
        preserve_stereo = kw.get("preserve_stereo", True)

        for proj in inputs:
            targets = self._select_inputs(proj.last_outputs, kw.get("clone_bg_vocals", False))
            passthrough = [f for f in proj.last_outputs if f not in targets]
            outputs = []
            stage = proj.stage_dir("cloned")
            for i, f in enumerate(targets):
                callback(i, f"Cloning {os.path.basename(f)}", len(targets))
                a = read_audio(f)
                x = a.samples
                if x.shape[0] == 2 and preserve_stereo:
                    mid, side = stereo_to_ms(jnp.asarray(x))
                    mono = np.asarray(mid)
                else:
                    mono = x.mean(axis=0)
                    side = None

                mono16 = resample_poly_np(mono, a.sample_rate, 16000)
                out = self.converter.convert(
                    mono16, transpose=transpose, index_rate=index_rate, protect=protect
                )
                out_sr = self.converter.synth_cfg.sr

                # restore silences/levels from the source vocal
                out = restore_silence(mono, out, a.sample_rate, out_sr)

                if side is not None:
                    side_r = np.asarray(resample_side(jnp.asarray(np.asarray(side)), out.shape[-1]))
                    result = np.asarray(ms_to_stereo(jnp.asarray(out), jnp.asarray(side_r)))
                    final_sr = a.sample_rate
                else:
                    result = out
                    final_sr = a.sample_rate

                base = os.path.splitext(os.path.basename(f))[0]
                out_path = os.path.join(stage, f"{base} (Cloned).wav")
                write_audio(out_path, result, final_sr)
                outputs.append(out_path)
            proj.add_output("cloned", outputs + passthrough)
        return inputs


register_processor(Clone())
