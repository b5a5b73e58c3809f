"""Separate processor (reference: wrappers/separate.py).

Reference behaviors reproduced: SHA-256 + config cache check (:293-315,
400-412), TTS/generated-input skip heuristic handled by the chain layer,
stem naming conventions "(Vocals)"/"(Instrumental)" used downstream by Clone.

The model ensemble is injected via ``configure`` — with no checkpoints
loaded the processor falls back to a DSP vocal/instrumental split (center-
channel + harmonic masking) so the chain stays runnable end-to-end.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

from audiolab_tpu.core.audio_io import read_audio, write_audio
from audiolab_tpu.core.project import ProjectFiles
from audiolab_tpu.pipelines.base import (
    BaseProcessor,
    ProgressFn,
    TypedInput,
    null_progress,
    register_processor,
)
from audiolab_tpu.pipelines.separate import StemSeparator, apply_transform_chain


def dsp_vocal_split(audio: np.ndarray, sr: int) -> dict[str, np.ndarray]:
    """Checkpoint-free fallback: center-channel extraction + spectral mask.

    Vocals are mostly center-panned and harmonic; the mid-minus-side
    estimate gated by a per-bin voicedness mask gives a usable split for
    pipeline plumbing (not SDR-competitive with the neural ensemble)."""
    import jax.numpy as jnp

    from audiolab_tpu.kernels.stft import istft, stft

    if audio.ndim == 1:
        audio = np.stack([audio, audio])
    mid = 0.5 * (audio[0] + audio[1])
    side = 0.5 * (audio[0] - audio[1])

    n_fft, hop = 2048, 512
    rm, im = stft(jnp.asarray(mid), n_fft=n_fft, hop=hop)
    rs, is_ = stft(jnp.asarray(side), n_fft=n_fft, hop=hop)
    mag_m = jnp.sqrt(rm**2 + im**2 + 1e-12)
    mag_s = jnp.sqrt(rs**2 + is_**2 + 1e-12)
    # center dominance mask, soft
    mask = jnp.clip((mag_m - mag_s) / (mag_m + 1e-9), 0.0, 1.0) ** 2
    # vocals live mostly in 100 Hz - 12 kHz
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    band = ((freqs > 100) & (freqs < 12000)).astype(np.float32)
    mask = mask * jnp.asarray(band)[None, :]
    v = np.asarray(istft(rm * mask, im * mask, n_fft=n_fft, hop=hop, length=mid.shape[-1]))
    vocals = np.stack([v, v])
    inst = audio - vocals
    return {"vocals": vocals.astype(np.float32), "instrumental": inst.astype(np.float32)}


class Separate(BaseProcessor):
    title = "Separate"
    priority = 1
    description = "Split a track into vocal and instrumental stems."
    default_enabled = True
    allowed_kwargs = {
        "transform_chain": TypedInput(
            default=True, description="Apply dereverb/denoise transforms to stems",
            type=bool,
        ),
        "use_cache": TypedInput(
            default=True, description="Reuse cached stems when config+hash match",
            type=bool,
        ),
    }

    separator: StemSeparator | None = None  # injected neural ensemble

    @classmethod
    def configure(cls, separator: StemSeparator) -> None:
        cls.separator = separator

    def _cache_key(self, path: str, cfg: dict) -> str:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for blk in iter(lambda: f.read(1 << 20), b""):
                h.update(blk)
        h.update(json.dumps(cfg, sort_keys=True).encode())
        return h.hexdigest()[:16]

    def process_audio(
        self, inputs: list[ProjectFiles], callback: ProgressFn = null_progress, **kw
    ) -> list[ProjectFiles]:
        use_chain = kw.get("transform_chain", True)
        use_cache = kw.get("use_cache", True)
        for proj in inputs:
            stage = proj.stage_dir("stems")
            src = proj.last_outputs[0]
            key = self._cache_key(src, {"chain": use_chain})
            cache_meta = os.path.join(stage, "cache.json")
            base = os.path.splitext(os.path.basename(src))[0]
            v_path = os.path.join(stage, f"{base} (Vocals).wav")
            i_path = os.path.join(stage, f"{base} (Instrumental).wav")

            if use_cache and os.path.exists(cache_meta):
                with open(cache_meta) as f:
                    if json.load(f).get("key") == key and os.path.exists(v_path):
                        proj.add_output("stems", [v_path, i_path])
                        continue

            a = read_audio(src)
            audio = a.samples if a.channels == 2 else np.vstack([a.samples, a.samples])
            if self.separator is not None:
                stems = self.separator.separate(audio, callback=callback)
            else:
                callback(0, "Separating (DSP fallback)", 1)
                stems = dsp_vocal_split(audio, a.sample_rate)
            if use_chain:
                stems = apply_transform_chain(stems, a.sample_rate)

            write_audio(v_path, stems["vocals"], a.sample_rate)
            write_audio(i_path, stems["instrumental"], a.sample_rate)
            with open(cache_meta, "w") as f:
                json.dump({"key": key}, f)
            proj.add_output("stems", [v_path, i_path])
        return inputs


register_processor(Separate())
