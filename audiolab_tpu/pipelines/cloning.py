"""Voice-cloning facade: OpenVoice conversion, TTS cloning, diarization.

Reference surface (modules/cloning/main.py:19-149, SURVEY §2.3):
  - clone_voice_openvoice(src, ref): tone-color conversion in 10 s chunks
    with crossfade concat (openvoice.py:29-157)
  - clone_voice_tts(text, ref): XTTS-v2 clone+TTS (tts.py:27-192) — here
    routed to the Zonos engine with a speaker embedding from the reference
  - choose_speaker / split per speaker: pyannote 3.1 diarization
    (speaker_separation.py:24-209) — here a windowed-embedding k-means
    diarizer over the in-repo SpeakerEncoder
  - /api/v1/clone/{voices,methods} (wrappers/clone.py:615,637)"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from audiolab_tpu.core.chunking import extract_chunks, plan_chunks, stitch_chunks
from audiolab_tpu.kernels.mel import log_mel, mel_spectrogram
from audiolab_tpu.kernels.resample import resample_poly_np
from audiolab_tpu.kernels.stft import spectrogram
from audiolab_tpu.models.openvoice import ToneColorConfig, ToneColorConverter
from audiolab_tpu.models.zonos import SpeakerEncoder
from audiolab_tpu.retrieval.index import kmeans


# ------------------------------------------------------------------ openvoice

@dataclass
class OpenVoiceCloneConfig:
    chunk_seconds: float = 10.0
    overlap_seconds: float = 0.5


class OpenVoiceCloner:
    def __init__(self, cfg: ToneColorConfig, params,
                 ccfg: OpenVoiceCloneConfig | None = None):
        self.cfg = cfg
        self.model = ToneColorConverter(cfg)
        self.params = params
        self.ccfg = ccfg or OpenVoiceCloneConfig()

    def _ref_spec(self, wav: jnp.ndarray) -> jnp.ndarray:
        # openvoice extracts speaker embeddings from the LINEAR spectrogram
        # (se_extractor/api), not mel
        from audiolab_tpu.kernels.stft import spectrogram

        # center=False matches upstream extract_se (api.py:65-67)
        return spectrogram(wav, n_fft=self.cfg.n_fft, hop=self.cfg.hop,
                           power=1.0, center=False)

    def extract_se(self, wav: np.ndarray, sr: int) -> np.ndarray:
        x = np.asarray(wav, np.float32)
        if sr != self.cfg.sr:
            x = resample_poly_np(x, sr, self.cfg.sr)
        g = self.model.apply({"params": self.params}, self._ref_spec(jnp.asarray(x)[None]),
                             method=ToneColorConverter.extract_se)
        return np.asarray(g[0])

    def convert(self, src: np.ndarray, src_sr: int, ref: np.ndarray,
                ref_sr: int) -> tuple[np.ndarray, int]:
        """Tone-color conversion in chunked batches w/ crossfade stitch."""
        c = self.cfg
        x = np.asarray(src, np.float32)
        if src_sr != c.sr:
            x = resample_poly_np(x, src_sr, c.sr)
        g_src = jnp.asarray(self.extract_se(x, c.sr))[None]
        g_tgt = jnp.asarray(self.extract_se(ref, ref_sr))[None]

        chunk = int(self.ccfg.chunk_seconds * c.sr)
        chunk -= chunk % c.hop
        overlap = int(self.ccfg.overlap_seconds * c.sr)
        overlap -= overlap % c.hop
        plan = plan_chunks(len(x), chunk, overlap)
        chunks = extract_chunks(jnp.asarray(x), plan)   # (count, chunk)
        spec = spectrogram(chunks, c.n_fft, c.hop, c.n_fft, center=True,
                           power=1.0)
        frames = chunk // c.hop
        spec = spec[:, :frames]
        lengths = jnp.full((plan.count,), frames, jnp.int32)
        out = self.model.apply(
            {"params": self.params}, spec, lengths,
            jnp.tile(g_src, (plan.count, 1)), jnp.tile(g_tgt, (plan.count, 1)),
            method=ToneColorConverter.convert,
        )  # (count, frames*hop)
        y = stitch_chunks(out, plan)
        return np.asarray(y[: len(x)], np.float32), c.sr


# ------------------------------------------------------------------ diarization

def neural_diarize(wav: np.ndarray, sr: int, diarizer=None
                   ) -> list[tuple[float, float, str]]:
    """pyannote-class two-stage diarization: EEND segmentation net +
    embedding clustering (models/diarize.py; reference
    speaker_separation.py:24-209).  Pass a NeuralDiarizer with converted/
    trained weights for real accuracy; default is random-init."""
    from audiolab_tpu.models.diarize import NeuralDiarizer

    return (diarizer or NeuralDiarizer()).diarize(wav, sr)


def diarize(
    wav: np.ndarray, sr: int, spk_encoder: SpeakerEncoder, spk_params,
    n_speakers: int = 2, window_s: float = 1.5, hop_s: float = 0.75,
) -> list[tuple[float, float, str]]:
    """Windowed speaker embeddings -> k-means -> merged turns (the fast
    fallback; neural_diarize is the pyannote-class path)."""
    x = np.asarray(wav, np.float32)
    if sr != 16000:
        x = resample_poly_np(x, sr, 16000)
        sr = 16000
    win, hop = int(window_s * sr), int(hop_s * sr)
    if len(x) < win:
        return [(0.0, len(x) / sr, "SPEAKER_00")]
    starts = np.arange(0, len(x) - win + 1, hop)
    frames = np.stack([x[s : s + win] for s in starts])
    mel = log_mel(mel_spectrogram(jnp.asarray(frames), sr=sr, n_fft=1024,
                                  hop=256, n_mels=80, power=1.0))
    embs = np.asarray(spk_encoder.apply({"params": spk_params}, mel))
    k = min(n_speakers, len(embs))
    cents = np.asarray(kmeans(jnp.asarray(embs), n_clusters=k))
    labels = np.argmax(embs @ cents.T, axis=-1)
    turns: list[tuple[float, float, str]] = []
    for i, lab in enumerate(labels):
        t0, t1 = starts[i] / sr, (starts[i] + win) / sr
        name = f"SPEAKER_{lab:02d}"
        if turns and turns[-1][2] == name and t0 <= turns[-1][1]:
            turns[-1] = (turns[-1][0], t1, name)
        else:
            turns.append((t0, t1, name))
    return turns


def split_speakers(wav: np.ndarray, sr: int, turns) -> dict[str, np.ndarray]:
    """Per-speaker concatenated audio (choose_speaker source material)."""
    out: dict[str, list[np.ndarray]] = {}
    for t0, t1, spk in turns:
        out.setdefault(spk, []).append(wav[int(t0 * sr) : int(t1 * sr)])
    return {k: np.concatenate(v) for k, v in out.items() if v}


# ------------------------------------------------------------------ facade

class CloningFacade:
    """modules/cloning/main.py equivalent: method dispatch + voice store."""

    methods = ["openvoice", "tts"]

    def __init__(self, openvoice: OpenVoiceCloner | None = None,
                 tts=None, spk_encoder=None, spk_params=None):
        self.openvoice = openvoice
        self.tts = tts            # ZonosTTS-compatible engine
        self.spk_encoder = spk_encoder
        self.spk_params = spk_params
        self.voices: dict[str, np.ndarray] = {}

    def register_voice(self, name: str, wav: np.ndarray, sr: int) -> None:
        self.voices[name] = np.asarray(wav, np.float32)
        self.voices[name + "__sr"] = np.asarray([sr])

    def clone_voice_openvoice(self, src, src_sr, ref, ref_sr):
        if self.openvoice is None:
            raise NotImplementedError("openvoice converter not loaded")
        return self.openvoice.convert(src, src_sr, ref, ref_sr)

    def clone_voice_tts(self, text: str, ref, ref_sr):
        if self.tts is None:
            raise NotImplementedError("tts engine not loaded")
        spk = self.tts.make_speaker_embedding(ref, ref_sr)
        return self.tts.synthesize(text, speaker=spk)

    def choose_speaker(self, wav, sr, n_speakers=2, index=0):
        turns = diarize(wav, sr, self.spk_encoder, self.spk_params, n_speakers)
        parts = split_speakers(np.asarray(wav, np.float32), sr, turns)
        names = sorted(parts)
        return parts[names[min(index, len(names) - 1)]], turns
