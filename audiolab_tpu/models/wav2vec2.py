"""wav2vec2-CTC forced aligner (flax) — WhisperX-style word timings.

The reference's transcription tab gets word-level timestamps from
WhisperX's alignment step (layouts/transcribe.py:89-112), which runs a
wav2vec2 CTC model (facebook/wav2vec2-base-960h class checkpoints) over
each segment and Viterbi-aligns the transcript characters through the CTC
posteriors.

wav2vec2-base and HuBERT-base share the encoder topology (conv feature
extractor -> feature projection -> conv positional embedding -> 12
post-LN transformer layers), so the backbone here IS models/hubert.Hubert;
only the CTC vocabulary head is new.  ``convert_wav2vec2`` maps the HF
``Wav2Vec2ForCTC`` state dict (transformers is the parity oracle in
tests/test_wav2vec2_parity.py).

TPU notes: one jitted forward per padded segment-batch; frames are
20 ms (320x downsample at 16 kHz); the trellis runs on host (numpy) —
it is O(T*L) sequential and tiny next to the encoder.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.hubert import Hubert, HubertConfig

# facebook/wav2vec2-base-960h vocabulary (uppercase chars, | = word break,
# <pad> doubles as the CTC blank — HF convention)
CTC_VOCAB_EN = {
    "<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4, "E": 5, "T": 6,
    "A": 7, "O": 8, "N": 9, "I": 10, "H": 11, "S": 12, "R": 13, "D": 14,
    "L": 15, "U": 16, "M": 17, "W": 18, "C": 19, "F": 20, "G": 21, "Y": 22,
    "P": 23, "B": 24, "V": 25, "K": 26, "'": 27, "X": 28, "J": 29, "Q": 30,
    "Z": 31,
}


@dataclass(frozen=True)
class Wav2Vec2Config:
    vocab_size: int = 32
    encoder: HubertConfig = field(default_factory=HubertConfig)


class Wav2Vec2CTC(nn.Module):
    """HF Wav2Vec2ForCTC equivalent: wav (b, n) 16 kHz -> logits (b, t, V)."""

    cfg: Wav2Vec2Config = Wav2Vec2Config()

    @nn.compact
    def __call__(self, wav):
        x = Hubert(self.cfg.encoder, name="encoder")(
            wav, output_layer=self.cfg.encoder.layers)
        return nn.Dense(self.cfg.vocab_size, name="lm_head")(x)


class CTCWordAligner:
    """Segment transcript -> word timings via CTC forced alignment.

    Replaces the energy heuristic when converted wav2vec2 weights are
    available (VERDICT r2 item 7; reference layouts/transcribe.py:89-112).
    """

    FRAME_S = 320.0 / 16000.0  # one encoder frame = 20 ms

    def __init__(self, params, cfg: Wav2Vec2Config | None = None,
                 vocab: dict[str, int] | None = None):
        self.cfg = cfg or Wav2Vec2Config()
        self.vocab = vocab or CTC_VOCAB_EN
        self.model = Wav2Vec2CTC(self.cfg)
        self.params = params
        self._logits = jax.jit(
            lambda w: jax.nn.log_softmax(
                self.model.apply({"params": params}, w), axis=-1))

    def _encode_words(self, words: list[str]) -> tuple[np.ndarray, list[int]]:
        """chars -> ids with | separators; returns (ids, per-token word idx)."""
        ids: list[int] = []
        owner: list[int] = []
        unk = self.vocab.get("<unk>", 3)
        sep = self.vocab.get("|", 4)
        for wi, w in enumerate(words):
            if wi:
                ids.append(sep)
                owner.append(-1)
            for ch in w.upper():
                ids.append(self.vocab.get(ch, unk))
                owner.append(wi)
        return np.asarray(ids, np.int64), owner

    def align_words(self, audio: np.ndarray, sr: int, start: float,
                    end: float, words: list[str]) -> list[dict]:
        from audiolab_tpu.pipelines.forced_align import (
            ctc_forced_align,
            energy_align_words,
        )

        words = [w for w in (w.strip() for w in words) if w]
        if not words:
            return []
        i0 = max(0, int(start * sr))
        i1 = min(len(audio), int(end * sr))
        seg = np.asarray(audio[i0:i1], np.float32)
        if len(seg) < sr // 25:  # <40 ms: no frames to align
            return energy_align_words(audio, sr, start, end, words)
        lp = np.asarray(self._logits(jnp.asarray(seg)[None])[0])
        ids, owner = self._encode_words(words)
        spans = ctc_forced_align(lp, ids, blank=self.vocab.get("<pad>", 0))
        out = []
        for wi, w in enumerate(words):
            tok = [spans[k] for k in range(len(ids)) if owner[k] == wi]
            if not tok:
                continue
            s = start + tok[0][0] * self.FRAME_S
            e = start + tok[-1][1] * self.FRAME_S
            out.append({"word": w, "start": round(s, 3),
                        "end": round(max(e, s + self.FRAME_S), 3)})
        return out


def random_ctc_aligner(seed: int = 0, vocab_size: int = 32,
                       layers: int = 2) -> CTCWordAligner:
    """Random-weight aligner (tiny encoder) for tests/serving without
    downloaded checkpoints."""
    cfg = Wav2Vec2Config(
        vocab_size=vocab_size,
        encoder=HubertConfig(dim=64, ffn_dim=128, heads=4, layers=layers))
    model = Wav2Vec2CTC(cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 16000), jnp.float32))["params"]
    return CTCWordAligner(params, cfg)
