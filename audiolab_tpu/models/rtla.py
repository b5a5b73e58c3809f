"""Real-time lyric alignment (rtla): CRNN frame classifier + online DTW.

Reference behavior (modules/rtla/, SURVEY §2.3):
  - CRNN frame classifier over mel frames -> phoneme/chroma posteriors
    (CRNN_model.py:177)
  - OLTW online dynamic time warping with a bounded search window
    (oltw.py:15-287): incremental alignment of a live stream against a
    reference feature sequence
  - stream chunker simulating real-time input (stream_processor.py:64)
  - make_path_strictly_monotonic (utils.py)

TPU design: the CRNN is conv blocks + a GRU done as `lax.scan` (recurrence
is inherent; the scan body is fully fused by XLA).  OLTW itself is a
sequential host algorithm with O(window) work per frame — it stays numpy
(it is not a FLOPs problem), while feature extraction is batched on
device."""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CRNNConfig:
    n_mels: int = 80
    n_classes: int = 72        # phoneme classes (or 12 for chroma targets)
    conv_ch: tuple = (32, 32, 64)
    gru_dim: int = 128


class GRUCell(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, h, x):
        z = nn.sigmoid(nn.Dense(self.dim, name="wz")(jnp.concatenate([x, h], -1)))
        r = nn.sigmoid(nn.Dense(self.dim, name="wr")(jnp.concatenate([x, h], -1)))
        n = jnp.tanh(nn.Dense(self.dim, name="wn")(jnp.concatenate([x, r * h], -1)))
        h = (1 - z) * n + z * h
        return h, h


class CRNN(nn.Module):
    cfg: CRNNConfig = CRNNConfig()

    @nn.compact
    def __call__(self, mel):
        """(b, t, n_mels) -> frame posteriors (b, t, n_classes)."""
        c = self.cfg
        h = mel[..., None]
        for i, ch in enumerate(c.conv_ch):
            h = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv_{i}")(h)
            h = nn.relu(nn.LayerNorm(name=f"ln_{i}")(h))
            h = nn.max_pool(h, (1, 2), strides=(1, 2))
        b, t, f, ch = h.shape
        h = h.reshape(b, t, f * ch)
        cell = nn.scan(
            GRUCell, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(c.gru_dim, name="gru")
        h0 = jnp.zeros((b, c.gru_dim))
        _, seq = cell(h0, h)
        return jax.nn.log_softmax(nn.Dense(c.n_classes, name="head")(seq))


class _Affine(nn.Module):
    """Per-channel scale+bias (inference-folded BatchNorm2d)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


@dataclass(frozen=True)
class RtlaCRNNConfig:
    """The published pretrained-model.safetensors hyperparameters come from
    its sibling pretrained-model.json (modules/rtla/utils.py:30-39)."""

    n_mels: int = 66              # modules/rtla/config.py N_MELS
    num_lbl: int = 72             # phoneme classes (config.num_lbl)
    model_complexity: int = 16    # model_size = 16 * complexity

    @property
    def model_size(self) -> int:
        return self.model_complexity * 16


class RtlaCRNN(nn.Module):
    """Checkpoint-faithful RTLA frame classifier (reference
    modules/rtla/CRNN_model.py:63-160): ConvStack (two 3x3 conv+BN+ReLU at
    ms/16 channels, maxpool(1,2), one conv+BN+ReLU at ms/8, maxpool(1,2),
    flatten channel-major, Linear to ms) -> unidirectional LSTM(ms) ->
    Linear(num_lbl).  BatchNorms are inference-folded to affines;
    converter: utils/convert.convert_rtla_crnn."""

    cfg: RtlaCRNNConfig = RtlaCRNNConfig()

    @nn.compact
    def __call__(self, feat):
        """(b, t, n_mels) mel-dB features -> frame logits (b, t, num_lbl)."""
        c = self.cfg
        ms = c.model_size
        x = feat[..., None]                       # (b, t, F, 1)
        x = nn.Conv(ms // 16, (3, 3), padding="SAME", name="conv_0")(x)
        x = nn.relu(_Affine(name="bn_0")(x))
        x = nn.Conv(ms // 16, (3, 3), padding="SAME", name="conv_1")(x)
        x = nn.relu(_Affine(name="bn_1")(x))
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = nn.Conv(ms // 8, (3, 3), padding="SAME", name="conv_2")(x)
        x = nn.relu(_Affine(name="bn_2")(x))
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        # torch: (N, C, T, F') -> transpose(1,2) -> flatten(-2): index c*F'+f
        b, t, f, ch = x.shape
        x = x.transpose(0, 1, 3, 2).reshape(b, t, ch * f)
        x = nn.Dense(ms, name="fc")(x)            # ConvStack.fc.0
        cell = nn.OptimizedLSTMCell(ms, param_dtype=x.dtype, name="lstm_cell")
        x = nn.RNN(cell)(x)                       # model.1.rnn (uni-dir)
        return nn.Dense(c.num_lbl, name="head")(x)  # model.2 (raw logits)


def rtla_mel_db(wav: np.ndarray, sr: int = 16000, n_mels: int = 66,
                hop: int = 640, top_db: float = 80.0) -> jnp.ndarray:
    """The RTLA CRNN front end (modules/rtla/CRNN_model.py:24-35 +
    config.py): power mel, n_fft = 2*hop, center=False, unit-peak (inf-norm)
    filters, AmplitudeToDB(power, top_db=80).  wav (n,) -> (t, n_mels)."""
    from audiolab_tpu.kernels.mel import mel_spectrogram

    w = jnp.asarray(wav, jnp.float32)
    m = mel_spectrogram(w[None], sr=sr, n_fft=2 * hop, hop=hop,
                        n_mels=n_mels, norm="inf", power=2.0,
                        center=False)[0]
    db = 10.0 * jnp.log10(jnp.clip(m, 1e-10, None))
    return jnp.maximum(db, db.max() - top_db)


def phoneme_features(wav: np.ndarray, sr: int, model, params,
                     hop: int = 640, temperature: float = 1.0) -> np.ndarray:
    """Phoneme posteriorgram feature stream for OLTW (reference
    modules/rtla/utils.py:94-106 process_phonemes): CRNN frame logits ->
    softmax(T) -> log1p(p*5)/4; returns (C, T) to vstack with chroma."""
    import jax as _jax

    if sr != 16000:
        from audiolab_tpu.kernels.resample import resample_poly_np

        wav = resample_poly_np(np.asarray(wav, np.float32), sr, 16000)
        sr = 16000
    feat = rtla_mel_db(np.asarray(wav, np.float32), sr=sr,
                       n_mels=model.cfg.n_mels, hop=hop)
    logits = _jax.jit(
        lambda p, f: model.apply({"params": p}, f[None])[0])(params, feat)
    p = _jax.nn.softmax(jnp.asarray(logits) / temperature, axis=-1)
    ph = np.asarray(jnp.log1p(p * 5.0) / 4.0).T        # (C, T)
    return ph[:, 1:-1] if ph.shape[1] > 2 else ph      # trim context frames


# ------------------------------------------------------------------ OLTW

class OLTW:
    """Online DTW (oltw.py semantics): align a stream of feature frames to a
    reference sequence with a bounded window and run-length constraints."""

    def __init__(self, ref: np.ndarray, window: int = 64, max_run: int = 3,
                 metric: str = "cosine"):
        self.ref = np.ascontiguousarray(ref, np.float32)   # (n_ref, d)
        if metric == "cosine":
            norms = np.linalg.norm(self.ref, axis=1, keepdims=True) + 1e-8
            self.ref_n = self.ref / norms
        self.metric = metric
        self.window = window
        self.max_run = max_run
        self.n_ref = len(ref)
        self.j = 0                    # current reference index
        self.t = 0                    # current stream index
        self.run = 0
        self.last_dir = None
        big = np.float32(1e9)
        self.D = np.full((self.n_ref,), big, np.float32)   # rolling column
        self.D_prev = np.full((self.n_ref,), big, np.float32)
        self.path: list[tuple[int, int]] = []

    def _dist_col(self, x: np.ndarray) -> np.ndarray:
        lo = max(0, self.j - self.window)
        hi = min(self.n_ref, self.j + self.window)
        seg = self.ref_n[lo:hi] if self.metric == "cosine" else self.ref[lo:hi]
        if self.metric == "cosine":
            xn = x / (np.linalg.norm(x) + 1e-8)
            d = 1.0 - seg @ xn
        else:
            d = np.linalg.norm(seg - x, axis=1)
        col = np.full((self.n_ref,), 1e9, np.float32)
        col[lo:hi] = d
        return col

    def insert(self, x: np.ndarray) -> int:
        """Feed one stream frame; returns current reference position."""
        d = self._dist_col(np.asarray(x, np.float32))
        lo = max(0, self.j - self.window)
        hi = min(self.n_ref, self.j + self.window)
        newD = np.full_like(self.D, 1e9)
        if self.t == 0:
            newD[lo:hi] = np.cumsum(d[lo:hi])
        else:
            for jj in range(lo, hi):
                best = self.D[jj]                       # (t-1, j) step right
                if jj > 0:
                    best = min(best, self.D[jj - 1])    # (t-1, j-1) diagonal
                    best = min(best, newD[jj - 1])      # (t, j-1) step down
                newD[jj] = d[jj] + best
        self.D_prev = self.D
        self.D = newD
        # advance reference pointer toward the window minimum, bounded by
        # the run-length constraint (no more than max_run pure advances)
        jmin = int(np.argmin(self.D[lo:hi])) + lo
        if jmin > self.j:
            if self.last_dir == "ref" and self.run >= self.max_run:
                self.run = 0
                self.last_dir = "stream"
            else:
                self.j = min(self.j + 1, self.n_ref - 1)
                self.run = self.run + 1 if self.last_dir == "ref" else 1
                self.last_dir = "ref"
        else:
            self.run = self.run + 1 if self.last_dir == "stream" else 1
            self.last_dir = "stream"
        self.t += 1
        self.path.append((self.t - 1, self.j))
        return self.j

    def align(self, stream: np.ndarray) -> np.ndarray:
        """Offline convenience: feed all frames; returns (t, 2) path."""
        for x in stream:
            self.insert(x)
        return np.asarray(self.path)


def make_path_strictly_monotonic(path: np.ndarray) -> np.ndarray:
    """Deduplicate so both coordinates strictly increase (utils.py)."""
    out = [path[0]]
    for t, j in path[1:]:
        lt, lj = out[-1]
        if t > lt and j > lj:
            out.append((t, j))
    return np.asarray(out)


class StreamChunker:
    """Mock real-time chunker (stream_processor.py:64): yields fixed hops."""

    def __init__(self, wav: np.ndarray, sr: int, hop_s: float = 0.04):
        self.wav = np.asarray(wav, np.float32)
        self.hop = int(hop_s * sr)

    def __iter__(self):
        for s in range(0, len(self.wav) - self.hop + 1, self.hop):
            yield self.wav[s : s + self.hop]


# ------------------------------------------------------------------ chroma

CHROMA_A4 = 440.0


def chroma_features(wav: np.ndarray, sr: int, hop: int = 512,
                    n_fft: int = 2048) -> np.ndarray:
    """12-bin chroma from an STFT magnitude (align layout's warp features)."""
    from audiolab_tpu.kernels.stft import spectrogram

    mag = np.asarray(spectrogram(jnp.asarray(wav)[None], n_fft, hop,
                                 center=True, power=1.0))[0]  # (t, bins)
    freqs = np.linspace(0, sr / 2, mag.shape[1])
    chroma = np.zeros((mag.shape[0], 12), np.float32)
    valid = freqs > 30.0
    pitch = 12.0 * np.log2(np.maximum(freqs, 1e-3) / CHROMA_A4) + 69.0
    bins = np.round(pitch).astype(int) % 12
    for b in range(12):
        sel = valid & (bins == b)
        if sel.any():
            chroma[:, b] = mag[:, sel].sum(axis=1)
    norm = np.linalg.norm(chroma, axis=1, keepdims=True) + 1e-8
    return chroma / norm
