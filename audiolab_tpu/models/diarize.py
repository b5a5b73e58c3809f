"""Neural speaker diarization (reference: pyannote/speaker-diarization-3.1
via modules/cloning/speaker_separation.py:24-209).

pyannote 3.1 is a two-stage system: a local end-to-end-neural (EEND-class)
segmentation model producing per-frame activity for up to K speakers per
chunk, then speaker-embedding clustering to stitch chunk-local speakers
into global identities.  Same structure here, TPU-first:

  SegmentationNet  log-mel -> conv frontend -> BiLSTM x2 -> Dense ->
                   sigmoid activities (t, K); trainable with the standard
                   permutation-invariant BCE (pit_bce_loss)
  SpeakerEmbedder  log-mel -> conv stack -> attentive stats pooling ->
                   L2-normed embedding (x-vector role)
  neural_diarize   10 s chunks, 5 s hop -> activities -> active regions ->
                   embeddings -> agglomerative clustering -> global turns

Weights-gated like the other model families: random init runs the full
path; converted/trained weights give real accuracy.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from itertools import permutations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.mel import mel_spectrogram


@dataclass(frozen=True)
class DiarizeConfig:
    sr: int = 16000
    n_mels: int = 64
    hop: int = 160               # 10 ms frames
    max_speakers: int = 3        # local speakers per chunk (pyannote K=3)
    hidden: int = 128
    emb_dim: int = 192
    chunk_s: float = 10.0
    chunk_hop_s: float = 5.0
    threshold: float = 0.5
    min_turn_s: float = 0.25
    cluster_threshold: float = 0.7   # cosine distance for agglomeration


class BiLSTM(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        cell = lambda: nn.OptimizedLSTMCell(self.hidden, param_dtype=x.dtype)
        fwd = nn.RNN(cell(), name="fwd")(x)
        bwd = nn.RNN(cell(), reverse=True, keep_order=True, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class SegmentationNet(nn.Module):
    """(b, t, n_mels) log-mel -> (b, t, K) speaker activities in [0,1]."""

    cfg: DiarizeConfig

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        h = nn.Conv(c.hidden, (5,), padding="SAME", name="conv1")(mel)
        h = nn.gelu(h)
        h = nn.Conv(c.hidden, (5,), padding="SAME", name="conv2")(h)
        h = nn.gelu(h)
        h = BiLSTM(c.hidden, name="lstm1")(h)
        h = BiLSTM(c.hidden, name="lstm2")(h)
        h = nn.gelu(nn.Dense(c.hidden, name="fc1")(h))
        return jax.nn.sigmoid(nn.Dense(c.max_speakers, name="fc2")(h))


class SpeakerEmbedder(nn.Module):
    """(b, t, n_mels) -> (b, emb_dim) L2-normalized (x-vector role)."""

    cfg: DiarizeConfig

    @nn.compact
    def __call__(self, mel, mask=None):
        c = self.cfg
        h = mel
        for i, d in enumerate((1, 2, 3)):
            h = nn.Conv(c.hidden, (5,), kernel_dilation=(d,), padding="SAME",
                        name=f"conv{i}")(h)
            h = nn.gelu(h)
        # attentive stats pooling: learned frame weights + weighted mu/sigma
        w = nn.Dense(1, name="attn")(jnp.tanh(h))[..., 0]  # (b, t)
        if mask is not None:
            w = jnp.where(mask > 0, w, -1e9)
        a = jax.nn.softmax(w, axis=-1)[..., None]
        mu = jnp.sum(a * h, axis=1)
        var = jnp.sum(a * (h - mu[:, None]) ** 2, axis=1)
        e = nn.Dense(c.emb_dim, name="proj")(
            jnp.concatenate([mu, jnp.sqrt(var + 1e-6)], axis=-1))
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True),
                               1e-6)


def pit_bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Permutation-invariant BCE over the K speaker channels (EEND loss):
    min over channel permutations of mean BCE.  pred/target (b, t, K)."""
    k = pred.shape[-1]
    eps = 1e-7
    losses = []
    for perm in permutations(range(k)):
        p = pred[..., list(perm)]
        bce = -(target * jnp.log(p + eps)
                + (1.0 - target) * jnp.log(1.0 - p + eps))
        losses.append(bce.mean(axis=(1, 2)))
    return jnp.min(jnp.stack(losses), axis=0).mean()


# ------------------------------------------------------------ pipeline

class NeuralDiarizer:
    def __init__(self, cfg: DiarizeConfig | None = None, seg_params=None,
                 emb_params=None, seed: int = 0, pyannet_params=None,
                 pyannet_cfg=None, wespeaker=None):
        """``pyannet_params``: converted pyannote segmentation-3.0 weights
        (utils.convert.load_pyannet_checkpoint) — when given, per-frame
        activities come from the checkpoint-compatible PyanNet
        (models/pyannet.py) instead of the in-repo SegmentationNet.

        ``wespeaker``: ``(WeSpeakerResNet, params)`` from
        utils.convert.load_wespeaker_checkpoint — when given, region
        embeddings come from the checkpoint-compatible wespeaker r-vector
        (models/wespeaker.py, the embedding stage of pyannote
        speaker-diarization-3.1) on raw-audio region windows instead of
        the in-repo SpeakerEmbedder; with ``pyannet_params`` too, both
        neural stages of the 3.1 pipeline run converted weights."""
        self.cfg = cfg or DiarizeConfig()
        self.seg = SegmentationNet(self.cfg)
        self.emb = SpeakerEmbedder(self.cfg)
        self.pyannet = None
        self.pyannet_params = pyannet_params
        if pyannet_params is not None:
            from audiolab_tpu.models.pyannet import PyanNet, PyanNetConfig

            self.pyannet = PyanNet(pyannet_cfg or PyanNetConfig())
        if seg_params is None or emb_params is None:
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            mel = jnp.zeros((1, 32, self.cfg.n_mels))
            seg_params = seg_params or self.seg.init(k1, mel)["params"]
            emb_params = emb_params or self.emb.init(k2, mel)["params"]
        self.seg_params = seg_params
        self.emb_params = emb_params
        self.wespeaker = wespeaker  # (WeSpeakerResNet, params) or None

    def _mel(self, wav: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        m = mel_spectrogram(wav, sr=c.sr, n_fft=1024, hop=c.hop,
                            n_mels=c.n_mels)
        return jnp.log(jnp.clip(m, 1e-5, None))

    @partial(jax.jit, static_argnums=(0,))
    def _activities(self, params, mel):
        return self.seg.apply({"params": params}, mel)

    @partial(jax.jit, static_argnums=(0,))
    def _embed(self, params, mel, mask):
        return self.emb.apply({"params": params}, mel, mask)

    def diarize(self, wav: np.ndarray, sr: int
                ) -> list[tuple[float, float, str]]:
        """-> [(start_s, end_s, 'SPEAKER_00'), ...] like pyannote turns."""
        c = self.cfg
        if sr != c.sr:
            from audiolab_tpu.kernels.resample import resample_poly_np

            wav = resample_poly_np(np.asarray(wav, np.float32), sr, c.sr)
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=0)
        chunk = int(c.chunk_s * c.sr)
        hop = int(c.chunk_hop_s * c.sr)
        n = len(wav)
        starts = list(range(0, max(1, n - chunk + 1), hop))
        if not starts or starts[-1] + chunk < n:
            starts.append(max(0, n - chunk))
        # pad tail so every chunk is full-size: ONE compiled shape
        pads = np.zeros(chunk, np.float32)
        batch = np.stack([
            np.concatenate([wav[s:s + chunk], pads])[:chunk] for s in starts
        ])
        mel = self._mel(jnp.asarray(batch))
        if self.pyannet is not None:
            from audiolab_tpu.models.pyannet import powerset_to_multilabel

            lp = jax.jit(lambda p, w: self.pyannet.apply({"params": p}, w))(
                self.pyannet_params, jnp.asarray(batch))
            ml = np.asarray(powerset_to_multilabel(lp))   # (B, tp, 3)
            # map PyanNet's 270-sample frames onto the mel (hop) frame grid
            tp, tm = ml.shape[1], mel.shape[1]
            idx = np.minimum((np.arange(tm) * tp // max(tm, 1)), tp - 1)
            act = ml[:, idx, : c.max_speakers]
        else:
            act = np.asarray(self._activities(self.seg_params, mel))  # (B,t,K)

        frame_s = c.hop / c.sr
        regions = []   # (global_start_f, global_end_f, chunk_i, local_k)
        mels, masks = [], []
        for bi, s in enumerate(starts):
            off = s / c.sr
            for k in range(c.max_speakers):
                a = act[bi, :, k] > c.threshold
                # valid frames only (tail chunk may be padded)
                t_valid = min(a.shape[0], int((n - s) / c.hop))
                a = a[:t_valid]
                edges = np.flatnonzero(np.diff(np.concatenate(
                    [[0], a.astype(np.int8), [0]])))
                for r0, r1 in zip(edges[::2], edges[1::2]):
                    if (r1 - r0) * frame_s < c.min_turn_s:
                        continue
                    regions.append((off + r0 * frame_s, off + r1 * frame_s))
                    mask = np.zeros(mel.shape[1], np.float32)
                    mask[r0:r1] = 1.0
                    mels.append(np.asarray(mel[bi]))
                    masks.append(mask)
        if not regions:
            return []
        if self.wespeaker is not None:
            embs = self._wespeaker_embs(wav, regions)
        else:
            embs = np.asarray(self._embed(
                self.emb_params, jnp.asarray(np.stack(mels)),
                jnp.asarray(np.stack(masks))))
        labels = _agglomerate(embs, self.cfg.cluster_threshold)
        turns = sorted(
            (r0, r1, f"SPEAKER_{labels[i]:02d}")
            for i, (r0, r1) in enumerate(regions))
        return _merge_turns(turns)


    def _wespeaker_embs(self, wav: np.ndarray,
                        regions: list[tuple[float, float]],
                        window_s: float = 3.0) -> np.ndarray:
        """Checkpoint-compatible r-vector embeddings per region: each
        region's raw audio is wrap-padded/cropped to one fixed window so
        every region shares a single compiled shape (pyannote crops the
        same way around each local-speaker support)."""
        from audiolab_tpu.models.wespeaker import wespeaker_embed

        model, params = self.wespeaker
        win = int(window_s * self.cfg.sr)
        segs = []
        for r0, r1 in regions:
            s0 = max(0, int(r0 * self.cfg.sr))
            s1 = min(len(wav), max(s0 + 1, int(r1 * self.cfg.sr)))
            seg = wav[s0:s1]
            segs.append(np.resize(seg, win))   # wrap-pad short regions
        return np.asarray(wespeaker_embed(
            model, params, np.stack(segs), sr=self.cfg.sr))


def _agglomerate(embs: np.ndarray, threshold: float) -> np.ndarray:
    """Average-linkage agglomerative clustering on cosine distance."""
    n = len(embs)
    clusters = [[i] for i in range(n)]
    means = [embs[i].copy() for i in range(n)]
    while len(clusters) > 1:
        m = np.stack([v / max(np.linalg.norm(v), 1e-9) for v in means])
        d = 1.0 - m @ m.T
        np.fill_diagonal(d, np.inf)
        i, j = np.unravel_index(np.argmin(d), d.shape)
        if d[i, j] > threshold:
            break
        clusters[i].extend(clusters[j])
        means[i] = embs[clusters[i]].mean(axis=0)
        del clusters[j], means[j]
    labels = np.zeros(n, np.int64)
    for ci, members in enumerate(clusters):
        labels[members] = ci
    return labels


def _merge_turns(turns: list[tuple[float, float, str]],
                 gap: float = 0.2) -> list[tuple[float, float, str]]:
    """Merge overlapping/adjacent same-speaker turns (chunk overlap dedup)."""
    out: list[list] = []
    for t0, t1, spk in turns:
        if out and out[-1][2] == spk and t0 <= out[-1][1] + gap:
            out[-1][1] = max(out[-1][1], t1)
        else:
            out.append([t0, t1, spk])
    return [(round(a, 3), round(b, 3), s) for a, b, s in out]
