"""PyanNet — pyannote segmentation-3.0's model, checkpoint-compatible.

The reference diarizes with pyannote/speaker-diarization-3.1
(modules/cloning/speaker_separation.py:39-45), whose local segmentation
model is PyanNet (pyannote.audio models/segmentation/PyanNet.py):

  SincNet frontend (sincnet.py): InstanceNorm over the waveform, a
  parametrized sinc band-pass filterbank (asteroid ParamSincFB: 80
  filters, kernel 251, stride 10; learned low_hz_/band_hz_), |.|, then
  two Conv1d(5) stages — each followed by MaxPool(3) + affine
  InstanceNorm + leaky_relu
  -> 4-layer bidirectional LSTM (hidden 128)
  -> 2 leaky-relu Linear(128) layers
  -> classifier Linear(7) + log-softmax over the POWERSET classes
     {∅, s0, s1, s2, s0s1, s0s2, s1s2} (3 speakers, <=2 per frame)

``convert_pyannet`` consumes the lightning checkpoint's state-dict names
(sincnet.conv1d.0.filterbank.low_hz_, lstm.weight_ih_l2_reverse, ...);
parity is gated against a seeded torch replica with those names
(tests/torch_pyannet_replica.py).

TPU notes: the sinc filters are synthesized from 160 scalars at trace
time into an ordinary (251, 1, 80) conv kernel — one VALID conv on the
MXU; the LSTM runs as 8 scan passes (4 layers x 2 directions).

Frame rate: stride 10 then 3 maxpools of 3 -> 270 samples/frame
(16.875 ms at 16 kHz).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PyanNetConfig:
    sample_rate: int = 16000
    n_filters: int = 80
    kernel_size: int = 251
    stride: int = 10
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_dim: int = 128
    num_classes: int = 7        # powerset(3 speakers, max 2 per frame)

    @property
    def frame_hop(self) -> int:
        return self.stride * 27  # three MaxPool(3) stages


# powerset class -> member speakers (pyannote.audio utils/powerset.py,
# combinations ordered by size then lexicographically)
POWERSET_3_2 = ((), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2))


def powerset_to_multilabel(log_probs: jnp.ndarray,
                           n_speakers: int = 3) -> jnp.ndarray:
    """(..., 7) log-probs -> hard per-speaker activity (..., 3) in {0,1}
    (Powerset.to_multilabel: argmax then class membership)."""
    mapping = np.zeros((len(POWERSET_3_2), n_speakers), np.float32)
    for ci, members in enumerate(POWERSET_3_2):
        for s in members:
            mapping[ci, s] = 1.0
    best = jnp.argmax(log_probs, axis=-1)
    return jnp.asarray(mapping)[best]


class SincFilterbank(nn.Module):
    """asteroid ParamSincFB as used by pyannote's SincNet: learned
    low_hz_/band_hz_ -> band-pass sinc kernels, stride-10 VALID conv,
    magnitude."""

    cfg: PyanNetConfig

    @nn.compact
    def __call__(self, x):
        """(b, n, 1) -> (b, t, n_filters)."""
        c = self.cfg
        half = c.kernel_size // 2
        low_hz = self.param("low_hz", nn.initializers.zeros,
                            (c.n_filters, 1))
        band_hz = self.param("band_hz", nn.initializers.zeros,
                             (c.n_filters, 1))
        low = c.min_low_hz + jnp.abs(low_hz)
        high = jnp.clip(low + c.min_band_hz + jnp.abs(band_hz),
                        c.min_low_hz, c.sample_rate / 2)
        band = (high - low)[:, 0]
        # left half of the symmetric filter (SincNet formulation)
        n_lin = np.linspace(0, half - 1, half, dtype=np.float32)
        window = 0.54 - 0.46 * np.cos(2 * np.pi * n_lin / c.kernel_size)
        n_ = (2 * np.pi * np.arange(-half, 0, dtype=np.float32)
              / c.sample_rate)[None]
        f_low = low * n_
        f_high = high * n_
        left = ((jnp.sin(f_high) - jnp.sin(f_low)) / (n_ / 2)) * window[None]
        center = 2 * band[:, None]
        right = left[:, ::-1]
        filt = jnp.concatenate([left, center, right], axis=1)
        filt = filt / (2 * band[:, None])            # (n_filters, k)
        kernel = filt.T[:, None, :]                  # (k, 1, n_filters)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(c.stride,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"))
        return jnp.abs(y)


class AffineInstanceNorm(nn.Module):
    """torch InstanceNorm1d(affine=True) over the time axis (axis 1 of
    (b, t, c))."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        y = (x - mu) / jnp.sqrt(var + self.eps)
        d = x.shape[-1]
        return (y * self.param("weight", nn.initializers.ones, (d,))
                + self.param("bias", nn.initializers.zeros, (d,)))


def _maxpool3(x):
    n = x.shape[1] // 3
    return jnp.max(x[:, : n * 3].reshape(x.shape[0], n, 3, x.shape[-1]),
                   axis=2)


class SincNet(nn.Module):
    cfg: PyanNetConfig

    @nn.compact
    def __call__(self, wav):
        """(b, n) 16 kHz -> (b, t, 60)."""
        c = self.cfg
        x = wav[..., None]                            # (b, n, 1)
        x = AffineInstanceNorm(name="wav_norm")(x)
        x = SincFilterbank(c, name="sinc")(x)
        x = nn.leaky_relu(AffineInstanceNorm(name="norm_0")(_maxpool3(x)),
                          negative_slope=0.01)
        for i, ch in enumerate((60, 60)):
            x = nn.Conv(ch, (5,), padding="VALID", name=f"conv_{i + 1}")(x)
            x = _maxpool3(x)
            x = nn.leaky_relu(AffineInstanceNorm(name=f"norm_{i + 1}")(x),
                              negative_slope=0.01)
        return x


class TorchBiLSTM(nn.Module):
    """torch nn.LSTM(bidirectional=True, num_layers=N) equivalent; weights
    convert gate-for-gate from weight_ih_l{k}(_reverse)."""

    hidden: int
    layers: int

    @nn.compact
    def __call__(self, x):
        for k in range(self.layers):
            cell = lambda d: nn.OptimizedLSTMCell(  # noqa: E731
                self.hidden, param_dtype=x.dtype, name=f"l{k}_{d}_cell")
            fwd = nn.RNN(cell("fwd"))(x)
            bwd = nn.RNN(cell("bwd"), reverse=True, keep_order=True)(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return x


class PyanNet(nn.Module):
    cfg: PyanNetConfig = PyanNetConfig()

    @nn.compact
    def __call__(self, wav):
        """(b, n) -> (b, t, num_classes) log-probs (powerset)."""
        c = self.cfg
        x = SincNet(c, name="sincnet")(wav)
        x = TorchBiLSTM(c.lstm_hidden, c.lstm_layers, name="lstm")(x)
        for i in range(2):
            x = nn.leaky_relu(
                nn.Dense(c.linear_dim, name=f"linear_{i}")(x),
                negative_slope=0.01)
        x = nn.Dense(c.num_classes, name="classifier")(x)
        return jax.nn.log_softmax(x, axis=-1)
