"""RMVPE f0 estimator in flax (reference: modules/rvc/infer/lib/rmvpe.py).

Architecture parity with E2E(4, 1, (2,2)) so the published rmvpe.pt weights
convert directly:

  mel (128 bins, n_fft 1024, hop 160, 30-8000 Hz, log)        rmvpe.py:475-557
  DeepUnet: 5 enc (ResEncoderBlocks, avgpool 2x2) + 4 inter + 5 dec
  cnn 3x3 -> 3 ch                                              rmvpe.py:430-473
  BiGRU(3*128 -> 256) -> Dense 360 -> sigmoid                  rmvpe.py:217-230
  decode: local weighted argmax over 360 20-cent bins          rmvpe.py:558-687

TPU notes: NHWC conv layout; the BiGRU runs as two lax.scan passes (time is
the scan axis) — one compile, sequential in T but tiny (hidden 256).
BatchNorms run in inference mode (scale/bias + running stats folded by the
converter).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.mel import mel_spectrogram
from audiolab_tpu.kernels.stft import spectrogram

N_MELS = 128
N_CLASS = 360


class ConvBlockRes(nn.Module):
    out_channels: int
    dtype: str | None = None  # None = follow input (fp32/fp64 parity);
                              # "bfloat16" rides the MXU like the
                              # reference's is_half fp16 mode (rmvpe.py)

    @nn.compact
    def __call__(self, x):
        dt = self.dtype and jnp.dtype(self.dtype)
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False, dtype=dt, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, dtype=dt, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False, dtype=dt, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, dtype=dt, name="bn2")(y)
        y = nn.relu(y)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=dt, name="shortcut")(x)
        return y + x


class ResEncoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 4
    pool: bool = True
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, self.dtype, name=f"block_{i}")(x)
        if self.pool:
            pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
            return x, pooled
        return x


class ResDecoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 4
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, skip):
        # torch ConvTranspose2d k3 s2 p1 outpad1 (exact 2x upsample) maps to
        # flax padding ((1,2),(1,2)) with a spatially-flipped kernel — the
        # correspondence is validated to 1e-14 in tests/test_torch_parity_full
        dt = self.dtype and jnp.dtype(self.dtype)
        x = nn.ConvTranspose(
            self.out_channels, (3, 3), strides=(2, 2),
            padding=((1, 2), (1, 2)), use_bias=False, dtype=dt, name="convt",
        )(x)
        x = nn.BatchNorm(use_running_average=True, dtype=dt, name="bn")(x)
        x = nn.relu(x)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, self.dtype, name=f"block_{i}")(x)
        return x


class DeepUnet(nn.Module):
    en_de_layers: int = 5
    inter_layers: int = 4
    n_blocks: int = 4
    en_out_channels: int = 16
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        # x (b, T, 128, 1)
        x = nn.BatchNorm(use_running_average=True, name="bn_in")(x)
        if self.dtype:
            x = x.astype(jnp.dtype(self.dtype))
        skips = []
        ch = self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(ch, self.n_blocks, pool=True, dtype=self.dtype, name=f"enc_{i}")(x)
            skips.append(skip)
            ch *= 2
        # intermediate: first maps ch//2? reference: Intermediate(out_ch//2 -> out_ch)
        for i in range(self.inter_layers):
            x = ResEncoderBlock(ch, self.n_blocks, pool=False, dtype=self.dtype, name=f"inter_{i}")(x)
        for i in range(self.en_de_layers):
            ch //= 2
            x = ResDecoderBlock(ch, self.n_blocks, dtype=self.dtype, name=f"dec_{i}")(x, skips[-1 - i])
        return x


class BiGRU(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        # x (b, t, f); carry dtype follows the input so the fp64 parity
        # path works (GRUCell's initialize_carry uses param_dtype)
        cell = lambda: nn.GRUCell(self.hidden, param_dtype=x.dtype)
        fwd = nn.RNN(cell(), name="fwd")(x)
        bwd = nn.RNN(cell(), reverse=True, keep_order=True, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class E2E(nn.Module):
    """rmvpe.py:430-473 with n_blocks=4, n_gru=1, kernel (2,2).

    Sizes are configurable so parity tests can run a structurally identical
    small variant; the defaults match the published rmvpe.pt checkpoint."""

    en_de_layers: int = 5
    inter_layers: int = 4
    n_blocks: int = 4
    en_out_channels: int = 16
    gru_hidden: int = 256
    dtype: str | None = None  # "bfloat16" = the reference's is_half mode

    @nn.compact
    def __call__(self, mel):
        # mel (b, T, 128) — note reference feeds (b, 1, T, 128) NCHW
        t = mel.shape[1]
        pad = (-t) % (1 << self.en_de_layers)
        x = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))[..., None]  # (b,T,128,1)
        x = DeepUnet(self.en_de_layers, self.inter_layers, self.n_blocks,
                     self.en_out_channels, self.dtype, name="unet")(x)
        x = nn.Conv(3, (3, 3), padding="SAME", name="cnn")(x)  # (b,T,128,3)
        x = x.astype(mel.dtype)  # GRU/decode stay in the input precision
        # reference flattens channel-major: (b,3,T,128)->(b,T,3*128), so the
        # GRU input index is c*128+m — transpose before reshape to match
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(x.shape[0], x.shape[1], -1)
        x = BiGRU(self.gru_hidden, name="gru")(x)
        x = nn.Dense(N_CLASS, name="fc")(x)
        return jax.nn.sigmoid(x)[:, :t]


_CENTS = 20 * np.arange(N_CLASS) + 1997.3794084376191  # rmvpe.py cents_mapping


def decode_f0(hidden: jnp.ndarray, threshold: float = 0.03) -> jnp.ndarray:
    """Salience (b, t, 360) -> f0 Hz (b, t) by ±4-bin local weighted average
    around the argmax (rmvpe.py RMVPE.decode/to_local_average_cents)."""
    cents_map = jnp.asarray(np.pad(_CENTS, 4))  # pad 4 each side
    center = jnp.argmax(hidden, axis=-1)  # (b, t)
    hp = jnp.pad(hidden, ((0, 0), (0, 0), (4, 4)))
    idx = center[..., None] + jnp.arange(9)[None, None, :]  # (b,t,9)
    w = jnp.take_along_axis(hp, idx, axis=-1)
    c = cents_map[idx]
    cents = jnp.sum(w * c, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1e-9)
    maxx = jnp.max(hidden, axis=-1)
    cents = jnp.where(maxx > threshold, cents, 0.0)
    f0 = 10.0 * jnp.power(2.0, cents / 1200.0)
    return jnp.where(cents > 0, f0, 0.0)


class RMVPE:
    """Inference wrapper: audio 16 kHz -> f0 (the reference's RMVPE class)."""

    def __init__(self, params=None, batch_stats=None,
                 dtype: str | None = "bfloat16"):
        # default bf16 conv stack = the reference's is_half fp16 inference
        # mode (rmvpe.py runs the E2E net in half precision on CUDA);
        # parity tests construct E2E directly and stay full-precision
        self.model = E2E(dtype=dtype)
        self.variables = None
        if params is not None:
            self.variables = {"params": params, "batch_stats": batch_stats or {}}

    @classmethod
    def from_checkpoint(cls, path: str) -> "RMVPE":
        """Load the published rmvpe.pt (torch state_dict, rmvpe.py:687)."""
        from audiolab_tpu.utils.convert import load_rmvpe_checkpoint

        variables = load_rmvpe_checkpoint(path)
        return cls(variables["params"], variables["batch_stats"])

    def init(self, rng, t_frames: int = 320):
        mel = jnp.zeros((1, t_frames, N_MELS))
        self.variables = self.model.init(rng, mel)
        return self.variables

    @partial(jax.jit, static_argnums=(0,))
    def _run(self, variables, mel):
        return self.model.apply(variables, mel)

    def mel(self, audio16k: jnp.ndarray) -> jnp.ndarray:
        # reference MelSpectrogram(128, 16000, 1024, 160, fmin 30, fmax 8000)
        # builds its filterbank with librosa htk=True (rmvpe.py:490-498)
        m = mel_spectrogram(
            audio16k, sr=16000, n_fft=1024, hop=160, n_mels=N_MELS,
            fmin=30.0, fmax=8000.0, htk=True, norm="slaney", power=1.0,
        )
        return jnp.log(jnp.clip(m, 1e-5, None))

    def infer(self, audio16k: jnp.ndarray, threshold: float = 0.03) -> jnp.ndarray:
        """(n,) or (b, n) 16 kHz audio -> f0 (b, t) at 100 Hz frame rate."""
        if audio16k.ndim == 1:
            audio16k = audio16k[None]
        if self.variables is None:  # lazy random init (converter fills real)
            self.init(jax.random.PRNGKey(0))
        mel = self.mel(audio16k)
        # reference reflect-pads mel frames to a multiple of 32 before the
        # U-net and slices back (rmvpe.py mel2hidden); E2E's internal zero
        # pad is then a no-op
        t = mel.shape[1]
        pad = min((-t) % 32, t - 1)
        if pad:
            mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        hidden = self._run(self.variables, mel)[:, :t]
        return decode_f0(hidden, threshold)

    def infer_with_pitch(self, audio16k: jnp.ndarray,
                         threshold: float = 0.03, f0_min: float = 50.0,
                         f0_max: float = 1100.0) -> jnp.ndarray:
        """The fork's "rmvpe+" (pitch-dependent) variant
        (pitch_extraction.py:196-203 / rmvpe.py
        infer_from_audio_with_pitch): plain inference with out-of-range
        estimates zeroed."""
        f0 = self.infer(audio16k, threshold)
        return jnp.where((f0 < f0_min) | (f0 > f0_max), 0.0, f0)
