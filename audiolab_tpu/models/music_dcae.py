"""MusicDCAE latent-codec boundary — ACE-Step's audio <-> latent chain
with the exact upstream constants (vendored reference:
modules/acestep/acestep/music_dcae/music_dcae_pipeline.py:30-150 and
music_log_mel.py).

The inner mel <-> latent autoencoder upstream is a diffusers AutoencoderDC
(``music_dcae_f8c8``) — implemented in models/dcae.py with a converter
(``utils.convert.load_dcae_checkpoint``) and wired in through
``dcae_codec_fns`` below.  Everything around it is also reproduced here
and is checkpoint-exact:

  - ``log_mel_44k``: LogMelSpectrogram(44.1k, n_fft 2048, hop 512,
    center=False with manual (win-hop)//2 reflect pad, sqrt(power + 1e-6),
    slaney/slaney filterbank 40..16000 Hz, log(clamp(1e-5)))
  - mel normalization to [-1, 1]: (mel + 11) / 14 then Normalize(0.5, 0.5)
  - latent scaling: z' = (z - shift) * scale with scale 0.1786,
    shift -1.9091 (and the inverse on decode)
  - mel -> audio through the CONVERTED AdamosVocoder (one channel at a
    time, like upstream), 512 samples per frame at 44.1 kHz

``encoder_fn`` / ``decoder_fn`` plug in any mel<->latent codec: the
trained-in-repo DCAE stand-in (models/acestep.ACEStepModel), an identity
for vocoder-only use, or a future converted AutoencoderDC.  With real
converted weights everywhere else, a converted DCAE drops in with NO other
code changes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.mel import mel_filterbank
from audiolab_tpu.kernels.stft import spectrogram

MIN_MEL = -11.0
MAX_MEL = 3.0
SCALE_FACTOR = 0.1786
SHIFT_FACTOR = -1.9091
SR = 44100
HOP = 512
N_FFT = 2048
TIME_MULTIPLE = 8  # DCAE temporal downsample: latent frame = 8 mel frames


def log_mel_44k(audio: jnp.ndarray) -> jnp.ndarray:
    """(..., t) 44.1 kHz -> (..., frames, 128) log-mel, upstream-exact
    (music_log_mel.py: center=False + manual reflect pad, sqrt(p + 1e-6),
    slaney 40..16k, log clamp 1e-5)."""
    pad_l = (N_FFT - HOP) // 2
    pad_r = (N_FFT - HOP + 1) // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad_l, pad_r)],
                mode="reflect")
    spec = spectrogram(x, n_fft=N_FFT, hop=HOP, center=False, power=1.0,
                       eps=1e-6)  # (..., T, 1025)
    fb = jnp.asarray(mel_filterbank(SR, N_FFT, 128, 40.0, 16000.0,
                                    htk=False, norm="slaney"))
    return jnp.log(jnp.clip(spec @ fb, 1e-5, None))


def normalize_mel(mel: jnp.ndarray) -> jnp.ndarray:
    """log-mel -> [-1, 1] (min/max scale then Normalize(0.5, 0.5))."""
    m = (mel - MIN_MEL) / (MAX_MEL - MIN_MEL)
    return (m - 0.5) / 0.5


def denormalize_mel(mel: jnp.ndarray) -> jnp.ndarray:
    m = mel * 0.5 + 0.5
    return m * (MAX_MEL - MIN_MEL) + MIN_MEL


def dcae_codec_fns(params, cfg=None):
    """Converted diffusers AutoencoderDC (models/dcae.py) -> the
    ``encoder_fn`` / ``decoder_fn`` pair MusicDCAE consumes.

    Layout bridge: the pipeline's mel is (b, ch, T, 128) and ACE-Step
    latents are torch-layout (b, 8, 16, t); the flax DCAE is NHWC with
    the mel image as (b, 128 bins, T, ch) — matching upstream's
    (b, ch, 128, T) NCHW orientation channel-for-channel."""
    import jax

    from audiolab_tpu.models.dcae import AutoencoderDC, DCAEConfig

    model = AutoencoderDC(cfg or DCAEConfig())

    @jax.jit
    def encoder_fn(mel):                     # (b, ch, T, 128)
        x = jnp.transpose(mel, (0, 3, 2, 1))     # (b, 128, T, ch)
        z = model.apply({"params": params}, x, method=AutoencoderDC.encode)
        return jnp.transpose(z, (0, 3, 1, 2))    # (b, 8, 16, t)

    @jax.jit
    def decoder_fn(z):                       # (b, 8, 16, t)
        zq = jnp.transpose(z, (0, 2, 3, 1))      # (b, 16, t, 8)
        x = model.apply({"params": params}, zq, method=AutoencoderDC.decode)
        return jnp.transpose(x, (0, 3, 2, 1))    # (b, ch, T, 128)

    return encoder_fn, decoder_fn


class MusicDCAE:
    """audio (b, ch, t) @44.1k <-> scaled latents, + latent -> audio."""

    def __init__(self, encoder_fn=None, decoder_fn=None,
                 vocoder=None, vocoder_params=None):
        self.encoder_fn = encoder_fn    # norm-mel (b, ch, T, 128) -> latent
        self.decoder_fn = decoder_fn    # latent -> norm-mel (b, ch, T, 128)
        self.vocoder = vocoder          # models/adamos_vocoder.AdamosVocoder
        self.vocoder_params = vocoder_params

    def encode(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(b, ch, t) 44.1 kHz -> scaled latents.  Pads t to a multiple of
        8*512 like upstream (music_dcae_pipeline.py:95-100)."""
        t = audio.shape[-1]
        block = TIME_MULTIPLE * HOP
        if t % block:
            audio = jnp.pad(
                audio, [(0, 0)] * (audio.ndim - 1) + [(0, block - t % block)])
        mel = normalize_mel(log_mel_44k(audio))
        z = self.encoder_fn(mel)
        return (z - SHIFT_FACTOR) * SCALE_FACTOR

    def latent_frames(self, audio_len: int, sr: int = SR) -> int:
        """audio samples -> latent frames (upstream latent_lengths)."""
        return int(audio_len / sr * SR / HOP / TIME_MULTIPLE)

    def decode(self, latents: jnp.ndarray) -> np.ndarray:
        """scaled latents -> (b, ch, t) audio via decoder + AdamosVocoder,
        one channel at a time (music_dcae_pipeline.py:117-131)."""
        z = latents / SCALE_FACTOR + SHIFT_FACTOR
        mel = denormalize_mel(self.decoder_fn(z))  # (b, ch, T, 128)
        chans = []
        for ch in range(mel.shape[1]):
            wav = self.vocoder.apply({"params": self.vocoder_params},
                                     mel[:, ch])
            chans.append(np.asarray(wav))
        return np.stack(chans, axis=1)
