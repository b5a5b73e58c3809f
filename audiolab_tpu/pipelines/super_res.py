"""Audio super-resolution pipeline (reference: wrappers/super_res.py).

Reference behaviors reproduced:
  - 10.24 s chunks with overlap + crossfade            (:42-50, 264-295)
  - Butterworth crossover splice: keep the original's lows, take the
    enhancer's highs above the crossover                (:222-320)
  - loudness match to the input (pyloudnorm role)       (:300-320)
  - output at 48 kHz

The enhancer slot is pluggable: the neural enhancer (diffusion / vocoder
model) drops in as ``enhancer_fn``; the built-in default is a DSP
band-replicator (harmonic folding + shaped noise) so the pipeline is fully
functional without checkpoints.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as sps

import jax
import jax.numpy as jnp

from audiolab_tpu.core.chunking import extract_chunks, plan_chunks, stitch_chunks
from audiolab_tpu.dsp.loudness import integrated_loudness
from audiolab_tpu.kernels.resample import resample
from audiolab_tpu.kernels.stft import istft, stft


def sbr_enhance(chunk48: jnp.ndarray) -> jnp.ndarray:
    """Default DSP enhancer: spectral band replication above the source
    band — copies 4-12 kHz content up an octave with -12 dB tilt."""
    n_fft, hop = 2048, 512
    real, imag = stft(chunk48, n_fft=n_fft, hop=hop)
    n_bins = n_fft // 2 + 1
    half = n_bins // 2
    # shift low half up one octave (bin doubling approximation)
    src_r = real[..., :half]
    src_i = imag[..., :half]
    rep_r = jnp.zeros_like(real).at[..., half : half + src_r.shape[-1]].set(src_r * 0.25)
    rep_i = jnp.zeros_like(imag).at[..., half : half + src_i.shape[-1]].set(src_i * 0.25)
    real = real + rep_r
    imag = imag + rep_i
    return istft(real, imag, n_fft=n_fft, hop=hop, length=chunk48.shape[-1])


def crossover_splice(
    original48: np.ndarray, enhanced48: np.ndarray, sr: int = 48000, fc: float = 10000.0
) -> np.ndarray:
    """Butterworth crossover: original lows + enhanced highs (:222-320)."""
    n = min(original48.shape[-1], enhanced48.shape[-1])
    lo_b, lo_a = sps.butter(8, fc, btype="low", fs=sr)
    hi_b, hi_a = sps.butter(8, fc, btype="high", fs=sr)
    lows = sps.filtfilt(lo_b, lo_a, original48[..., :n])
    highs = sps.filtfilt(hi_b, hi_a, enhanced48[..., :n])
    return (lows + highs).astype(np.float32)


def make_wavegrad_enhancer(model, params, wt_cfg, schedule=None, seed: int = 0):
    """Learned diffusion enhancer (the reference's AudioSR slot,
    wrappers/super_res.py:42): conditions a trained WaveGrad on the chunk's
    own mel and re-synthesizes — the crossover splice in super_resolve then
    keeps only the generated highband."""
    import jax

    from audiolab_tpu.models.wavegrad import FAST_6, sample
    from audiolab_tpu.train.wavetransfer import _mel_of

    sched = schedule or FAST_6

    def enhance(chunks: jnp.ndarray) -> jnp.ndarray:
        # chunks (count, ch, n) -> flatten channels into the batch
        count, ch, n = chunks.shape
        flat = chunks.reshape(count * ch, n)
        mel = _mel_of(flat, wt_cfg)
        out = sample(model, params, mel, sched, jax.random.PRNGKey(seed))
        pad = n - out.shape[-1]
        if pad > 0:
            out = jnp.pad(out, ((0, 0), (0, pad)))
        return out[:, :n].reshape(count, ch, n)

    return enhance


def super_resolve(
    audio: np.ndarray,
    sr: int,
    enhancer_fn=None,
    chunk_seconds: float = 10.24,
    overlap_seconds: float = 0.64,
    crossover_hz: float | None = None,
) -> tuple[np.ndarray, int]:
    """(ch, n)@sr -> (ch, m)@48k with enhanced highband."""
    if audio.ndim == 1:
        audio = audio[None]
    target_sr = 48000
    x48 = np.asarray(resample(jnp.asarray(audio), sr, target_sr))

    plan = plan_chunks(x48.shape[-1], int(chunk_seconds * target_sr), int(overlap_seconds * target_sr))
    chunks = extract_chunks(jnp.asarray(x48), plan)  # (count, ch, chunk)
    fn = enhancer_fn or sbr_enhance
    enhanced = fn(chunks)
    y = np.asarray(stitch_chunks(enhanced, plan))

    # crossover: keep original lows below the source Nyquist-ish corner
    fc = crossover_hz if crossover_hz is not None else min(0.4 * sr, 20000.0)
    y = crossover_splice(x48, y, target_sr, fc=fc)

    # loudness match to the (resampled) input
    li = integrated_loudness(x48, target_sr)
    lo = integrated_loudness(y, target_sr)
    if np.isfinite(li) and np.isfinite(lo):
        y = y * 10.0 ** ((li - lo) / 20.0)
    peak = np.abs(y).max() if y.size else 0.0
    if peak > 0.99:
        y = y * (0.99 / peak)
    return y.astype(np.float32), target_sr


# ------------------------------------------- AudioSR checkpoint pipeline

def cosine_alphas_cumprod(n_timesteps: int = 1000, s: float = 8e-3):
    """The audiosr cosine schedule (diffusionmodules/util.py:31-39):
    alphas_cumprod[t] = prod(1 - betas[:t+1])."""
    import numpy as np

    ts = np.arange(n_timesteps + 1, dtype=np.float64) / n_timesteps + s
    al = np.cos(ts / (1 + s) * np.pi / 2) ** 2
    al = al / al[0]
    betas = 1 - al[1:] / al[:-1]
    return np.cumprod(1.0 - betas)


# the constant unconditional VAE latent upstream uses for CFG
# (audiosr encoders/modules.py VAEFeatureExtract.forward:
#  unconditional_cond = -11.4981 + vae_embed * 0.0)
_AUDIOSR_UNCOND_LATENT = -11.4981


class AudioSRCheckpointPipeline:
    """DDIM (eta=0) super-resolution with the CONVERTED AudioSR stack
    (models/audiosr_{vae,unet,vocoder}.py; sampler semantics from
    ddpm.py register_schedule + ddim.py, v-parameterization):

      lowpass fbank -> VAE mean latents -> x scale_factor (DiffusionWrapper
      concat conditioning, ddpm.py:1658) -> classifier-free-guided DDIM
      v-prediction denoise (guidance_scale 3.5, pipeline.py:155; the
      unconditional branch is the constant -11.4981 latent,
      encoders/modules.py:146) -> / scale_factor (decode_first_stage,
      ddpm.py:930) -> VAE decode -> 48 kHz vocoder.

    ``scale_factor`` is a checkpoint buffer (ddpm.py:672 register_buffer,
    set by scale_by_std at :747); load it with
    utils/convert.load_audiosr_scale_factor.  Fill params with
    utils/convert.load_audiosr_{vae,unet,vocoder}_checkpoint.
    """

    def __init__(self, vae, vae_params, unet, unet_params, vocoder,
                 voc_params, n_timesteps: int = 1000,
                 scale_factor: float = 1.0, guidance_scale: float = 3.5,
                 n_mels: int = 256):
        self.vae, self.vae_params = vae, vae_params
        self.unet, self.unet_params = unet, unet_params
        self.vocoder, self.voc_params = vocoder, voc_params
        self.acp = jnp.asarray(cosine_alphas_cumprod(n_timesteps),
                               jnp.float32)
        self.n_timesteps = n_timesteps
        self.scale_factor = float(scale_factor)
        self.guidance_scale = float(guidance_scale)
        self.n_mels = int(n_mels)

    def super_resolve(self, lowpass_fbank, steps: int = 50, seed: int = 0):
        """(b, t, mel, 1) normalized lowpass fbank -> (b, samples) 48 kHz."""
        from audiolab_tpu.models.audiosr_vae import AudioSRVAE

        cond, _ = self.vae.apply({"params": self.vae_params}, lowpass_fbank,
                                 method=AudioSRVAE.encode)
        # DiffusionWrapper scales the concat cond into the diffusion's
        # latent space (ddpm.py:1658); same for the CFG unconditional branch
        cond = cond * self.scale_factor
        uncond = jnp.full_like(cond,
                               _AUDIOSR_UNCOND_LATENT * self.scale_factor)
        t_seq = jnp.linspace(self.n_timesteps - 1, 0, steps).round(
        ).astype(jnp.int32)
        z = jax.random.normal(jax.random.PRNGKey(seed), cond.shape)
        gs = self.guidance_scale
        use_cfg = gs != 1.0

        @jax.jit
        def run(z, cond, uncond, unet_params, vae_params, voc_params):
            def unet_v(z, cond, t):
                return self.unet.apply(
                    {"params": unet_params},
                    jnp.concatenate([z, cond], axis=-1),
                    jnp.full((z.shape[0],), t, jnp.float32))

            def body(z, i):
                t = t_seq[i]
                t_next = jnp.where(i + 1 < steps, t_seq[jnp.minimum(
                    i + 1, steps - 1)], 0)
                a = self.acp[t]
                a_next = jnp.where(i + 1 < steps, self.acp[t_next], 1.0)
                if use_cfg:
                    # one batched UNet call for both CFG branches (the MXU
                    # prefers 2x batch over 2 dispatches); merge like
                    # ddim.py:311 (uncond + gs * (cond - uncond), on the
                    # raw v output, BEFORE the v-param conversion)
                    b = z.shape[0]
                    v2 = unet_v(jnp.concatenate([z, z], axis=0),
                                jnp.concatenate([cond, uncond], axis=0), t)
                    v = v2[b:] + gs * (v2[:b] - v2[b:])
                else:
                    v = unet_v(z, cond, t)
                # v-param: x0 = sqrt(a) z - sqrt(1-a) v ; eps likewise
                x0 = jnp.sqrt(a) * z - jnp.sqrt(1 - a) * v
                eps = jnp.sqrt(1 - a) * z + jnp.sqrt(a) * v
                z = jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps
                return z, None

            z, _ = jax.lax.scan(body, z, jnp.arange(steps))
            # decode_first_stage divides by scale_factor (ddpm.py:930)
            mel = self.vae.apply({"params": vae_params},
                                 z / self.scale_factor,
                                 method=type(self.vae).decode)[..., 0]
            return self.vocoder.apply({"params": voc_params}, mel)

        return run(z, cond, uncond, self.unet_params, self.vae_params,
                   self.voc_params)

    def enhance_chunks(self, chunks, steps: int = 50, seed: int = 0):
        """(count, ch, n) 48 kHz chunks -> enhanced, same shape — the
        ``enhancer_fn`` contract of ``super_resolve``.  Each channel runs
        as an independent batch row (upstream processes mono,
        pipeline.py:123)."""
        count, ch, n = chunks.shape
        x = jnp.asarray(chunks).reshape(count * ch, n)
        # utils.normalize_wav: zero-mean, peak 0.5 (audiosr utils.py:186)
        x = x - x.mean(axis=-1, keepdims=True)
        peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True) + 1e-8
        xn = x / peak * 0.5
        fbank = audiosr_fbank(xn, n_mels=self.n_mels)  # (b, t, mel)
        t = fbank.shape[1]
        pad = (-t) % 64                              # VAE 8x + even frames
        if pad:
            fbank = jnp.pad(fbank, ((0, 0), (0, pad), (0, 0)))
        wav = self.super_resolve(fbank[..., None], steps=steps, seed=seed)
        wav = wav[..., :n] * (peak / 0.5)            # undo input scaling
        if wav.shape[-1] < n:
            wav = jnp.pad(wav, ((0, 0), (0, n - wav.shape[-1])))
        return wav.reshape(count, ch, n)


def audiosr_fbank(x: jnp.ndarray, n_mels: int = 256) -> jnp.ndarray:
    """The audiosr log-mel front end (utils.mel_spectrogram_train,
    audiosr utils.py:110-155): 48 kHz, n_fft 2048, hop 480, 256 slaney
    mels fmin 20 / fmax 24000, manual reflect pad of (n_fft-hop)/2 with
    center=False, ln(clamp(mel, 1e-5)).  ``x`` (b, n) -> (b, t, 256)."""
    from audiolab_tpu.kernels.mel import mel_spectrogram

    pad = (2048 - 480) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    m = mel_spectrogram(xp, sr=48000, n_fft=2048, hop=480, n_mels=n_mels,
                        fmin=20.0, fmax=24000.0, htk=False, norm="slaney",
                        power=1.0, center=False)
    return jnp.log(jnp.clip(m, 1e-5, None))
