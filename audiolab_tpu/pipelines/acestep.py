"""ACE-Step pipeline: generate / retake / repaint / edit / extend + LoRA.

Reference surface (modules/acestep/acestep/pipeline_ace_step.py:1425
__call__ with task routing at :562-765; trainer.py LoRA training;
layouts/acestep.py UI options):
  task=text2music | retake | repaint | extend | edit
  retake_variance controls how much noise re-injection; repaint_start/end
  select the seconds window; extend pads left/right.

TPU notes: every task is the same fm_sample scan with different z_init /
mask; the vocoder is the Vocos iSTFT head (no transposed-conv artifacts,
all MXU)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.mel import log_mel, mel_spectrogram
from audiolab_tpu.models.acestep import (
    ACEStepConfig,
    ACEStepModel,
    fm_sample,
    lora_apply,
    tokenize_lyrics,
)
from audiolab_tpu.models.codecs import Vocos, VocosConfig
from audiolab_tpu.models.stable_audio import tokenize_prompt


@dataclass
class ACEStepPipelineConfig:
    steps: int = 27
    scheduler: str = "euler"
    guidance_scale: float = 7.5
    use_apg: bool = True


class ACEStepPipeline:
    """Model + vocoder params behind one callable (pipeline_ace_step.py:1425)."""

    def __init__(self, cfg: ACEStepConfig, params, vocos_cfg: VocosConfig,
                 vocos_params, pcfg: ACEStepPipelineConfig | None = None,
                 lora: dict | None = None, lora_alpha: float = 1.0):
        self.cfg = cfg
        self.model = ACEStepModel(cfg)
        self.base_params = params
        self.params = lora_apply(params, lora, lora_alpha) if lora else params
        self.vocos = Vocos(vocos_cfg)
        self.vocos_params = vocos_params
        self.pcfg = pcfg or ACEStepPipelineConfig()

    # -------------------------------------------------- internals

    def _context2(self, prompt: str, lyrics: str, b: int = 1):
        tag_c = jnp.asarray(np.stack([tokenize_prompt(prompt, 64)] * b))
        lyr_c = jnp.asarray(np.stack([tokenize_lyrics(lyrics, 128)] * b))
        tag_u = jnp.zeros_like(tag_c)
        lyr_u = jnp.zeros_like(lyr_c)
        ctx_c = self.model.apply({"params": self.params}, tag_c, lyr_c,
                                 method=ACEStepModel.encode_cond)
        ctx_u = self.model.apply({"params": self.params}, tag_u, lyr_u,
                                 method=ACEStepModel.encode_cond)
        return jnp.concatenate([ctx_c, ctx_u], axis=0)

    def _latents_of_audio(self, audio: np.ndarray) -> jnp.ndarray:
        mel = log_mel(mel_spectrogram(
            jnp.asarray(audio, jnp.float32)[None], sr=self.cfg.sr, n_fft=2048,
            hop=self.cfg.mel_hop, n_mels=self.cfg.dcae.n_mels, power=1.0,
            center=True,
        ))
        frames = (mel.shape[1] // self.cfg.dcae.hop) * self.cfg.dcae.hop
        return self.model.apply({"params": self.params}, mel[:, :frames],
                                method=ACEStepModel.encode_mel)

    def _decode(self, z: jnp.ndarray) -> np.ndarray:
        mel = self.model.apply({"params": self.params}, z,
                               method=ACEStepModel.decode_latent)
        audio = self.vocos.apply({"params": self.vocos_params}, mel)
        return np.asarray(audio[0])

    def _frames(self, seconds: float) -> int:
        return max(1, int(round(seconds * self.cfg.latent_rate)))

    # -------------------------------------------------- tasks

    def generate(self, prompt: str, lyrics: str = "", duration: float = 30.0,
                 seed: int = 0, **kw) -> tuple[np.ndarray, int]:
        ctx2 = self._context2(prompt, lyrics)
        z = fm_sample(
            self.model, self.params, ctx2, self._frames(duration),
            steps=self.pcfg.steps, scheduler=self.pcfg.scheduler,
            guidance_scale=self.pcfg.guidance_scale, use_apg=self.pcfg.use_apg,
            rng=jax.random.PRNGKey(seed),
        )
        return self._decode(z), self.cfg.sr

    def retake(self, audio: np.ndarray, prompt: str, lyrics: str = "",
               variance: float = 0.5, seed: int = 0) -> tuple[np.ndarray, int]:
        """Re-noise existing latents by ``variance`` and re-solve
        (pipeline_ace_step.py retake task)."""
        z0 = self._latents_of_audio(audio)
        t0 = float(np.clip(variance, 0.05, 1.0))
        eps = jax.random.normal(jax.random.PRNGKey(seed + 1), z0.shape)
        z_init = (1.0 - t0) * z0 + t0 * eps
        ctx2 = self._context2(prompt, lyrics)
        z = fm_sample(self.model, self.params, ctx2, z0.shape[1],
                      steps=self.pcfg.steps, guidance_scale=self.pcfg.guidance_scale,
                      use_apg=self.pcfg.use_apg, rng=jax.random.PRNGKey(seed),
                      z_init=z_init, t_start=t0)
        return self._decode(z), self.cfg.sr

    def repaint(self, audio: np.ndarray, prompt: str, start_s: float,
                end_s: float, lyrics: str = "", seed: int = 0
                ) -> tuple[np.ndarray, int]:
        """Regenerate only [start_s, end_s]; outside is anchored to the
        source latents at every step."""
        z0 = self._latents_of_audio(audio)
        t = z0.shape[1]
        f0, f1 = self._frames(start_s), min(t, self._frames(end_s))
        mask = jnp.zeros((1, t, 1)).at[:, f0:f1].set(1.0)
        ctx2 = self._context2(prompt, lyrics)
        z = fm_sample(self.model, self.params, ctx2, t,
                      steps=self.pcfg.steps, guidance_scale=self.pcfg.guidance_scale,
                      use_apg=self.pcfg.use_apg, rng=jax.random.PRNGKey(seed),
                      repaint_mask=mask, z_ref=z0)
        return self._decode(z), self.cfg.sr

    def edit(self, audio: np.ndarray, prompt: str, lyrics: str = "",
             strength: float = 0.7, seed: int = 0) -> tuple[np.ndarray, int]:
        """flowedit-style whole-track edit = retake with moderate variance
        under the NEW conditioning (pipeline_ace_step.py:562-765)."""
        return self.retake(audio, prompt, lyrics, variance=strength, seed=seed)

    def extend(self, audio: np.ndarray, prompt: str, left_s: float = 0.0,
               right_s: float = 10.0, lyrics: str = "", seed: int = 0
               ) -> tuple[np.ndarray, int]:
        """Pad latents and repaint the new regions."""
        z0 = self._latents_of_audio(audio)
        lf, rf = self._frames(left_s) if left_s > 0 else 0, (
            self._frames(right_s) if right_s > 0 else 0)
        t_new = z0.shape[1] + lf + rf
        z_ref = jnp.pad(z0, ((0, 0), (lf, rf), (0, 0)))
        mask = jnp.ones((1, t_new, 1)).at[:, lf : lf + z0.shape[1]].set(0.0)
        ctx2 = self._context2(prompt, lyrics)
        z = fm_sample(self.model, self.params, ctx2, t_new,
                      steps=self.pcfg.steps, guidance_scale=self.pcfg.guidance_scale,
                      use_apg=self.pcfg.use_apg, rng=jax.random.PRNGKey(seed),
                      repaint_mask=mask, z_ref=z_ref)
        return self._decode(z), self.cfg.sr

    # serve backend protocol
    def __call__(self, prompt: str, **kw):
        return self.generate(prompt, **kw)


def random_acestep(cfg: ACEStepConfig | None = None, seed: int = 0
                   ) -> ACEStepPipeline:
    """Random-weight pipeline (converter fills pretrained weights)."""
    from audiolab_tpu.models.acestep import DCAEConfig
    from audiolab_tpu.models.dit import DiTConfig

    cfg = cfg or ACEStepConfig(
        sr=8000, mel_hop=256,
        dcae=DCAEConfig(n_mels=32, latent_dim=4, base_ch=8, ratios=(2, 2)),
        dit=DiTConfig(dim=32, n_layers=2, n_heads=4, cond_dim=32, in_dim=4,
                      out_dim=4, dtype="float32"),
        text_dim=32, text_layers=1, lyric_vocab=300,
    )
    model = ACEStepModel(cfg)
    k = jax.random.PRNGKey(seed)
    mel = jnp.zeros((1, cfg.dcae.hop * 4, cfg.dcae.n_mels))
    params = model.init(
        k, mel, jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1,)), method=ACEStepModel.full_init,
    )["params"]
    vcfg = VocosConfig(dim=32, n_layers=1, n_fft=4 * cfg.mel_hop, hop=cfg.mel_hop)
    voc = Vocos(vcfg)
    vp = voc.init(jax.random.PRNGKey(seed + 1),
                  jnp.zeros((1, 8, cfg.dcae.n_mels)))["params"]
    return ACEStepPipeline(cfg, params, vcfg, vp)
