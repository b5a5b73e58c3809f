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
    # checkpoint-sampler knobs (pipeline_ace_step.py __call__ defaults);
    # the speed pipeline leaves them off
    shift: float | None = None            # 3.0 for the published sampler
    omega_scale: float | None = None      # 10.0 upstream
    guidance_interval: float = 1.0        # 0.5 upstream
    guidance_interval_decay: float = 0.0
    min_guidance_scale: float = 3.0
    use_erg_tag: bool = True
    use_erg_lyric: bool = True
    use_erg_diffusion: bool = True


def checkpoint_pcfg() -> ACEStepPipelineConfig:
    """The published ACEStepPipeline.__call__ defaults
    (pipeline_ace_step.py:1425-1442): 60 steps, euler shift-3, APG 15.0,
    omega 10, CFG on the middle half of the schedule, ERG on."""
    return ACEStepPipelineConfig(
        steps=60, scheduler="euler", guidance_scale=15.0, use_apg=True,
        shift=3.0, omega_scale=10.0, guidance_interval=0.5)


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
                 seed: int = 0, infer_step: int | None = None,
                 guidance_scale: float | None = None,
                 scheduler_type: str | None = None,
                 **kw) -> tuple[np.ndarray, int]:
        """Per-request sampler overrides mirror the reference API surface
        (pipeline_ace_step.py __call__: infer_step / guidance_scale /
        scheduler_type)."""
        ctx2 = self._context2(prompt, lyrics)
        z = fm_sample(
            self.model, self.params, ctx2, self._frames(duration),
            steps=int(infer_step or self.pcfg.steps),
            scheduler=scheduler_type or self.pcfg.scheduler,
            guidance_scale=(self.pcfg.guidance_scale
                            if guidance_scale is None else float(guidance_scale)),
            use_apg=self.pcfg.use_apg,
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


# ---------------------------------------------------- checkpoint-faithful

class CheckpointACEStep:
    """Generation with the checkpoint-faithful lite-LA transformer
    (models/acestep_dit.ACEStepDiT, filled from the published weights via
    utils/convert.load_acestep_dit_checkpoint) through the SAME fm_sample
    scan as the speed pipeline — latents (b, 8, 16, t) are flattened to
    the sampler's (b, t, 128) layout.

    Conditioning mirrors upstream pipeline_ace_step.py:562-765: external
    768-d text hidden states (umT5 upstream), a 512-d speaker embedding,
    and lyric tokens through the converted LyricConformerEncoder.
    ``generate`` returns latents unless a ``decode_fn`` is supplied — wire
    models/music_dcae.MusicDCAE.decode (scale / shift / mel denorm /
    converted ADaMoS vocoder) around the converted AutoencoderDC
    (models/dcae.py via music_dcae.dcae_codec_fns) for the full
    latents -> audio chain the reference runs."""

    def __init__(self, cfg, params, lyric_params=None,
                 pcfg: ACEStepPipelineConfig | None = None,
                 decode_fn=None, latent_rate: float = 44100 / 512 / 8,
                 text_encoder=None):
        from audiolab_tpu.models.acestep_dit import (
            ACEStepDiT,
            LyricConformerEncoder,
        )

        self.cfg = cfg
        self.model = ACEStepDiT(cfg)
        self.params = params
        self.lyric_enc = LyricConformerEncoder(
            dim=cfg.lyric_hidden_size) if lyric_params is not None else None
        self.lyric_params = lyric_params
        self.pcfg = pcfg or checkpoint_pcfg()
        self.decode_fn = decode_fn
        self.latent_rate = latent_rate
        self.text_encoder = text_encoder  # ACEStepTextEncoder (umt5)

    def text_embeddings(self, texts: list[str], max_length: int = 256):
        """prompt strings -> (hidden, mask) via the converted umt5-base
        (pipeline_ace_step.py:327-342); requires ``text_encoder``."""
        if self.text_encoder is None:
            raise NotImplementedError(
                "umt5 text encoder not loaded; pass text_encoder=")
        return self.text_encoder(texts, max_length)

    def encode_cond(self, text_hidden, text_mask, speaker,
                    lyric_tokens=None, lyric_mask=None,
                    lyric_q_tau: float = 1.0):
        """``lyric_q_tau=0.01`` reproduces ERG-lyric: the uncond branch
        runs the REAL lyric tokens through a temperature-scaled conformer
        (pipeline_ace_step.py forward_encoder_with_temperature,
        lyric_encoder self_attn.linear_q of encoders 4-5)."""
        lyric_hidden = None
        if lyric_tokens is not None and self.lyric_enc is not None:
            emb = self.model.apply({"params": self.params}, lyric_tokens,
                                   method=type(self.model).embed_lyrics)
            lyric_hidden = self.lyric_enc.apply(
                {"params": self.lyric_params}, emb, lyric_mask,
                q_tau=lyric_q_tau,
                q_tau_layers=(4, 5) if lyric_q_tau != 1.0 else ())
        enc, mask = self.model.apply(
            {"params": self.params}, text_hidden, text_mask, speaker,
            lyric_hidden, lyric_mask, method=type(self.model).encode)
        return enc, mask

    def _velocity(self, enc, enc_mask, q_tau: float = 1.0,
                  q_tau_blocks: tuple = ()):
        """Single-batch velocity closure over one conditioning stream;
        q_tau/q_tau_blocks implement ERG-diffusion for the uncond fn."""
        c = self.cfg

        def fn(zb, tb):
            b, t, _ = zb.shape
            lat = zb.reshape(b, t, c.in_channels,
                             c.patch_height).transpose(0, 2, 3, 1)
            v = self.model.apply(
                {"params": self.params}, lat, jnp.ones((b, t)), enc,
                enc_mask, tb, method=type(self.model).decode,
                q_tau=q_tau, q_tau_blocks=q_tau_blocks)
            return v.transpose(0, 3, 1, 2).reshape(b, t, -1)

        return fn

    def generate(self, text_hidden, text_mask, speaker, lyric_tokens=None,
                 lyric_mask=None, duration: float = 30.0, seed: int = 0,
                 text_hidden_null=None, **kw):
        """Returns latents (b, 8, 16, t) — or decoded audio if decode_fn
        was supplied.

        Sampler semantics mirror the published text2music loop
        (pipeline_ace_step.py:848-1330): shift-3 sigmas with the DiT fed
        sigma*1000, omega mean-shift Euler steps, APG projected onto the
        conditional branch per latent channel, CFG only over the middle
        ``guidance_interval`` of steps, and ERG temperature guidance for
        the unconditional forward.  ``text_hidden_null`` is the ERG-tag
        null text embedding (ACEStepTextEncoder.null_embeddings); zeros
        are used when absent."""
        from audiolab_tpu.models.acestep import acestep_sigmas, fm_sample

        c, p = self.cfg, self.pcfg
        enc_c, m_c = self.encode_cond(text_hidden, text_mask, speaker,
                                      lyric_tokens, lyric_mask)
        # unconditional stream (pipeline_ace_step.py:1095-1127): ERG-tag
        # null text (or zeros), zeroed speaker; ERG-lyric keeps the real
        # tokens under a temperature-scaled encoder, else zeroed tokens
        t_null = (text_hidden_null
                  if text_hidden_null is not None and p.use_erg_tag
                  else jnp.zeros_like(text_hidden))
        if p.use_erg_lyric and lyric_tokens is not None:
            enc_u, m_u = self.encode_cond(
                t_null, text_mask, jnp.zeros_like(speaker),
                lyric_tokens, lyric_mask, lyric_q_tau=0.01)
        else:
            enc_u, m_u = self.encode_cond(
                t_null, text_mask, jnp.zeros_like(speaker),
                None if lyric_tokens is None
                else jnp.zeros_like(lyric_tokens), lyric_mask)
        b = text_hidden.shape[0]
        frames = max(1, int(round(duration * self.latent_rate)))
        z0 = jax.random.normal(
            jax.random.PRNGKey(seed),
            (b, frames, c.in_channels * c.patch_height))
        sig = acestep_sigmas(p.steps, p.shift) if p.shift else None
        z = fm_sample(
            None, None, jnp.concatenate([enc_c, enc_u], axis=0), frames,
            steps=p.steps, scheduler=p.scheduler,
            guidance_scale=p.guidance_scale, use_apg=p.use_apg,
            rng=jax.random.PRNGKey(seed), z_init=z0,
            sigmas=sig, timestep_scale=1000.0,
            omega_scale=p.omega_scale,
            guidance_interval=p.guidance_interval,
            guidance_interval_decay=p.guidance_interval_decay,
            min_guidance_scale=p.min_guidance_scale,
            velocity_cond_fn=self._velocity(enc_c, m_c),
            velocity_uncond_fn=self._velocity(
                enc_u, m_u,
                q_tau=0.01 if p.use_erg_diffusion else 1.0,
                q_tau_blocks=tuple(range(15, 20))
                if p.use_erg_diffusion else ()),
            apg_channels=c.in_channels, **kw)
        lat = z.reshape(b, frames, c.in_channels,
                        c.patch_height).transpose(0, 2, 3, 1)
        if self.decode_fn is not None:
            return self.decode_fn(lat)
        return lat


def random_checkpoint_acestep(seed: int = 0):
    """Tiny random-weight CheckpointACEStep (smoke tests / serving)."""
    from audiolab_tpu.models.acestep_dit import (
        ACEStepDiT,
        ACEStepDiTConfig,
        LyricConformerEncoder,
    )

    cfg = ACEStepDiTConfig(
        num_layers=2, num_attention_heads=2, attention_head_dim=8,
        in_channels=2, out_channels=2, patch_height=4,
        speaker_embedding_dim=8, text_embedding_dim=8, lyric_vocab_size=32,
        lyric_hidden_size=16, ssl_latent_dims=(8,), ssl_encoder_depths=(0,))
    model = ACEStepDiT(cfg)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    b, t = 1, 4
    params = model.init(
        k1, jnp.zeros((b, 2, 4, t)), jnp.ones((b, t)),
        jnp.zeros((b, 2, 8)), jnp.ones((b, 2)), jnp.zeros((b, 8)),
        jnp.full((b,), 0.5), jnp.zeros((b, 3, 16)), jnp.ones((b, 3)))["params"]
    params = dict(params) | dict(model.init(
        k2, jnp.zeros((b, 3), jnp.int32),
        method=ACEStepDiT.embed_lyrics)["params"])
    lyr = LyricConformerEncoder(dim=16, heads=2, ffn_dim=32, num_blocks=1)
    lyr_params = lyr.init(k3, jnp.zeros((b, 3, 16)), jnp.ones((b, 3)))["params"]
    pipe = CheckpointACEStep(cfg, params, lyr_params,
                             latent_rate=2.0)
    pipe.lyric_enc = lyr
    return pipe


class ACEStepTextEncoder:
    """Converted umt5-base (models/t5.T5Encoder, per-layer bias) + its
    sentencepiece tokenizer: prompt strings -> (hidden, mask), the exact
    role of get_text_embeddings (pipeline_ace_step.py:327-342).

    Load with utils.convert.load_t5_encoder(path, cfg=umt5_base()) and
    the checkpoint dir's spiece.model."""

    def __init__(self, t5_params, spm_model_path: str, cfg=None):
        from audiolab_tpu.models.t5 import T5Encoder, umt5_base
        from audiolab_tpu.utils.spm import SentencePieceProcessor

        self.cfg = cfg or umt5_base()
        self.model = T5Encoder(self.cfg)
        self.params = t5_params
        self.sp = SentencePieceProcessor(spm_model_path)
        self._eos = self.sp.eos_id() if self.sp.eos_id() >= 0 else 1

    def _tokenize(self, texts: list[str], max_length: int):
        enc = [self.sp.encode_as_ids(t)[: max_length - 1] + [self._eos]
               for t in texts]
        n = max(len(e) for e in enc)
        ids = np.zeros((len(texts), n), np.int32)
        mask = np.zeros((len(texts), n), np.int32)
        for r, e in enumerate(enc):
            ids[r, : len(e)] = e
            mask[r, : len(e)] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

    def __call__(self, texts: list[str], max_length: int = 256):
        ids, mask = self._tokenize(texts, max_length)
        hidden = self.model.apply({"params": self.params}, ids, mask)
        return hidden, mask

    def null_embeddings(self, texts: list[str], max_length: int = 256,
                        tau: float = 0.01):
        """ERG-tag null text states (pipeline_ace_step.py
        get_text_embeddings_null: SelfAttention.q output scaled by tau on
        encoder blocks 8-9) — the unconditional text stream when
        use_erg_tag is on."""
        ids, mask = self._tokenize(texts, max_length)
        return self.model.apply({"params": self.params}, ids, mask,
                                q_tau=tau, q_tau_layers=(8, 9))
