"""Music generation pipelines — serve-backend adapters for the generators.

Backend protocol (serve/music_api.py): .generate(prompt, **settings)
-> (samples (n,) or (n, ch), sr).

Reference surface mirrored: layouts/stable_audio.py (generate, variations,
continue), layouts/music.py (YuE), layouts/acestep.py (ACE-Step)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.stable_audio import (
    StableAudioConfig,
    StableAudioModel,
    generate_audio,
)


class StableAudioPipeline:
    """StableAudioModel + params behind the music-api backend protocol
    (modules/stable_audio/model.py:115 generate_audio options)."""

    def __init__(self, cfg: StableAudioConfig, params):
        self.cfg = cfg
        self.model = StableAudioModel(cfg)
        self.params = params

    def generate(
        self,
        prompt: str,
        negative_prompt: str = "",
        seconds_total: float = 10.0,
        seconds_start: float = 0.0,
        steps: int = 50,
        cfg_scale: float = 7.0,
        seed: int = 0,
        init_audio=None,
        init_strength: float = 0.8,
        **_,
    ):
        out = generate_audio(
            self.model, self.params, prompt,
            negative_prompt=negative_prompt,
            seconds_total=seconds_total, seconds_start=seconds_start,
            steps=steps, cfg_scale=cfg_scale, seed=seed,
            init_audio=init_audio, init_strength=init_strength,
        )
        samples = np.asarray(out[0]).T  # (channels, n)
        if samples.shape[0] == 1:
            samples = samples[0]
        return samples, self.cfg.sr

    def variations(self, audio: np.ndarray, prompt: str, strength: float = 0.6,
                   **kw):
        """img2img variation of an existing clip (layouts/stable_audio.py)."""
        a = np.asarray(audio, np.float32)
        if a.ndim == 1:
            a = a[:, None]
        return self.generate(prompt, init_audio=a[None], init_strength=strength,
                             seconds_total=a.shape[0] / self.cfg.sr, **kw)

    def continue_audio(self, audio: np.ndarray, prompt: str,
                       seconds_total: float = 10.0, **kw):
        """Extend a clip: generate with the clip as init for the overlap
        region, then splice (the reference's /api/v1/audio/continue)."""
        y, sr = self.generate(prompt, seconds_total=seconds_total, **kw)
        a = np.asarray(audio, np.float32)
        if a.ndim == 2:
            a = a.mean(axis=0) if a.shape[0] < a.shape[1] else a.mean(axis=1)
        fade = min(len(a), len(y), int(0.25 * sr))
        ramp = np.linspace(0.0, 1.0, fade, dtype=np.float32)
        if y.ndim == 2:
            y = y.mean(axis=0)
        joined = np.concatenate([
            a[: len(a) - fade],
            a[len(a) - fade :] * (1 - ramp) + y[:fade] * ramp,
            y[fade:],
        ])
        return joined, sr


class T5PromptTokenizer:
    """T5Conditioner tokenization (wheel conditioners.py:349-358):
    sentencepiece ids, truncate to max_length, append </s>, pad to
    max_length with pad=0, boolean attention mask."""

    def __init__(self, spm_model_path: str, max_length: int = 128):
        from audiolab_tpu.utils.spm import SentencePieceProcessor

        self.sp = SentencePieceProcessor(spm_model_path)
        self.max_length = max_length
        self.eos = self.sp.eos_id() if self.sp.eos_id() >= 0 else 1
        self.pad = max(self.sp.pad_id(), 0)

    def __call__(self, texts: list[str]):
        """-> (ids (b, max_length) int32, mask (b, max_length) int32)."""
        n = self.max_length
        ids = np.full((len(texts), n), self.pad, np.int32)
        mask = np.zeros((len(texts), n), np.int32)
        for r, t in enumerate(texts):
            e = self.sp.encode_as_ids(t)[: n - 1] + [self.eos]
            ids[r, : len(e)] = e
            mask[r, : len(e)] = 1
        return ids, mask


class StableAudioCheckpointPipeline:
    """Published stable-audio-open weights end-to-end.

    Conditioning mirrors the wheel's ConditionedDiffusionModelWrapper
    (diffusion.py:137-197) for stable-audio-open-1.0's config:
    cross-attn input = [T5(prompt), emb(seconds_start), emb(seconds_total)]
    (the cross-attn mask is disabled upstream, diffusion.py:283, so zeroed
    T5 pad embeddings are attended to — matched here), global cond =
    concat(seconds embeds) (b, 1536).  Denoiser = converted SAODiT,
    decode = converted OobleckDecoder.  Sampling: k-diffusion
    dpmpp-3m-sde over polyexponential sigmas with VDenoiser scalings and
    zero-embed CFG, exactly the reference's sample_k configuration
    (models/ksampler.py); v-ddim kept as the deterministic option."""

    def __init__(self, dit_params, vae_decoder_params, t5_params,
                 ss_params, st_params, spm_model_path: str,
                 dit_cfg=None, vae_cfg=None, t5_cfg=None,
                 sr: int = 44100, seconds_clamp: float = 512.0,
                 max_seconds: float = 47.0):
        from audiolab_tpu.models.stable_audio import NumberEmbedder
        from audiolab_tpu.models.stable_audio_dit import (
            OobleckConfig as CkptOobleckConfig,
        )
        from audiolab_tpu.models.stable_audio_dit import (
            OobleckDecoder,
            SAODiTConfig,
            StableAudioDiT,
        )
        from audiolab_tpu.models.t5 import T5Config, T5Encoder

        self.dit_cfg = dit_cfg or SAODiTConfig()
        self.vae_cfg = vae_cfg or CkptOobleckConfig()
        self.t5_cfg = t5_cfg or T5Config()
        self.sr = sr
        self.seconds_clamp = seconds_clamp
        self.max_seconds = max_seconds
        self.dit = StableAudioDiT(self.dit_cfg)
        self.decoder = OobleckDecoder(self.vae_cfg)
        self.t5 = T5Encoder(self.t5_cfg)
        self.num_emb = NumberEmbedder(features=self.t5_cfg.dim)
        self.params = dict(dit=dit_params, dec=vae_decoder_params,
                           t5=t5_params, ss=ss_params, st=st_params)
        self.tokenizer = T5PromptTokenizer(spm_model_path)

    def _conditioning(self, prompts: list[str], seconds_start: float,
                      seconds_total: float):
        ids, mask = self.tokenizer(prompts)
        text = self.t5.apply({"params": self.params["t5"]},
                             jnp.asarray(ids), jnp.asarray(mask))
        b = len(prompts)
        norm = lambda v: jnp.full(  # noqa: E731
            (b,), float(np.clip(v, 0.0, self.seconds_clamp))
            / self.seconds_clamp)
        ss = self.num_emb.apply({"params": self.params["ss"]},
                                norm(seconds_start))
        st = self.num_emb.apply({"params": self.params["st"]},
                                norm(seconds_total))
        cross = jnp.concatenate(
            [text, ss[:, None, :], st[:, None, :]], axis=1)
        glob = jnp.concatenate([ss, st], axis=-1)
        return cross, glob

    def generate(self, prompt: str, negative_prompt: str = "",
                 seconds_total: float = 10.0, seconds_start: float = 0.0,
                 steps: int = 100, cfg_scale: float = 7.0, seed: int = 0,
                 init_audio=None, init_strength: float = 0.8,
                 sampler_type: str = "dpmpp-3m-sde",
                 sigma_min: float = 0.3, sigma_max: float = 500.0, **_):
        """Published-sampler semantics (modules/stable_audio/model.py:
        277-289 -> stable_audio_tools sample_k): dpmpp-3m-sde over a
        polyexponential sigma schedule (0.3..500, rho 1) with the
        v-objective model behind k-diffusion's VDenoiser; CFG is a
        doubled batch whose unconditional row uses the ZEROED cross-attn
        sequence (dit.py:347-361 null_embed) — a negative prompt replaces
        the null embed — while the global seconds embedding stays on both
        rows (dit.py:332-334).  ``sampler_type="v-ddim"`` selects the
        cosine DDIM alternative (sampling.py sample/v-ddim family)."""
        c = self.vae_cfg
        hop = int(np.prod(c.strides))
        seconds_total = float(np.clip(seconds_total, 1.0, self.max_seconds))
        t_lat = max(1, int(round(seconds_total * self.sr / hop)))

        cross_c, glob = self._conditioning([prompt], seconds_start,
                                           seconds_total)
        if negative_prompt and negative_prompt.strip():
            cross_u, _ = self._conditioning([negative_prompt],
                                            seconds_start, seconds_total)
        else:
            cross_u = jnp.zeros_like(cross_c)
        cross2 = jnp.concatenate([cross_c, cross_u], axis=0)
        glob2 = jnp.concatenate([glob, glob], axis=0)

        rng_noise, rng_samp = jax.random.split(jax.random.PRNGKey(seed))
        noise = jax.random.normal(rng_noise, (1, t_lat, c.latent_dim))
        if init_audio is not None:
            raise NotImplementedError(
                "init audio needs the Oobleck encoder params")

        dit_params = self.params["dit"]

        def v_guided(x, tb1):
            """CFG-merged v prediction at timestep tb1 (scalar array)."""
            x2 = jnp.concatenate([x, x], axis=0)
            tb = jnp.full((2,), tb1, x.dtype)
            v = self.dit.apply({"params": dit_params}, x2, tb, cross2,
                               glob2)
            vc, vu = v[:1], v[1:]
            return vu + cfg_scale * (vc - vu)

        if sampler_type == "dpmpp-3m-sde":
            from audiolab_tpu.models.ksampler import (
                sample_dpmpp_3m_sde,
                sigmas_polyexponential,
                v_denoiser,
            )

            sig = sigmas_polyexponential(steps, sigma_min, sigma_max)
            z = sample_dpmpp_3m_sde(v_denoiser(v_guided), noise * sig[0],
                                    sig, eta=1.0, rng=rng_samp)
        else:  # v-ddim
            from audiolab_tpu.models.stable_audio import v_to_eps_x0

            ts = jnp.linspace(1.0, 0.0, steps + 1)

            def body(z, i):
                t_cur, t_next = ts[i], ts[i + 1]
                v = v_guided(z, t_cur)
                eps, x0 = v_to_eps_x0(v, z, jnp.full((1,), t_cur))
                z = (jnp.cos(t_next * np.pi / 2) * x0
                     + jnp.sin(t_next * np.pi / 2) * eps)
                return z, None

            z, _ = jax.lax.scan(body, noise, jnp.arange(steps))
        audio = self.decoder.apply({"params": self.params["dec"]}, z)
        samples = np.asarray(audio[0])           # (out_ch, n)
        if samples.shape[0] == 1:
            samples = samples[0]
        return samples, self.sr


def random_stable_audio(cfg: StableAudioConfig | None = None, seed: int = 0):
    """Random-weight pipeline (converter fills pretrained weights)."""
    import jax.numpy as jnp

    from audiolab_tpu.models.dit import DiTConfig
    from audiolab_tpu.models.stable_audio import OobleckConfig, tokenize_prompt

    cfg = cfg or StableAudioConfig(
        sr=16000, max_seconds=10.0,
        vae=OobleckConfig(channels=1, latent_dim=16, base_ch=16, ratios=(4, 4, 4)),
        dit=DiTConfig(dim=64, n_layers=2, n_heads=4, cond_dim=64, in_dim=16,
                      out_dim=16, dtype="float32"),
        text_dim=64, text_layers=1,
    )
    model = StableAudioModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(seed)},
        jnp.zeros((1, cfg.vae.hop * 2, cfg.vae.channels)),
        jnp.asarray(tokenize_prompt("x"))[None],
        jnp.zeros((1,)),
        method=StableAudioModel.full_init,
    )["params"]
    return StableAudioPipeline(cfg, params)
