"""Music generation pipelines — serve-backend adapters for the generators.

Backend protocol (serve/music_api.py): .generate(prompt, **settings)
-> (samples (n,) or (n, ch), sr).

Reference surface mirrored: layouts/stable_audio.py (generate, variations,
continue), layouts/music.py (YuE), layouts/acestep.py (ACE-Step)."""

from __future__ import annotations

import jax
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
