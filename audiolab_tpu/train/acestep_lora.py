"""ACE-Step LoRA fine-tuning (reference: modules/acestep/trainer.py:36-890 —
Lightning trainer with peft LoRA at :76-83, flow-matching MSE on DCAE
latents; the MERT/mHuBERT SSL auxiliary losses at :145-298 are pretrain-time
regularizers and are not required for LoRA adaptation).

TPU redesign: base params frozen as constants in the jitted step; ONLY the
LoRA A/B pytree is differentiated — smaller grads, no optax masking tricks
needed."""

from __future__ import annotations

import logging
from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiolab_tpu.models.acestep import (
    ACEStepConfig,
    ACEStepModel,
    lora_apply,
    lora_init,
    tokenize_lyrics,
)
from audiolab_tpu.models.stable_audio import tokenize_prompt

log = logging.getLogger(__name__)


@dataclass
class LoRATrainConfig:
    rank: int = 8
    lr: float = 1e-4
    steps: int = 200
    seg_latent: int = 32      # latent frames per training example
    batch_size: int = 2
    alpha: float = 1.0


def flow_match_loss(model: ACEStepModel, params, z0, ctx, rng):
    """MSE(v_pred, eps - z0) at a random t (rectified-flow objective)."""
    k1, k2 = jax.random.split(rng)
    b = z0.shape[0]
    t = jax.random.uniform(k1, (b,))
    eps = jax.random.normal(k2, z0.shape)
    z_t = (1.0 - t[:, None, None]) * z0 + t[:, None, None] * eps
    v = model.apply({"params": params}, z_t, t, ctx,
                    method=ACEStepModel.velocity)
    return jnp.mean((v - (eps - z0)) ** 2)


def train_lora(
    pipeline,                         # ACEStepPipeline (base weights)
    dataset: list[tuple[np.ndarray, str, str]],  # (audio, prompt, lyrics)
    cfg: LoRATrainConfig | None = None,
    callback=None,
) -> dict:
    """Returns {"lora": pytree, "loss": float}."""
    cfg = cfg or LoRATrainConfig()
    model = pipeline.model
    base = pipeline.base_params

    lora = lora_init(base["dit"], jax.random.PRNGKey(0), cfg.rank)
    tx = optax.adam(cfg.lr)
    opt = tx.init(lora)

    # precompute latents + contexts on device once (dataset is small for LoRA)
    items = []
    for audio, prompt, lyrics in dataset:
        z = pipeline._latents_of_audio(audio)
        tag = jnp.asarray(tokenize_prompt(prompt, 64))[None]
        lyr = jnp.asarray(tokenize_lyrics(lyrics, 128))[None]
        ctx = model.apply({"params": base}, tag, lyr,
                          method=ACEStepModel.encode_cond)
        items.append((z, ctx))

    rng_np = np.random.default_rng(0)

    @jax.jit
    def step(lora, opt, z0, ctx, rng):
        def loss_fn(lora):
            merged = dict(base)
            merged["dit"] = lora_apply(base["dit"], lora, cfg.alpha)
            return flow_match_loss(model, merged, z0, ctx, rng)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt = tx.update(grads, opt, lora)
        return optax.apply_updates(lora, updates), opt, loss

    loss = jnp.asarray(np.nan)
    for i in range(cfg.steps):
        batch_z, batch_ctx = [], []
        for _ in range(cfg.batch_size):
            z, ctx = items[rng_np.integers(len(items))]
            t = z.shape[1]
            if t >= cfg.seg_latent:
                s = rng_np.integers(0, t - cfg.seg_latent + 1)
                z = z[:, s : s + cfg.seg_latent]
            else:
                z = jnp.pad(z, ((0, 0), (0, cfg.seg_latent - t), (0, 0)))
            batch_z.append(z[0])
            batch_ctx.append(ctx[0])
        lora, opt, loss = step(lora, opt, jnp.stack(batch_z),
                               jnp.stack(batch_ctx), jax.random.PRNGKey(i))
        if callback and (i + 1) % max(1, cfg.steps // 10) == 0:
            callback(i + 1, f"lora step {i + 1}: loss {float(loss):.4f}", cfg.steps)
    return {"lora": lora, "loss": float(loss)}


def save_lora(path: str, lora: dict) -> None:
    flat = {}
    for p, ab in lora.items():
        key = "/".join(p)
        flat[f"{key}.a"] = np.asarray(ab["a"])
        flat[f"{key}.b"] = np.asarray(ab["b"])
    np.savez(path, **flat)


def load_lora(path: str) -> dict:
    data = np.load(path)
    out: dict = {}
    for k in data.files:
        key, which = k.rsplit(".", 1)
        p = tuple(key.split("/"))
        out.setdefault(p, {})[which] = jnp.asarray(data[k])
    return out
