"""ACE-Step LoRA fine-tuning (reference: modules/acestep/trainer.py:36-890 —
Lightning trainer with peft LoRA at :76-83, flow-matching MSE on DCAE
latents, plus the MERT/mHuBERT SSL projection losses at :145-298 /
ace_step_transformer.py:478-520: inner DiT hidden states are projected to
a frozen SSL model's feature space and pulled toward it with a cosine
loss (REPA-style regularizer).

Here the SSL target model is the flax HuBERT (the mHuBERT role; MERT is
the same family at 24 kHz) run frozen over the target audio; the
projector trains jointly with the LoRA factors.  Enable with
``ssl_coeff > 0``.

TPU redesign: base params frozen as constants in the jitted step; ONLY the
LoRA A/B pytree (+ SSL projector) is differentiated — smaller grads, no
optax masking tricks needed."""

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
    # SSL projection loss (trainer.py ssl_coeff; 0 disables)
    ssl_coeff: float = 0.0
    ssl_depth: int = 1        # DiT block index to tap (ssl_encoder_depths)


def _interp_time(x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Linear interpolation along axis 1 (F.interpolate mode='linear')."""
    n_in = x.shape[1]
    pos = (jnp.arange(n_out) + 0.5) * n_in / n_out - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    w = jnp.clip(pos - lo, 0.0, 1.0)[None, :, None]
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


def ssl_projection_loss(hidden, proj_params, ssl_target):
    """cosine distance between projected inner states (interpolated to the
    SSL frame rate) and frozen SSL features (trainer.py:560-585)."""
    est = hidden @ proj_params["kernel"] + proj_params["bias"]
    est = _interp_time(est, ssl_target.shape[1])
    est = est / jnp.maximum(
        jnp.linalg.norm(est, axis=-1, keepdims=True), 1e-6)
    tgt = ssl_target / jnp.maximum(
        jnp.linalg.norm(ssl_target, axis=-1, keepdims=True), 1e-6)
    return jnp.mean(1.0 - jnp.sum(est * tgt, axis=-1))


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
    ssl_model=None,                   # frozen SSL feature fn(audio)->(t,d)
) -> dict:
    """Returns {"lora": pytree, "loss": float[, "proj": pytree]}.

    ``ssl_model``: callable mapping a 16 kHz mono np array to frozen SSL
    features (e.g. a bound HubertFeatureExtractor); required when
    cfg.ssl_coeff > 0."""
    cfg = cfg or LoRATrainConfig()
    model = pipeline.model
    base = pipeline.base_params
    use_ssl = cfg.ssl_coeff > 0.0 and ssl_model is not None

    lora = lora_init(base["dit"], jax.random.PRNGKey(0), cfg.rank)

    # precompute latents + contexts (+ frozen SSL features) once
    items = []
    ssl_dim = None
    for audio, prompt, lyrics in dataset:
        z = pipeline._latents_of_audio(audio)
        tag = jnp.asarray(tokenize_prompt(prompt, 64))[None]
        lyr = jnp.asarray(tokenize_lyrics(lyrics, 128))[None]
        ctx = model.apply({"params": base}, tag, lyr,
                          method=ACEStepModel.encode_cond)
        feats = None
        if use_ssl:
            feats = jnp.asarray(ssl_model(audio))  # (t_ssl, ssl_dim)
            if feats.ndim == 3:
                feats = feats[0]
            ssl_dim = int(feats.shape[-1])
        items.append((z, ctx, feats))

    dit_dim = model.cfg.dit.dim
    train_state = {"lora": lora}
    if use_ssl:
        k = jax.random.PRNGKey(7)
        train_state["proj"] = {
            "kernel": jax.random.normal(k, (dit_dim, ssl_dim)) * 0.02,
            "bias": jnp.zeros((ssl_dim,)),
        }
    tx = optax.adam(cfg.lr)
    opt = tx.init(train_state)

    rng_np = np.random.default_rng(0)

    @jax.jit
    def step(state, opt, z0, ctx, ssl_tgt, rng):
        def loss_fn(state):
            merged = dict(base)
            merged["dit"] = lora_apply(base["dit"], state["lora"], cfg.alpha)
            k1, k2 = jax.random.split(rng)
            b = z0.shape[0]
            t = jax.random.uniform(k1, (b,))
            eps = jax.random.normal(k2, z0.shape)
            z_t = (1.0 - t[:, None, None]) * z0 + t[:, None, None] * eps
            if use_ssl:
                v, hidden = model.apply(
                    {"params": merged}, z_t, t, ctx, cfg.ssl_depth,
                    method=ACEStepModel.velocity_hidden)
            else:
                v = model.apply({"params": merged}, z_t, t, ctx,
                                method=ACEStepModel.velocity)
            loss = jnp.mean((v - (eps - z0)) ** 2)
            if use_ssl:
                loss = loss + cfg.ssl_coeff * ssl_projection_loss(
                    hidden, state["proj"], jax.lax.stop_gradient(ssl_tgt))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state)
        updates, opt = tx.update(grads, opt, state)
        return optax.apply_updates(state, updates), opt, loss

    loss = jnp.asarray(np.nan)
    ssl_frames = 0
    if use_ssl:
        ssl_frames = max(4, min(int(it[2].shape[0]) for it in items))
    for i in range(cfg.steps):
        batch_z, batch_ctx, batch_ssl = [], [], []
        for _ in range(cfg.batch_size):
            z, ctx, feats = items[rng_np.integers(len(items))]
            t = z.shape[1]
            if t >= cfg.seg_latent:
                s = rng_np.integers(0, t - cfg.seg_latent + 1)
                z_seg = z[:, s : s + cfg.seg_latent]
            else:
                s = 0
                z_seg = jnp.pad(z, ((0, 0), (0, cfg.seg_latent - t), (0, 0)))
            batch_z.append(z_seg[0])
            batch_ctx.append(ctx[0])
            if use_ssl:
                # SSL frame span matching the latent crop (proportional)
                t_ssl = feats.shape[0]
                s0 = int(round(s / max(t, 1) * t_ssl))
                seg = feats[s0 : s0 + ssl_frames]
                if seg.shape[0] < ssl_frames:
                    seg = jnp.pad(seg, ((0, ssl_frames - seg.shape[0]), (0, 0)))
                batch_ssl.append(seg)
        ssl_b = (jnp.stack(batch_ssl) if use_ssl
                 else jnp.zeros((cfg.batch_size, 1, 1)))
        train_state, opt, loss = step(train_state, opt, jnp.stack(batch_z),
                                      jnp.stack(batch_ctx), ssl_b,
                                      jax.random.PRNGKey(i))
        if callback and (i + 1) % max(1, cfg.steps // 10) == 0:
            callback(i + 1, f"lora step {i + 1}: loss {float(loss):.4f}", cfg.steps)
    out = {"lora": train_state["lora"], "loss": float(loss)}
    if use_ssl:
        out["proj"] = train_state["proj"]
    return out


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
