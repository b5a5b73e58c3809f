"""RVC GAN training — pjit data-parallel train step.

Reference behavior: modules/rvc/infer/modules/train/train.py:254-788 — one
process per GPU + DDP + fp16 GradScaler, AdamW(G)/AdamW(D), per-epoch lr decay
0.999875, losses = LS-GAN adv + 2*feature-matching + 45*mel-L1 + KL.

TPU design: a single jitted train step over a ``Mesh(dp)``.  The batch is
sharded over ``dp``; parameters are replicated; gradient sync is emitted by
XLA from the sharding (no NCCL/DDP equivalent needed, SURVEY §2.6).  bf16
matmuls inside the nets, f32 master params and losses — no GradScaler.
Both optimizer updates happen in ONE step (D first on stop-grad'd fake, then
G), matching the reference's ordering at train.py:588-617.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiolab_tpu.kernels.mel import log_mel, mel_spectrogram
from audiolab_tpu.models.rvc.discriminator import MultiPeriodDiscriminatorV2
from audiolab_tpu.models.rvc.synthesizer import SynthesizerConfig, SynthesizerTrn, _slice_segments
from audiolab_tpu.train.losses import (
    discriminator_loss,
    feature_matching_loss,
    generator_adv_loss,
    kl_loss,
    mel_l1_loss,
)

# mel front-end parameters per sample rate (modules/rvc/configs/v2/*.json)
MEL_CFG = {
    32000: dict(n_fft=1024, hop=320, win_length=1024, n_mels=80),
    40000: dict(n_fft=2048, hop=400, win_length=2048, n_mels=125),
    48000: dict(n_fft=2048, hop=480, win_length=2048, n_mels=128),
}


@flax.struct.dataclass
class RVCTrainState:
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any


def _mel(wav: jnp.ndarray, sr: int) -> jnp.ndarray:
    m = MEL_CFG[sr]
    return log_mel(
        mel_spectrogram(
            wav,
            sr=sr,
            n_fft=m["n_fft"],
            hop=m["hop"],
            win_length=m["win_length"],
            n_mels=m["n_mels"],
            fmin=0.0,
            fmax=None,
            norm="slaney",
            htk=False,
            power=1.0,
            center=False,
        )
    )


def make_optimizer(lr: float = 1e-4, betas=(0.8, 0.99), eps: float = 1e-9,
                   lr_decay: float = 0.999875, steps_per_epoch: int = 200):
    """AdamW with the reference's per-epoch exponential decay
    (train.py:356-363,434-439), applied per-step at the epoch-equivalent rate."""
    sched = optax.exponential_decay(
        lr, transition_steps=steps_per_epoch, decay_rate=lr_decay
    )
    return optax.adamw(sched, b1=betas[0], b2=betas[1], eps=eps, weight_decay=0.0)


def create_train_state(
    cfg: SynthesizerConfig,
    rng: jax.Array,
    batch_size: int = 4,
    spec_frames: int = 400,
    lr: float = 1e-4,
    steps_per_epoch: int = 200,
    periods=None,
) -> tuple[RVCTrainState, SynthesizerTrn, MultiPeriodDiscriminatorV2]:
    """Initialise G/D params + optimizer states with dummy shapes."""
    gen = SynthesizerTrn(cfg)
    disc = MultiPeriodDiscriminatorV2(periods) if periods else MultiPeriodDiscriminatorV2()

    t = spec_frames
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    dummy = dict(
        phone=jnp.zeros((batch_size, t, cfg.feat_channels), jnp.float32),
        phone_lengths=jnp.full((batch_size,), t, jnp.int32),
        pitch=jnp.zeros((batch_size, t), jnp.int32),
        pitchf=jnp.zeros((batch_size, t), jnp.float32),
        spec=jnp.zeros((batch_size, t, cfg.spec_channels), jnp.float32),
        spec_lengths=jnp.full((batch_size,), t, jnp.int32),
        sid=jnp.zeros((batch_size,), jnp.int32),
    )
    g_params = gen.init(
        {"params": k1, "posterior": k2, "slice": k3, "noise": k4},
        dummy["phone"], dummy["phone_lengths"], dummy["pitch"], dummy["pitchf"],
        dummy["spec"], dummy["spec_lengths"], dummy["sid"],
        {"posterior": k2, "slice": k3, "noise": k4},
    )["params"]
    seg = cfg.segment_size
    d_params = disc.init(
        k5, jnp.zeros((batch_size, seg, 1)), jnp.zeros((batch_size, seg, 1))
    )["params"]

    g_tx = make_optimizer(lr, steps_per_epoch=steps_per_epoch)
    d_tx = make_optimizer(lr, steps_per_epoch=steps_per_epoch)
    state = RVCTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
    )
    return state, gen, disc


def make_train_step(
    cfg: SynthesizerConfig,
    gen: SynthesizerTrn,
    disc: MultiPeriodDiscriminatorV2,
    lr: float = 1e-4,
    steps_per_epoch: int = 200,
    c_mel: float = 45.0,
    c_kl: float = 1.0,
    mesh: Mesh | None = None,
):
    """Build the jitted (optionally dp-sharded) train step.

    batch keys: phone (b,t,feat), phone_lengths (b,), pitch (b,t) int,
    pitchf (b,t) f32, spec (b,t,spec_channels), spec_lengths (b,),
    wave (b, t*upp), sid (b,).
    Returns (state, metrics).
    """
    g_tx = make_optimizer(lr, steps_per_epoch=steps_per_epoch)
    d_tx = make_optimizer(lr, steps_per_epoch=steps_per_epoch)
    sr = cfg.sr
    hop = MEL_CFG[sr]["hop"]
    seg_frames = cfg.segment_size // cfg.upp

    def step(state: RVCTrainState, batch, rng: jax.Array):
        r_post, r_slice, r_noise = jax.random.split(jax.random.fold_in(rng, state.step), 3)
        rngs = {"posterior": r_post, "slice": r_slice, "noise": r_noise}

        def g_forward(g_params):
            o, ids, _, y_mask, lat = gen.apply(
                {"params": g_params},
                batch["phone"], batch["phone_lengths"], batch["pitch"],
                batch["pitchf"], batch["spec"], batch["spec_lengths"],
                batch["sid"], rngs,
            )
            return o, ids, y_mask, lat

        # ---- generator forward once; reuse for both D and G losses ----
        def g_loss_fn(g_params):
            o, ids, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q) = g_forward(g_params)
            y_hat = o[..., 0]  # (b, segment)
            wave_slice = _slice_segments(
                batch["wave"][..., None], ids * cfg.upp, cfg.segment_size
            )[..., 0]
            mel_real = _mel(wave_slice, sr)
            mel_fake = _mel(y_hat.astype(jnp.float32), sr)

            r_outs, f_outs, r_fmaps, f_fmaps = disc.apply(
                {"params": state.d_params}, wave_slice[..., None], y_hat[..., None]
            )
            l_adv = generator_adv_loss(f_outs)
            l_fm = feature_matching_loss(r_fmaps, f_fmaps)
            l_mel = mel_l1_loss(mel_real, mel_fake, c_mel)
            l_kl = c_kl * kl_loss(z_p, logs_q, m_p, logs_p, y_mask)
            total = l_adv + l_fm + l_mel + l_kl
            aux = dict(
                loss_gen=l_adv, loss_fm=l_fm, loss_mel=l_mel, loss_kl=l_kl,
                y_hat=y_hat, wave_slice=wave_slice,
            )
            return total, aux

        (g_total, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params
        )

        # ---- discriminator step on detached fake (train.py:588-600) ----
        y_hat_sg = jax.lax.stop_gradient(aux["y_hat"])
        wave_slice = aux["wave_slice"]

        def d_loss_fn(d_params):
            r_outs, f_outs, _, _ = disc.apply(
                {"params": d_params}, wave_slice[..., None], y_hat_sg[..., None]
            )
            return discriminator_loss(r_outs, f_outs)

        d_total, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)

        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = RVCTrainState(
            step=state.step + 1,
            g_params=g_params, d_params=d_params, g_opt=g_opt, d_opt=d_opt,
        )
        metrics = dict(
            loss_disc=d_total, loss_gen_total=g_total,
            loss_gen=aux["loss_gen"], loss_fm=aux["loss_fm"],
            loss_mel=aux["loss_mel"], loss_kl=aux["loss_kl"],
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    batch_shardings = dict(
        phone=data, phone_lengths=data, pitch=data, pitchf=data,
        spec=data, spec_lengths=data, wave=data, sid=data,
    )
    return jax.jit(
        step,
        in_shardings=(repl, batch_shardings, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
