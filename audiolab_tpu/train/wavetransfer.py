"""WaveTransfer training + inference orchestration.

Reference behavior (modules/wavetransfer/main.py:110 train_model,
learner.py:50-487 WaveGradLearner with EMA + checkpoints + TensorBoard,
main.py:36-106 CancellationToken/thread wrapper, bddm/sampler.py:38 chunked
inference, layouts/wavetransfer.py project management):

  - a "project" holds paired (source, target) wavs of the same phrase;
    the model learns target timbre conditioned on source mel
  - training: L1 noise loss, EMA decay 0.9999, periodic checkpoints,
    cooperative cancellation
  - inference: chunked sampling with a short noise schedule, crossfade join

TPU redesign: dp-mesh jitted train step (no DDP spawn, SURVEY §2.6);
EMA update fused into the step; the sampler scans the schedule on device
and batches chunks."""

from __future__ import annotations

import json
import logging
import threading
import time
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiolab_tpu.core.audio_io import read_audio, write_wav
from audiolab_tpu.core.chunking import ChunkPlan, extract_chunks, plan_chunks, stitch_chunks
from audiolab_tpu.kernels.mel import log_mel, mel_spectrogram
from audiolab_tpu.kernels.resample import resample_poly_np
import flax.linen as nn

from audiolab_tpu.models.wavegrad import (
    FAST_6,
    NoiseSchedule,
    TRAIN_SCHEDULE,
    WaveGrad,
    WaveGradConfig,
    diffusion_loss,
    sample,
)
from audiolab_tpu.train.checkpoint import checkpoint_manager, restore_train_state, save_train_state

log = logging.getLogger(__name__)


class CancellationToken:
    """Cooperative cancel for threaded training (main.py:36-106)."""

    def __init__(self):
        self._ev = threading.Event()

    def cancel(self):
        self._ev.set()

    @property
    def cancelled(self) -> bool:
        return self._ev.is_set()


@dataclass
class WTConfig:
    sr: int = 24000
    n_mels: int = 128
    seg_frames: int = 24           # training segment: seg_frames * hop samples
    batch_size: int = 8
    lr: float = 2e-4
    steps: int = 1000
    ema: float = 0.9999
    ckpt_every: int = 500
    model: WaveGradConfig = WaveGradConfig()


def _mel_of(wav: jnp.ndarray, cfg: WTConfig) -> jnp.ndarray:
    """Mel with exactly len(wav)//hop frames (center pad, then crop) so the
    sampler's t*hop output matches the conditioning audio length."""
    frames = wav.shape[-1] // cfg.model.hop
    m = log_mel(
        mel_spectrogram(
            wav, sr=cfg.sr, n_fft=1024, hop=cfg.model.hop, win_length=1024,
            n_mels=cfg.n_mels, power=1.0, center=True,
        )
    )
    return m[..., :frames, :]


def preprocess_project(project_dir: str, cfg: WTConfig | None = None) -> int:
    """Resample all wavs in <project>/data to cfg.sr mono (the reference's
    preprocess/resample step, layouts/wavetransfer.py:108-159)."""
    cfg = cfg or WTConfig()
    data = Path(project_dir) / "data"
    out = Path(project_dir) / "prepared"
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for p in sorted(data.glob("*.wav")):
        a = read_audio(str(p)).to_mono()
        x = np.asarray(a.samples[0], np.float32)
        if a.sample_rate != cfg.sr:
            x = resample_poly_np(x, a.sample_rate, cfg.sr)
        write_wav(str(out / p.name), x, cfg.sr)
        n += 1
    (Path(project_dir) / "conf.json").write_text(
        json.dumps({"sr": cfg.sr, "n_mels": cfg.n_mels, "hop": cfg.model.hop})
    )
    return n


def _load_segments(project_dir: str, cfg: WTConfig, rng: np.random.Generator):
    """Infinite generator of (audio (b, seg*hop), mel (b, seg, n_mels))."""
    files = sorted((Path(project_dir) / "prepared").glob("*.wav"))
    if not files:
        raise ValueError(f"no prepared wavs in {project_dir}")
    wavs = [np.asarray(read_audio(str(p)).to_mono().samples[0], np.float32)
            for p in files]
    seg = cfg.seg_frames * cfg.model.hop
    wavs = [w for w in wavs if len(w) >= seg]
    if not wavs:
        raise ValueError("all clips shorter than one training segment")
    while True:
        batch = []
        for _ in range(cfg.batch_size):
            w = wavs[rng.integers(len(wavs))]
            s = rng.integers(0, len(w) - seg + 1)
            batch.append(w[s : s + seg])
        audio = jnp.asarray(np.stack(batch))
        yield audio, _mel_of(audio, cfg)


def train_model(
    project_dir: str,
    cfg: WTConfig | None = None,
    token: CancellationToken | None = None,
    callback=None,
    segment_gen=None,
) -> dict:
    """Train loop with EMA + orbax checkpoints + cancellation.

    ``segment_gen`` overrides the (audio, mel) batch source — the
    super-resolution trainer feeds (fullband audio, band-limited mel)
    pairs through the same loop (train/super_res.py)."""
    cfg = cfg or WTConfig()
    token = token or CancellationToken()
    model = WaveGrad(cfg.model)
    rng_np = np.random.default_rng(0)
    gen = segment_gen or _load_segments(project_dir, cfg, rng_np)

    audio0, mel0 = next(gen)
    params = model.init(jax.random.PRNGKey(0), audio0, mel0,
                        jnp.ones((cfg.batch_size,)))["params"]
    tx = optax.adam(cfg.lr)
    opt = tx.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    def _step(params, opt, ema, audio, mel, rng):
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss(model, p, audio, mel, rng)
        )(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: cfg.ema * e + (1.0 - cfg.ema) * p, ema, params
        )
        return params, opt, ema, loss

    # dp-sharded when the batch divides the device count (SURVEY §2.6:
    # replaces the reference's DDP spawn, learner.py:508-522)
    n_dev = len(jax.devices())
    if n_dev > 1 and cfg.batch_size % n_dev == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from audiolab_tpu.core.mesh import get_mesh

        mesh = get_mesh()
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("dp"))
        step = jax.jit(_step,
                       in_shardings=(repl, repl, repl, data, data, repl),
                       out_shardings=(repl, repl, repl, repl))
    else:
        step = jax.jit(_step)

    mgr = checkpoint_manager(str(Path(project_dir) / "ckpt"))
    state = {"params": params, "opt": opt, "ema": ema, "step": 0}
    restored = restore_train_state(mgr, state)
    start = 0
    if restored is not None:
        params, opt, ema = restored["params"], restored["opt"], restored["ema"]
        start = int(restored["step"])
        log.info("wavetransfer resumed at step %d", start)

    loss = float("nan")
    loss_j = jnp.asarray(float("nan"))
    t0 = time.time()
    for i in range(start, cfg.steps):
        if token.cancelled:
            log.info("training cancelled at step %d", i)
            break
        audio, mel = next(gen)
        params, opt, ema, loss_j = step(params, opt, ema, audio, mel,
                                        jax.random.PRNGKey(i))
        if (i + 1) % cfg.ckpt_every == 0 or i + 1 == cfg.steps:
            loss = float(loss_j)
            save_train_state(mgr, i + 1,
                             {"params": params, "opt": opt, "ema": ema, "step": i + 1})
            if callback:
                callback(i + 1, f"step {i + 1}: loss {loss:.4f}", cfg.steps)
            log.info("step %d loss %.4f (%.1fs)", i + 1, loss, time.time() - t0)
    mgr.wait_until_finished()
    return {"loss": float(loss) if np.isfinite(loss) else float(loss_j), "steps": cfg.steps}


def generate(
    project_dir: str,
    source_wav: np.ndarray,
    source_sr: int,
    cfg: WTConfig | None = None,
    schedule: NoiseSchedule = FAST_6,
    chunk_frames: int = 64,
    seed: int = 0,
) -> tuple[np.ndarray, int]:
    """Timbre transfer: source audio -> mel -> batched chunked sampling ->
    crossfade stitch (bddm/sampler.py:38-628 behavior, batched)."""
    cfg = cfg or WTConfig()
    model = WaveGrad(cfg.model)
    mgr = checkpoint_manager(str(Path(project_dir) / "ckpt"))
    tmpl_gen = _load_segments(project_dir, cfg, np.random.default_rng(0))
    audio0, mel0 = next(tmpl_gen)
    tmpl_params = model.init(jax.random.PRNGKey(0), audio0, mel0,
                             jnp.ones((cfg.batch_size,)))["params"]
    tx = optax.adam(cfg.lr)
    state = restore_train_state(
        mgr, {"params": tmpl_params, "opt": tx.init(tmpl_params),
              "ema": tmpl_params, "step": 0}
    )
    if state is None:
        raise FileNotFoundError(f"no checkpoint in {project_dir}/ckpt")
    params = state["ema"]  # EMA weights for inference (learner.py convention)

    x = np.asarray(source_wav, np.float32)
    if source_sr != cfg.sr:
        x = resample_poly_np(x, source_sr, cfg.sr)
    hop = cfg.model.hop
    chunk = chunk_frames * hop
    overlap = 4 * hop
    plan = plan_chunks(len(x), chunk, overlap)
    chunks = extract_chunks(jnp.asarray(x), plan)         # (count, chunk)
    mel = _mel_of(chunks, cfg)                            # (count, frames, n_mels)
    out = sample(model, params, mel, schedule, jax.random.PRNGKey(seed))
    y = stitch_chunks(out, plan)  # mel cropping guarantees out chunk == plan.chunk
    return np.asarray(y[: len(x)], np.float32), cfg.sr


# ------------------------------------------------ BDDM schedule network

class BDDMScheduleNet(nn.Module):
    """BDDM's noise-schedule predictor phi (reference
    modules/wavetransfer/bddm/galr.py:427-444 role + models.py wrapper):
    beta_hat = min(beta_next_bound, delta^2) * sigmoid_ratio(noisy audio).

    TPU-first: a strided-conv stack replaces the GALR blocks — BDDM's
    step loss (Eq. 14) is agnostic to phi's architecture, and a conv
    stack maps onto the MXU without GALR's per-segment RNN recurrences."""

    @nn.compact
    def __call__(self, audio, bounds):
        """audio (b, t); bounds (b, 2) = [beta_next, delta^2] -> (b, 1)."""
        x = audio[..., None]
        for ch, s in ((16, 4), (32, 4), (64, 4)):
            x = nn.silu(nn.Conv(ch, (8,), strides=(s,), padding="SAME")(x))
        ratio = jax.nn.sigmoid(nn.Dense(1, name="ratio")(x.mean(axis=1)))
        mu = jnp.min(bounds, axis=1, keepdims=True)
        return mu * ratio


def bddm_step_loss(wavegrad, wg_params, sched_net, s_params, audio, mel,
                   rng, schedule: NoiseSchedule = TRAIN_SCHEDULE,
                   tau: int = 250):
    """BDDM Eq. 14 step loss (bddm/loss.py:37-64), exact semantics: draw a
    step pair (t, t+tau), noise the audio at alpha_t, ask phi for
    beta_hat bounded by [beta_next, delta^2], and score it against the
    FROZEN score network's eps prediction."""
    sac = jnp.asarray(schedule.sqrt_alpha_cum)
    n = len(schedule.betas)
    k1, k2 = jax.random.split(rng)
    b = audio.shape[0]
    ts = jax.random.randint(k1, (b,), tau, n - tau)
    a_cur = sac[ts][:, None]
    a_nxt = sac[ts + tau][:, None]
    b_nxt = 1.0 - (a_nxt / a_cur) ** 2
    delta2 = 1.0 - a_cur ** 2
    z = jax.random.normal(k2, audio.shape)
    noisy = a_cur * audio + jnp.sqrt(delta2) * z
    e = wavegrad.apply({"params": wg_params}, noisy, mel, a_cur[:, 0])
    b_hat = sched_net.apply({"params": s_params}, noisy,
                            jnp.concatenate([b_nxt, delta2], axis=1))
    t_len = audio.shape[-1]
    l = (delta2 / (2.0 * (delta2 - b_hat))
         * (z - b_hat / delta2 * e) ** 2
         + jnp.log(1e-8 + delta2 / (b_hat + 1e-8)) / 4.0)
    loss = l.sum(-1) + (b_hat[:, 0] / delta2[:, 0] - 1.0) / 2.0 * t_len
    return jnp.mean(loss)


def train_schedule_net(wavegrad, wg_params, audio, mel, steps: int = 100,
                       lr: float = 1e-4, seed: int = 0,
                       schedule: NoiseSchedule = TRAIN_SCHEDULE,
                       tau: int = 250):
    """Optimize phi against a FROZEN score network (bddm/trainer.py role).
    Returns (sched_net, params, losses)."""
    import optax

    sched_net = BDDMScheduleNet()
    rng = jax.random.PRNGKey(seed)
    s_params = sched_net.init(rng, audio, jnp.ones((audio.shape[0], 2)))[
        "params"]
    opt = optax.adam(lr)
    opt_state = opt.init(s_params)

    @jax.jit
    def step(s_params, opt_state, rng):
        rng, k = jax.random.split(rng)
        loss, grads = jax.value_and_grad(
            lambda p: bddm_step_loss(wavegrad, wg_params, sched_net, p,
                                     audio, mel, k, schedule, tau))(s_params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(s_params, updates), opt_state, rng, loss

    losses = []
    for _ in range(steps):
        s_params, opt_state, rng, loss = step(s_params, opt_state, rng)
        losses.append(float(loss))
    return sched_net, s_params, losses


def bddm_noise_scheduling(wavegrad, wg_params, sched_net, s_params,
                          ref_mel, alpha_param: float = 0.95,
                          beta_param: float = 0.02, max_steps: int = 20,
                          min_beta: float = 1e-6, seed: int = 0,
                          schedule: NoiseSchedule = TRAIN_SCHEDULE):
    """BDDM reverse schedule search (bddm/sampler.py:238-300): run the
    reverse process from (alpha_param, beta_param), letting phi emit each
    next beta, and collect the short schedule.  Grid-search the two
    params by output quality like the reference's FAD loop
    (sampler.py:455-479).  Returns a NoiseSchedule of the found betas."""
    t_len = ref_mel.shape[1] * wavegrad.cfg.hop
    rng = jax.random.PRNGKey(seed)
    rng, k = jax.random.split(rng)
    x = jax.random.normal(k, (ref_mel.shape[0], t_len))
    eps_fn = jax.jit(lambda xx, aa: wavegrad.apply(
        {"params": wg_params}, xx, ref_mel, aa))
    phi_fn = jax.jit(lambda xx, bb: sched_net.apply(
        {"params": s_params}, xx, bb))
    a_cur, b_cur = float(alpha_param), float(beta_param)
    min_sac = float(np.min(schedule.sqrt_alpha_cum))
    betas = []
    for n in range(max_steps - 1, -1, -1):
        if a_cur < min_sac:  # past the densest trained noise level
            break
        betas.append(b_cur)
        ab = jnp.full((x.shape[0],), a_cur)
        e = eps_fn(x, ab)
        x = (x - b_cur / np.sqrt(1.0 - a_cur ** 2) * e) / np.sqrt(1.0 - b_cur)
        if n > 0:
            a_nxt_val = a_cur / np.sqrt(1.0 - b_cur)
            rng, k = jax.random.split(rng)
            z = jax.random.normal(k, x.shape)
            x = x + np.sqrt((1.0 - min(a_nxt_val, 1.0 - 1e-6) ** 2)
                            / (1.0 - a_cur ** 2) * b_cur) * z
        a_cur = a_cur / np.sqrt(1.0 - b_cur)
        if a_cur > 1.0:
            break
        bounds = jnp.asarray([[b_cur, 1.0 - a_cur ** 2]])
        bounds = jnp.broadcast_to(bounds, (x.shape[0], 2))
        b_cur = float(jnp.mean(phi_fn(x, bounds)))
        if b_cur < min_beta:
            break
    return NoiseSchedule(np.asarray(betas[::-1], np.float64))
