"""ACE-Step-class flow-matching text2music.

Reference behavior (modules/acestep/, SURVEY §2.3):
  - DiT denoiser over music-DCAE latents
    (acestep/models/ace_step_transformer.py:568, acestep/music_dcae/)
  - flow-matching with Euler / Heun / PingPong schedulers
    (acestep/schedulers/scheduling_flow_match_*.py)
  - APG guidance (apg_guidance.py): CFG update split into components
    parallel/orthogonal to the state with momentum, prevents oversaturation
  - retake (re-noise w/ variance), repaint (masked region), extend
    (pad + repaint), edit via flowedit (pipeline_ace_step.py:562-765)
  - lyric tokenizer + language segmentation (models/lyrics_utils/)
  - LoRA adapters + Lightning trainer (trainer.py:36-890)

TPU redesign: one `lax.scan` over scheduler steps with the CFG double batch
inside; DCAE is a 1-D conv stack over mel frames (all MXU); LoRA is a
parameter-tree overlay (base kernels frozen, optax.masked trains only the
A/B factors) — no module surgery."""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.dit import DiT, DiTConfig
from audiolab_tpu.models.stable_audio import TextEncoder, tokenize_prompt


# ------------------------------------------------------------------ DCAE

@dataclass(frozen=True)
class DCAEConfig:
    n_mels: int = 128
    latent_dim: int = 8
    base_ch: int = 64
    ratios: Sequence[int] = (2, 2, 2)   # temporal compression 8x

    @property
    def hop(self) -> int:
        return int(np.prod(self.ratios))


class DCAEEncoder(nn.Module):
    cfg: DCAEConfig = DCAEConfig()

    @nn.compact
    def __call__(self, mel):
        """(b, t, n_mels) -> (b, t/hop, latent_dim)."""
        c = self.cfg
        h = nn.Conv(c.base_ch, (3,), padding="SAME", name="conv_in")(mel)
        ch = c.base_ch
        for i, r in enumerate(c.ratios):
            ch *= 2
            h = nn.gelu(nn.GroupNorm(num_groups=8, name=f"gn_{i}")(h))
            h = nn.Conv(ch, (2 * r,), strides=(r,), padding="SAME",
                        name=f"down_{i}")(h)
        h = nn.gelu(h)
        return nn.Conv(c.latent_dim, (3,), padding="SAME", name="conv_out")(h)


class DCAEDecoder(nn.Module):
    cfg: DCAEConfig = DCAEConfig()

    @nn.compact
    def __call__(self, z):
        """(b, t, latent_dim) -> (b, t*hop, n_mels)."""
        c = self.cfg
        ch = c.base_ch * 2 ** len(c.ratios)
        h = nn.Conv(ch, (3,), padding="SAME", name="conv_in")(z)
        for i, r in enumerate(reversed(c.ratios)):
            ch //= 2
            h = nn.gelu(nn.GroupNorm(num_groups=8, name=f"gn_{i}")(h))
            h = nn.ConvTranspose(ch, (2 * r,), strides=(r,), padding="SAME",
                                 name=f"up_{i}")(h)
        h = nn.gelu(h)
        return nn.Conv(c.n_mels, (3,), padding="SAME", name="conv_out")(h)


# ------------------------------------------------------------------ lyric tokenizer

_LANG_TAG = re.compile(r"\[(verse|chorus|bridge|intro|outro|inst|en|zh|ja|ko)\]",
                       re.IGNORECASE)


def segment_languages(text: str) -> list[tuple[str, str]]:
    """Unicode-script language segmentation (the reference vendors a
    language_segmentation package for the lyric tokenizer;
    acestep/models/lyrics_utils/).  Returns [(lang, run)] with lang in
    en/zh/ja/ko, split at script boundaries."""

    def script_of(ch: str) -> str:
        o = ord(ch)
        if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
            return "zh"
        if 0x3040 <= o <= 0x30FF:
            return "ja"
        if 0xAC00 <= o <= 0xD7AF or 0x1100 <= o <= 0x11FF:
            return "ko"
        return "en"

    runs: list[tuple[str, list[str]]] = []
    for ch in text:
        lang = script_of(ch)
        if ch.isspace() and runs:
            runs[-1][1].append(ch)
        elif runs and runs[-1][0] == lang:
            runs[-1][1].append(ch)
        else:
            runs.append((lang, [ch]))
    return [(lang, "".join(chars)) for lang, chars in runs if "".join(chars).strip()]


def tokenize_lyrics(text: str, max_len: int = 1024) -> np.ndarray:
    """Structure-tag-aware byte tokenizer (lyrics_utils semantics: [verse]
    etc. become single control tokens 1-16; bytes shifted +16)."""
    tags = ["verse", "chorus", "bridge", "intro", "outro", "inst",
            "en", "zh", "ja", "ko"]
    out: list[int] = []
    pos = 0
    for m in _LANG_TAG.finditer(text):
        out.extend(b + 16 for b in text[pos : m.start()].encode("utf-8"))
        out.append(1 + tags.index(m.group(1).lower()))
        pos = m.end()
    out.extend(b + 16 for b in text[pos:].encode("utf-8"))
    ids = np.zeros(max_len, np.int32)
    trunc = out[:max_len]
    ids[: len(trunc)] = trunc
    return ids


# ------------------------------------------------------------------ model

@dataclass
class ACEStepConfig:
    sr: int = 44100
    mel_hop: int = 512            # audio samples per mel frame
    dcae: DCAEConfig = field(default_factory=DCAEConfig)
    dit: DiTConfig = field(default_factory=lambda: DiTConfig(
        dim=1024, n_layers=16, n_heads=16, cond_dim=768, in_dim=8, out_dim=8))
    text_dim: int = 768
    text_layers: int = 4
    lyric_vocab: int = 300

    @property
    def latent_rate(self) -> float:
        return self.sr / (self.mel_hop * self.dcae.hop)


class ACEStepModel(nn.Module):
    cfg: ACEStepConfig

    def setup(self):
        c = self.cfg
        self.encoder = DCAEEncoder(c.dcae, name="dcae_encoder")
        self.decoder = DCAEDecoder(c.dcae, name="dcae_decoder")
        self.dit = DiT(c.dit, name="dit")
        self.text_enc = TextEncoder(c.text_dim, c.text_layers,
                                    max(1, c.text_dim // 64), name="text_encoder")
        self.lyric_emb = nn.Embed(c.lyric_vocab, c.text_dim, name="lyric_emb")

    def encode_cond(self, tag_ids, lyric_ids):
        """Genre-tag text + lyrics -> one context stream."""
        tags = self.text_enc(tag_ids)
        lyr = self.lyric_emb(lyric_ids)
        return jnp.concatenate([tags, lyr], axis=1)

    def velocity(self, z, t, context):
        return self.dit(z, t, context)

    def velocity_hidden(self, z, t, context, depth):
        """Velocity + inner hidden states after DiT block ``depth`` (the
        SSL projection tap, ace_step_transformer.py:478-481)."""
        return self.dit(z, t, context, return_hidden_at=depth)

    def encode_mel(self, mel):
        return self.encoder(mel)

    def decode_latent(self, z):
        return self.decoder(z)

    def full_init(self, mel, tag_ids, lyric_ids, t):
        z = self.encode_mel(mel)
        ctx = self.encode_cond(tag_ids, lyric_ids)
        v = self.velocity(z, t, ctx)
        return self.decode_latent(z + 0.0 * v)


# ------------------------------------------------------------------ APG guidance

def apg(cond: jnp.ndarray, uncond: jnp.ndarray, scale: float,
        momentum: jnp.ndarray, beta: float = -0.75,
        eta: float = 0.0, norm_threshold: float = 2.5,
        channels: int | None = None):
    """Adaptive projected guidance (apg_guidance.py:33-57 apg_forward):
    the CFG delta is momentum-filtered (MomentumBuffer, beta=-0.75),
    norm-clipped at ``norm_threshold``, and split into components
    parallel/orthogonal to **pred_cond** (project() with v1=pred_cond);
    only ``eta`` of the parallel part survives.

    ``channels``: the checkpoint latents are torch (b, c, h, t) with
    norm/projection dims=[-1, -2] (per-(b, c) over (h, t)).  Our sampler
    layout is (b, t, c*h); passing ``channels=c`` reproduces the
    per-channel reduction exactly.  ``None`` reduces over everything but
    batch (the in-repo speed model's convention)."""
    diff = cond - uncond
    momentum = beta * momentum + diff          # negative-momentum filter
    if channels is not None:
        b, t, f = diff.shape
        dr = momentum.reshape(b, t, channels, f // channels)
        cr = cond.reshape(b, t, channels, f // channels)
        red = (1, 3)                           # == torch dims (-1, -2)
    else:
        dr, cr = momentum[..., None], cond[..., None]
        red = (1, 2)
    norm = jnp.sqrt(jnp.sum(dr * dr, axis=red, keepdims=True))
    dr = dr * jnp.minimum(1.0, norm_threshold / (norm + 1e-15))
    cn = cr / (jnp.sqrt(jnp.sum(cr * cr, axis=red, keepdims=True)) + 1e-12)
    parallel = jnp.sum(dr * cn, axis=red, keepdims=True) * cn
    orthogonal = dr - parallel
    upd = (orthogonal + eta * parallel).reshape(cond.shape)
    return cond + (scale - 1.0) * upd, momentum


def acestep_sigmas(steps: int, shift: float = 3.0,
                   num_train_timesteps: int = 1000) -> jnp.ndarray:
    """The checkpoint sampler's sigma schedule
    (schedulers/scheduling_flow_match_euler_discrete.py:198-217 with
    shift=3.0 as built by pipeline_ace_step.py:870-885): base sigmas
    linspace(1, 1/1000, steps), time-shifted s' = shift*s/(1+(shift-1)s),
    with a final 0 appended.  The DiT consumes sigma*1000 as its
    timestep."""
    base = jnp.linspace(1.0, 1.0 / num_train_timesteps, steps)
    shifted = shift * base / (1.0 + (shift - 1.0) * base)
    return jnp.concatenate([shifted, jnp.zeros((1,))])


# ------------------------------------------------------------------ sampling (flow matching)

def fm_sample(
    model: ACEStepModel,
    params,
    context2: jnp.ndarray,        # (2b, s, cond_dim) [cond; uncond]
    t_latent: int,
    steps: int = 27,
    scheduler: str = "euler",     # euler | heun | pingpong
    guidance_scale: float = 7.5,
    use_apg: bool = True,
    rng: jax.Array | None = None,
    z_init: jnp.ndarray | None = None,
    t_start: float = 1.0,
    repaint_mask: jnp.ndarray | None = None,   # (b, t, 1): 1 = regenerate
    z_ref: jnp.ndarray | None = None,          # kept where mask==0
    velocity2_fn=None,   # optional (z2, t2) -> v2 override (2b doubled batch)
    sigmas: jnp.ndarray | None = None,    # explicit (steps+1,) schedule
    timestep_scale: float = 1.0,          # DiT timestep = sigma * this
    omega_scale: float | None = None,     # scheduler omega (mean-shift step)
    guidance_interval: float = 1.0,
    guidance_interval_decay: float = 0.0,
    min_guidance_scale: float = 3.0,
    velocity_cond_fn=None,     # (z, t_b) -> v, single batch (ERG split)
    velocity_uncond_fn=None,
    apg_channels: int | None = None,
) -> jnp.ndarray:
    """Flow-matching ODE solve z_1 (noise) -> z_0 (data), CFG double batch.

    velocity convention: v = dz/dt pointing from data to noise
    (z_t = (1-t) z0 + t eps  =>  v = eps - z0).

    ``velocity2_fn`` lets another backbone (e.g. the checkpoint-faithful
    models/acestep_dit.ACEStepDiT via pipelines.acestep.CheckpointACEStep)
    reuse this scan; ``model``/``params``/``context2`` then only size the
    batch (pass z_init explicitly).

    Checkpoint-sampler semantics (pipeline_ace_step.py text2music loop):

    - ``sigmas`` — pass :func:`acestep_sigmas` for the shift-3 schedule;
      ``timestep_scale=1000`` feeds the DiT sigma*1000 as upstream does.
    - ``omega_scale`` — the custom FlowMatchEulerDiscreteScheduler.step
      ``omega`` (:290-336): dx = (sigma_next-sigma)*v is mean-shifted,
      (dx - mean)*logistic(omega) + mean, logistic L=0.9 U=1.1 k=0.1.
    - ``guidance_interval`` — CFG only on the middle fraction of steps
      (:1065-1066 start/end idx); outside, the conditional velocity alone
      drives the step and the APG momentum buffer is NOT updated.
    - ``guidance_interval_decay``/``min_guidance_scale`` — linear decay of
      the scale across the interval (:1200-1211).
    - ``velocity_cond_fn``/``velocity_uncond_fn`` — separate forwards when
      cond and uncond need different module behavior (ERG temperature
      guidance); overrides the doubled-batch path.
    """
    b = context2.shape[0] // 2
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if z_init is not None:
        z = z_init
    else:
        z = jax.random.normal(rng, (b, t_latent, model.cfg.dcae.latent_dim))
    if sigmas is not None:
        ts = jnp.asarray(sigmas)
        steps = int(ts.shape[0]) - 1
    else:
        ts = jnp.linspace(t_start, 0.0, steps + 1)
    momentum0 = jnp.zeros_like(z)

    # guidance interval (pipeline_ace_step.py:1065-1066)
    if guidance_interval < 1.0:
        start_idx = int(steps * ((1.0 - guidance_interval) / 2.0))
        end_idx = int(steps * (guidance_interval / 2.0 + 0.5))
    else:
        start_idx, end_idx = 0, steps

    scales = np.full(steps, guidance_scale, np.float32)
    if guidance_interval_decay > 0 and end_idx - start_idx > 1:
        for i in range(start_idx, end_idx):
            progress = (i - start_idx) / (end_idx - start_idx - 1)
            scales[i] = guidance_scale - (
                guidance_scale - min_guidance_scale
            ) * progress * guidance_interval_decay
    scales = jnp.asarray(scales)

    def vel_both(z, t):
        if velocity_cond_fn is not None:
            tb = jnp.full((b,), t * timestep_scale)
            return velocity_cond_fn(z, tb), velocity_uncond_fn(z, tb)
        z2 = jnp.concatenate([z, z], axis=0)
        tb = jnp.full((2 * b,), t * timestep_scale)
        if velocity2_fn is not None:
            v = velocity2_fn(z2, tb)
        else:
            v = model.apply({"params": params}, z2, tb, context2,
                            method=ACEStepModel.velocity)
        return jnp.split(v, 2, axis=0)

    def vel_cond(z, t):
        if velocity_cond_fn is not None:
            return velocity_cond_fn(z, jnp.full((b,), t * timestep_scale))
        return vel_both(z, t)[0]

    def guide(vc, vu, mom, scale):
        if use_apg:
            return apg(vc, vu, scale, mom, channels=apg_channels)
        return vu + scale * (vc - vu), mom

    if omega_scale is not None:
        # logistic_function(omega, L=0.9, U=1.1, x_0=0, k=0.1)
        omega = 0.9 + 0.2 / (1.0 + math.exp(-0.1 * omega_scale))

    def euler_dx(v, dt):
        dx = dt * v
        if omega_scale is not None:
            m = jnp.mean(dx)            # global mean, matching dx.mean()
            dx = (dx - m) * omega + m
        return dx

    def make_body(guided: bool):
        def body(carry, i):
            z, mom, rng = carry
            t_cur, t_next = ts[i], ts[i + 1]
            dt = t_next - t_cur
            if guided:
                vc, vu = vel_both(z, t_cur)
                v, mom = guide(vc, vu, mom, scales[i])
            else:
                v = vel_cond(z, t_cur)
            if scheduler == "heun":
                z_e = z + dt * v
                if guided:
                    vc2, vu2 = vel_both(z_e, t_next)
                    v2, mom = guide(vc2, vu2, mom, scales[i])
                else:
                    v2 = vel_cond(z_e, t_next)
                z = z + dt * 0.5 * (v + v2)
            elif scheduler == "pingpong":
                # stochastic: step to the x0 estimate, then re-noise
                x0 = z - t_cur * v
                rng, k = jax.random.split(rng)
                eps = jax.random.normal(k, z.shape)
                z = (1.0 - t_next) * x0 + t_next * eps
            else:  # euler
                z = z + euler_dx(v, dt)
            if repaint_mask is not None and z_ref is not None:
                # keep reference content outside the repaint region at its
                # matching noise level
                rng, k = jax.random.split(rng)
                eps = jax.random.normal(k, z.shape)
                z_keep = (1.0 - t_next) * z_ref + t_next * eps
                z = repaint_mask * z + (1.0 - repaint_mask) * z_keep
            return (z, mom, rng), None
        return body

    carry = (z, momentum0, rng)
    phases = ((0, start_idx, False), (start_idx, end_idx, True),
              (end_idx, steps, False))
    for lo, hi, guided in phases:
        if hi > lo:
            carry, _ = jax.lax.scan(make_body(guided), carry,
                                    jnp.arange(lo, hi))
    return carry[0]


# ------------------------------------------------------------------ LoRA

def lora_init(params, rng, rank: int = 8, targets=("wq", "wk", "wv", "wo")) -> dict:
    """Low-rank factors for every target Dense kernel in the DiT.

    Returns a pytree shaped like a subset of params: {path: {a, b}}."""
    flat = {}

    def walk(tree, path):
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                if k in targets and "kernel" in v:
                    key = jax.random.fold_in(rng, hash(p) % (2**31))
                    din, dout = v["kernel"].shape
                    flat[p] = {
                        "a": jax.random.normal(key, (din, rank)) * 0.01,
                        "b": jnp.zeros((rank, dout)),
                    }
                else:
                    walk(v, p)

    walk(params, ())
    return flat


def lora_apply(params, lora: dict, alpha: float = 1.0):
    """Merged params: kernel + alpha * (a @ b) at every adapted path."""
    import copy

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy

    def set_at(tree, path, val):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = val

    for path, ab in lora.items():
        node = params
        for k in path:
            node = node[k]
        merged = dict(node)
        merged["kernel"] = node["kernel"] + alpha * (ab["a"] @ ab["b"])
        set_at(out, path, merged)
    return out
