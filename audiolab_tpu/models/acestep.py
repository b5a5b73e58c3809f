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

def apg(cond: jnp.ndarray, uncond: jnp.ndarray, x: jnp.ndarray,
        scale: float, momentum: jnp.ndarray, beta: float = -0.75,
        eta: float = 0.0, norm_threshold: float = 2.5):
    """Adaptive projected guidance (apg_guidance.py semantics): the CFG
    delta is momentum-filtered, norm-clipped, and split into components
    parallel/orthogonal to x; only ``eta`` of the parallel part is kept."""
    diff = cond - uncond
    momentum = beta * momentum + diff          # negative-momentum filter
    d = momentum
    norm = jnp.linalg.norm(d.reshape(d.shape[0], -1), axis=-1)[:, None, None]
    d = d * jnp.minimum(1.0, norm_threshold / (norm + 1e-8))
    xn = x / (jnp.linalg.norm(x.reshape(x.shape[0], -1), axis=-1)[:, None, None] + 1e-8)
    parallel = jnp.sum(d * xn, axis=(1, 2), keepdims=True) * xn
    orthogonal = d - parallel
    guided = cond + (scale - 1.0) * (orthogonal + eta * parallel)
    return guided, momentum


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
) -> jnp.ndarray:
    """Flow-matching ODE solve z_1 (noise) -> z_0 (data), CFG double batch.

    velocity convention: v = dz/dt pointing from data to noise
    (z_t = (1-t) z0 + t eps  =>  v = eps - z0).

    ``velocity2_fn`` lets another backbone (e.g. the checkpoint-faithful
    models/acestep_dit.ACEStepDiT via pipelines.acestep.CheckpointACEStep)
    reuse this scan; ``model``/``params``/``context2`` then only size the
    batch (pass z_init explicitly)."""
    b = context2.shape[0] // 2
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if z_init is not None:
        z = z_init
    else:
        z = jax.random.normal(rng, (b, t_latent, model.cfg.dcae.latent_dim))
    ts = jnp.linspace(t_start, 0.0, steps + 1)
    momentum0 = jnp.zeros_like(z)

    def vel(z, t):
        z2 = jnp.concatenate([z, z], axis=0)
        tb = jnp.full((2 * b,), t)
        if velocity2_fn is not None:
            v = velocity2_fn(z2, tb)
        else:
            v = model.apply({"params": params}, z2, tb, context2,
                            method=ACEStepModel.velocity)
        return jnp.split(v, 2, axis=0)

    def guide(vc, vu, z, mom):
        if use_apg:
            return apg(vc, vu, z, guidance_scale, mom)
        return vu + guidance_scale * (vc - vu), mom

    def body(carry, i):
        z, mom, rng = carry
        t_cur, t_next = ts[i], ts[i + 1]
        dt = t_next - t_cur
        vc, vu = vel(z, t_cur)
        v, mom = guide(vc, vu, z, mom)
        if scheduler == "heun":
            z_e = z + dt * v
            vc2, vu2 = vel(z_e, t_next)
            v2, mom = guide(vc2, vu2, z_e, mom)
            z = z + dt * 0.5 * (v + v2)
        elif scheduler == "pingpong":
            # stochastic: step to the x0 estimate, then re-noise to t_next
            x0 = z - t_cur * v
            rng, k = jax.random.split(rng)
            eps = jax.random.normal(k, z.shape)
            z = (1.0 - t_next) * x0 + t_next * eps
        else:  # euler
            z = z + dt * v
        if repaint_mask is not None and z_ref is not None:
            # keep reference content outside the repaint region at its
            # matching noise level
            rng, k = jax.random.split(rng)
            eps = jax.random.normal(k, z.shape)
            z_keep = (1.0 - t_next) * z_ref + t_next * eps
            z = repaint_mask * z + (1.0 - repaint_mask) * z_keep
        return (z, mom, rng), None

    (z, _, _), _ = jax.lax.scan(body, (z, momentum0, rng), jnp.arange(steps))
    return z


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
