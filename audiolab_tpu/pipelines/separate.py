"""Ensemble stem separation engine (reference:
modules/separator/stem_separator.py — EnsembleDemucsMDXMusicSeparationModel).

Reference behaviors reproduced:
  - weighted multi-model ensemble blend, avg/median hybrid (:241, weights
    :379-386)
  - residual-subtraction de-bleed with a cosine-similarity guard (:415-443)
  - per-stem transform chain (dereverb/denoise policies, :680-820)
  - background-vocal split hook (karaoke models, :737)

TPU redesign: every model consumes the same batched chunk tensor
(core/chunking) in one jitted call — ensemble members run back-to-back on
device with no per-model host loop or serial model swapping
(the reference reloads models inside the loop, stem_separator.py:393-394).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.core.chunking import extract_chunks, plan_chunks, stitch_chunks

logger = logging.getLogger(__name__)


@dataclass
class EnsembleMember:
    """One separation model + its ensemble blend weights
    (stem_separator.py:379-386 pairs weights per model).

    Two calling conventions: ``apply_fn(batch)`` with params closed over
    (legacy), or ``apply_fn(params, batch)`` with ``params`` set — the
    latter lets the separator fuse chunking + all batch calls + stitching
    into ONE jitted graph per member without baking weights in as
    constants (each eager jnp op is a full RPC round trip on tunneled
    TPUs; a 4-min track used to spend ~3 s on those)."""

    name: str
    apply_fn: Callable[..., dict]  # (b, ch, n) -> {stem: (b, ch, n)}
    weight_vocals: float = 1.0
    weight_inst: float = 1.0
    params: dict | None = None


def blend_tracks(tracks: list, weights: list[float]):
    """Avg/median hybrid blend (stem_separator.py:241 _blend_tracks).
    Works on device (jnp) — no host round trip inside the ensemble."""
    stack = jnp.stack([jnp.asarray(t) for t in tracks])  # (m, ch, n)
    w = jnp.asarray(weights, dtype=jnp.float32)[:, None, None]
    avg = (stack * w).sum(axis=0) / w.sum()
    med = jnp.median(stack, axis=0)
    return 0.5 * (avg + med)


def debleed(target, other, alpha: float = 0.2, cos_guard: float = 0.5):
    """Residual subtraction with cosine guard (stem_separator.py:415-443):
    only subtract the leaked component when the stems are sufficiently
    decorrelated, so we don't carve out shared content.  Branchless device
    form: the guard becomes a multiplicative mask."""
    t = jnp.asarray(target).reshape(-1)
    o = jnp.asarray(other).reshape(-1)
    denom = jnp.linalg.norm(t) * jnp.linalg.norm(o) + 1e-9
    cos = jnp.dot(t, o) / denom
    proj = jnp.dot(t, o) / (jnp.dot(o, o) + 1e-9)
    apply = (jnp.abs(cos) <= cos_guard).astype(jnp.float32)
    return jnp.asarray(target) - apply * alpha * proj * jnp.asarray(other)


class StemSeparator:
    """Chunked, batched ensemble separation."""

    def __init__(
        self,
        members: list[EnsembleMember],
        sr: int = 44100,
        chunk_seconds: float = 8.0,
        overlap_seconds: float = 0.5,
        device_batch: int = 8,
        mesh=None,
        matmul_precision: str = "bfloat16",
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a leading ``dp``
        axis.  Chunk batches are sharded over it, fanning ensemble inference
        out across chips (chunks are embarrassingly parallel; XLA inserts
        zero collectives).  ``device_batch`` is rounded up to a multiple of
        the dp size so every shard gets equal work."""
        self.members = members
        self.sr = sr
        self.chunk_seconds = chunk_seconds
        self.overlap_seconds = overlap_seconds
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape["dp"]
            device_batch = max(device_batch, dp)
            device_batch += (-device_batch) % dp
        self.device_batch = device_batch
        self._fused_cache: dict = {}
        # model matmuls ride the MXU in bf16 (~6x fp32 on v5e); the STFT /
        # iSTFT kernels pin HIGHEST internally so the spectral front-end
        # keeps full precision (same policy as RVCPipelineConfig)
        self.matmul_precision = matmul_precision

    def _run_member(self, member: EnsembleMember, audio: np.ndarray) -> dict:
        """Chunk -> fixed-size batched model calls -> crossfade stitch.

        Chunk count is padded to device_batch multiples so long tracks
        reuse ONE compiled shape with bounded HBM (same policy as the RVC
        pipeline).  When the member carries explicit ``params``, the whole
        path (chunk gather, every batch call, crossfade stitch) runs as a
        single jitted graph — one dispatch per member per track."""
        ch, n = audio.shape
        chunk = int(self.chunk_seconds * self.sr)
        overlap = int(self.overlap_seconds * self.sr)
        plan = plan_chunks(n, chunk, overlap)
        db = max(1, min(self.device_batch, plan.count))
        # balance the batch over the group count: 35 chunks at device_batch
        # 8 would pad to 5 groups x 8 = 40 slots (14% wasted MXU time);
        # 5 groups x 7 covers them exactly.  Never exceeds device_batch,
        # so HBM stays bounded by the configured shape.
        n_groups = -(-plan.count // db)
        db = -(-plan.count // n_groups)
        if self.mesh is not None:  # keep shards equal across the dp axis
            dp = self.mesh.shape["dp"]
            db += (-db) % dp
        pad = (-plan.count) % db

        if member.params is not None and self.mesh is None:
            fn = self._fused_member_fn(member, ch, n, plan, db, pad)
            return fn(member.params, jnp.asarray(audio))

        chunks = extract_chunks(jnp.asarray(audio), plan)  # (count, ch, chunk)
        if pad:
            chunks = jnp.concatenate(
                [chunks, jnp.zeros((pad,) + chunks.shape[1:], chunks.dtype)])
        groups: list[dict] = []
        for g in range(0, chunks.shape[0], db):
            batch = chunks[g : g + db]
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch = jax.device_put(batch, NamedSharding(self.mesh, P("dp")))
            groups.append(member.apply_fn(member.params, batch)
                          if member.params is not None
                          else member.apply_fn(batch))
        out = {stem: jnp.concatenate([gr[stem] for gr in groups])[: plan.count]
               for stem in groups[0]}
        # stays ON DEVICE: stitched stems feed the blend/de-bleed and the
        # downstream pipeline without a tunnel round trip
        return {stem: stitch_chunks(v, plan) for stem, v in out.items()}

    def _fused_member_fn(self, member: EnsembleMember, ch, n, plan, db, pad):
        key = (id(member.apply_fn), ch, n, db)
        fn = self._fused_cache.get(key)
        if fn is not None:
            return fn

        n_groups = (plan.count + pad) // db

        def graph(params, audio):
            chunks = extract_chunks(audio, plan)
            if pad:
                chunks = jnp.concatenate(
                    [chunks,
                     jnp.zeros((pad,) + chunks.shape[1:], chunks.dtype)])
            # lax.map over groups: the model body is traced/compiled ONCE
            # instead of inlined n_groups times (a 4-min track at batch 7 is
            # 5 groups — unrolling quintupled the XLA graph and pushed the
            # tunnel compile to ~15 min; execution order is identical)
            batched = chunks.reshape((n_groups, db) + chunks.shape[1:])
            stacked = jax.lax.map(
                lambda b: member.apply_fn(params, b), batched)
            out = {s: v.reshape((n_groups * db,) + v.shape[2:])[: plan.count]
                   for s, v in stacked.items()}
            return {s: stitch_chunks(v, plan) for s, v in out.items()}

        fn = jax.jit(graph)
        self._fused_cache[key] = fn
        return fn

    def separate(
        self,
        audio: np.ndarray,
        callback=None,
        as_numpy: bool = True,
    ) -> dict[str, np.ndarray]:
        """(ch, n) -> {"vocals": (ch, n), "instrumental": (ch, n)}.

        ``as_numpy=False`` keeps the stems on device (feed them straight
        into the next pipeline stage without a host transfer)."""
        if audio.ndim == 1:
            audio = audio[None]
        audio = jnp.asarray(audio)
        vocals_tracks, inst_tracks = [], []
        wv, wi = [], []
        with jax.default_matmul_precision(self.matmul_precision):
            for i, m in enumerate(self.members):
                if callback:
                    callback(i, f"Separating with {m.name}", len(self.members))
                stems = self._run_member(m, audio)
                v = stems.get("vocals")
                inst = stems.get("other", stems.get("instrumental"))
                if inst is None and v is not None:
                    inst = audio - v  # residual instrumental
                if v is not None:
                    vocals_tracks.append(v)
                    wv.append(m.weight_vocals)
                if inst is not None:
                    inst_tracks.append(inst)
                    wi.append(m.weight_inst)

            # blend + de-bleed as ONE jitted dispatch (each eager op is a
            # full RPC round trip on tunneled TPUs)
            key = ("combine", tuple(wv), tuple(wi), len(vocals_tracks),
                   vocals_tracks[0].shape)
            fn = self._fused_cache.get(key)
            if fn is None:
                wv_t, wi_t = tuple(wv), tuple(wi)

                def combine(vs, is_):
                    vb = blend_tracks(list(vs), list(wv_t))
                    ib = blend_tracks(list(is_), list(wi_t))
                    return debleed(vb, ib), debleed(ib, vb)

                fn = jax.jit(combine)
                self._fused_cache[key] = fn
            vocals, inst = fn(jnp.stack(vocals_tracks),
                              jnp.stack(inst_tracks))
            del vocals_tracks, inst_tracks
        if as_numpy:
            return {"vocals": np.asarray(vocals, np.float32),
                    "instrumental": np.asarray(inst, np.float32)}
        return {"vocals": vocals, "instrumental": inst}

    def separate_multistem(self, audio: np.ndarray, member: EnsembleMember,
                           callback=None) -> dict[str, np.ndarray]:
        """Full multistem split (vocals/drums/bass/guitar/piano/other) with
        one N-stem model — the reference's htdemucs 6-stem path
        (_multistem_separation_all, stem_separator.py:459).  The residual
        (input − Σstems) is folded into 'other' so the stems sum to the
        input exactly (the reference's reconstruction guarantee)."""
        if audio.ndim == 1:
            audio = audio[None]
        if callback:
            callback(0, f"Multistem with {member.name}", 1)
        stems = {k: np.asarray(v) for k, v in
                 self._run_member(member, jnp.asarray(audio)).items()}
        if len(stems) > 2:
            # derived complement stem (mix - vocals) some members add for
            # 2-stem ensembles; it would double-count in the residual
            stems.pop("instrumental", None)
        total = np.zeros_like(audio)
        for v in stems.values():
            total = total + v[:, : audio.shape[1]]
        residual = audio - total[:, : audio.shape[1]]
        other = stems.get("other", np.zeros_like(audio))
        stems["other"] = (other[:, : audio.shape[1]] + residual).astype(np.float32)
        return {k: np.asarray(v, np.float32) for k, v in stems.items()}


def htdemucs_member(params, cfg=None, name: str = "htdemucs_6s",
                    weight_vocals: float = 1.0,
                    weight_inst: float = 1.0) -> EnsembleMember:
    """A converted demucs v4 checkpoint
    (utils.convert.load_htdemucs_checkpoint) as an EnsembleMember whose
    apply returns every source — feed it to ``separate_multistem`` for
    the reference's 6-stem path (stem_separator.py:459,466) or to the
    ensemble for 2-stem blending."""
    from audiolab_tpu.models.separation.htdemucs import (
        HTDemucs,
        HTDemucsConfig,
    )

    model = HTDemucs(cfg or HTDemucsConfig())
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    sources = tuple(model.cfg.sources)

    def apply(p, batch):
        out = fwd(p, batch)                      # (b, S, ch, n)
        stems = {s: out[:, i] for i, s in enumerate(sources)}
        if "instrumental" not in stems and "vocals" in stems:
            stems["instrumental"] = batch - stems["vocals"]
        return stems

    return EnsembleMember(name=name, apply_fn=apply, params=params,
                          weight_vocals=weight_vocals,
                          weight_inst=weight_inst)


def mdx23c_member(params, cfg=None, name: str = "mdx23c",
                  weight_vocals: float = 7.2,
                  weight_inst: float = 14.9) -> EnsembleMember:
    """A converted MDX23C checkpoint
    (utils.convert.load_mdx23c_checkpoint) as an EnsembleMember — the
    reference blends MDX23C-8KFFT-InstVoc_HQ at 7.2/14.9
    (stem_separator.py:383) and uses the DrumSep variant for kit splits
    (:534-541).  Chunks are right-padded to the net's time-divisibility
    constraint and trimmed back, so any ensemble chunk length works."""
    from audiolab_tpu.models.separation.mdx23c import (
        MDX23CConfig,
        TFCTDFNetV3,
    )

    if isinstance(cfg, dict):
        cfg = MDX23CConfig(**cfg)
    model = TFCTDFNetV3(cfg or MDX23CConfig())
    c = model.cfg
    names = ([c.target_instrument] if c.target_instrument
             else list(c.instruments))
    names = [s.lower() for s in names]

    def fwd(p, x):
        n = x.shape[-1]
        tot = c.scale[0] ** c.num_scales
        frames = -(-(n // c.hop_length + 1) // tot) * tot
        good = (frames - 1) * c.hop_length
        x = jnp.pad(x, ((0, 0), (0, 0), (0, good - n)))
        out = model.apply({"params": p}, x)       # (b, nt, ch, good)
        return out[..., :n]

    jfwd = jax.jit(fwd)

    def apply(p, batch):
        out = jfwd(p, batch)
        stems = {s: out[:, i] for i, s in enumerate(names)}
        if "instrumental" not in stems and "vocals" in stems:
            stems["instrumental"] = batch - stems["vocals"]
        elif "vocals" not in stems and "instrumental" in stems:
            stems["vocals"] = batch - stems["instrumental"]
        return stems

    return EnsembleMember(name=name, apply_fn=apply, params=params,
                          weight_vocals=weight_vocals,
                          weight_inst=weight_inst)


# preset stem layouts (stem_separator.py: htdemucs 6-stem :459, alt bass
# :505, drum-sep MDX23C :534, woodwinds UVR :589, karaoke BG split :737)
MULTISTEM_6 = ("vocals", "drums", "bass", "guitar", "piano", "other")
DRUM_KIT = ("kick", "snare", "toms", "hh", "cymbals", "other")
KARAOKE = ("lead_vocals", "back_vocals")
WOODWINDS = ("woodwinds", "other")


def vr_split(params, model, band_params, stems: tuple[str, str],
             window_size: int = 512, aggressiveness: float = 0.0):
    """A converted UVR VR checkpoint (utils.convert.load_vr_checkpoint)
    as a named two-stem split — the reference's woodwinds path
    (17_HP-Wind_Inst-UVR.pth, stem_separator.py:589-596) and the BVE
    karaoke split (UVR-BVE-4B_SN-44100-1.pth, :752) use these weights.
    ``stems`` = (primary, complement) names, e.g. WOODWINDS or KARAOKE
    reversed per the model's primary stem."""
    from audiolab_tpu.models.separation.vr_bands import VRSeparator

    sep = VRSeparator(params, model, band_params=band_params,
                      primary=stems[0], window_size=window_size,
                      aggressiveness=aggressiveness)

    def split(audio: np.ndarray) -> dict[str, np.ndarray]:
        out = sep(np.asarray(audio))
        return {stems[0]: out[stems[0]], stems[1]: out["complement"]}

    return split


def vr_transform(params, model, band_params, keep: str = "primary",
                 window_size: int = 512, aggressiveness: float = 0.0):
    """A VR checkpoint as an audio->audio transform for the per-stem
    chain — the reference's UVR-DeNoise / UVR-De-Echo transforms
    (stem_separator.py:148,799,1048-1050; the models' primary stem is the
    cleaned signal, so ``keep='primary'`` denoises/de-echoes)."""
    from audiolab_tpu.models.separation.vr_bands import VRSeparator

    sep = VRSeparator(params, model, band_params=band_params,
                      primary="primary", window_size=window_size,
                      aggressiveness=aggressiveness)

    def transform(audio: np.ndarray, sr: int = 44100) -> np.ndarray:
        x = np.asarray(audio)
        mono = x.ndim == 1
        if mono:
            x = np.stack([x, x])
        out = sep(x)[("primary" if keep == "primary" else "complement")]
        out = out[..., : x.shape[-1]]
        return out[0] if mono else out

    return transform


# ---------------------------------------------------------------- transforms

def spectral_gate_denoise(
    audio: np.ndarray, sr: int, reduction_db: float = 12.0, n_fft: int = 2048
) -> np.ndarray:
    """Noise-removal transform for the per-stem chain (role of the UVR
    denoise models in _apply_transform_chain, stem_separator.py:777):
    noise-floor estimate per bin + soft spectral gate."""
    import jax

    from audiolab_tpu.kernels.stft import istft, stft

    x = jnp.asarray(audio)
    real, imag = stft(x, n_fft=n_fft, hop=n_fft // 4)
    mag = jnp.sqrt(real**2 + imag**2 + 1e-12)
    floor = jnp.percentile(mag, 10.0, axis=-2, keepdims=True)  # per-bin floor
    thresh = floor * 2.0
    gain_min = 10.0 ** (-reduction_db / 20.0)
    gain = jnp.clip((mag - thresh) / (mag + 1e-9), gain_min, 1.0)
    y = istft(real * gain, imag * gain, n_fft=n_fft, hop=n_fft // 4, length=x.shape[-1])
    return np.asarray(y, dtype=np.float32)


def dereverb(audio: np.ndarray, sr: int, strength: float = 0.5) -> np.ndarray:
    """Dereverb transform (role of the dereverb RoFormers in the chain):
    spectral-envelope late-tail suppression via per-bin exponential floor
    tracking."""
    from audiolab_tpu.kernels.stft import istft, stft

    n_fft = 2048
    x = jnp.asarray(audio)
    real, imag = stft(x, n_fft=n_fft, hop=n_fft // 4)
    mag = jnp.sqrt(real**2 + imag**2 + 1e-12)

    # estimate reverb tail as a decayed running max of previous frames
    import jax

    decay = 0.85

    def scan_fn(carry, m):
        tail = jnp.maximum(carry * decay, m)
        return tail, carry * decay

    _, tail = jax.lax.scan(scan_fn, jnp.zeros_like(mag[..., 0, :]), jnp.moveaxis(mag, -2, 0))
    tail = jnp.moveaxis(tail, 0, -2)
    gain = jnp.clip(1.0 - strength * tail / (mag + 1e-9), 0.1, 1.0)
    y = istft(real * gain, imag * gain, n_fft=n_fft, hop=n_fft // 4, length=x.shape[-1])
    return np.asarray(y, dtype=np.float32)


def should_apply_transform(stem_name: str, setting: str) -> bool:
    """Policy dropdown semantics (stem_separator.py:680-699): Nothing /
    Main Vocals / All Vocals / All, keyed on the stem's name."""
    if setting == "All":
        return True
    low = stem_name.lower()
    if setting == "All Vocals":
        return "vocals" in low
    if setting == "Main Vocals":
        return "vocals" in low and "bg_vocals" not in low
    return False


def apply_policy_transforms(
    stems: dict[str, np.ndarray],
    sr: int,
    policies: dict[str, str],
    transforms: dict[str, Callable] | None = None,
) -> dict[str, np.ndarray]:
    """The reference's per-stem transform chain with its policy dropdowns
    (_apply_transform_chain, stem_separator.py:777-806; order reverb ->
    echo -> crowd -> noise like its transformations list :795-800).

    ``transforms`` maps {"reverb","echo","crowd","noise"} to audio->audio
    callables — inject converted checkpoint models (vr_transform /
    roformer dereverb members) when weights are loaded; the defaults are
    the DSP fallbacks below."""
    fallbacks: dict[str, Callable] = {
        "reverb": lambda x, s: dereverb(x, s, strength=0.5),
        "echo": lambda x, s: dereverb(x, s, strength=0.3),
        "crowd": lambda x, s: spectral_gate_denoise(x, s, reduction_db=8.0),
        "noise": lambda x, s: spectral_gate_denoise(x, s, reduction_db=12.0),
    }
    transforms = {**fallbacks, **(transforms or {})}
    out = {}
    for stem, audio in stems.items():
        x = audio
        for kind in ("reverb", "echo", "crowd", "noise"):
            if should_apply_transform(stem, policies.get(kind, "Nothing")):
                x = transforms[kind](x, sr)
        out[stem] = np.asarray(x, np.float32)
    return out


def hpss_split(audio: np.ndarray, sr: int,
               n_fft: int = 2048, kernel: int = 17) -> dict[str, np.ndarray]:
    """Median-filter harmonic/percussive split — the checkpoint-free
    fallback for the drum-separation path (the reference uses the
    MDX23C-DrumSep checkpoint, stem_separator.py:534-541; wire
    ``mdx23c_member`` when its weights are available)."""
    from audiolab_tpu.kernels.stft import istft, stft

    x = jnp.asarray(audio)
    real, imag = stft(x, n_fft=n_fft, hop=n_fft // 4)
    mag = jnp.sqrt(real**2 + imag**2 + 1e-12)

    def med(v, axis):
        k = kernel
        pad = [(0, 0)] * v.ndim
        pad[axis] = (k // 2, k // 2)
        p = jnp.pad(v, pad, mode="edge")
        sl = [jnp.take(p, jnp.arange(v.shape[axis]) + i, axis=axis)
              for i in range(k)]
        return jnp.median(jnp.stack(sl), axis=0)

    harm = med(mag, axis=-2)   # smooth over time -> harmonic
    perc = med(mag, axis=-1)   # smooth over freq -> percussive
    mask_p = perc**2 / (harm**2 + perc**2 + 1e-12)
    drums = istft(real * mask_p, imag * mask_p, n_fft=n_fft,
                  hop=n_fft // 4, length=x.shape[-1])
    drums = np.asarray(drums, np.float32)
    return {"drums": drums, "other": np.asarray(audio) - drums}


STEM_TRANSFORM_POLICY = {
    # which transforms apply to which stems (stem_separator.py:680-735
    # _should_apply_transform policy table)
    "vocals": ["dereverb", "denoise"],
    "instrumental": [],
    "drums": ["denoise"],
    "bass": [],
}


def apply_transform_chain(
    stems: dict[str, np.ndarray],
    sr: int,
    enabled: list[str] | None = None,
) -> dict[str, np.ndarray]:
    """Per-stem transform chain (stem_separator.py:777)."""
    enabled = enabled if enabled is not None else ["dereverb", "denoise"]
    out = {}
    for stem, audio in stems.items():
        x = audio
        for t in STEM_TRANSFORM_POLICY.get(stem, []):
            if t not in enabled:
                continue
            if t == "dereverb":
                x = dereverb(x, sr)
            elif t == "denoise":
                x = spectral_gate_denoise(x, sr)
        out[stem] = x
    return out
