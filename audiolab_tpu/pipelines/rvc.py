"""RVC voice-conversion pipeline — the product's deepest hot path
(reference call stack: SURVEY §3.3, modules/rvc/infer/modules/vc/pipeline.py).

Reference behavior reproduced:
  - 16 kHz input, Butterworth high-pass 48 Hz (pipeline.py:252)
  - HuBERT features (layer 9+proj v1 / layer 12 v2)      (:186-191)
  - optional retrieval blend k=8, 1/d² weights            (:194-203)
  - 2x nearest feature upsample to 100 Hz frames          (:206-223)
  - f0 extraction + semitone transpose + 1-255 coarse     (pitch_extraction.py)
  - consonant 'protect' blend where f0 is unvoiced        (:206-223)
  - SynthesizerTrn.infer -> waveform at model sr          (:225-229)

TPU redesign: the reference crosses CPU⇄GPU per ~60 s segment; here the
whole chain — features, retrieval, f0, synth — is ONE jitted graph over a
batch of fixed-size chunks (core/chunking), so long tracks run as a single
device program with a crossfade stitch at the end.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps

from audiolab_tpu.core.chunking import extract_chunks, plan_chunks, stitch_chunks
from audiolab_tpu.dsp.f0 import coarse_f0, f0_autocorr, merge_f0
from audiolab_tpu.kernels.resample import resample
from audiolab_tpu.models.hubert import HubertConfig, HubertFeatureExtractor
from audiolab_tpu.models.rvc.synthesizer import SynthesizerConfig, SynthesizerTrn
from audiolab_tpu.retrieval.index import knn_blend


@dataclass
class RVCPipelineConfig:
    version: str = "v2"
    sr: int = 48000           # model output rate
    chunk_seconds: float = 8.0  # canonical compile-cached chunk length (16 kHz)
    overlap_seconds: float = 0.4
    f0_method: str = "rmvpe"  # rmvpe | yin | crepe | hybrid | [list]
    f0_min: float = 50.0
    f0_max: float = 1100.0
    merge_type: str = "median"  # hybrid merge strategy (median | mean)
    filter_radius: int = 3      # >2 applies a 3-tap median to harvest f0
    crepe_hop: int = 160        # crepe-method hop (crepe_hop_length)
    f0_autotune: bool = False   # snap f0 to 12-TET before synthesis
    device_batch: int = 8     # chunks per device step: ONE compiled shape,
                              # bounded HBM (34 unpadded 8 s chunks OOM v5e)
    matmul_precision: str = "bfloat16"  # model matmuls on the MXU (~1.5x);
                              # the STFT/mel kernels pin HIGHEST regardless,
                              # so the spectral front-end stays full-precision


_HP_TAPS = None


def _highpass_device(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase 48 Hz FIR high-pass on device (linear-phase equivalent of
    the reference's butter+filtfilt at pipeline.py:252)."""
    global _HP_TAPS
    if _HP_TAPS is None:
        taps = sps.firwin(257, 48, fs=16000, pass_zero=False)
        _HP_TAPS = jnp.asarray(taps, jnp.float32)
    pad = (len(_HP_TAPS) - 1) // 2

    def one(ch: jnp.ndarray) -> jnp.ndarray:
        xp = jnp.pad(ch, (pad, pad), mode="reflect")
        return jnp.convolve(xp, _HP_TAPS, mode="valid")

    if x.ndim == 1:
        return one(x)
    # apply per-channel over any leading axes (the reference filters
    # unconditionally, pipeline.py:252 — never pass audio through unfiltered)
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    return jax.vmap(one)(flat).reshape(*lead, -1)


class VoiceConverter:
    """Holds the three parameter trees (hubert, synthesizer, optional rmvpe)
    and exposes ``convert`` — the VC.vc_single equivalent."""

    def __init__(
        self,
        synth_cfg: SynthesizerConfig,
        synth_params,
        hubert_params,
        rmvpe=None,
        crepe=None,
        index_features: np.ndarray | None = None,
        cfg: RVCPipelineConfig | None = None,
        hubert_cfg: HubertConfig | None = None,
    ):
        self.cfg = cfg or RVCPipelineConfig(sr=synth_cfg.sr)
        self.synth_cfg = synth_cfg
        self.synth = SynthesizerTrn(synth_cfg)
        self.hubert = HubertFeatureExtractor(
            version=self.cfg.version, cfg=hubert_cfg or HubertConfig()
        )
        self.synth_params = synth_params
        self.hubert_params = hubert_params
        self.rmvpe = rmvpe
        self.crepe = crepe  # models/crepe.CrepePredictor (weights converted)
        self.index_features = (
            jnp.asarray(index_features) if index_features is not None else None
        )

    # ---------------- single-chunk jitted core ----------------

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("use_index", "f0_in_graph"))
    def _convert_chunk(
        self,
        hubert_params,
        synth_params,
        wav16: jnp.ndarray,     # (b, n) 16 kHz chunk
        f0: jnp.ndarray,        # (b, t100) Hz — or transpose scalar when
                                # f0_in_graph (f0 computed inside the graph)
        sid: jnp.ndarray,       # (b,)
        index_data: jnp.ndarray | None,
        index_rate: float,
        protect: float,
        rng: jax.Array,
        use_index: bool = False,
        f0_in_graph: bool = False,
    ) -> jnp.ndarray:
        if f0_in_graph:
            # fuse f0 extraction into the conversion graph: ONE dispatch per
            # group (a separate f0 call costs a tunnel round trip each)
            f0 = jax.vmap(
                lambda w: f0_autocorr(
                    w, sr=16000, hop=160,
                    fmin=self.cfg.f0_min, fmax=self.cfg.f0_max,
                )[0]
            )(wav16) * f0  # f0 argument carries the transpose factor
        feats = self.hubert.apply({"params": hubert_params}, wav16)  # (b,t50,d)
        feats0 = feats
        if use_index and index_data is not None:
            b, t, d = feats.shape
            blended = knn_blend(feats.reshape(b * t, d), index_data, index_rate)
            feats = blended.reshape(b, t, d)

        # 2x nearest upsample to 100 Hz frames (reference F.interpolate)
        feats = jnp.repeat(feats, 2, axis=1)
        feats0 = jnp.repeat(feats0, 2, axis=1)

        t100 = min(feats.shape[1], f0.shape[1])
        feats = feats[:, :t100]
        feats0 = feats0[:, :t100]
        f0 = f0[:, :t100]

        # consonant protection (pipeline.py:206-223): at unvoiced frames fall
        # back toward the un-indexed features
        pitchff = jnp.where(f0[..., None] > 0, 1.0, protect)
        feats = feats * pitchff + feats0 * (1.0 - pitchff)

        pitch = coarse_f0(f0, self.cfg.f0_min, self.cfg.f0_max)
        lengths = jnp.full((wav16.shape[0],), t100, jnp.int32)
        audio = self.synth.apply(
            {"params": synth_params},
            feats,
            lengths,
            pitch,
            f0,
            sid,
            rng,
            method=SynthesizerTrn.infer,
        )
        return audio  # (b, t100 * upp)

    # ---------------- host orchestration ----------------

    def _f0_on_host(self) -> bool:
        """True when f0 comes from a separate model/merge call (not fused
        into the conversion graph)."""
        m = self.cfg.f0_method
        if isinstance(m, (list, tuple)) or m == "hybrid":
            return True
        if m in ("rmvpe", "rmvpe+", "rmvpe_onnx"):
            return self.rmvpe is not None
        if m in ("crepe", "crepe-tiny", "mangio-crepe", "mangio-crepe-tiny"):
            return self.crepe is not None
        if m in ("pm", "dio", "harvest"):
            return True          # host numpy estimators (dsp/f0.py)
        return False

    def _f0_one_method(self, method: str, wav16) -> jnp.ndarray:
        # the reference's 11-method dict (pitch_extraction.py:44-55):
        # rmvpe_onnx is the same net through ORT (the converter fills it
        # from either serialization); -tiny capacity comes from the loaded
        # crepe checkpoint
        if method in ("rmvpe", "rmvpe_onnx") and self.rmvpe is not None:
            return self.rmvpe.infer(jnp.asarray(wav16))
        if method == "rmvpe+" and self.rmvpe is not None:
            return self.rmvpe.infer_with_pitch(
                jnp.asarray(wav16), f0_min=self.cfg.f0_min,
                f0_max=self.cfg.f0_max)
        if (method in ("mangio-crepe", "mangio-crepe-tiny")
                and self.crepe is not None):
            rows = [self._to_t100(self.crepe.predict_mangio(
                        w, hop=getattr(self.cfg, "crepe_hop", 160), fmin=self.cfg.f0_min,
                        fmax=self.cfg.f0_max), wav16.shape[-1])
                    for w in jnp.asarray(wav16)]
            t = min(r.shape[0] for r in rows)
            return jnp.stack([r[:t] for r in rows])
        if method in ("crepe", "crepe-tiny") and self.crepe is not None:
            rows = [self._to_t100(self.crepe.predict(
                        w, hop=getattr(self.cfg, "crepe_hop", 160), fmin=self.cfg.f0_min,
                        fmax=self.cfg.f0_max)[0], wav16.shape[-1])
                    for w in jnp.asarray(wav16)]
            return jnp.stack(rows)
        if method in ("pm", "dio", "harvest"):
            # host numpy estimators: pm = Praat-AC (Boersma), dio/harvest =
            # WORLD DIO/Harvest + StoneMask (pitch_extraction.py:157-191)
            from audiolab_tpu.dsp.f0 import f0_dio, f0_harvest, f0_pm

            fn = {"pm": f0_pm, "dio": f0_dio, "harvest": f0_harvest}[method]
            rows = [fn(np.asarray(w), sr=16000, hop=160,
                       fmin=self.cfg.f0_min, fmax=self.cfg.f0_max)
                    for w in np.asarray(wav16)]
            f0 = np.stack(rows)
            if (method == "harvest"
                    and getattr(self.cfg, "filter_radius", 3) > 2):
                # pipeline.py: signal.medfilt(f0, 3) for harvest
                import scipy.signal as _sps

                f0 = _sps.medfilt(f0, (1, 3))
            return jnp.asarray(f0, jnp.float32)
        # ONE vmapped device call over all chunks (a per-chunk host loop
        # serialises ~30 dispatches on a 4-min track); the result stays
        # on device — no host round trip before _convert_chunk
        return jax.vmap(
            lambda w: f0_autocorr(
                w, sr=16000, hop=160,
                fmin=self.cfg.f0_min, fmax=self.cfg.f0_max,
            )[0]
        )(jnp.asarray(wav16))

    def _extract_f0(self, wav16, transpose: int) -> jnp.ndarray:
        """(b, n) -> (b, t100) f0 Hz at 100 Hz frame rate."""
        m = self.cfg.f0_method
        if isinstance(m, (list, tuple)) or m == "hybrid":
            # reference hybrid: run several estimators, median/mean-merge
            # the stack (pitch_extraction.py:205-286); its default list is
            # ["harvest", "rmvpe+"] (pitch_extraction.py:320)
            if isinstance(m, (list, tuple)):
                methods = list(m)
            elif self.rmvpe is not None:
                methods = ["harvest", "rmvpe+"]
            else:
                methods = [meth for meth, ok in
                           (("crepe", self.crepe is not None),
                            ("harvest", True), ("yin", True)) if ok][:2]
            rows = [self._f0_one_method(meth, wav16) for meth in methods]
            t = min(r.shape[-1] for r in rows)
            stack = jnp.stack([r[..., :t] for r in rows])
            f0 = merge_f0(stack, getattr(self.cfg, "merge_type", "median"))
        else:
            f0 = self._f0_one_method(m, wav16)
        if getattr(self.cfg, "f0_autotune", False):
            # fork f0_autotune: snap voiced frames to the nearest 12-TET
            # note frequency
            semis = jnp.round(12.0 * jnp.log2(jnp.maximum(f0, 1e-3) / 440.0))
            f0 = jnp.where(f0 > 0, 440.0 * 2.0 ** (semis / 12.0), f0)
        return f0 * (2.0 ** (transpose / 12.0))

    @staticmethod
    def _to_t100(f0, n_samples: int):
        """Resample an f0 curve to the 100 Hz frame grid the synthesizer
        consumes (needed when crepe_hop != 160)."""
        t100 = 1 + n_samples // 160
        if f0.shape[-1] == t100:
            return f0
        src = np.asarray(f0, np.float64)
        pos = np.linspace(0, len(src) - 1, t100)
        return jnp.asarray(np.interp(pos, np.arange(len(src)), src),
                           jnp.float32)

    @staticmethod
    def _mix_rms(x16, y, out_sr: int, rate: float):
        """pipeline.py change_rms: blend the output's volume envelope
        toward the input's; rate=1 keeps the converted envelope."""
        def env(sig, sr):
            frame, hop = sr, sr // 2
            n = sig.shape[-1]
            k = max(1 + (n - 1) // hop, 1)
            pad = (k - 1) * hop + frame - n
            s = jnp.pad(sig, (0, max(pad, 0)))
            idx = jnp.arange(k)[:, None] * hop + jnp.arange(frame)[None]
            return jnp.sqrt(jnp.mean(s[idx] ** 2, axis=-1) + 1e-12)

        def interp_to(r, n):
            pos = jnp.linspace(0, r.shape[0] - 1, n)
            lo = jnp.floor(pos).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, r.shape[0] - 1)
            w = pos - lo
            return r[lo] * (1 - w) + r[hi] * w

        n = y.shape[-1]
        r1 = interp_to(env(jnp.asarray(x16), 16000), n)
        r2 = jnp.maximum(interp_to(env(y, out_sr), n), 1e-6)
        return y * (r1 ** (1 - rate)) * (r2 ** (rate - 1))

    def convert(
        self,
        audio16k: np.ndarray,
        sid: int = 0,
        transpose: int = 0,
        index_rate: float = 0.75,
        protect: float = 0.33,
        rms_mix_rate: float = 1.0,
        seed: int = 0,
        as_numpy: bool = True,
    ) -> np.ndarray:
        """Full conversion of a mono 16 kHz track -> waveform at model sr.

        Accepts numpy OR a device array; device inputs stay on device (the
        48 Hz high-pass becomes a zero-phase FIR conv there — device->host
        readback over tunneled TPUs is orders slower than the filter).
        ``as_numpy=False`` returns the device array so downstream stages
        (export encode, merge) consume it without a host round trip."""
        if isinstance(audio16k, jnp.ndarray):
            x = _highpass_device(audio16k)
        else:
            x = np.asarray(audio16k, dtype=np.float32)
            # high-pass 48 Hz (pipeline.py:252)
            b, a = sps.butter(5, 48, btype="high", fs=16000)
            x = sps.filtfilt(b, a, x).astype(np.float32)

        chunk = int(self.cfg.chunk_seconds * 16000)
        chunk -= chunk % 320  # align to hubert hop so frames tile exactly
        overlap = int(self.cfg.overlap_seconds * 16000)
        overlap -= overlap % 320
        plan = plan_chunks(len(x), chunk, overlap)
        chunks = extract_chunks(jnp.asarray(x), plan)  # (count, chunk)

        rng = jax.random.PRNGKey(seed)
        use_index = self.index_features is not None and index_rate > 0

        # fixed device batch: pad chunk count to a multiple of device_batch so
        # every step (f0 + conversion) reuses ONE compiled executable per
        # shape, independent of track length, with bounded HBM footprint
        db = max(1, min(self.cfg.device_batch, plan.count))
        pad_rows = (-plan.count) % db
        if pad_rows:
            chunks = jnp.concatenate([chunks, jnp.zeros((pad_rows,) + chunks.shape[1:], chunks.dtype)])
        sids = jnp.full((db,), sid, jnp.int32)
        fuse_f0 = not self._f0_on_host()
        transpose_factor = jnp.full((1, 1), 2.0 ** (transpose / 12.0))
        outs = []
        with jax.default_matmul_precision(self.cfg.matmul_precision):
            for g in range(0, chunks.shape[0], db):
                group = chunks[g : g + db]
                f0_g = (transpose_factor if fuse_f0
                        else self._extract_f0(group, transpose))
                outs.append(
                    self._convert_chunk(
                        self.hubert_params,
                        self.synth_params,
                        group,
                        f0_g,
                        sids,
                        self.index_features,
                        index_rate,
                        protect,
                        rng,
                        use_index=use_index,
                        f0_in_graph=fuse_f0,
                    )
                )
        out = jnp.concatenate(outs, axis=0)[: plan.count]  # (count, out_chunk)

        # stitch at the model rate: the chunk grid scales exactly by sr/16000
        # because chunk/hop are 320-aligned and upp*100 == sr
        from audiolab_tpu.core.chunking import ChunkPlan

        scale = self.synth_cfg.sr / 16000.0
        out_chunk = out.shape[-1]
        out_hop = int(round(plan.hop * scale))
        out_plan = ChunkPlan(
            chunk=out_chunk,
            hop=out_hop,
            n=int(round(plan.n * scale)),
            count=plan.count,
            padded=(plan.count - 1) * out_hop + out_chunk,
        )
        y = stitch_chunks(out, out_plan)
        if rms_mix_rate < 1.0:
            y = self._mix_rms(x, y, self.synth_cfg.sr, rms_mix_rate)
        # peak normalize IN-GRAPH: a float() readback here costs a full
        # host round trip per call on tunneled TPUs
        peak = jnp.abs(y).max()
        y = jnp.where(peak > 0.99, y * (0.99 / jnp.maximum(peak, 1e-9)), y)
        if not as_numpy:
            return y
        result = np.asarray(y, dtype=np.float32)
        self._debug_dump(x, result)
        return result

    def _debug_dump(self, x16, out) -> None:
        """Env-gated intermediate-audio dump (reference debug_clone_audio,
        pipeline.py:78-104: SAVE_DEBUG_AUDIO writes each step's audio).
        Set AUDIOLAB_SAVE_DEBUG_AUDIO=<dir> to capture the high-passed
        16 kHz input and the converted output of every call."""
        import os

        dbg = os.environ.get("AUDIOLAB_SAVE_DEBUG_AUDIO")
        if not dbg:
            return
        import time as _time

        from audiolab_tpu.core.audio_io import write_wav

        os.makedirs(dbg, exist_ok=True)
        tag = f"{int(_time.time() * 1000) % 10**9:09d}"
        write_wav(os.path.join(dbg, f"{tag}_input16k_hp.wav"),
                  np.asarray(x16, np.float32), 16000)
        write_wav(os.path.join(dbg, f"{tag}_converted.wav"),
                  np.asarray(out, np.float32), self.synth_cfg.sr)

    def sweep_convert(
        self,
        audio16k: np.ndarray,
        out_dir: str,
        sid: int = 0,
        index_rates=(0.0, 0.5, 0.75),
        protects=(0.2, 0.33, 0.5),
        transposes=(0,),
        name: str = "sweep",
    ) -> list[str]:
        """Parameter-sweep listening harness (reference test_clone,
        pipeline.py:659-795: one output file per parameter combination).
        Returns the written paths; filenames encode the combination."""
        import itertools
        import os

        from audiolab_tpu.core.audio_io import write_wav

        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for ir, pr, tr in itertools.product(index_rates, protects,
                                            transposes):
            y = self.convert(audio16k, sid=sid, transpose=tr,
                             index_rate=ir, protect=pr)
            p = os.path.join(
                out_dir, f"{name}_ir{ir:g}_pr{pr:g}_tr{tr:+d}.wav")
            write_wav(p, y, self.synth_cfg.sr)
            paths.append(p)
        return paths
