"""Kernel/model micro-benchmarks -> MICROBENCH.json (reproducible
artifacts for the per-kernel claims in COVERAGE.md).

Measures on the default device (the real TPU chip under the driver; CPU
elsewhere) and prints ONE JSON line, also written to MICROBENCH.json:

  - Pallas flash attention vs XLA reference attention at the BS-RoFormer
    time-axis shape (b*bands=496, heads=8, t=690, hd=64), bf16 — with
    analytic FLOPs and achieved MFU for both
  - BS-RoFormer SDR-12.96-scale member (dim 512, depth 12) 8 s chunk
    batch-8 throughput -> member RTF, PLUS a per-stage breakdown
    (stft, band_split, time/freq transformer stacks, mask estimator,
    istft) each with FLOPs, achieved TFLOP/s and %-of-peak so the top
    cost center is visible (VERDICT r3 weak #4: no MFU accounting)
  - Zonos AR decode frames/s at the published backbone scale, batch 1
    AND CFG double-batch (the upstream default inference mode)
  - generation-side anchors (BASELINE.json config 5): Stable Audio DiT
    step time -> 10 s-audio RTF, ACE-Step DiT step time

Peak used for MFU: TPU v5e (v5 lite) 197 TFLOP/s bf16.  On non-TPU
devices MFU fields are still emitted but meaningless (peak mismatch) —
the driver runs this on the real chip.
"""

from __future__ import annotations

import json
import sys
import time

import os

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197e12  # TFLOP/s, TPU v5 lite MXU peak


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(x) -> float:
    """Scalar D2H readback — block_until_ready can return early through
    the tunneled runtime."""
    return float(jnp.sum(x) if x.ndim == 0 else jnp.sum(x.ravel()[:16]))


def timeit(fn, *args, reps: int = 3, iters: int = 8,
           data_arg: int = -1) -> float:
    """Per-op time with the tunnel dispatch cost amortized away.

    A single dispatch through the tunneled TPU runtime costs ~25-30 ms
    (measured: an 8192^3 matmul 'took' 32.5 ms dispatched singly but
    7.7 ms inside an in-graph loop) — timing one op per dispatch inflates
    every sub-30ms kernel beyond recognition.  So the op runs ``iters``
    times inside ONE jitted scan, chained through a zero-valued
    perturbation of the ``data_arg``-th argument so XLA can neither hoist
    the loop-invariant computation nor CSE the iterations.  The chain adds
    one elementwise add of the data tensor per iteration (noted, small)."""
    args = list(args)

    @jax.jit
    def g(*a):
        def step(carry, _):
            aa = list(a)
            x = aa[data_arg]
            aa[data_arg] = x + carry.astype(x.dtype)
            out = fn(*aa)
            leaf = out if not isinstance(out, (dict, tuple, list)) else \
                jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf.astype(jnp.float32).ravel()[:8]) * 0.0, None
        s, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
        return s

    float(g(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(g(*args))
    del s
    return (time.perf_counter() - t0) / reps / iters


def mfu(flops: float, seconds: float) -> float:
    return flops / seconds / V5E_PEAK_BF16


# --------------------------------------------------------------- attention

def attn_flops(b: int, h: int, t: int, d: int) -> float:
    """QK^T + AV matmul FLOPs only (the projections live outside the
    kernel in this architecture)."""
    return 2.0 * 2.0 * b * h * t * t * d


def bench_attention(dev) -> dict:
    from audiolab_tpu.kernels.attention import (
        attention_reference,
        flash_attention,
    )

    rng = np.random.default_rng(0)
    shape = (496, 8, 690, 64)
    q, k, v = (jax.device_put(
        jnp.asarray(rng.standard_normal(shape), jnp.bfloat16), dev)
        for _ in range(3))
    t_flash = timeit(lambda a, b, c: flash_attention(a, b, c,
                                                     block_q=768,
                                                     block_k=768,
                                                     block_h=2), q, k, v)
    t_xla = timeit(attention_reference, q, k, v)
    fl = attn_flops(*shape)
    log(f"[micro] flash {t_flash * 1e3:.1f} ms ({mfu(fl, t_flash):.1%} MFU) "
        f"vs xla {t_xla * 1e3:.1f} ms ({mfu(fl, t_xla):.1%}) @ {shape}")
    return {"flash_ms": round(t_flash * 1e3, 2),
            "xla_attention_ms": round(t_xla * 1e3, 2),
            "flash_speedup_vs_xla": round(t_xla / t_flash, 3),
            "attn_shape": list(shape),
            "attn_matmul_tflop": round(fl / 1e12, 3),
            "flash_mfu": round(mfu(fl, t_flash), 4),
            "xla_attention_mfu": round(mfu(fl, t_xla), 4)}


# --------------------------------------------------- separation member MFU

def member_stage_flops(cfg, batch: int, t: int):
    """Analytic matmul FLOPs per stage for one batch of chunks.
    Elementwise/norm/rope work is excluded (it's bandwidth, not MXU)."""
    from audiolab_tpu.models.separation.roformer import band_bin_table

    D, H, dh = cfg.dim, cfg.heads, cfg.dim_head
    inner = H * dh
    nb = cfg.n_bands
    ch2 = 2 * cfg.channels
    bands = band_bin_table(cfg)
    maxw = max(len(b) for b in bands) * ch2
    hidden = D * 4

    def xformer(n_seq, L):  # one axial transformer over seq length L
        qkv = L * D * 3 * inner * 2
        attn = 2 * 2 * L * L * inner
        out = L * inner * D * 2
        gates = L * D * H * 2
        ff = 2 * L * D * cfg.ff_mult * D * 2
        return n_seq * (qkv + attn + out + gates + ff)

    time_fl = cfg.depth * cfg.time_depth * xformer(batch * nb, t)
    freq_fl = cfg.depth * cfg.freq_depth * xformer(batch * t, nb)
    split_fl = batch * t * nb * maxw * D * 2
    # mask estimator: D->4D tanh MLP chain + GLU out (2*maxo wide)
    mask_fl = batch * t * nb * (
        D * hidden * 2
        + (cfg.mask_est_depth - 1) * hidden * hidden * 2
        + hidden * 2 * maxw * 2) * len(cfg.stems)
    return {"band_split": split_fl, "time_stack": time_fl,
            "freq_stack": freq_fl, "mask_est": mask_fl}


def bench_sep_member(dev) -> dict:
    from audiolab_tpu.kernels.stft import istft, stft
    from audiolab_tpu.models.separation.roformer import (
        BandSplit,
        BSRoformer,
        MaskEstimator,
        RoformerConfig,
        Transformer,
    )
    from audiolab_tpu.utils.fast_init import fast_init

    cfg = RoformerConfig(dim=512, depth=12, heads=8,
                         stems=("vocals",), residual_stem="other")
    model = BSRoformer(cfg)
    chunk_s, batch = 8.0, 8
    chunk = int(chunk_s * 44100)
    params = fast_init(
        lambda: model.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, chunk)))
    )["params"]
    params = jax.device_put(params, dev)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 2, chunk)) * 0.1,
                    jnp.float32), dev)
    t_full = timeit(lambda p, a: model.apply({"params": p}, a)["vocals"],
                    params, x)
    rtf = batch * chunk_s / t_full

    # ---- per-stage timing on the same parameter tree
    t_frames = chunk // cfg.hop + 1
    n_bins = cfg.n_fft // 2 + 1
    fl = member_stage_flops(cfg, batch, t_frames)

    spec = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, t_frames, n_bins, 4)) * 0.1,
        jnp.float32), dev)
    xt = jax.device_put(jnp.asarray(
        rng.standard_normal((batch * cfg.n_bands, t_frames, cfg.dim)),
        jnp.bfloat16), dev)
    xf = jax.device_put(jnp.asarray(
        rng.standard_normal((batch * t_frames, cfg.n_bands, cfg.dim)),
        jnp.bfloat16), dev)
    xb = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, t_frames, cfg.n_bands, cfg.dim)),
        jnp.bfloat16), dev)

    split = BandSplit(cfg)
    tr = Transformer(cfg.dim, cfg.heads, cfg.dim_head, cfg.ff_mult,
                     1, cfg.dtype)
    mask = MaskEstimator(cfg)

    t_stft = timeit(lambda a: jnp.stack(
        stft(a, n_fft=cfg.n_fft, hop=cfg.hop), -1), x)
    t_split = timeit(lambda p, s: split.apply({"params": p}, s),
                     params["band_split"], spec)
    layer0 = jax.tree_util.tree_map(lambda a: a[0], params["depth"])
    t_time = cfg.depth * timeit(
        lambda p, a: tr.apply({"params": p}, a), layer0["time"], xt)
    t_freq = cfg.depth * timeit(
        lambda p, a: tr.apply({"params": p}, a), layer0["freq"], xf)
    t_mask = timeit(lambda p, a: mask.apply({"params": p}, a),
                    params["mask_vocals"], xb)
    re = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, 2, t_frames, n_bins)) * 0.1,
        jnp.float32), dev)
    t_istft = timeit(lambda a, b: istft(a, b, n_fft=cfg.n_fft,
                                        hop=cfg.hop, length=chunk), re, re)

    stages = {
        "stft": (t_stft, 0.0),
        "band_split": (t_split, fl["band_split"]),
        "time_stack": (t_time, fl["time_stack"]),
        "freq_stack": (t_freq, fl["freq_stack"]),
        "mask_est": (t_mask, fl["mask_est"]),
        "istft": (t_istft, 0.0),
    }
    breakdown = {}
    total_fl = 0.0
    for name, (sec, flops) in stages.items():
        total_fl += flops
        breakdown[name] = {
            "ms": round(sec * 1e3, 1),
            "tflop": round(flops / 1e12, 3),
            "mfu": round(mfu(flops, sec), 4) if flops else None,
        }
        log(f"[micro] member/{name}: {sec * 1e3:7.1f} ms  "
            f"{flops / 1e12:6.2f} TF  "
            + (f"{mfu(flops, sec):6.1%} MFU" if flops else "  (bandwidth)"))
    covered = sum(s for s, _ in stages.values())
    log(f"[micro] member full: {t_full * 1e3:.0f} ms ({rtf:.1f}x RT, "
        f"{mfu(total_fl, t_full):.1%} MFU); stage sum {covered * 1e3:.0f} ms")
    return {"sep_member_dim512_batch8_ms": round(t_full * 1e3, 1),
            "sep_member_dim512_rtf": round(rtf, 1),
            "sep_member_matmul_tflop": round(total_fl / 1e12, 2),
            "sep_member_mfu": round(mfu(total_fl, t_full), 4),
            "sep_member_stages": breakdown}


# ----------------------------------------------------------- zonos decode

def bench_zonos_decode(dev) -> dict:
    """AR decode at the published backbone scale (dim 1024, 12 layers),
    CFG double-batch (generate's default cfg_scale=2.0), for BOTH mixers:
    mamba1 and the upstream-default mamba2 hybrid (VERDICT r3 weak #7)."""
    from audiolab_tpu.models.zonos import ZonosConfig, ZonosModel, generate
    from audiolab_tpu.utils.fast_init import fast_init

    frames = 200
    out = {"zonos_decode_frames": frames, "zonos_decode_cfg_scale": 2.0}
    for label, mixer in (("", "mamba1"), ("_mamba2", "mamba2")):
        cfg = ZonosConfig(mixer=mixer)
        model = ZonosModel(cfg)
        text = jnp.zeros((1, 8), jnp.int32)
        spk = jnp.zeros((1, cfg.spk_dim))
        bos = jnp.full((1, cfg.n_codebooks, 1), cfg.masked_id, jnp.int32)
        params = fast_init(
            lambda: model.init(jax.random.PRNGKey(0), text, spk,
                               jnp.zeros((1, 8)), jnp.zeros((1, 1)),
                               jnp.zeros((1, 1)), bos,
                               method=ZonosModel.prefill)
        )["params"]
        params = jax.device_put(params, dev)

        def run():
            return generate(model, params,
                            jax.device_put(text, dev),
                            jax.device_put(spk, dev),
                            max_frames=frames,
                            emotion=jax.device_put(jnp.zeros((1, 8)), dev),
                            rate=jax.device_put(jnp.full((1, 1), 15.0), dev),
                            pitch=jax.device_put(jnp.full((1, 1), 20.0), dev),
                            rng=jax.random.PRNGKey(0))

        sync(run())  # compile
        t0 = time.perf_counter()
        for _ in range(2):
            sync(run())
        dt = (time.perf_counter() - t0) / 2
        fps = frames / dt
        log(f"[micro] zonos decode ({mixer}, cfg x2): {frames} frames in "
            f"{dt:.2f} s -> {fps:.0f} frames/s (CUDA anchor 86/s)")
        out[f"zonos_decode{label}_frames_per_s"] = round(fps, 1)
        del params
    return out


# --------------------------------------- generation-side anchors (cfg 5)

def bench_generation(dev) -> dict:
    """Stable Audio DiT step -> 10 s RTF; ACE-Step DiT step time
    (BASELINE.json config 5 coverage; VERDICT r3 weak #8)."""
    from audiolab_tpu.utils.fast_init import fast_init

    out = {}
    # Stable Audio open 1.0: DiT dim 1536, depth 24, latent rate 21.5 Hz
    try:
        from audiolab_tpu.models.stable_audio_dit import (
            SAODiTConfig,
            StableAudioDiT,
        )

        cfg = SAODiTConfig()
        model = StableAudioDiT(cfg)
        t_lat = 215  # 10 s at 21.5 latent frames/s
        x = jnp.zeros((1, t_lat, cfg.io_channels))
        tt = jnp.full((1,), 0.5)
        cross = jnp.zeros((1, 130, cfg.cond_token_dim))
        glob = jnp.zeros((1, cfg.global_cond_dim))
        params = fast_init(
            lambda: model.init(jax.random.PRNGKey(0), x, tt, cross, glob)
        )["params"]
        params = jax.device_put(params, dev)
        x, tt, cross, glob = (jax.device_put(a, dev)
                              for a in (x, tt, cross, glob))
        t_step = timeit(lambda p, a, b, c, d: model.apply(
            {"params": p}, a, b, c, d), params, x, tt, cross, glob)
        # product default: 100 steps, CFG double-pass -> 200 evals / 10 s
        steps = 100
        gen_s = t_step * 2 * steps
        out["sao_dit_step_ms"] = round(t_step * 1e3, 2)
        out["sao_10s_rtf_100step_cfg"] = round(10.0 / gen_s, 2)
        log(f"[micro] SAO DiT step {t_step * 1e3:.1f} ms -> 10 s audio at "
            f"{10.0 / gen_s:.1f}x RT (100 steps, CFG)")
    except Exception as e:  # pragma: no cover - report, don't die
        log(f"[micro] SAO bench skipped: {e!r}")

    # ACE-Step DiT (dim 2560 / 24 layers published scale)
    try:
        from audiolab_tpu.models.acestep_dit import (
            ACEStepDiT,
            ACEStepDiTConfig,
        )

        cfg = ACEStepDiTConfig()
        model = ACEStepDiT(cfg)
        t_lat = 172  # ~16 s at ~10.8 latent frames/s (44.1k/4096)
        x = jnp.zeros((1, cfg.in_channels, cfg.patch_height, t_lat))
        mask = jnp.ones((1, t_lat))
        text = jnp.zeros((1, 32, cfg.text_embedding_dim))
        text_mask = jnp.ones((1, 32))
        spk = jnp.zeros((1, cfg.speaker_embedding_dim))
        tt = jnp.full((1,), 0.5)
        lyr = jnp.zeros((1, 64, cfg.lyric_hidden_size))
        lyr_mask = jnp.ones((1, 64))
        args0 = (x, mask, text, text_mask, spk, tt, lyr, lyr_mask)
        params = fast_init(
            lambda: model.init(jax.random.PRNGKey(0), *args0)
        )["params"]
        params = jax.device_put(params, dev)
        args = tuple(jax.device_put(a, dev) for a in args0)
        t_step = timeit(lambda p, *a: model.apply({"params": p}, *a),
                        params, *args)
        out["acestep_dit_step_ms"] = round(t_step * 1e3, 2)
        log(f"[micro] ACE-Step DiT step {t_step * 1e3:.1f} ms")
    except Exception as e:  # pragma: no cover
        log(f"[micro] ACE-Step bench skipped: {e!r}")
    return out


# --------------------------------------- BASELINE configs 1-2 (export, DSP)

def bench_export_dsp(dev) -> dict:
    """BASELINE.json configs 1-2 (VERDICT r4 missing #5).

    config 1 — 'Mono WAV resample + STFT/mel spectrogram export'
    (reference handlers/spectrogram): 60 s mono 44.1 kHz -> 16 kHz
    polyphase + 128-mel log spectrogram, one jitted graph.

    config 2 — 'DSP chain: autotune + reverb + stereo widen on a vocal
    stem (RMVPE f0)' (reference handlers/autotune.py:165-223,
    handlers/reverb.py:179-209, handlers/stereo.py): 30 s stereo vocal
    -> M/S split -> RMVPE-driven autotune on mid -> IR convolution
    reverb -> widened M/S recombine.  Wall-clock including the host-side
    key detection / segment grouping the reference also does."""
    from audiolab_tpu.dsp.autotune import auto_tune_track
    from audiolab_tpu.dsp.reverb import apply_reverb, generate_ir
    from audiolab_tpu.dsp.stereo import ms_to_stereo, stereo_to_ms
    from audiolab_tpu.kernels.mel import log_mel, mel_spectrogram
    from audiolab_tpu.kernels.resample import resample
    from audiolab_tpu.models.rmvpe import RMVPE
    from audiolab_tpu.utils.fast_init import fast_init

    out = {}
    rng = np.random.default_rng(0)

    # ---- config 1
    dur1, sr = 60.0, 44100
    x = jax.device_put(jnp.asarray(
        rng.standard_normal(int(dur1 * sr)) * 0.1, jnp.float32), dev)

    def export(a):
        a16 = resample(a, sr, 16000)
        return log_mel(mel_spectrogram(a16, sr=16000, n_fft=1024, hop=160,
                                       n_mels=128))

    t1 = timeit(export, x, iters=4)
    out["config1_mel_export_rtf_60s_mono"] = round(dur1 / t1, 1)
    log(f"[micro] config1 resample+mel export: {t1 * 1e3:.1f} ms "
        f"({dur1 / t1:.0f}x RT)")

    # ---- config 2
    dur2 = 30.0
    stem = (rng.standard_normal((2, int(dur2 * sr))) * 0.1).astype(np.float32)
    rm = RMVPE()
    rm_vars = fast_init(lambda: rm.model.init(jax.random.PRNGKey(7),
                                              jnp.zeros((1, 320, 128))))
    rmvpe = RMVPE(jax.device_put(rm_vars["params"], dev),
                  jax.device_put(rm_vars.get("batch_stats", {}), dev))
    f0_fn = lambda a16: np.asarray(rmvpe.infer(jnp.asarray(a16)))[0]  # noqa: E731
    ir_params = {
        "sample_rate": sr, "pre_delay": 0.02,
        "impulse_response": generate_ir(sr, 0.02, 1.2, 0.3, 0.7, 4000.0,
                                        length=1.0).tolist(),
    }

    def chain():
        mid, side = stereo_to_ms(jnp.asarray(stem))
        tuned, _key, _scale = auto_tune_track(np.asarray(mid), sr,
                                              strength=1.0, f0_fn=f0_fn)
        wet = apply_reverb(tuned, ir_params)
        return np.asarray(ms_to_stereo(jnp.asarray(wet), 1.4 * side))

    chain()  # compile
    t0 = time.perf_counter()
    for _ in range(2):
        y = chain()
    t2 = (time.perf_counter() - t0) / 2
    assert np.isfinite(y).all()
    out["config2_dsp_chain_rtf_30s_stereo"] = round(dur2 / t2, 1)
    out["config2_chain"] = "autotune(rmvpe f0) + IR reverb + stereo widen"
    log(f"[micro] config2 DSP chain: {t2:.2f} s ({dur2 / t2:.1f}x RT)")
    return out


def main():
    dev = jax.devices()[0]
    out = {"device": str(dev)}
    out.update(bench_attention(dev))
    out.update(bench_sep_member(dev))
    out.update(bench_zonos_decode(dev))
    out.update(bench_generation(dev))
    out.update(bench_export_dsp(dev))
    line = json.dumps(out)
    with open("MICROBENCH.json", "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
