"""Kernel/model micro-benchmarks -> MICROBENCH.json (reproducible
artifacts for the per-kernel claims in COVERAGE.md; VERDICT r2 weak #7).

Folds the former scratch scripts (_attn_micro / _sep_micro*) into one
runnable file.  Measures on the default device (the real TPU chip under
the driver; CPU elsewhere) and prints ONE JSON line, also written to
MICROBENCH.json:

  - Pallas flash attention vs XLA reference attention at the BS-RoFormer
    time-axis shape (b*bands=496, heads=8, t=690, hd=64), bf16
  - BS-RoFormer SDR-12.96-scale member (dim 512, depth 12) 8 s chunk
    batch-8 throughput -> member RTF
  - Zonos AR decode frames/s at the published backbone scale (dim 1024,
    12 layers), batch 1 (reference CUDA anchor: 86 frames/s,
    modules/zonos/model.py:194)
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/audiolab_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(x) -> float:
    """Scalar D2H readback — block_until_ready can return early through
    the tunneled runtime."""
    return float(jnp.sum(x) if x.ndim == 0 else jnp.sum(x.ravel()[:16]))


def timeit(fn, *args, reps: int = 3) -> float:
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(f(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(f(*args))
    del s
    return (time.perf_counter() - t0) / reps


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
    log(f"[micro] flash {t_flash * 1e3:.1f} ms vs xla {t_xla * 1e3:.1f} ms "
        f"({t_xla / t_flash:.2f}x) @ {shape}")
    return {"flash_ms": round(t_flash * 1e3, 2),
            "xla_attention_ms": round(t_xla * 1e3, 2),
            "flash_speedup_vs_xla": round(t_xla / t_flash, 3),
            "attn_shape": list(shape)}


def bench_sep_member(dev) -> dict:
    from audiolab_tpu.models.separation.roformer import (
        BSRoformer,
        RoformerConfig,
    )

    cpu = jax.devices("cpu")[0]
    cfg = RoformerConfig(dim=512, depth=12, heads=8)
    model = BSRoformer(cfg)
    chunk_s, batch = 8.0, 8
    chunk = int(chunk_s * 44100)
    with jax.default_device(cpu):
        params = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 2, chunk)))["params"]
    params = jax.device_put(params, dev)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 2, chunk)) * 0.1,
                    jnp.float32), dev)
    t = timeit(lambda p, a: model.apply({"params": p}, a)["vocals"],
               params, x)
    rtf = batch * chunk_s / t
    log(f"[micro] roformer dim512 member: {t * 1e3:.0f} ms / "
        f"{batch}x{chunk_s}s chunks -> {rtf:.1f}x RT")
    return {"sep_member_dim512_batch8_ms": round(t * 1e3, 1),
            "sep_member_dim512_rtf": round(rtf, 1)}


def bench_zonos_decode(dev) -> dict:
    from audiolab_tpu.models.zonos import ZonosConfig, ZonosModel, generate

    cpu = jax.devices("cpu")[0]
    cfg = ZonosConfig()  # published backbone scale: dim 1024, 12 layers
    model = ZonosModel(cfg)
    frames = 200
    with jax.default_device(cpu):
        text = jnp.zeros((1, 8), jnp.int32)
        spk = jnp.zeros((1, cfg.spk_dim))
        bos = jnp.full((1, cfg.n_codebooks, 1), cfg.masked_id, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), text, spk,
                            jnp.zeros((1, 8)), jnp.zeros((1, 1)),
                            jnp.zeros((1, 1)), bos,
                            method=ZonosModel.prefill)["params"]
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
    log(f"[micro] zonos decode: {frames} frames in {dt:.2f} s "
        f"-> {fps:.0f} frames/s (reference CUDA anchor 86/s)")
    return {"zonos_decode_frames_per_s": round(fps, 1),
            "zonos_decode_frames": frames}


def main():
    dev = jax.devices()[0]
    out = {"device": str(dev)}
    out.update(bench_attention(dev))
    out.update(bench_sep_member(dev))
    out.update(bench_zonos_decode(dev))
    line = json.dumps(out)
    with open("MICROBENCH.json", "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
