"""Numerics + timing for the exp2/MXU-rowsum nk1 flash kernel (r5).

Checks flash_attention against the f32 jnp reference at both RoFormer
member shapes, then times the member configs (incl. freq block_h
variants under the VMEM ceiling)."""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.attention import (apply_rope_tables,
                                            attention_reference,
                                            flash_attention, rope_tables)

PEAK = 197e12


def timeit(fn, *args, iters=8, reps=3):
    @jax.jit
    def g(*a):
        def step(carry, _):
            aa = list(a)
            aa[0] = aa[0] + carry.astype(aa[0].dtype)
            out = fn(*aa)
            return jnp.sum(out.astype(jnp.float32).ravel()[:8]) * 0.0, None
        s, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
        return s

    float(g(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(g(*args))
    return (time.perf_counter() - t0) / reps / iters


def relerr(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


rng = np.random.default_rng(0)

# numerics at reduced batch
for (b, h, t, d, cfg) in [
        (8, 8, 690, 64, dict(block_q=768, block_k=768, block_h=2)),
        (48, 8, 62, 64, dict(block_q=62, block_k=62, block_h=64))]:
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
               for _ in range(3))
    ref = jax.jit(lambda a, b2, c: attention_reference(
        a.astype(jnp.float32), b2.astype(jnp.float32),
        c.astype(jnp.float32)))(q, k, v)
    out = jax.jit(lambda a, b2, c: flash_attention(a, b2, c, **cfg))(q, k, v)
    print(f"numerics t={t}: flash-vs-f32ref {relerr(out, ref):.2e}",
          flush=True)

# fused-rope numerics: kernel path vs table rope applied out-of-kernel +
# f32 reference attention
for (b, h, t, d, cfg) in [
        (8, 8, 690, 64, dict(block_q=768, block_k=768, block_h=2)),
        (48, 8, 62, 64, dict(block_q=62, block_k=62, block_h=64))]:
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
               for _ in range(3))
    cos, sin = rope_tables(t, d)
    qr = apply_rope_tables(q, cos, sin)
    kr = apply_rope_tables(k, cos, sin)
    ref = jax.jit(lambda a, b2, c: attention_reference(
        a.astype(jnp.float32), b2.astype(jnp.float32),
        c.astype(jnp.float32)))(qr, kr, v)
    out = jax.jit(lambda a, b2, c: flash_attention(
        a, b2, c, rope_cos=cos, rope_sin=sin, **cfg))(q, k, v)
    print(f"rope-fused numerics t={t}: vs f32ref {relerr(out, ref):.2e}",
          flush=True)

# member-shape timing (plain and rope-fused — the fused number replaces
# plain attn + 2 rope prepasses in the member stacks)
for (shape, cfgs) in [
        ((496, 8, 690, 64), [dict(block_q=768, block_k=768, block_h=4),
                             dict(block_q=768, block_k=768, block_h=4,
                                  rope=True),
                             dict(block_q=768, block_k=768, block_h=2,
                                  rope=True),
                             dict(block_q=768, block_k=768, block_h=8,
                                  rope=True)]),
        ((5520, 8, 62, 64), [dict(block_q=62, block_k=62, block_h=64),
                             dict(block_q=62, block_k=62, block_h=64,
                                  rope=True),
                             dict(block_q=62, block_k=62, block_h=32,
                                  rope=True)])]:
    b, h, t, d = shape
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
               for _ in range(3))
    fl = 2 * 2 * b * h * t * t * d
    cos, sin = rope_tables(t, d)
    for cfg in cfgs:
        cfg = dict(cfg)
        if cfg.pop("rope", False):
            cfg["rope_cos"], cfg["rope_sin"] = cos, sin
        label = {k2: v2 for k2, v2 in cfg.items()
                 if not isinstance(v2, np.ndarray)}
        label["rope"] = "rope_cos" in cfg
        try:
            tt = timeit(lambda a, b2, c: flash_attention(a, b2, c, **cfg),
                        q, k, v)
            print(f"t={t} {label}: {tt * 1e3:7.2f} ms  "
                  f"{fl / tt / PEAK:6.1%} MFU", flush=True)
        except Exception as e:
            print(f"t={t} {label}: FAIL {str(e)[:100]}", flush=True)
print("done", flush=True)
