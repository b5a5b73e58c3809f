"""Freq-axis step-amortization probe: can dropping the ones-column widen
(acc/v_ext are the marginal VMEM at large block_h) buy block_h=128 and
halve the 690 overhead-bound grid steps?

Standalone pallas variant so the library kernel stays untouched unless
this wins."""

from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiolab_tpu.kernels.attention import flash_attention

PEAK = 197e12
B, H, T, D = 5520, 8, 62, 64
SCALE = 1.0 / np.sqrt(D)


def _nk1_slim(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """nk1 without the v widen: VPU row-sum, minimal VMEM."""
    f32 = jnp.float32
    qs = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    s = jax.lax.dot_general(qs, k_ref[0], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=f32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(q_ref.dtype)
    l = jnp.sum(p.astype(f32), axis=-1, keepdims=True)
    acc = jax.lax.dot_general(p, v_ref[0], (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=f32)
    o_ref[0] = (acc / jnp.where(l > 0.0, l, 1.0)).astype(o_ref.dtype)


def slim_attention(q, k, v, bh):
    b, h, t, d = q.shape
    qp = q.reshape(b * h // bh, bh, t, d)
    kp = k.reshape(b * h // bh, bh, t, d)
    vp = v.reshape(b * h // bh, bh, t, d)
    return pl.pallas_call(
        functools.partial(_nk1_slim, scale=float(SCALE)),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid=(b * h // bh,),
        in_specs=[pl.BlockSpec((1, bh, t, d), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, bh, t, d), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(qp, kp, vp).reshape(b, h, t, d)


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


rng = np.random.default_rng(0)
q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
           for _ in range(3))
fl = 2 * 2 * B * H * T * T * D

ref = np.asarray(jax.jit(
    lambda a, b2, c: flash_attention(a, b2, c, block_q=62, block_k=62,
                                     block_h=64))(q, k, v), np.float32)
for bh in (64, 128, 160, 240):
    if (B * H) % bh:
        continue
    try:
        out = np.asarray(jax.jit(
            lambda a, b2, c: slim_attention(a, b2, c, bh))(q, k, v),
            np.float32)
        err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9))
        tt = timeit(lambda a, b2, c: slim_attention(a, b2, c, bh), q, k, v)
        print(f"slim bh={bh}: {tt * 1e3:7.2f} ms  {fl / tt / PEAK:6.1%} MFU  "
              f"relerr-vs-prod {err:.2e}", flush=True)
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if "vmem" in l.lower()
               or "Scoped" in l or "INTERNAL" in l]
        print(f"slim bh={bh}: FAIL {key[-1][:160] if key else msg[:160]}",
              flush=True)
print("done", flush=True)
