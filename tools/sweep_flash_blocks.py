"""Flash-kernel block-size sweep at the two RoFormer member shapes.

Hypothesis (MICROBENCH r5: flash 15.1 ms / 16.2% MFU at the time shape):
the nk1 kernel is per-grid-step-overhead bound — (496*8)/block_h steps at
~8 us fixed cost each.  Sweep block_h (and a split-q variant) under the
VMEM ceiling and print ms + MFU per config; the winner goes into
models/separation/roformer.py Attention.__call__.

Run on the real chip: python tools/sweep_flash_blocks.py
"""

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

from audiolab_tpu.kernels.attention import flash_attention

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


def sweep(shape, configs, label):
    b, h, t, d = shape
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    q, k, v = (jax.device_put(jnp.asarray(
        rng.standard_normal(shape), jnp.bfloat16), dev) for _ in range(3))
    fl = 2 * 2 * b * h * t * t * d
    print(f"== {label} {shape} ({fl / 1e12:.3f} TF)", flush=True)
    best = (None, 1e9)
    for cfg in configs:
        try:
            tt = timeit(lambda a, bb, c: flash_attention(a, bb, c, **cfg),
                        q, k, v)
            print(f"  {cfg}: {tt * 1e3:7.2f} ms  {fl / tt / PEAK:6.1%} MFU",
                  flush=True)
            if tt < best[1]:
                best = (cfg, tt)
        except Exception as e:
            print(f"  {cfg}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
    print(f"  BEST {label}: {best[0]} @ {best[1] * 1e3:.2f} ms", flush=True)


def main():
    # time axis: b*bands=496, t=690
    sweep((496, 8, 690, 64), [
        dict(block_q=768, block_k=768, block_h=2),   # current
        dict(block_q=768, block_k=768, block_h=4),
        dict(block_q=768, block_k=768, block_h=8),
        dict(block_q=768, block_k=768, block_h=16),
        dict(block_q=384, block_k=768, block_h=8),
        dict(block_q=384, block_k=768, block_h=16),
        dict(block_q=256, block_k=768, block_h=16),
    ], "time-axis")
    # freq axis: b*t=5520, bands=62
    sweep((5520, 8, 62, 64), [
        dict(block_q=62, block_k=62, block_h=64),    # current formula value
        dict(block_q=62, block_k=62, block_h=128),
        dict(block_q=62, block_k=62, block_h=256),
        dict(block_q=62, block_k=62, block_h=512),
    ], "freq-axis")


if __name__ == "__main__":
    main()
