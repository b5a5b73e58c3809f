"""Freq-axis flash probe: aligned 64-row q/k blocks (t=62 padded to 64)
at large block_h, with FULL error capture on compile failure.

The r5 sweep showed every block_h>64 config failing with a truncated
HTTP 500 from the tunnel compile helper; this isolates whether the
failure is VMEM or the unaligned 62-row blocks."""

from __future__ import annotations

import os
import sys
import time
import traceback

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
B, H, T, D = 5520, 8, 62, 64


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


def main():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
               for _ in range(3))
    fl = 2 * 2 * B * H * T * T * D
    ref = None
    for cfg in [dict(block_q=62, block_k=62, block_h=64),
                dict(block_q=64, block_k=64, block_h=64),
                dict(block_q=64, block_k=64, block_h=128),
                dict(block_q=64, block_k=64, block_h=256),
                dict(block_q=64, block_k=64, block_h=512)]:
        try:
            out = jax.jit(lambda a, b2, c: flash_attention(a, b2, c, **cfg))(
                q, k, v)
            out = np.asarray(out, np.float32)
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)) /
                        (np.max(np.abs(ref)) + 1e-9))
            tt = timeit(lambda a, b2, c: flash_attention(a, b2, c, **cfg),
                        q, k, v)
            print(f"{cfg}: {tt * 1e3:7.2f} ms  {fl / tt / PEAK:6.1%} MFU  "
                  f"relerr-vs-first {err:.2e}", flush=True)
        except Exception:
            tb = traceback.format_exc()
            # surface the root-cause line (VMEM / alignment / mosaic)
            keys = [l for l in tb.splitlines()
                    if any(w in l.lower() for w in
                           ("vmem", "divisible", "scoped", "error:",
                            "exceeded", "internal:"))]
            print(f"{cfg}: FAIL", flush=True)
            print("  " + "\n  ".join(keys[-6:]), flush=True)


if __name__ == "__main__":
    main()
