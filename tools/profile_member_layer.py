"""Sub-op profile of one RoFormer axial layer at member scale.

Splits a time-axis layer (496, 690, 512) and a freq-axis layer
(5520, 62, 512) into their constituent ops and times each with the
in-graph scan harness, to locate the non-flash cost.

Run on the real chip: python tools/profile_member_layer.py
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
from audiolab_tpu.models.separation.roformer import (RMSNorm, rope_packed,
                                                     qk_deinterleave_perm)

PEAK = 197e12


def timeit(fn, *args, iters=8, reps=3):
    @jax.jit
    def g(*a):
        def step(carry, _):
            aa = list(a)
            aa[0] = aa[0] + carry.astype(aa[0].dtype)
            out = fn(*aa)
            leaf = (out if not isinstance(out, (tuple, list))
                    else out[0])
            return jnp.sum(leaf.astype(jnp.float32).ravel()[:8]) * 0.0, None
        s, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
        return s

    float(g(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(g(*args))
    return (time.perf_counter() - t0) / reps / iters


def report(name, sec, flops=0.0):
    m = f"  {flops / sec / PEAK:6.1%} MFU" if flops else "   (bandwidth)"
    print(f"  {name:<26} {sec * 1e3:8.2f} ms{m}", flush=True)


def profile_axis(b, t, label):
    print(f"== {label}: ({b}, {t}, 512) bf16", flush=True)
    D, H, dh = 512, 8, 64
    inner = H * dh
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((b, t, D)), jnp.bfloat16), dev)
    wqkv = jax.device_put(jnp.asarray(
        rng.standard_normal((D, 3 * inner)) * 0.02, jnp.float32), dev)
    wout = jax.device_put(jnp.asarray(
        rng.standard_normal((inner, D)) * 0.02, jnp.float32), dev)
    w1 = jax.device_put(jnp.asarray(
        rng.standard_normal((D, 4 * D)) * 0.02, jnp.float32), dev)
    w2 = jax.device_put(jnp.asarray(
        rng.standard_normal((4 * D, D)) * 0.02, jnp.float32), dev)
    scale = jax.device_put(jnp.ones((D,), jnp.float32), dev)
    q = jax.device_put(jnp.asarray(
        rng.standard_normal((b, H, t, dh)), jnp.bfloat16), dev)
    k, v = q + 0, q * 0.5

    norm = RMSNorm()
    np_ = norm.init(jax.random.PRNGKey(0), x)["params"]

    report("rmsnorm", timeit(
        lambda a: norm.apply({"params": np_}, a), x))
    fl_qkv = 2.0 * b * t * D * 3 * inner
    report("qkv matmul (bf16 cast)", timeit(
        lambda a, w: a @ w.astype(jnp.bfloat16), x, wqkv), fl_qkv)
    xq = x @ wqkv.astype(jnp.bfloat16)[:, :inner]
    report("rope_packed", timeit(
        lambda a: rope_packed(a, H, dh), xq))
    report("heads_first transpose", timeit(
        lambda a: a.reshape(b, t, H, dh).transpose(0, 2, 1, 3), xq))
    fl_attn = 2.0 * 2 * b * H * t * t * dh
    if t > 256:
        fa = lambda a, bb, c: flash_attention(a, bb, c, block_q=768,  # noqa
                                              block_k=768, block_h=2)
    else:
        bh = max(1, min(64, int(8e6 // (t * t * 4))))
        fa = lambda a, bb, c: flash_attention(a, bb, c, block_q=t,  # noqa
                                              block_k=t, block_h=bh)
    report("flash attention", timeit(fa, q, k, v), fl_attn)
    o = jax.device_put(jnp.asarray(
        rng.standard_normal((b, t, inner)), jnp.bfloat16), dev)
    fl_out = 2.0 * b * t * inner * D
    report("out proj", timeit(
        lambda a, w: a @ w.astype(jnp.bfloat16), o, wout), fl_out)
    fl_ff = 2.0 * b * t * D * 4 * D * 2
    report("ff fc1+gelu+fc2", timeit(
        lambda a, u, w: jax.nn.gelu(
            a @ u.astype(jnp.bfloat16)) @ w.astype(jnp.bfloat16),
        x, w1, w2), fl_ff)
    # the full fused layer as the model runs it is timed by bench_micro;
    # this is the sum-of-parts view
    total_fl = fl_qkv + fl_attn + fl_out + fl_ff
    print(f"  (analytic matmul total {total_fl / 1e12:.2f} TF/layer)",
          flush=True)


def main():
    profile_axis(496, 690, "time axis")
    profile_axis(5520, 62, "freq axis")


if __name__ == "__main__":
    main()
