"""Probe: packed-layout nk1 attention for the RoFormer TIME axis.

Hypothesis: at member scale the attention sub-block pays ~4.5 GB/layer of
pure layout traffic around the kernel — jnp.split of qkv, two rope
prepasses, three heads_first transposes into (b, h, t, d), and the
transpose back.  A kernel that reads q/k/v straight out of the packed
(b, t, 3h, d) VIEW of the qkv activation (free reshape), ropes in-kernel,
and writes (b, t, h, d) removes all of it.  Full-t blocks (bq = t = 690)
need NO input padding — Mosaic masks the non-aligned tail internally.

Variants:
  A  committed path: rope_packed prepass + split + transposes + flash
     (rope fused in-kernel as of today) — measured as the full sub-block
  B  same but rope fused (today's kernel): split + transposes + flash+rope
  C1 packed kernel, in-kernel transposes to (bh, t, d)
  C2 packed kernel, batch-middle dot_general (no transposes at all)

Run on the real chip: python tools/probe_packed_attn.py
"""

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

from audiolab_tpu.kernels.attention import (apply_rope_tables,
                                            attention_reference,
                                            flash_attention, rope_tables)
from audiolab_tpu.models.separation.roformer import rope_packed

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


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, variant: str,
                   scale: float):
    """C': inputs are ALREADY-ROPED (b, t, h, d) views; q block is a
    (1, bq, h, d) slice of the t axis, k/v are full-t (1, t, h, d).
    h=8 satisfies the minor-dims block rule; no input padding (full axes).
    """
    f32 = jnp.float32
    dt = q_ref.dtype
    d = q_ref.shape[-1]
    qs = (q_ref[0] * jnp.asarray(scale, dt))
    ks = k_ref[0]
    v = v_ref[0]
    if variant == "C1":
        qs = jnp.transpose(qs, (1, 0, 2))  # (h, bq, d)
        ks = jnp.transpose(ks, (1, 0, 2))
        vt = jnp.transpose(v, (1, 0, 2))
        s = jax.lax.dot_general(qs, ks, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=f32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(dt)
        ones = jnp.ones(vt.shape[:-1] + (128 - d % 128,), dt)
        acc = jax.lax.dot_general(
            p, jnp.concatenate([vt, ones], axis=-1),
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32)
    else:
        # batch dim in the MIDDLE of q/k (dim 1) — no transposes at all
        s = jax.lax.dot_general(qs, ks, (((2,), (2,)), ((1,), (1,))),
                                preferred_element_type=f32)  # (h, bq, t)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(dt)
        ones = jnp.ones(v.shape[:-1] + (128 - d % 128,), dt)
        acc = jax.lax.dot_general(
            p, jnp.concatenate([v, ones], axis=-1),
            (((2,), (0,)), ((0,), (1,))), preferred_element_type=f32)
    l = acc[..., d:d + 1]
    acc = acc[..., :d]
    o = acc / jnp.where(l > 0.0, l, 1.0)        # (h, bq, d)
    o_ref[0] = jnp.transpose(o, (1, 0, 2)).astype(o_ref.dtype)


def packed_attention(q, k, v, heads, dim_head, bq, variant):
    """q/k/v (b, t, heads*dim_head), already roped -> (b, t, inner)."""
    b, t, _ = q.shape
    d = dim_head
    h = heads
    scale = 1.0 / float(np.sqrt(d))
    nq = t // bq
    assert nq * bq == t
    x = [z.reshape(b, t, h, d) for z in (q, k, v)]
    out = pl.pallas_call(
        functools.partial(_packed_kernel, variant=variant, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, t, h, d), q.dtype),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, bq, h, d), lambda ib, iq: (ib, iq, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, h, d), lambda ib, iq: (ib, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, h, d), lambda ib, iq: (ib, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, h, d), lambda ib, iq: (ib, iq, 0, 0), memory_space=pltpu.VMEM),
    )(*x)
    return out.reshape(b, t, h * d)


def main():
    b, h, t, d = 496, 8, 690, 64
    inner = h * d
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    qkv = jax.device_put(jnp.asarray(
        rng.standard_normal((b, t, 3 * inner)), jnp.bfloat16), dev)
    fl = 2 * 2 * b * h * t * t * d
    cos, sin = rope_tables(t, d)

    def heads_first(z):
        return z.reshape(z.shape[0], t, h, d).transpose(0, 2, 1, 3)

    def variant_A(qkv):
        bb = qkv.shape[0]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rope_packed(q, h, d)
        k = rope_packed(k, h, d)
        q, k, v = map(heads_first, (q, k, v))
        o = flash_attention(q, k, v, block_q=768, block_k=768, block_h=4)
        return o.transpose(0, 2, 1, 3).reshape(bb, t, inner)

    def variant_B(qkv):
        bb = qkv.shape[0]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = map(heads_first, (q, k, v))
        o = flash_attention(q, k, v, block_q=768, block_k=768, block_h=4,
                            rope_cos=cos, rope_sin=sin)
        return o.transpose(0, 2, 1, 3).reshape(bb, t, inner)

    # numerics at reduced batch
    small = qkv[:16]
    ref = variant_A(small)

    def relerr(a):
        a = np.asarray(a, np.float32)
        bref = np.asarray(ref, np.float32)
        return float(np.max(np.abs(a - bref)) / (np.max(np.abs(bref)) + 1e-9))

    def variant_C(qkv, bq, variant):
        bb = qkv.shape[0]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rope_packed(q, h, d)
        k = rope_packed(k, h, d)
        o = packed_attention(q, k, v, h, d, bq, variant)
        return o.reshape(bb, t, inner)

    print(f"B vs A numerics: {relerr(variant_B(small)):.2e}", flush=True)
    for variant in ("C2", "C1"):
        for bq in (230,):
            try:
                o = variant_C(small, bq, variant)
                print(f"{variant} bq={bq} vs A numerics: {relerr(o):.2e}",
                      flush=True)
            except Exception as e:
                print(f"{variant} bq={bq}: FAIL {str(e)[:160]}", flush=True)

    print("-- timing (attention sub-block incl. layout ops) --", flush=True)
    for name, fn in [("A rope-prepass", variant_A), ("B rope-fused", variant_B)]:
        tt = timeit(fn, qkv)
        print(f"{name:<22} {tt * 1e3:7.2f} ms  {fl / tt / PEAK:6.1%} attn-MFU",
              flush=True)
    for variant in ("C2", "C1"):
        for bq in (230, 115, 345):
            try:
                tt = timeit(lambda x: variant_C(x, bq, variant), qkv)
                print(f"{variant} packed bq={bq}      {tt * 1e3:7.2f} ms  "
                      f"{fl / tt / PEAK:6.1%} attn-MFU", flush=True)
            except Exception as e:
                print(f"{variant} bq={bq}: FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
