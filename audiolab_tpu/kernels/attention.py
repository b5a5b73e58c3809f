"""Blockwise flash attention (Pallas, TPU).

Replaces the reference's flash_attn CUDA dependency (requirements.txt:28,
used by Zonos/ACE-Step/YuE attention stacks — SURVEY §2.5).  Online-softmax
over KV blocks: scores never materialize in HBM; running (max, sum, acc)
live in VMEM scratch across the kv grid axis.

API: ``flash_attention(q, k, v, causal=False, scale=None)`` with
``(batch, heads, seq, head_dim)`` inputs.  Off-TPU (CPU tests) a jnp
reference path is used; numerics are validated against it in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _on_tpu() -> bool:
    """True only when the computation will actually run on a TPU: honors
    ``jax.default_device(cpu)`` contexts (used for cheap param inits on a
    TPU-attached host — Pallas can't lower on the CPU backend)."""
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            return dd.platform == "tpu"
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def attention_reference(q, k, v, causal=False, scale=None, mask=None):
    """Plain jnp softmax attention (fallback + test oracle).

    ``mask``: optional bool, broadcastable to (b, h, tq, tk); True = attend."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / np.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        cmask = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(cmask, logits, _NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, scale: float, causal: bool, bq: int, bk: int, kv_len: int,
    causal_offset: int,
):
    """One grid step processes a (block_h, bq, d) slab of heads: short
    sequences (the RoFormer 690-frame time axis) make single-head steps
    overhead-bound — 3968 ~12 us steps; folding heads into batched
    dot_generals amortizes the fixed per-step cost."""
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def compute():
        # native-dtype inputs, f32 accumulation: the MXU takes bf16
        # operands at full rate; upcasting q/k to f32 first would force
        # an 8x-slower fp32 matmul (measured 45.7 -> much faster)
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (bh, bq, bk)

        key_ids = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        valid = key_ids < kv_len
        if causal:
            # diagonal offset kv_len - q_len matches tril(k=tk-tq) in
            # attention_reference, so tq != tk (KV-cache decode) agrees
            qry_ids = (iq * bq + causal_offset
                       + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0))
            valid = valid & (key_ids <= qry_ids)
        s = jnp.where(valid[None], s, _NEG_INF)

        m_prev = m_scr[:]  # (bh, bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    if causal:
        # skip kv blocks entirely above the (offset) diagonal
        pl.when(ik * bk <= (iq + 1) * bq - 1 + causal_offset)(compute)
    else:
        compute()

    @pl.when(ik == nk - 1)
    def _():
        l = jnp.where(l_scr[:] > 0.0, l_scr[:], 1.0)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _rotate_half_matrix(d: int) -> np.ndarray:
    """The rotate-half map as a constant ±1 signed-permutation matrix: the
    MXU applies it for free inside a kernel and the result is EXACT (one
    ±1 product per output, fp32 accumulate — no rounding)."""
    half = d // 2
    r = np.zeros((d, d), np.float32)
    r[half:, :half] = -np.eye(half, dtype=np.float32)
    r[:half, half:] = np.eye(half, dtype=np.float32)
    return r


def rope_tables(t: int, d: int, scale: float = 1.0):
    """(t, d) cos/sin tables for half-split rotary embedding, duplicated
    across the two halves; ``scale`` is folded into the tables (exact for
    power-of-two attention scales — multiplying by 2^-n commutes with
    bf16 rounding)."""
    half = d // 2
    freqs = 1.0 / (10000.0 ** (np.arange(0, half, dtype=np.float32) / half))
    ang = np.arange(t)[:, None] * freqs[None, :]
    cos = np.concatenate([np.cos(ang)] * 2, -1).astype(np.float32) * scale
    sin = np.concatenate([np.sin(ang)] * 2, -1).astype(np.float32) * scale
    return cos, sin


def _flash_kernel_nk1_rope(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref,
                           sk_ref, o_ref, *, n_pad: int):
    """nk1 kernel with HALF-SPLIT rotary embedding fused onto the q/k
    blocks: the rotate-half is a constant d×d ±1 matmul on the
    VMEM-resident block and cos/sin arrive as (bq|bk, d) table blocks.
    The attention scale is pre-folded into the q tables (rope_tables), so
    numerics are bitwise-identical to a rope-prepass + in-kernel q*scale
    path for power-of-two scales.  Padded k rows stay EXACT zeros (their
    cos/sin table rows are zero), preserving the closed-form n_pad
    denominator correction.

    MEASURED VERDICT (v5e, tools/check_nk1.py + probe_packed_attn.py):
    the in-kernel table math costs ~9 ms/call at the RoFormer member time
    shape vs ~2.1 ms/call for the packed XLA prepass (rope_packed) — the
    per-step f32 broadcast work dominates.  The RoFormer model therefore
    uses the PREPASS; this fused path stays for callers whose q/k are not
    resident in a packed layout (where the prepass would add its own
    transposes) and as the validated reference for future re-probes."""
    f32 = jnp.float32
    dt = q_ref.dtype
    d = q_ref.shape[-1]
    half = d // 2
    # the rotate-half ±1 matrix built from iota IN-kernel (Pallas forbids
    # captured constants); R[i, j] = +1 where i == j - half, -1 where
    # i == j + half — a (d, d) VPU compare, negligible next to the slab
    ri = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    rc = ((ri == cj - half).astype(dt) - (ri == cj + half).astype(dt))

    def rope_block(x, cos, sin):
        # x (bh, bq, d); cos/sin (bq, d) f32
        rot = jax.lax.dot_general(x, rc, (((2,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        return (x.astype(f32) * cos[None] + rot * sin[None]).astype(dt)

    qs = rope_block(q_ref[0], cq_ref[...], sq_ref[...])
    ks = rope_block(k_ref[0], ck_ref[...], sk_ref[...])
    s = jax.lax.dot_general(
        qs, ks, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # (bh, bq, bk)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(dt)
    v = v_ref[0]  # (bh, bk, d)
    if d % 128:
        ones = jnp.ones(v.shape[:-1] + (128 - d % 128,), dt)
        acc = jax.lax.dot_general(
            p, jnp.concatenate([v, ones], axis=-1),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        l = acc[..., d:d + 1]
        acc = acc[..., :d]
    else:
        acc = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        l = jnp.sum(p.astype(f32), axis=-1, keepdims=True)
    if n_pad:
        l = l - n_pad * jnp.exp(-m)
    o_ref[0] = (acc / jnp.where(l > 0.0, l, 1.0)).astype(o_ref.dtype)


def _flash_kernel_nk1(q_ref, k_ref, v_ref, o_ref, *, n_pad: int,
                      scale: float):
    """Single-kv-block specialization: the whole score row is in VMEM, so
    the online-softmax rescale chain (m/l scratch, alpha rescales) and the
    padding mask collapse.  Padded keys are EXACT zero k/v rows: they add
    exp2(0-m) to the denominator (subtracted in closed form — n_pad is
    static) and exp2(0-m)*0 to the numerator.

    Two savings over the general kernel's structure (this shape is bound
    by VPU slab work — the exp dominates — plus fixed per-step cost):
      - q*scale moves in-kernel onto the (bh, bq, d) q BLOCK (bk/d-times
        smaller than the slab), deleting the q*scale HBM read+write
        prepass the caller used to make — and it stays bitwise-identical
        to that prepass for power-of-two scales (1/sqrt(64) etc.);
      - the denominator comes out of the MXU: v is widened in VMEM with
        a ones column, so p @ [v | 1] yields numerator AND row-sums in
        one matmul — at d=64 the pv matmul only used half the MXU's 128
        lanes, making the extra column free and deleting the VPU
        row-sum reduction pass.  (An exp2(s*log2e) refactor was tried
        and reverted: exp already lowers to exp2+mul in-register, and
        folding log2e into the bf16 q rounds where *scale alone is
        exact — 3x worse max error for zero time.)"""
    f32 = jnp.float32
    dt = q_ref.dtype
    qs = q_ref[0] * jnp.asarray(scale, dt)
    s = jax.lax.dot_general(
        qs, k_ref[0], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # (bh, bq, bk)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(dt)
    v = v_ref[0]  # (bh, bk, d)
    d = v.shape[-1]
    if d % 128:
        # widen v to the 128-lane tile with a ones block: row-sums ride
        # the otherwise-idle MXU lanes
        ones = jnp.ones(v.shape[:-1] + (128 - d % 128,), dt)
        acc = jax.lax.dot_general(
            p, jnp.concatenate([v, ones], axis=-1),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        l = acc[..., d:d + 1]
        acc = acc[..., :d]
    else:
        # lanes already full — the extra column would cost a real tile;
        # keep the VPU reduction
        acc = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        l = jnp.sum(p.astype(f32), axis=-1, keepdims=True)
    if n_pad:
        l = l - n_pad * jnp.exp(-m)
    o_ref[0] = (acc / jnp.where(l > 0.0, l, 1.0)).astype(o_ref.dtype)


def apply_rope_tables(x: jnp.ndarray, cos: np.ndarray,
                      sin: np.ndarray) -> jnp.ndarray:
    """Half-split rope on (..., t, d) from precomputed (t, d) tables —
    the out-of-kernel fallback matching _flash_kernel_nk1_rope exactly."""
    d = x.shape[-1]
    rot = jax.lax.dot_general(
        x, jnp.asarray(_rotate_half_matrix(d)).astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (x.astype(jnp.float32) * jnp.asarray(cos)
            + rot * jnp.asarray(sin)).astype(x.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    block_h: int = 1,
    rope_cos: np.ndarray | None = None,
    rope_sin: np.ndarray | None = None,
) -> jnp.ndarray:
    """Flash attention over ``(b, h, t, d)``; full precision accumulate.

    ``block_h``: (batch*head) slices per grid step.  Raise it for SHORT
    sequences where single-slice steps are overhead-bound (each grid step
    has a fixed ~10 us cost on the one v5e TensorCore).  The fold is over
    the flattened (b, h) axis — every slice carries its own k/v, so
    folding batch elements is as valid as folding heads, and at tiny
    sequence lengths (e.g. the RoFormer 62-band freq axis) block_h=64
    turns tens of thousands of overhead-bound steps into hundreds of
    MXU-bound ones.  VMEM bound: the fp32 score slab is
    block_h*bq*bk*4 bytes — keep it ~<10 MB.

    ``rope_cos``/``rope_sin``: optional (t, d) numpy tables from
    :func:`rope_tables` (WITHOUT the scale fold — it is applied here).
    When given, half-split rotary embedding is applied to q and k INSIDE
    the nk1 kernel (valid for any per-position table: the tables depend
    only on sequence position, so they broadcast over the cross-batch
    block_h fold).  On the fallback paths the same tables are applied
    out-of-kernel, bit-matching the fused path's math."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    has_rope = rope_cos is not None
    if not _on_tpu() or d > 256:
        if has_rope:
            q = apply_rope_tables(q, rope_cos[:tq], rope_sin[:tq])
            k = apply_rope_tables(k, rope_cos[:tk], rope_sin[:tk])
        return attention_reference(q, k, v, causal=causal, scale=scale)

    bh = max(1, min(block_h, b * h))
    while (b * h) % bh:
        bh -= 1
    bq = min(block_q, max(8, tq))
    bk = min(block_k, max(8, tk))
    tq_p = -(-tq // bq) * bq
    tk_p = -(-tk // bk) * bk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
    qp = qp.reshape(b * h // bh, bh, tq_p, d)
    kp = kp.reshape(b * h // bh, bh, tk_p, d)
    vp = vp.reshape(b * h // bh, bh, tk_p, d)

    grid = (b * h // bh, tq_p // bq, tk_p // bk)
    if tk_p // bk == 1 and not causal:
        if has_rope:
            # pad tables with ZEROS: padded k rows become exact zero after
            # rope (0*cos + rot*0), preserving the n_pad closed form;
            # padded q rows produce garbage that is sliced off below
            cq = np.zeros((tq_p, d), np.float32)
            sq = np.zeros((tq_p, d), np.float32)
            cq[:tq], sq[:tq] = rope_cos[:tq] * scale, rope_sin[:tq] * scale
            ck = np.zeros((tk_p, d), np.float32)
            sk = np.zeros((tk_p, d), np.float32)
            ck[:tk], sk[:tk] = rope_cos[:tk], rope_sin[:tk]
            out = pl.pallas_call(
                functools.partial(_flash_kernel_nk1_rope, n_pad=tk_p - tk),
                out_shape=jax.ShapeDtypeStruct(
                    (b * h // bh, bh, tq_p, d), q.dtype),
                grid=(b * h // bh, tq_p // bq),
                in_specs=[
                    pl.BlockSpec((1, bh, bq, d), lambda g, iq: (g, 0, iq, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bh, bk, d), lambda g, iq: (g, 0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bh, bk, d), lambda g, iq: (g, 0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bq, d), lambda g, iq: (iq, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bq, d), lambda g, iq: (iq, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, d), lambda g, iq: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, d), lambda g, iq: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, bh, bq, d), lambda g, iq: (g, 0, iq, 0), memory_space=pltpu.VMEM
                ),
            )(qp, kp, vp, jnp.asarray(cq), jnp.asarray(sq),
              jnp.asarray(ck), jnp.asarray(sk))
            return out.reshape(b, h, tq_p, d)[:, :, :tq, :]
        out = pl.pallas_call(
            functools.partial(_flash_kernel_nk1, n_pad=tk_p - tk,
                              scale=float(scale)),
            out_shape=jax.ShapeDtypeStruct((b * h // bh, bh, tq_p, d), q.dtype),
            grid=(b * h // bh, tq_p // bq),
            in_specs=[
                pl.BlockSpec((1, bh, bq, d), lambda g, iq: (g, 0, iq, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bh, bk, d), lambda g, iq: (g, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bh, bk, d), lambda g, iq: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, bh, bq, d), lambda g, iq: (g, 0, iq, 0), memory_space=pltpu.VMEM
            ),
        )(qp, kp, vp)
        return out.reshape(b, h, tq_p, d)[:, :, :tq, :]
    if has_rope:
        # multi-kv-block / causal paths: rope applied out-of-kernel with
        # the same table math (qp/kp are zero-padded, so padded rows stay
        # consistent with the masked kernel)
        cp = np.zeros((max(tq_p, tk_p), d), np.float32)
        sp = np.zeros((max(tq_p, tk_p), d), np.float32)
        cp[:rope_cos.shape[0]], sp[:rope_sin.shape[0]] = rope_cos, rope_sin
        qp = apply_rope_tables(qp, cp[:tq_p], sp[:tq_p])
        kp = apply_rope_tables(kp, cp[:tk_p], sp[:tk_p])
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, causal=causal, bq=bq, bk=bk, kv_len=tk,
            causal_offset=tk - tq,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h // bh, bh, tq_p, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bh, bq, d), lambda g, iq, ik: (g, 0, iq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, bk, d), lambda g, iq, ik: (g, 0, ik, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, bk, d), lambda g, iq, ik: (g, 0, ik, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, bq, d), lambda g, iq, ik: (g, 0, iq, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((bh, bq, 1), jnp.float32),
            pltpu.VMEM((bh, bq, 1), jnp.float32),
            pltpu.VMEM((bh, bq, d), jnp.float32),
        ],
    )(qp, kp, vp)
    return out.reshape(b, h, tq_p, d)[:, :, :tq, :]
