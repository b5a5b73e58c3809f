"""Band-Split RoFormer source separation in flax.

The reference's best separators are BS/mel-RoFormer torch checkpoints run
through the audio-separator package (modules/separator/stem_separator.py:
379-386 lists them with SDR 12.96 vocals).  This is a from-scratch flax
implementation of the architecture family:

  stereo STFT -> per-band linear "band split" -> axial transformer
  (alternating attention over time and over bands, rotary embeddings)
  -> per-band mask MLPs -> complex mask * STFT -> iSTFT per stem

The module structure is shape- and semantics-compatible with the published
lucidrains/BS-RoFormer checkpoints the reference downloads (gated attention
with per-head sigmoid gates, interleaved-pair rotary embedding, per-axial
transformer output RMSNorm, tanh-MLP + GLU mask estimators), so
utils/convert.roformer_mapping can fill the tree from a real .ckpt.

TPU notes: attention runs on the Pallas flash kernel; the axial layout keeps
sequence lengths short (T≈400 frames per 8 s chunk, B=62 bands) so both
axes tile the MXU well; everything is one jitted graph per chunk batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.attention import flash_attention
from audiolab_tpu.kernels.stft import istft, stft

# default 1025-bin band layout (sums to n_fft//2+1 for n_fft=2048); matches
# lucidrains' DEFAULT_FREQS_PER_BANDS used by the published checkpoints
DEFAULT_BANDS: tuple[int, ...] = (
    (2,) * 24 + (4,) * 12 + (12,) * 8 + (24,) * 8 + (48,) * 8 + (128,) + (129,)
)


@dataclass(frozen=True)
class RoformerConfig:
    dim: int = 192
    depth: int = 6                  # axial (time, freq) pairs
    heads: int = 8
    dim_head: int = 64              # per-head width (inner = heads*dim_head)
    stems: Sequence[str] = ("vocals", "other")  # one mask estimator each
    residual_stem: str | None = None  # stem synthesized as mix - sum(stems)
    freqs_per_bands: Sequence[int] = DEFAULT_BANDS
    n_fft: int = 2048
    hop: int = 512
    channels: int = 2               # stereo
    ff_mult: int = 4
    time_depth: int = 1             # inner layers per time transformer
    freq_depth: int = 1             # inner layers per freq transformer
    mask_est_depth: int = 2         # hidden linears in each mask MLP
    band_bins: tuple | None = None  # explicit per-band STFT-bin tuples
                                    # (overlapping allowed — mel-band
                                    # roformer); None = contiguous
                                    # freqs_per_bands
    dtype: str = "bfloat16"         # activation/matmul dtype: bf16 rides
                                    # the MXU (~6x fp32 on v5e); params and
                                    # the STFT/iSTFT stay fp32; tests pass
                                    # float64 for exact torch parity

    @property
    def n_bands(self) -> int:
        return (len(self.band_bins) if self.band_bins is not None
                else len(self.freqs_per_bands))


def band_bin_table(cfg: "RoformerConfig") -> list[tuple[int, ...]]:
    """Per-band STFT-bin index tuples: explicit (mel-band, overlapping) or
    contiguous runs from freqs_per_bands."""
    if cfg.band_bins is not None:
        return [tuple(b) for b in cfg.band_bins]
    out, start = [], 0
    for w in cfg.freqs_per_bands:
        out.append(tuple(range(start, start + w)))
        start += w
    return out


def mel_band_bins(n_bands: int, n_fft: int, sr: int) -> tuple[tuple[int, ...], ...]:
    """Mel-band layout of lucidrains/Mel-Band-RoFormer: the nonzero bins of
    an htk mel filterbank (norm=None), with DC forced into the first band
    and Nyquist into the last so every bin is covered."""
    from audiolab_tpu.kernels.mel import mel_filterbank

    fb = np.asarray(mel_filterbank(sr, n_fft, n_mels=n_bands, fmin=0.0,
                                   fmax=sr / 2, htk=True, norm=None)).T
    # fb is (n_bands, n_bins); force DC into the first band and Nyquist
    # into the last (mel_band_roformer does the same), and hand boundary
    # bins that sit exactly on a triangle edge (weight 0 everywhere) to
    # their nearest band so every bin is covered
    fb[0, 0] = 1.0
    fb[-1, -1] = 1.0
    uncovered = np.flatnonzero(~(fb > 0).any(axis=0))
    for bb in uncovered:
        centers = np.array([np.mean(np.flatnonzero(fb[i] > 0))
                            if (fb[i] > 0).any() else 1e9
                            for i in range(n_bands)])
        fb[int(np.argmin(np.abs(centers - bb))), bb] = 1.0
    bands = [tuple(np.flatnonzero(fb[i] > 0).tolist())
             for i in range(n_bands)]
    assert all(len(b) for b in bands)
    return tuple(bands)


def rope(x: jnp.ndarray) -> jnp.ndarray:
    """Rotary embedding over axis -2, INTERLEAVED pair convention
    (rotary_embedding_torch's rotate_half groups (d r) with r=2, which is
    what the published checkpoints were trained with)."""
    t, d = x.shape[-2], x.shape[-1]
    half = d // 2
    freqs = 1.0 / (10000.0 ** (np.arange(0, half, dtype=np.float32) / half))
    angles = jnp.arange(t)[:, None] * freqs[None, :]  # (t, half)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    # rotation accumulates in fp32 (angles table); return the input dtype so
    # bf16 activations stay bf16 into the flash kernel
    return out.reshape(x.shape).astype(x.dtype)


def rope_half(x: jnp.ndarray) -> jnp.ndarray:
    """Rotary embedding, HALF-SPLIT convention: pair i is (x[i], x[i+d/2]).

    Identical to :func:`rope` after the de-interleave permutation
    ``[0,2,...,d-2, 1,3,...,d-1]`` of the feature axis — used with
    :func:`qk_deinterleave_perm` below, which folds that permutation into
    the q/k projection WEIGHT COLUMNS (attention scores are invariant
    under any shared q/k feature permutation, so outputs are unchanged).

    The rotate-half itself is a CONSTANT 64x64 signed-permutation MATMUL,
    not a slice+concat: lane-axis shuffles on (..., 64) bf16 tiles cost
    ~5.6 ms per member-scale call on v5e (48 calls = ~270 ms/member),
    while the MXU eats the +-1 matrix for free and the result is EXACT
    (one +-1 per column, fp32 accumulate - no rounding)."""
    t, d = x.shape[-2], x.shape[-1]
    half = d // 2
    freqs = 1.0 / (10000.0 ** (np.arange(0, half, dtype=np.float32) / half))
    angles = np.arange(t)[:, None] * freqs[None, :]          # (t, half)
    cos = jnp.asarray(np.concatenate([np.cos(angles)] * 2, -1))  # (t, d)
    sin = jnp.asarray(np.concatenate([np.sin(angles)] * 2, -1))
    R = np.zeros((d, d), np.float32)
    R[half:, :half] = -np.eye(half, dtype=np.float32)  # rot[j<half] = -x[j+half]
    R[:half, half:] = np.eye(half, dtype=np.float32)   # rot[j>=half] = x[j-half]
    rot = jax.lax.dot_general(x, jnp.asarray(R).astype(x.dtype),
                              (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (x.astype(jnp.float32) * cos + rot * sin).astype(x.dtype)


def _rope_packed_tables(t: int, heads: int, dim_head: int):
    """cos/sin tables tiled across heads + the block-diagonal rotate-half
    matrix, for rope applied in the PACKED (b, t, heads*dim_head) layout."""
    half = dim_head // 2
    freqs = 1.0 / (10000.0 ** (np.arange(0, half, dtype=np.float32) / half))
    ang = np.arange(t)[:, None] * freqs[None, :]                  # (t, half)
    cos = np.tile(np.concatenate([np.cos(ang)] * 2, -1), (1, heads))
    sin = np.tile(np.concatenate([np.sin(ang)] * 2, -1), (1, heads))
    r = np.zeros((dim_head, dim_head), np.float32)
    r[half:, :half] = -np.eye(half, dtype=np.float32)
    r[:half, half:] = np.eye(half, dtype=np.float32)
    rp = np.kron(np.eye(heads, dtype=np.float32), r)   # (inner, inner)
    return cos, sin, rp


def rope_packed(x: jnp.ndarray, heads: int, dim_head: int) -> jnp.ndarray:
    """:func:`rope_half` evaluated WITHOUT leaving the packed
    ``(b, t, heads*dim_head)`` activation layout (half-split convention per
    head, i.e. after :func:`qk_deinterleave_perm`).

    Numerically identical to rope_half on the unpacked (b, h, t, d) view —
    the rotate-half is the same signed permutation, now block-diagonal per
    head, and each output element still has exactly one ±1 product (exact
    at any dtype); the cos/sin tables tile across heads.  The win is
    layout: (…, 64)-wide tiles leave half of every 128-lane register empty
    and measured 8.7 ms per member-scale call on v5e, while the packed
    512-lane layout runs the same op in 5.6 ms and skips the per-head
    transpose of q/k beforehand."""
    t = x.shape[-2]
    cos, sin, rp = _rope_packed_tables(t, heads, dim_head)
    rot = jax.lax.dot_general(
        x, jnp.asarray(rp).astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (x.astype(jnp.float32) * jnp.asarray(cos)
            + rot * jnp.asarray(sin)).astype(x.dtype)


def qk_deinterleave_perm(heads: int, dim_head: int, inner: int) -> np.ndarray:
    """Column permutation for the fused qkv kernel that moves q and k
    head-features from interleaved-pair order to half-split order
    (even dims first, odd dims second, per head); v stays in place."""
    half = dim_head // 2
    head_perm = np.concatenate([np.arange(0, dim_head, 2),
                                np.arange(1, dim_head, 2)])
    qk = np.concatenate([h * dim_head + head_perm for h in range(heads)])
    return np.concatenate([qk, inner + qk, 2 * inner + np.arange(inner)])


class RMSNorm(nn.Module):
    """lucidrains RMSNorm: F.normalize(x) * sqrt(d) * gamma (eps 1e-12).
    The norm accumulates in fp32 regardless of activation dtype; at bf16
    the normalizer is applied as a bf16 row scalar (the output is bf16
    anyway, so the factor's rounding is absorbed by the output rounding)
    — this keeps the whole op at 2 reads + 1 write of the bf16 tensor
    instead of materializing an fp32 copy (measured 5.3 -> ~1.5 ms on the
    496x690x512 residual stream)."""

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        xf = x.astype(jnp.float32)
        r = (d ** 0.5) / jnp.maximum(
            jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)), 1e-12)
        if x.dtype == jnp.bfloat16:
            return x * r.astype(x.dtype) * scale.astype(x.dtype)
        return (xf * r * scale).astype(x.dtype)


class QKVDense(nn.Module):
    """Bias-free Dense whose kernel columns are statically permuted at
    apply time (checkpoint layout preserved on disk; see
    qk_deinterleave_perm)."""

    features: int
    perm: tuple
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        kernel = kernel[:, jnp.asarray(np.asarray(self.perm))]
        return x @ kernel.astype(jnp.dtype(self.dtype))


class Attention(nn.Module):
    dim: int
    heads: int
    dim_head: int = 64
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        d = self.dim_head
        dt = jnp.dtype(self.dtype)
        inner = self.heads * d
        x = RMSNorm(name="norm")(x)
        # fused qkv with the q/k de-interleave permutation folded into the
        # KERNEL COLUMNS (a 0.75 MB gather on the weight, nothing on the
        # 350 MB activation): scores are invariant under a shared q/k
        # feature permutation, and the cheap rotate-half rope below is then
        # exactly the checkpoint's interleaved-pair rope.  Param path stays
        # "to_qkv/kernel" so converters are untouched.
        wq = QKVDense(inner * 3, perm=tuple(
            qk_deinterleave_perm(self.heads, d, inner).tolist()),
            dtype=self.dtype, name="to_qkv")
        qkv = wq(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # rope in the packed 2-d layout (full 128-lane tiles, no per-head
        # transpose of q/k first) — numerically identical, see rope_packed.
        # Fusing rope INTO the nk1 kernel was probed and REJECTED: the
        # packed XLA prepass costs ~2.1 ms/call here, while the in-kernel
        # table math added ~9 ms/call at the member time shape
        # (tools/probe_packed_attn.py: 27.0 ms rope-prepass vs 32.2 ms
        # rope-fused for the full attention sub-block).
        q = rope_packed(q, self.heads, d)
        k = rope_packed(k, self.heads, d)

        def heads_first(z):
            return z.reshape(b, t, self.heads, d).transpose(0, 2, 1, 3)

        q, k, v = map(heads_first, (q, k, v))
        if t < 256:
            # short sequences (the 62-band freq axis): whole-row kv block
            # takes the nk1 kernel path, and the cross-batch head fold
            # (block_h spans the flattened b*h axis) turns ~44k tiny grid
            # steps into ~700 MXU-bound ones — measured 12.6 ms vs 21.2 ms
            # for XLA's batched attention at the member freq shape; bh is
            # capped so the fp32 score slab stays inside scoped VMEM
            # (bh=128 at t=62 was a compile-time VMEM OOM)
            bh = max(1, min(64, int(8e6 // (t * t * 4))))
            o = flash_attention(q, k, v, block_q=t, block_k=t, block_h=bh)
        else:
            # one q/kv block per grid step, four heads per step: the single
            # kv block takes the nk1 kernel path (no online-softmax rescale
            # chain, padding handled in closed form); with the in-kernel
            # scale + MXU row-sum kernel, block_h=4 measured 12.39/12.40 ms
            # across runs vs 12.90/13.01 at block_h=2 (member time shape);
            # fp32 score slab 4*768*768*4B = 9.4 MB fits scoped VMEM
            o = flash_attention(q, k, v, block_q=768, block_k=768, block_h=4)
        # per-head sigmoid gates (bs_roformer Attention.to_gates)
        gates = nn.Dense(self.heads, dtype=dt, name="to_gates")(x)  # (b, t, h)
        o = o * jax.nn.sigmoid(gates).transpose(0, 2, 1)[..., None]
        o = o.transpose(0, 2, 1, 3).reshape(b, t, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=dt, name="to_out")(o)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = jnp.dtype(self.dtype)
        x = RMSNorm(name="norm")(x)
        x = nn.Dense(self.dim * self.mult, dtype=dt, name="fc1")(x)
        x = nn.gelu(x)
        return nn.Dense(self.dim, dtype=dt, name="fc2")(x)


class Transformer(nn.Module):
    """One axial transformer: `depth` (attn, ff) pairs + output RMSNorm,
    mirroring bs_roformer.Transformer(norm_output=True)."""

    dim: int
    heads: int
    dim_head: int
    ff_mult: int
    depth: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        for j in range(self.depth):
            x = x + Attention(self.dim, self.heads, self.dim_head,
                              self.dtype, name=f"attn_{j}")(x)
            x = x + FeedForward(self.dim, self.ff_mult, self.dtype,
                                name=f"ff_{j}")(x)
        return RMSNorm(name="norm")(x)


class BandSplit(nn.Module):
    """Per-band RMSNorm + Linear, executed as ONE batched einsum.

    62 per-band Dense calls serialize into hundreds of tiny MXU ops (the
    profiled bottleneck: ~3.6% MXU utilization); the bands are instead
    gathered into a padded (bands, maxw) layout and projected with a single
    (bands, maxw, dim) batched matmul.  Zero padding is exact: padded
    entries contribute 0 to the L2 norm and 0 through zero-padded kernel
    rows.  Params stay per-band so checkpoints convert band-by-band."""

    cfg: RoformerConfig

    @nn.compact
    def __call__(self, spec):
        # spec (b, t, n_bins, 2*channels) real/imag interleaved features
        c = self.cfg
        ch2 = spec.shape[-1]
        bands = band_bin_table(c)
        widths = [len(b) * ch2 for b in bands]
        maxw = max(widths)
        nb = len(widths)
        dt = jnp.dtype(c.dtype)

        scales = [self.param(f"norm_scale_{i}", nn.initializers.ones, (d,))
                  for i, d in enumerate(widths)]
        kernels = [self.param(f"proj_kernel_{i}",
                              nn.initializers.lecun_normal(), (d, c.dim))
                   for i, d in enumerate(widths)]
        biases = [self.param(f"proj_bias_{i}", nn.initializers.zeros,
                             (c.dim,)) for i in range(nb)]
        scale_p = jnp.stack([jnp.pad(s, (0, maxw - s.shape[0]))
                             for s in scales])            # (nb, maxw)
        kern_p = jnp.stack([jnp.pad(k, ((0, maxw - k.shape[0]), (0, 0)))
                            for k in kernels])            # (nb, maxw, dim)
        bias_p = jnp.stack(biases)                        # (nb, dim)

        # static gather: bin index per (band, slot); padded slots re-read
        # bin 0 and are masked to zero below
        idx = np.zeros((nb, maxw // ch2), np.int32)
        valid = np.zeros((nb, maxw), np.float32)
        for i, bins in enumerate(bands):
            idx[i, : len(bins)] = bins
            valid[i, : len(bins) * ch2] = 1.0
        gathered = spec[:, :, jnp.asarray(idx), :]  # (b,t,nb,maxw/ch2,ch2)
        x = gathered.reshape(*gathered.shape[:3], maxw) * jnp.asarray(valid)

        xf = x.astype(jnp.float32)
        norm = jnp.maximum(jnp.sqrt(
            jnp.sum(xf * xf, axis=-1, keepdims=True)), 1e-12)
        sqrt_d = jnp.asarray([d ** 0.5 for d in widths], jnp.float32)
        xn = xf / norm * sqrt_d[None, None, :, None] * scale_p
        return jnp.einsum("btkw,kwd->btkd", xn.astype(dt),
                          kern_p.astype(dt)) + bias_p.astype(dt)


class MaskEstimator(nn.Module):
    """Per-band tanh-MLP -> GLU (bs_roformer.MaskEstimator semantics), as
    batched einsums over the band axis — same padding strategy as
    BandSplit; the GLU halves are kept in separate padded blocks so the
    split stays exact.  Params are per-band for conversion."""

    cfg: RoformerConfig

    @nn.compact
    def __call__(self, x):
        # x (b, t, bands, dim) -> complex mask (b, t, n_bins, 2*channels)
        c = self.cfg
        hidden = c.dim * 4
        bands = band_bin_table(c)
        nb = c.n_bands
        dt = jnp.dtype(c.dtype)
        ch2 = 2 * c.channels
        outs_w = [len(b) * ch2 for b in bands]
        maxo = max(outs_w)

        h = x.astype(dt)
        for k in range(c.mask_est_depth):
            kk = jnp.stack([
                self.param(f"mlp_kernel_{i}_{k}",
                           nn.initializers.lecun_normal(),
                           (c.dim if k == 0 else hidden, hidden))
                for i in range(nb)])
            bb = jnp.stack([
                self.param(f"mlp_bias_{i}_{k}", nn.initializers.zeros,
                           (hidden,)) for i in range(nb)])
            h = jnp.tanh(jnp.einsum("btkd,kdh->btkh", h, kk.astype(dt))
                         + bb.astype(dt))

        # final layer: out features are (value || gate), each padded to maxo
        # per band so the GLU split at maxo is exact
        ok, ob = [], []
        for i, wo in enumerate(outs_w):
            kern = self.param(f"out_kernel_{i}",
                              nn.initializers.lecun_normal(),
                              (hidden, 2 * wo))
            bias = self.param(f"out_bias_{i}", nn.initializers.zeros,
                              (2 * wo,))
            pad = maxo - wo
            ok.append(jnp.concatenate([
                jnp.pad(kern[:, :wo], ((0, 0), (0, pad))),
                jnp.pad(kern[:, wo:], ((0, 0), (0, pad)))], axis=-1))
            ob.append(jnp.concatenate([
                jnp.pad(bias[:wo], (0, pad)), jnp.pad(bias[wo:], (0, pad))]))
        kern_p = jnp.stack(ok)   # (nb, hidden, 2*maxo)
        bias_p = jnp.stack(ob)
        out = jnp.einsum("btkh,kho->btko", h, kern_p.astype(dt)) \
            + bias_p.astype(dt)
        a, gate = out[..., :maxo], out[..., maxo:]
        mask = a * jax.nn.sigmoid(gate)   # (b, t, nb, maxo)

        # scatter band slots back to bins.  Disjoint (BS) bands hit each bin
        # once; overlapping mel bands SUM and divide by the per-bin band
        # count (mel_band_roformer's scatter_add + num_bands_per_freq).
        n_bins = 1 + max(max(b) for b in bands)
        maxbins = maxo // ch2
        slot_bin = np.full((nb * maxbins,), n_bins, np.int32)  # pad -> dump
        counts = np.zeros((n_bins,), np.float32)
        for i, bins in enumerate(bands):
            for j, bb in enumerate(bins):
                slot_bin[i * maxbins + j] = bb
                counts[bb] += 1.0
        m = mask.reshape(*mask.shape[:2], nb * maxbins, ch2)
        summed = jnp.zeros((*m.shape[:2], n_bins + 1, ch2), m.dtype)
        summed = summed.at[:, :, jnp.asarray(slot_bin), :].add(m)
        out_m = summed[:, :, :n_bins, :]
        return out_m / jnp.asarray(np.maximum(counts, 1.0))[None, None, :, None]


class AxialPair(nn.Module):
    """One (time transformer, freq transformer) depth step over the
    (b, t, bands, dim) feature map — the body scanned over depth."""

    cfg: RoformerConfig

    @nn.compact
    def __call__(self, x, _=None):
        c = self.cfg
        b, t_frames, n_bands, _d = x.shape
        # time attention: fold bands into batch
        xt = x.transpose(0, 2, 1, 3).reshape(b * n_bands, t_frames, c.dim)
        xt = Transformer(c.dim, c.heads, c.dim_head, c.ff_mult,
                         c.time_depth, c.dtype, name="time")(xt)
        x = xt.reshape(b, n_bands, t_frames, c.dim).transpose(0, 2, 1, 3)
        # freq (band) attention: fold time into batch
        xf = x.reshape(b * t_frames, n_bands, c.dim)
        xf = Transformer(c.dim, c.heads, c.dim_head, c.ff_mult,
                         c.freq_depth, c.dtype, name="freq")(xf)
        return xf.reshape(b, t_frames, n_bands, c.dim), None


class BSRoformer(nn.Module):
    cfg: RoformerConfig = RoformerConfig()

    @nn.compact
    def __call__(self, audio):
        """audio (b, channels, n) -> dict stem -> (b, channels, n)."""
        c = self.cfg
        b, ch, n = audio.shape
        real, imag = stft(audio, n_fft=c.n_fft, hop=c.hop)  # (b, ch, t, bins)
        spec = jnp.stack([real, imag], axis=-1)  # (b, ch, t, bins, 2)
        spec = spec.transpose(0, 2, 3, 1, 4).reshape(
            b, real.shape[-2], c.n_fft // 2 + 1, ch * 2
        )  # (b, t, bins, ch*2) — per bin: (ch0 re, ch0 im, ch1 re, ch1 im),
        # matching bs_roformer's 'b (f s) t c -> b t (f s c)' packing

        x = BandSplit(c, name="band_split")(spec)  # (b, t, bands, dim)
        t_frames = x.shape[1]

        # nn.scan over depth: params stack along a leading depth axis and
        # the axial-pair body is traced/compiled ONCE (an unrolled 12-deep
        # stack made the fused member graph a ~15-minute tunnel compile;
        # execution is identical — scan iterations run sequentially)
        pairs = nn.scan(AxialPair, variable_axes={"params": 0},
                        split_rngs={"params": True}, length=c.depth)
        x, _ = pairs(c, name="depth")(x)

        x = RMSNorm(name="final_norm")(x)

        out = {}
        acc = None
        for stem in c.stems:
            mask = MaskEstimator(c, name=f"mask_{stem}")(x)  # (b,t,bins,ch*2)
            masked = _complex_mul(spec, mask.astype(jnp.float32), ch)
            # back to (b, ch, t, bins) re/im
            masked = masked.reshape(b, t_frames, c.n_fft // 2 + 1, ch, 2)
            masked = masked.transpose(0, 3, 1, 2, 4)
            wav = istft(
                masked[..., 0], masked[..., 1], n_fft=c.n_fft, hop=c.hop, length=n
            )
            out[stem] = wav
            acc = wav if acc is None else acc + wav
        if c.residual_stem is not None:
            # published vocal models are num_stems=1: the complement stem is
            # the mix residual (stem_separator.py derives instrumental the
            # same way)
            out[c.residual_stem] = audio - acc
        return out


def _complex_mul(spec: jnp.ndarray, mask: jnp.ndarray, ch: int) -> jnp.ndarray:
    """Complex multiply spec*mask where last axis packs (ch*2) re/im pairs."""
    b, t, f, _ = spec.shape
    s = spec.reshape(b, t, f, ch, 2)
    m = mask.reshape(b, t, f, ch, 2)
    re = s[..., 0] * m[..., 0] - s[..., 1] * m[..., 1]
    im = s[..., 0] * m[..., 1] + s[..., 1] * m[..., 0]
    return jnp.stack([re, im], axis=-1).reshape(b, t, f, ch * 2)
