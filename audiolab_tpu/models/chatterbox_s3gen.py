"""Checkpoint-compatible Chatterbox S3Gen — speech tokens → waveform.

The reference's Chatterbox engine (layouts/tts.py:381) synthesises audio
from T3's 25 Hz speech tokens with ``s3gen.safetensors``
(S3Token2Wav in the published chatterbox-tts package, a CosyVoice2-style
stack, models/s3gen/{s3gen,flow,flow_matching,decoder,hifigan}.py):

  flow        CausalMaskedDiffWithXvec —
                input_embedding  Embedding(6561, 512)
                spk_embed_affine_layer   Linear(192 → 80)  (xvector)
                encoder          UpsampleConformerEncoder (6 rel-pos
                                 conformer layers, 2× nearest-upsample,
                                 4 more layers; 25 Hz tokens → 50 Hz)
                encoder_proj     Linear(512 → 80)
                decoder          CausalConditionalCFM: Euler ODE over a
                                 matcha-style causal UNet estimator with
                                 CFG (rate 0.7), cosine t-schedule,
                                 FIXED pre-drawn noise for determinism
  mel2wav     HiFTGenerator — NSF harmonic source + 2× ConvTranspose
              upsampling + ISTFT head (n_fft 16, hop 4), 24 kHz out

TPU design: every conv is an NTC lax.conv via the shared layer wrappers,
the conformer attention uses the skew-trick rel-shift (no gather), the
CFM loop is a ``lax.scan`` over the 10 Euler steps, and the ISTFT head
is the repo's matmul ISTFT (kernels/stft.py) — all static shapes.

Converter: utils/convert.convert_s3gen (fill from s3gen.safetensors);
parity: tests/test_s3gen_parity.py vs the seeded torch replica in
tests/torch_s3gen_replica.py which mirrors the published layout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.stft import istft, stft
from audiolab_tpu.models.codecs import Snake
from audiolab_tpu.models.layers import Conv1d, ConvTranspose1d, lrelu


# ---------------------------------------------------------------- configs

@dataclass(frozen=True)
class FlowConfig:
    token_vocab: int = 6561
    dim: int = 512
    mel_dim: int = 80
    xvector_dim: int = 192
    heads: int = 8
    ffn_dim: int = 2048
    n_layers: int = 6
    n_up_layers: int = 4
    pre_lookahead: int = 3
    token_mel_ratio: int = 2
    # estimator (ConditionalDecoder)
    est_channels: int = 256
    est_mid_blocks: int = 12
    est_n_blocks: int = 4
    est_heads: int = 8
    est_head_dim: int = 64
    n_timesteps: int = 10
    cfg_rate: float = 0.7
    sigma_min: float = 1e-6

    @property
    def est_in_channels(self) -> int:
        return 4 * self.mel_dim  # [x | mu | spks | cond]


@dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: tuple = (8, 5, 3)
    upsample_kernel_sizes: tuple = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop: int = 4
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    source_resblock_kernel_sizes: tuple = (7, 7, 11)
    source_resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    audio_limit: float = 0.99
    f0_cond_channels: int = 512

    @property
    def total_upsample(self) -> int:
        out = self.istft_hop
        for r in self.upsample_rates:
            out *= r
        return out


# ------------------------------------------------ conformer flow encoder

def espnet_rel_pos_emb(t: int, dim: int) -> np.ndarray:
    """ESPnet-style relative positional encoding, positions t-1 … -(t-1)
    (wenet EspnetRelPositionalEncoding): (1, 2t-1, dim)."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float32)
    inv = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                 * -(math.log(10000.0) / dim))
    ang = pos[:, None] * inv[None, :]
    pe = np.zeros((2 * t - 1, dim), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe[None]


class RelPosSelfAttention(nn.Module):
    """ESPnet RelPositionMultiHeadedAttention: content + position scores
    with pos_bias_u/v and the rel-shift skew."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, pos_emb):
        h, d = self.heads, self.dim // self.heads
        b, t, _ = x.shape
        q = nn.Dense(self.dim, name="linear_q")(x).reshape(b, t, h, d)
        k = nn.Dense(self.dim, name="linear_k")(x).reshape(b, t, h, d)
        v = nn.Dense(self.dim, name="linear_v")(x).reshape(b, t, h, d)
        p = nn.Dense(self.dim, use_bias=False, name="linear_pos")(
            pos_emb).reshape(1, -1, h, d)
        u = self.param("pos_bias_u", nn.initializers.zeros, (h, d))
        w = self.param("pos_bias_v", nn.initializers.zeros, (h, d))

        qk = jnp.einsum("bthd,bshd->bhts", q + u[None, None], k)
        qp = jnp.einsum("bthd,xmhd->bhtm", q + w[None, None], p)  # (b,h,t,2t-1)
        qp = _rel_shift(qp)
        scores = (qk + qp) / math.sqrt(d)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, self.dim)
        return nn.Dense(self.dim, name="linear_out")(o)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(b, h, t, 2t-1) relative logits -> (b, h, t, t) absolute: input
    column m is relative position (t-1-m), output[i, j] = x[i, t-1-i+j]
    (the wenet/espnet rel_shift, as a pad+reshape skew — no gathers)."""
    b, h, t, _ = x.shape
    y = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    y = y.reshape(b, h, 2 * t, t)
    y = y[:, :, 1:, :].reshape(b, h, t, 2 * t - 1)
    return y[:, :, :, :t]


class ConformerLayer(nn.Module):
    """normalize_before conformer layer without macaron/conv modules
    (wenet ConformerEncoderLayer as configured by the s3gen flow)."""

    dim: int
    heads: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x, pos_emb):
        h = RelPosSelfAttention(self.dim, self.heads, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm_mha")(x), pos_emb)
        x = x + h
        y = nn.LayerNorm(epsilon=1e-5, name="norm_ff")(x)
        y = nn.Dense(self.ffn_dim, name="ffn_w1")(y)
        y = nn.silu(y)
        y = nn.Dense(self.dim, name="ffn_w2")(y)
        return x + y


class LinearEmbed(nn.Module):
    """wenet LinearNoSubsampling: Linear + LayerNorm; the rel-pos encoding
    additionally scales x by sqrt(dim)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, name="out0")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="out1")(x)
        return x * math.sqrt(self.dim)


class PreLookaheadLayer(nn.Module):
    """conv1 looks `pre_lookahead` frames ahead, conv2 is causal; residual
    (upsample_encoder.py PreLookaheadLayer)."""

    dim: int
    pre_lookahead: int = 3

    @nn.compact
    def __call__(self, x):
        y = jnp.pad(x, ((0, 0), (0, self.pre_lookahead), (0, 0)))
        y = Conv1d(self.dim, self.pre_lookahead + 1, padding=0,
                   name="conv1")(y)
        y = lrelu(y, 0.01)  # torch F.leaky_relu default slope
        y = jnp.pad(y, ((0, 0), (2, 0), (0, 0)))
        y = Conv1d(self.dim, 3, padding=0, name="conv2")(y)
        return x + y


class Upsample1D(nn.Module):
    """2× nearest upsample + left-padded conv (upsample_encoder.Upsample1D
    with stride 2: pad (stride*2, 0), kernel stride*2+1)."""

    dim: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        y = jnp.repeat(x, self.stride, axis=1)
        y = jnp.pad(y, ((0, 0), (self.stride * 2, 0), (0, 0)))
        return Conv1d(self.dim, self.stride * 2 + 1, padding=0,
                      name="conv")(y)


class UpsampleConformerEncoder(nn.Module):
    cfg: FlowConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = LinearEmbed(c.dim, name="embed")(x)
        x = PreLookaheadLayer(c.dim, c.pre_lookahead,
                              name="pre_lookahead_layer")(x)
        pos = jnp.asarray(espnet_rel_pos_emb(x.shape[1], c.dim))
        for i in range(c.n_layers):
            x = ConformerLayer(c.dim, c.heads, c.ffn_dim,
                               name=f"encoders_{i}")(x, pos)
        x = Upsample1D(c.dim, 2, name="up_layer")(x)
        x = LinearEmbed(c.dim, name="up_embed")(x)
        pos = jnp.asarray(espnet_rel_pos_emb(x.shape[1], c.dim))
        for i in range(c.n_up_layers):
            x = ConformerLayer(c.dim, c.heads, c.ffn_dim,
                               name=f"up_encoders_{i}")(x, pos)
        return nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)


# --------------------------------------------------- CFM estimator (UNet)

class CausalConv1d(nn.Module):
    """Left-padded conv (decoder.py CausalConv1d): causal in time."""

    features: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (self.kernel - 1, 0), (0, 0)))
        return Conv1d(self.features, self.kernel, padding=0, name="conv")(x)


class CausalBlock1D(nn.Module):
    """CausalConv1d(3) + channel LayerNorm + Mish (cosyvoice decoder.py
    CausalBlock1D overrides matcha's GroupNorm with Transpose-wrapped
    nn.LayerNorm — over NTC that is a plain last-axis LayerNorm)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = CausalConv1d(self.features, 3, name="conv")(x)
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y)
        return y * jnp.tanh(jax.nn.softplus(y))


class CausalResnetBlock1D(nn.Module):
    """matcha ResnetBlock1D with causal convs: block1 -> +time -> block2,
    residual through a 1×1 conv."""

    features: int

    @nn.compact
    def __call__(self, x, t_emb):
        h = CausalBlock1D(self.features, name="block1")(x)
        h = h + nn.Dense(self.features, name="mlp")(
            t_emb * jnp.tanh(jax.nn.softplus(t_emb)))[:, None, :]
        h = CausalBlock1D(self.features, name="block2")(h)
        return h + Conv1d(self.features, 1, name="res_conv")(x)


class EstTransformerBlock(nn.Module):
    """matcha/diffusers BasicTransformerBlock (self-attn only, gelu FF).
    The attention inner dim is heads*head_dim (8*64=512), NOT the model
    dim (256) — diffusers Attention projects up then back down."""

    dim: int
    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        b, t, _ = h.shape
        hd = self.head_dim
        inner = self.heads * hd
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, name="to_v")(h)
        q = q.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)
        a = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd), axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3)
        x = x + nn.Dense(self.dim, name="to_out")(o.reshape(b, t, inner))
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        h = nn.Dense(self.dim * 4, name="ff_in")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="ff_out")(h)


class ConditionalDecoder(nn.Module):
    """matcha-style causal UNet velocity estimator (decoder.py
    ConditionalDecoder: channels (256,), 1 down level, 12 mid resnet+
    transformer pairs, 1 up level with skip, causal convs)."""

    cfg: FlowConfig

    @nn.compact
    def __call__(self, x, mu, spks, cond, t):
        c = self.cfg
        ch = c.est_channels
        # sinusoidal t-embedding (matcha SinusoidalPosEmb, scale 1000)
        half = c.est_in_channels // 2
        freqs = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
        ang = 1000.0 * t[:, None] * freqs[None]
        t_emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        t_emb = nn.Dense(ch * 4, name="time_mlp_1")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(ch * 4, name="time_mlp_2")(t_emb)

        spks_b = jnp.broadcast_to(spks[:, None, :],
                                  (x.shape[0], x.shape[1], spks.shape[-1]))
        h = jnp.concatenate([x, mu, spks_b, cond], axis=-1)

        h = CausalResnetBlock1D(ch, name="down_resnet")(h, t_emb)
        for i in range(c.est_n_blocks):
            h = EstTransformerBlock(ch, c.est_heads, c.est_head_dim,
                                    name=f"down_tb_{i}")(h)
        skip = h
        h = CausalConv1d(ch, 3, name="downsample")(h)

        for m in range(c.est_mid_blocks):
            h = CausalResnetBlock1D(ch, name=f"mid_resnet_{m}")(h, t_emb)
            for i in range(c.est_n_blocks):
                h = EstTransformerBlock(ch, c.est_heads, c.est_head_dim,
                                        name=f"mid_tb_{m}_{i}")(h)

        h = jnp.concatenate([h, skip], axis=-1)
        h = CausalResnetBlock1D(ch, name="up_resnet")(h, t_emb)
        for i in range(c.est_n_blocks):
            h = EstTransformerBlock(ch, c.est_heads, c.est_head_dim,
                                    name=f"up_tb_{i}")(h)
        h = CausalConv1d(ch, 3, name="upsample")(h)

        h = CausalBlock1D(ch, name="final_block")(h)
        return Conv1d(c.mel_dim, 1, name="final_proj")(h)


class CausalConditionalCFM(nn.Module):
    """Euler ODE over the estimator with CFG (flow_matching.py):
    t-span warped by 1 - cos(πt/2), uncond branch zeroes mu/spks/cond.
    The published module draws its noise ONCE at init (rand_noise) for
    deterministic generation — converted checkpoints carry it along."""

    cfg: FlowConfig

    def setup(self):
        self.estimator = ConditionalDecoder(self.cfg, name="estimator")

    def __call__(self, mu, spks, cond, noise, n_timesteps=None):
        c = self.cfg
        steps = n_timesteps or c.n_timesteps
        ts = 1.0 - jnp.cos(jnp.linspace(0.0, 1.0, steps + 1) * math.pi / 2)

        def euler_step(x, i):
            t = jnp.full((x.shape[0],), ts[i])
            dt = ts[i + 1] - ts[i]
            v_c = self.estimator(x, mu, spks, cond, t)
            v_u = self.estimator(x, jnp.zeros_like(mu), jnp.zeros_like(spks),
                                 jnp.zeros_like(cond), t)
            v = (1.0 + c.cfg_rate) * v_c - c.cfg_rate * v_u
            return x + dt * v, None

        if self.is_initializing():
            # materialize estimator params outside the scan trace
            _ = self.estimator(noise, mu, spks, cond,
                               jnp.zeros((noise.shape[0],)))
            return noise
        x, _ = jax.lax.scan(euler_step, noise, jnp.arange(steps))
        return x


class CausalMaskedDiffWithXvec(nn.Module):
    """flow.py: tokens + xvector + prompt mel -> mel (NTC)."""

    cfg: FlowConfig

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.token_vocab, c.dim,
                                        name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(c.mel_dim,
                                               name="spk_embed_affine_layer")
        self.encoder = UpsampleConformerEncoder(c, name="encoder")
        self.encoder_proj = nn.Dense(c.mel_dim, name="encoder_proj")
        self.decoder = CausalConditionalCFM(c, name="decoder")

    def __call__(self, tokens, xvector, prompt_mel, noise,
                 n_timesteps=None):
        """tokens (b, s) int [prompt_tokens ++ gen_tokens]; xvector
        (b, 192); prompt_mel (b, t_prompt, 80) conditions the start;
        noise (b, s*ratio, 80).  Returns the full mel — callers slice
        off the first t_prompt frames."""
        c = self.cfg
        spk = xvector / jnp.maximum(
            jnp.linalg.norm(xvector, axis=-1, keepdims=True), 1e-8)
        spk = self.spk_embed_affine_layer(spk)
        h = self.input_embedding(jnp.clip(tokens, 0, c.token_vocab - 1))
        h = self.encoder(h)
        mu = self.encoder_proj(h)
        t_total = mu.shape[1]
        t_prompt = prompt_mel.shape[1] if prompt_mel is not None else 0
        cond = jnp.zeros((mu.shape[0], t_total, c.mel_dim))
        if t_prompt:
            cond = cond.at[:, :t_prompt].set(prompt_mel)
        return self.decoder(mu, spk, cond, noise, n_timesteps)


# ----------------------------------------------------------------- HiFT

class HiFTResBlock(nn.Module):
    """cosyvoice hifigan ResBlock: Snake-activated convs1 (dilated) /
    convs2 pairs, per-channel alpha (activations1/activations2)."""

    channels: int
    kernel: int
    dilations: tuple

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = Snake(name=f"act1_{i}")(x)
            h = Conv1d(self.channels, self.kernel, dilation=d,
                       name=f"convs1_{i}")(h)
            h = Snake(name=f"act2_{i}")(h)
            h = Conv1d(self.channels, self.kernel, name=f"convs2_{i}")(h)
            x = x + h
        return x


class ConvRNNF0Predictor(nn.Module):
    """5 weight-normed convs + ELU, linear classifier, |.|
    (f0_predictor.py)."""

    cond_channels: int = 512

    @nn.compact
    def __call__(self, mel):
        x = mel
        for i in range(5):
            x = Conv1d(self.cond_channels, 3, name=f"condnet_{i}")(x)
            x = jax.nn.elu(x)
        return jnp.abs(nn.Dense(1, name="classifier")(x)[..., 0])


class HiFTGenerator(nn.Module):
    """hifigan.py HiFTGenerator: mel (b, t, 80) -> wav (b, t*480)."""

    cfg: HiFTConfig = HiFTConfig()

    def setup(self):
        c = self.cfg
        self.f0_predictor = ConvRNNF0Predictor(c.f0_cond_channels,
                                               name="f0_predictor")
        self.m_source_linear = nn.Dense(1, name="m_source_linear")
        self.conv_pre = Conv1d(c.base_channels, 7, name="conv_pre")
        ups, source_downs, source_res, res = [], [], [], []
        ch = c.base_channels
        # source-frame (hop-4 STFT) rate relative to x after the i-th
        # upsample: prod of the remaining upsample rates — 15, 3, 1 for
        # (8, 5, 3) (generator.py downsample_cum_rates[::-1])
        downs = [int(np.prod(c.upsample_rates[i + 1:]))
                 for i in range(len(c.upsample_rates))]
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            ch //= 2
            ups.append(ConvTranspose1d(ch, k, u, name=f"ups_{i}"))
            if downs[i] == 1:
                sd = Conv1d(ch, 1, stride=1, padding=0,
                            name=f"source_downs_{i}")
            else:
                sd = Conv1d(ch, downs[i] * 2, stride=downs[i],
                            padding=downs[i] // 2, name=f"source_downs_{i}")
            source_downs.append(sd)
            source_res.append(HiFTResBlock(
                ch, c.source_resblock_kernel_sizes[i],
                tuple(c.source_resblock_dilations[i]),
                name=f"source_resblocks_{i}"))
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilations)):
                res.append(HiFTResBlock(ch, rk, tuple(rd),
                                        name=f"resblocks_{i}_{j}"))
        self.ups = ups
        self.source_downs = source_downs
        self.source_resblocks = source_res
        self.resblocks = res
        self.conv_post = Conv1d(c.istft_n_fft + 2, 7, name="conv_post")

    def source_stft(self, source):
        """(b, n) NSF source -> (b, frames, n_fft+2) [real | imag]."""
        c = self.cfg
        r, i = stft(source, n_fft=c.istft_n_fft, hop=c.istft_hop,
                    win_length=c.istft_n_fft, window="hann", center=True)
        return jnp.concatenate([r, i], axis=-1)

    def decode(self, mel, s_stft):
        c = self.cfg
        x = self.conv_pre(mel)
        n = len(c.resblock_kernel_sizes)
        for i in range(len(self.ups)):
            x = lrelu(x, 0.1)
            x = self.ups[i](x)
            if i == len(self.ups) - 1:
                x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)), mode="reflect")
            si = self.source_downs[i](s_stft)
            si = self.source_resblocks[i](si)
            # stride/padding rounding can leave si one frame long/short
            si = si[:, :x.shape[1]]
            if si.shape[1] < x.shape[1]:
                si = jnp.pad(si, ((0, 0), (0, x.shape[1] - si.shape[1]),
                                  (0, 0)))
            x = x + si
            xs = 0.0
            for j in range(n):
                xs = xs + self.resblocks[i * n + j](x)
            x = xs / n
        x = lrelu(x, 0.01)
        x = self.conv_post(x)
        nb = c.istft_n_fft // 2 + 1
        magnitude = jnp.exp(x[..., :nb])
        phase = jnp.sin(x[..., nb:])  # upstream: sin then cos/sin split
        real = magnitude * jnp.cos(phase)
        imag = magnitude * jnp.sin(phase)
        wav = istft(real, imag, n_fft=c.istft_n_fft, hop=c.istft_hop,
                    win_length=c.istft_n_fft, window="hann", center=True)
        return jnp.clip(wav, -c.audio_limit, c.audio_limit)

    def nsf_source(self, f0_frames, rng):
        """f0 per mel frame -> harmonic-mixed source at sample rate
        (SourceModuleHnNSF + SineGen)."""
        c = self.cfg
        f0 = jnp.repeat(f0_frames, c.total_upsample, axis=1)  # (b, n)
        harmonics = jnp.arange(1, c.nb_harmonics + 2, dtype=jnp.float32)
        rad = (f0[:, :, None] * harmonics[None, None]) / c.sampling_rate
        k_ini = jax.random.uniform(rng, (f0.shape[0], 1, c.nb_harmonics + 1))
        # SineGen zeroes the fundamental's initial phase (rand_ini[:, 0]=0)
        k_ini = k_ini.at[:, :, 0].set(0.0)
        phase = 2 * math.pi * (jnp.cumsum(rad % 1.0, axis=1) + k_ini)
        uv = (f0 > c.nsf_voiced_threshold).astype(jnp.float32)[:, :, None]
        noise_amp = uv * c.nsf_sigma + (1 - uv) * c.nsf_alpha / 3
        noise = noise_amp * jax.random.normal(
            jax.random.fold_in(rng, 1), phase.shape)
        sines = uv * jnp.sin(phase) * c.nsf_alpha + noise
        merge = jnp.tanh(self.m_source_linear(sines))
        return merge[..., 0]

    def __call__(self, mel, rng):
        f0 = self.f0_predictor(mel)
        source = self.nsf_source(f0, rng)
        return self.decode(mel, self.source_stft(source))


def s3gen_ref_mel(wav24k) -> jnp.ndarray:
    """CosyVoice/Chatterbox mel_extractor for the flow's prompt_feat
    (matcha mel_spectrogram: 24 kHz, n_fft 1920, hop 480, win 1920,
    80 slaney mels fmin 0 fmax 8000, manual (n_fft-hop)/2 reflect pad +
    center=False, log clamp 1e-5): (b, n) -> (b, t, 80)."""
    from audiolab_tpu.kernels.mel import log_mel, mel_spectrogram

    x = jnp.asarray(wav24k, jnp.float32)
    pad = (1920 - 480) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    mel = mel_spectrogram(x, sr=24000, n_fft=1920, hop=480,
                          win_length=1920, n_mels=80, fmin=0.0,
                          fmax=8000.0, htk=False, norm="slaney",
                          power=1.0, center=False)
    return log_mel(mel)


# ------------------------------------------------------------- assembly

class S3Token2Wav:
    """flow + mel2wav with the published checkpoint's fixed CFM noise."""

    def __init__(self, flow_cfg: FlowConfig, flow_params: dict,
                 hift_cfg: HiFTConfig, hift_params: dict,
                 rand_noise: np.ndarray | None = None):
        self.flow_cfg, self.hift_cfg = flow_cfg, hift_cfg
        self.flow = CausalMaskedDiffWithXvec(flow_cfg)
        self.hift = HiFTGenerator(hift_cfg)
        self.flow_params = flow_params
        self.hift_params = hift_params
        # flow_matching.py: rand_noise = randn(1, 80, 50*300), sliced per
        # utterance — carried by the checkpoint loader for determinism
        self.rand_noise = (np.asarray(rand_noise) if rand_noise is not None
                           else np.random.default_rng(0).standard_normal(
                               (1, 15000, flow_cfg.mel_dim)).astype(
                                   np.float32))

    def tokens_to_wav(self, tokens, xvector, prompt_mel=None, seed: int = 0):
        c = self.flow_cfg
        t_mel = tokens.shape[1] * c.token_mel_ratio
        noise = jnp.asarray(self.rand_noise[:, :t_mel])
        noise = jnp.broadcast_to(noise, (tokens.shape[0],) + noise.shape[1:])
        mel = self.flow.apply(
            {"params": self.flow_params}, tokens, xvector,
            prompt_mel, noise)
        if prompt_mel is not None:
            mel = mel[:, prompt_mel.shape[1]:]
        wav = self.hift.apply({"params": self.hift_params}, mel,
                              jax.random.PRNGKey(seed))
        return wav
