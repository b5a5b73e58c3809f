"""XTTS-class voice-cloning TTS (reference: Coqui XTTS-v2 engine,
handlers/tts.py:16-126 and modules/cloning/tts.py:27-192).

The reference's Coqui engine is: reference-audio conditioning -> GPT-style
autoregressive transformer over VQ audio codes -> GAN vocoder.  Same stack
here, built TPU-first from the shared blocks:

  ConditioningEncoder  mel of the reference clip -> learned-query cross
                       attention -> L conditioning latents + speaker vector
  XttsGPT              decoder-only LM (models/lm.py TransformerLM with a
                       donated-KV lax.scan decode) over [cond | text |
                       audio-codes]; one token range per modality
  Vocoder              BigVGAN on code embeddings + speaker conditioning

This is a capability-parity engine (train/convert to fill weights); the
interfaces mirror the reference: clone(wav) -> voice, tts(text, voice).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.mel import mel_spectrogram
from audiolab_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from audiolab_tpu.models.lm import LMConfig, TransformerLM, decode, init_cache


@dataclass(frozen=True)
class XTTSConfig:
    text_vocab: int = 256           # byte-level text tokens
    n_codes: int = 1024             # VQ audio codebook
    dim: int = 256
    n_layers: int = 4
    n_heads: int = 4
    cond_latents: int = 8           # conditioning prefix length
    mel_bins: int = 80
    sr: int = 24000
    max_seq_len: int = 2048
    dtype: str = "float32"

    @property
    def audio_start(self) -> int:   # BOS for the audio stream
        return self.n_codes

    @property
    def audio_stop(self) -> int:
        return self.n_codes + 1

    @property
    def audio_vocab(self) -> int:
        return self.n_codes + 2

    def lm(self) -> LMConfig:
        return LMConfig(
            vocab_size=self.audio_vocab, dim=self.dim,
            n_layers=self.n_layers, n_heads=self.n_heads,
            n_kv_heads=self.n_heads, ffn_dim=self.dim * 4,
            max_seq_len=self.max_seq_len, dtype=self.dtype,
        )


class ConditioningEncoder(nn.Module):
    """Reference mel -> (cond latents (b, L, dim), speaker vector (b, dim)).
    Conv downsample + learned-query cross attention (the perceiver-resampler
    role of XTTS's conditioning encoder)."""

    cfg: XTTSConfig

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        x = nn.Conv(c.dim, (3,), strides=(2,), name="conv1")(mel)
        x = nn.gelu(x)
        x = nn.Conv(c.dim, (3,), strides=(2,), name="conv2")(x)
        x = nn.gelu(x)
        x = nn.LayerNorm(name="ln")(x)
        q = self.param("queries", nn.initializers.normal(0.02),
                       (c.cond_latents, c.dim))
        queries = jnp.broadcast_to(q, (x.shape[0],) + q.shape)
        lat = nn.MultiHeadDotProductAttention(
            num_heads=c.n_heads, name="xattn")(queries, x, x)
        lat = lat + nn.Dense(c.dim, name="ff")(nn.gelu(lat))
        spk = x.mean(axis=1)
        spk = spk / jnp.maximum(jnp.linalg.norm(spk, axis=-1, keepdims=True),
                                1e-6)
        return lat, spk


class XttsGPT(nn.Module):
    """Decoder-only LM over [cond latents | text | audio codes]."""

    cfg: XTTSConfig

    def setup(self):
        c = self.cfg
        self.text_emb = nn.Embed(c.text_vocab, c.dim, name="text_emb")
        self.audio_emb = nn.Embed(c.audio_vocab, c.dim, name="audio_emb")
        self.lm = TransformerLM(c.lm(), embed_input=False, with_head=False,
                                name="lm")
        self.audio_head = nn.Dense(c.audio_vocab, use_bias=False,
                                   name="audio_head")

    def prefill(self, cond, text_ids, caches):
        """cond (b, L, dim), text (b, s) -> logits for the first audio token."""
        c = self.cfg
        bos = self.audio_emb(
            jnp.full((text_ids.shape[0], 1), c.audio_start, jnp.int32))
        x = jnp.concatenate([cond, self.text_emb(text_ids), bos], axis=1)
        h, caches = self.lm(x, pos=jnp.arange(x.shape[1]), caches=caches)
        return self.audio_head(h[:, -1:].astype(jnp.float32)), caches

    def step(self, tokens, pos, caches):
        """tokens (b, 1) audio ids -> next-token logits."""
        x = self.audio_emb(tokens)
        h, caches = self.lm(x, pos=pos, caches=caches)
        return self.audio_head(h.astype(jnp.float32)), caches


class XttsVocoder(nn.Module):
    """Audio codes -> waveform: code embeddings + speaker cond -> BigVGAN."""

    cfg: XTTSConfig

    @nn.compact
    def __call__(self, codes, spk):
        c = self.cfg
        z = nn.Embed(c.n_codes, c.mel_bins, name="code_emb")(codes)
        g = nn.Dense(c.mel_bins, name="spk_proj")(spk)
        vcfg = BigVGANConfig(
            n_mels=c.mel_bins, upsample_rates=(8, 8, 4),
            upsample_kernel_sizes=(16, 16, 8), upsample_initial_channel=256)
        return BigVGAN(vcfg, name="bigvgan")(z + g[:, None, :])


class XTTS:
    """Bundles the three modules + jitted generate (the engine core)."""

    def __init__(self, cfg: XTTSConfig, params: dict):
        self.cfg = cfg
        self.cond_enc = ConditioningEncoder(cfg)
        self.gpt = XttsGPT(cfg)
        self.vocoder = XttsVocoder(cfg)
        self.params = params

    # ---------- construction ----------

    @classmethod
    def random_init(cls, cfg: XTTSConfig, seed: int = 0) -> "XTTS":
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        cond_enc, gpt, voc = (ConditioningEncoder(cfg), XttsGPT(cfg),
                              XttsVocoder(cfg))
        mel = jnp.zeros((1, 16, cfg.mel_bins))
        cond = jnp.zeros((1, cfg.cond_latents, cfg.dim))
        caches = init_cache(cfg.lm(), 1, cfg.max_seq_len)
        params = {
            "cond": cond_enc.init(k1, mel)["params"],
            "gpt": gpt.init(k2, cond, jnp.zeros((1, 4), jnp.int32), caches,
                            method=XttsGPT.prefill)["params"],
            "vocoder": voc.init(k3, jnp.zeros((1, 8), jnp.int32),
                                jnp.zeros((1, cfg.dim)))["params"],
        }
        return cls(cfg, params)

    # ---------- inference ----------

    def embed_reference(self, wav: np.ndarray, sr: int):
        """Reference clip -> (cond latents, speaker vector)."""
        mel = mel_spectrogram(jnp.asarray(wav, jnp.float32)[None], sr=sr,
                              n_fft=1024, hop=256, n_mels=self.cfg.mel_bins)
        mel = jnp.log(jnp.clip(mel, 1e-5, None))
        return self.cond_enc.apply({"params": self.params["cond"]}, mel)

    @partial(jax.jit, static_argnums=(0, 4))
    def _generate_codes(self, params, cond, text_ids, steps, rng):
        c = self.cfg
        caches = init_cache(c.lm(), text_ids.shape[0], c.max_seq_len)
        logits, caches = self.gpt.apply(
            {"params": params}, cond, text_ids, caches,
            method=XttsGPT.prefill)
        first = jnp.argmax(logits[:, -1], axis=-1)
        start = cond.shape[1] + text_ids.shape[1] + 1

        def apply_fn(p, toks, pos, cch):
            return self.gpt.apply({"params": p}, toks, pos, cch,
                                  method=XttsGPT.step)

        toks, _ = decode(apply_fn, params, caches, first, start, steps, rng,
                         temperature=0.75, top_k=50,
                         stop_token=c.audio_stop)
        return toks

    def tts(self, text: str, ref_wav: np.ndarray, ref_sr: int,
            max_codes: int = 256, seed: int = 0) -> tuple[np.ndarray, int]:
        c = self.cfg
        cond, spk = self.embed_reference(ref_wav, ref_sr)
        ids = jnp.asarray([min(b, c.text_vocab - 1)
                           for b in text.encode("utf-8")], jnp.int32)[None]
        codes = self._generate_codes(self.params["gpt"], cond, ids,
                                     max_codes, jax.random.PRNGKey(seed))
        # trim at stop, clamp BOS/STOP ids out of the vocoder range
        codes = jnp.clip(codes, 0, c.n_codes - 1)
        wav = self.vocoder.apply({"params": self.params["vocoder"]},
                                 codes, spk)
        return np.asarray(wav[0]), c.sr


# ------------------------------------------- checkpoint HiFi-GAN decoder

class _LReLUResBlock(nn.Module):
    """coqui ResBlock1 (vocoder/models/hifigan_generator.py:21-101):
    [lrelu(0.1) -> dilated conv -> lrelu(0.1) -> conv] x3 with residuals."""

    ch: int
    kernel: int
    dilations: tuple

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, 0.1)
            h = nn.Conv(self.ch, (self.kernel,), kernel_dilation=(d,),
                        padding="SAME", name=f"c1_{j}")(h)
            h = nn.leaky_relu(h, 0.1)
            h = nn.Conv(self.ch, (self.kernel,), padding="SAME",
                        name=f"c2_{j}")(h)
            x = x + h
        return x


class XttsHifiganDecoder(nn.Module):
    """Checkpoint-layout-faithful XTTS-v2 waveform decoder
    (TTS/tts/layers/xtts/hifigan_decoder.py:12-66 -> vocoder HifiganGenerator
    :165-289): GPT latents (b, t, 1024) + speaker d-vector (b, 512) ->
    24 kHz waveform.  Quirks reproduced exactly: conv_pre/conv_post carry
    NO weight norm (stripped at init), conv_post has no bias, the global
    d-vector enters both through cond_layer at the stem AND through a 1x1
    conds[i] at every upsample stage, and the final leaky_relu uses the
    torch DEFAULT slope 0.01 (not 0.1).  Fill from the published model.pth
    via utils/convert.convert_xtts_hifigan."""

    input_dim: int = 1024
    cond_dim: int = 512
    upsample_rates: tuple = (8, 8, 2, 2)
    upsample_kernels: tuple = (16, 16, 4, 4)
    resblock_kernels: tuple = (3, 7, 11)
    resblock_dilations: tuple = ((1, 3, 5),) * 3
    initial_channel: int = 512

    @nn.compact
    def __call__(self, latents, g):  # (b, t, input_dim), (b, cond_dim)
        x = nn.Conv(self.initial_channel, (7,), padding="SAME",
                    name="conv_pre")(latents)
        x = x + nn.Dense(self.initial_channel, name="cond_layer")(g)[:, None]
        ch = self.initial_channel
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernels)):
            ch //= 2
            x = nn.leaky_relu(x, 0.1)
            # torch ConvT p=(k-u)//2 with k=2u == flax SAME + flipped kernel
            x = nn.ConvTranspose(ch, (k,), strides=(u,), padding="SAME",
                                 name=f"up_{i}")(x)
            x = x + nn.Dense(ch, name=f"cond_{i}")(g)[:, None]
            xs = 0.0
            for j, (rk, rd) in enumerate(zip(self.resblock_kernels,
                                             self.resblock_dilations)):
                xs = xs + _LReLUResBlock(ch, rk, tuple(rd),
                                         name=f"res_{i}_{j}")(x)
            x = xs / len(self.resblock_kernels)
        x = nn.leaky_relu(x, 0.01)  # F.leaky_relu default, NOT 0.1
        x = nn.Conv(1, (7,), padding="SAME", use_bias=False,
                    name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


# --------------------------------------- checkpoint ResNet speaker encoder

class _SELayer(nn.Module):
    """Squeeze-excitation (encoder/models/resnet.py:8-23)."""

    ch: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):  # (b, h, w, c)
        y = jnp.mean(x, axis=(1, 2))
        y = nn.relu(nn.Dense(self.ch // self.reduction, name="fc0")(y))
        y = jax.nn.sigmoid(nn.Dense(self.ch, name="fc1")(y))
        return x * y[:, None, None]


class _SEBasicBlock(nn.Module):
    """resnet.py:26-56 — NOTE the upstream op order conv1 -> relu -> bn1
    (bn after relu), reproduced exactly."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        res = x
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv1")(x)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=True, name="bn1")(h)
        h = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=True, name="bn2")(h)
        h = _SELayer(self.planes, name="se")(h)
        if self.has_downsample:
            res = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                          use_bias=False, name="down_conv")(x)
            res = nn.BatchNorm(use_running_average=True, name="down_bn")(res)
        return nn.relu(h + res)


class XttsSpeakerEncoder(nn.Module):
    """Checkpoint-layout-faithful H/ASP ResNet34-SE d-vector network
    (TTS/encoder/models/resnet.py:59-200, instantiated by
    hifigan_decoder.py:60-66 with input_dim=64, proj_dim=512,
    log_input=True).  Input: mel-power frames (b, t, 64) from
    ``speaker_mel`` below; output: (b, 512) d-vector (optionally L2).
    Conversion: utils/convert.convert_xtts_speaker."""

    input_dim: int = 64
    proj_dim: int = 512
    layers: tuple = (3, 4, 6, 3)
    num_filters: tuple = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, mel, l2_norm: bool = False):
        x = jnp.log(mel + 1e-6)  # log_input=True in the XTTS instance
        # InstanceNorm1d over time, per mel channel (no affine, eps 1e-5)
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        x = (x - mu) / jnp.sqrt(var + 1e-5)
        x = x.transpose(0, 2, 1)[..., None]      # (b, mel, t, 1) == NHWC
        x = nn.Conv(self.num_filters[0], (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        inplanes = self.num_filters[0]
        for li, (planes, blocks) in enumerate(zip(self.num_filters,
                                                  self.layers)):
            stride = 1 if li == 0 else 2
            for j in range(blocks):
                s = stride if j == 0 else 1
                down = j == 0 and (s != 1 or inplanes != planes)
                x = _SEBasicBlock(planes, s, down,
                                  name=f"layer{li + 1}_{j}")(x)
                inplanes = planes
        # (b, h=mel/8, w, c) -> (b, w, c*h) with torch's c-major flatten
        b, hh, ww, cc = x.shape
        x = x.transpose(0, 2, 3, 1).reshape(b, ww, cc * hh)
        # attentive statistics pooling (ASP)
        w = nn.Dense(128, name="att0")(x)
        w = nn.BatchNorm(use_running_average=True, name="att_bn")(nn.relu(w))
        w = jax.nn.softmax(nn.Dense(cc * hh, name="att1")(w), axis=1)
        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(x * x * w, axis=1) - mu * mu,
                               1e-5, None))
        out = nn.Dense(self.proj_dim, name="fc")(
            jnp.concatenate([mu, sg], axis=-1))
        if l2_norm:
            out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out


def speaker_mel(wav16k: jnp.ndarray) -> jnp.ndarray:
    """XTTS speaker-encoder front end (base_encoder.py:39-65): reflect-pad
    preemphasis 0.97, then a torchaudio-default mel POWER spectrogram
    (fft 512, win 400 hamming, hop 160, 64 htk mels, norm None,
    center=True).  (b, t) 16 kHz -> (b, frames, 64)."""
    from audiolab_tpu.kernels.mel import mel_filterbank
    from audiolab_tpu.kernels.stft import spectrogram

    x = jnp.pad(wav16k, ((0, 0), (1, 0)), mode="reflect")
    x = x[:, 1:] - 0.97 * x[:, :-1]
    spec = spectrogram(x, n_fft=512, hop=160, win_length=400,
                       window="hamming", center=True, power=2.0)
    fb = jnp.asarray(mel_filterbank(16000, 512, 64, 0.0, 8000.0,
                                    htk=True, norm=None))
    return spec @ fb


# ----------------------------------------------- checkpoint GPT-2 backbone

class _Gpt2Block(nn.Module):
    """transformers GPT2Block: pre-LN (eps 1e-5) -> fused-qkv causal
    attention -> residual -> pre-LN -> gelu_new MLP -> residual."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        dk = d // self.heads
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * d, name="c_attn")(h)
        # GPT-2 column layout: [q | k | v] each d wide, THEN head-split
        q, k, v = (a.reshape(b, t, self.heads, dk)
                   for a in jnp.split(qkv, 3, axis=-1))
        logits = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(
            jnp.asarray(dk, x.dtype))
        mask = jnp.tril(jnp.ones((t, t), bool))
        logits = jnp.where(mask, logits, jnp.finfo(x.dtype).min)
        att = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, t, d)
        x = x + nn.Dense(d, name="c_proj_attn")(o)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * d, name="c_fc")(h)
        h = nn.gelu(h, approximate=True)  # GPT-2 gelu_new
        return x + nn.Dense(d, name="c_proj_mlp")(h)


class XttsGPT2(nn.Module):
    """Checkpoint-layout-faithful XTTS-v2 autoregressive core
    (TTS/tts/layers/xtts/gpt.py:20-250 around a transformers GPT2Model
    whose wpe/wte are nulled): text/mel token embeddings + per-stream
    learned positions -> GPT-2 stack -> final_norm -> text/mel heads.
    Conversion: utils/convert.convert_xtts_gpt.  The conditioning prefix
    (perceiver resampler output) is passed pre-embedded as ``cond``."""

    layers: int = 30
    dim: int = 1024
    heads: int = 16
    n_text: int = 6681
    n_audio: int = 1026
    max_text: int = 402
    max_mel: int = 605
    # AR generation wraps text ids in these (gpt.py:23-24 defaults;
    # gpt.py:486-487 pads with them before compute_embeddings)
    start_text: int = 261
    stop_text: int = 0

    @nn.compact
    def __call__(self, text_ids, mel_ids, cond=None,
                 return_latents: bool = False):
        """(b, tt), (b, tm), cond (b, tc, dim) -> (text_logits, mel_logits)
        teacher-forced over the [cond | text | mel] sequence."""
        te = nn.Embed(self.n_text, self.dim, name="text_embedding")(text_ids)
        tp = self.param("text_pos", nn.initializers.normal(0.02),
                        (self.max_text, self.dim))
        te = te + tp[: te.shape[1]]
        me = nn.Embed(self.n_audio, self.dim, name="mel_embedding")(mel_ids)
        mp = self.param("mel_pos", nn.initializers.normal(0.02),
                        (self.max_mel, self.dim))
        me = me + mp[: me.shape[1]]
        parts = ([] if cond is None else [cond]) + [te, me]
        x = jnp.concatenate(parts, axis=1)
        for i in range(self.layers):
            x = _Gpt2Block(self.dim, self.heads, name=f"h_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_f")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="final_norm")(x)
        tc = 0 if cond is None else cond.shape[1]
        tt = te.shape[1]
        text_h = x[:, tc : tc + tt]
        mel_h = x[:, tc + tt :]
        out = (nn.Dense(self.n_text, name="text_head")(text_h),
               nn.Dense(self.n_audio, name="mel_head")(mel_h))
        if return_latents:
            # the v2 inference path feeds these into XttsHifiganDecoder
            # (gpt.py:211-222: final_norm'd hidden states at mel positions)
            return out + (mel_h,)
        return out


# ------------------------------------- checkpoint conditioning encoders

class _TortoiseAttnBlock(nn.Module):
    """tortoise AttentionBlock (arch_utils.py:82-135) with the XTTS
    defaults: GroupNorm32 -> fused per-head-[q|k|v] 1x1 qkv -> softmax
    attention -> 1x1 proj, residual from the NORMALIZED input
    (tortoise_norm=False — the upstream quirk, reproduced)."""

    heads: int

    @nn.compact
    def __call__(self, x):  # (b, t, c)
        b, t, c = x.shape
        groups = 32 if c > 64 else (16 if c > 16 else 8)
        while c % groups:
            groups //= 2
        xn = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(3 * c, name="qkv")(xn)
        ch = c // self.heads
        qkv = qkv.reshape(b, t, self.heads, 3 * ch)
        q, k, v = (qkv[..., :ch], qkv[..., ch : 2 * ch], qkv[..., 2 * ch :])
        acc = jnp.promote_types(x.dtype, jnp.float32)
        logits = jnp.einsum("bthd,bshd->bhts", q.astype(acc),
                            k.astype(acc)) / jnp.sqrt(
            jnp.asarray(ch, acc))
        att = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", att, v.astype(acc))
        o = o.reshape(b, t, c).astype(x.dtype)
        return xn + nn.Dense(c, name="proj_out")(o)


class XttsConditioningEncoder(nn.Module):
    """gpt.py ConditioningEncoder (autoregressive.py:171-195): 1x1 lift of
    80-mel frames to model_dim + 6 tortoise attention blocks.
    Conversion: utils/convert.convert_xtts_conditioner."""

    dim: int = 1024
    heads: int = 16
    blocks: int = 6

    @nn.compact
    def __call__(self, mel):  # (b, t, 80) -> (b, t, dim)
        x = nn.Dense(self.dim, name="init")(mel)
        for i in range(self.blocks):
            x = _TortoiseAttnBlock(self.heads, name=f"attn_{i}")(x)
        return x


class XttsPerceiverResampler(nn.Module):
    """XTTS-v2 conditioning perceiver (perceiver_encoder.py:204-274,
    instantiated at gpt.py:103-112): 32 learned latents cross-attend to
    the conditioning sequence WITH the latents prepended to the context
    (cross_attn_include_queries=True), GEGLU feed-forward (inner
    dim*4*2/3), final gamma-RMSNorm.  No biases anywhere in attention."""

    dim: int = 1024
    depth: int = 2
    num_latents: int = 32
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):  # (b, t, dim) -> (b, num_latents, dim)
        b = x.shape[0]
        lat0 = self.param("latents", nn.initializers.normal(0.02),
                          (self.num_latents, self.dim))
        lat = jnp.broadcast_to(lat0[None], (b,) + lat0.shape)
        inner = self.heads * self.dim_head
        ff_inner = int(self.dim * 4 * 2 / 3)
        acc = jnp.promote_types(x.dtype, jnp.float32)
        for i in range(self.depth):
            ctx = jnp.concatenate([lat, x], axis=1)
            q = nn.Dense(inner, use_bias=False, name=f"q_{i}")(lat)
            kv = nn.Dense(2 * inner, use_bias=False, name=f"kv_{i}")(ctx)
            k, v = jnp.split(kv, 2, axis=-1)
            q = _split_heads_p(q, self.heads)
            k = _split_heads_p(k, self.heads)
            v = _split_heads_p(v, self.heads)
            logits = jnp.einsum("bhid,bhjd->bhij", q.astype(acc),
                                k.astype(acc)) / jnp.sqrt(
                jnp.asarray(self.dim_head, acc))
            att = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhij,bhjd->bhid", att, v.astype(acc))
            o = o.transpose(0, 2, 1, 3).reshape(b, -1, inner).astype(x.dtype)
            lat = lat + nn.Dense(self.dim, use_bias=False,
                                 name=f"out_{i}")(o)
            h = nn.Dense(2 * ff_inner, name=f"ff0_{i}")(lat)
            val, gate = jnp.split(h, 2, axis=-1)
            h = val * nn.gelu(gate, approximate=False)   # GEGLU, exact gelu
            lat = lat + nn.Dense(self.dim, name=f"ff1_{i}")(h)
        gamma = self.param("norm_gamma", nn.initializers.ones, (self.dim,))
        n = jnp.linalg.norm(lat, axis=-1, keepdims=True)
        return lat / jnp.maximum(n, 1e-12) * jnp.sqrt(
            jnp.asarray(self.dim, lat.dtype)) * gamma


def _split_heads_p(a, heads):
    b, t, _ = a.shape
    return a.reshape(b, t, heads, -1).transpose(0, 2, 1, 3)


def xtts_gpt2_generate(model: XttsGPT2, params, text_ids, cond,
                       max_steps: int, rng=None, temperature: float = 0.85,
                       top_k: int = 50, start_audio: int | None = None,
                       stop_audio: int | None = None):
    """AR mel-code generation for the converted XttsGPT2 + the final-norm
    latents the HiFi decoder consumes (gpt_inference.py role).

    Causal masking makes not-yet-generated (padded) positions invisible to
    earlier logits, so each scan step re-runs ONE fixed-shape forward over
    the padded sequence — a single compiled graph, no KV-cache state
    threading.  O(steps x forward); switch to a cached decode if profiles
    demand it.

    Text ids are wrapped in the checkpoint's [START]/[STOP] text tokens
    before decode, matching gpt.py:486-487 — the AR model was trained on
    wrapped sequences, so feeding raw ids conditions it off-distribution.

    Returns (codes (b, max_steps), latents (b, max_steps, dim),
    lengths (b,)) where ``lengths`` is the first-EOS step per batch row
    (== max_steps when no EOS fired); latent positions past the EOS are
    zero-masked so the HiFi decoder does not vocode post-stop junk
    (upstream trims generation at the stop token)."""
    start_audio = model.n_audio - 2 if start_audio is None else start_audio
    stop_audio = model.n_audio - 1 if stop_audio is None else stop_audio
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b = text_ids.shape[0]
    # wrap in [START]/[STOP] text tokens (clamped for tiny test vocabs)
    start_t = min(int(model.start_text), model.n_text - 1)
    stop_t = min(int(model.stop_text), model.n_text - 1)
    text_ids = jnp.concatenate(
        [jnp.full((b, 1), start_t, text_ids.dtype), text_ids,
         jnp.full((b, 1), stop_t, text_ids.dtype)], axis=1)
    mel0 = jnp.full((b, max_steps + 1), stop_audio, jnp.int32)
    mel0 = mel0.at[:, 0].set(start_audio)

    @jax.jit
    def run(params, text_ids, cond, rng):
        def fwd(mel):
            _, lm = model.apply({"params": params}, text_ids, mel, cond)
            return lm

        def body(carry, i):
            mel, rng, done = carry
            logits = fwd(mel)[:, i] / jnp.maximum(temperature, 1e-6)
            k_eff = min(top_k, logits.shape[-1])
            kth = jax.lax.top_k(logits, k_eff)[0][:, -1:]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
            rng, key = jax.random.split(rng)
            tok = jax.random.categorical(key, logits, axis=-1)
            tok = jnp.where(done, stop_audio, tok)
            done = done | (tok == stop_audio)
            mel = mel.at[:, i + 1].set(tok.astype(jnp.int32))
            return (mel, rng, done), None

        (mel, _, _), _ = jax.lax.scan(
            body, (mel0, rng, jnp.zeros((b,), bool)), jnp.arange(max_steps))
        _, _, latents = model.apply({"params": params}, text_ids, mel, cond,
                                    return_latents=True)
        codes, latents = mel[:, 1:], latents[:, 1:]
        # first EOS per row; zero latents past it so post-stop frames are
        # silent rather than vocoded junk
        is_eos = codes == stop_audio
        lengths = jnp.where(is_eos.any(axis=1),
                            jnp.argmax(is_eos, axis=1), max_steps)
        keep = jnp.arange(max_steps)[None, :] < lengths[:, None]
        latents = jnp.where(keep[..., None], latents, 0.0)
        return codes, latents, lengths

    return run(params, text_ids, cond, rng)


# --------------------------------------------------- checkpoint DVAE

class _DVAEResBlock(nn.Module):
    """dvae.py ResBlock: conv3-relu-conv3-relu-conv1 + residual."""

    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.ch, (3,), padding=((1, 1),),
                            name="c0")(x))
        h = nn.relu(nn.Conv(self.ch, (3,), padding=((1, 1),),
                            name="c1")(h))
        return x + nn.Conv(self.ch, (1,), name="c2")(h)


class XttsDVAE(nn.Module):
    """Checkpoint-layout-faithful XTTS discrete mel VAE
    (TTS/tts/layers/xtts/dvae.py:202-366 at the trainer config
    gpt_trainer.py:170-181: 1-D, 80 mels, 2 stride-2 conv layers, 3
    resblocks, 1024-token EMA codebook, nearest-upsample decoder).  This
    is the TRAINING-side code producer (GPT inference decodes latents
    through XttsHifiganDecoder instead).  Conversion:
    utils/convert.convert_xtts_dvae (dvae.pth)."""

    channels: int = 80
    num_tokens: int = 1024
    codebook_dim: int = 512
    hidden_dim: int = 512
    num_layers: int = 2
    num_resnet_blocks: int = 3

    def setup(self):
        self.enc_convs = [
            nn.Conv(self.hidden_dim * 2 ** i, (3,), strides=(2,),
                    padding=((1, 1),), name=f"enc_conv_{i}")
            for i in range(self.num_layers)
        ]
        inner = self.hidden_dim * 2 ** (self.num_layers - 1)
        self.enc_res = [_DVAEResBlock(inner, name=f"enc_res_{j}")
                        for j in range(self.num_resnet_blocks)]
        self.enc_out = nn.Conv(self.codebook_dim, (1,), name="enc_out")
        self.embed = self.param("embed", nn.initializers.normal(1.0),
                                (self.codebook_dim, self.num_tokens))
        self.dec_in = nn.Conv(inner, (1,), name="dec_in")
        self.dec_res = [_DVAEResBlock(inner, name=f"dec_res_{j}")
                        for j in range(self.num_resnet_blocks)]
        # dec channel ladder mirrors the encoder reversed:
        # [inner -> ... -> hidden_dim]
        dec_outs = [self.hidden_dim * 2 ** (self.num_layers - 1 - i)
                    for i in range(self.num_layers)]
        self.dec_ups = [
            nn.Conv(dec_outs[i], (3,), padding=((1, 1),),
                    name=f"dec_up_{i}")
            for i in range(self.num_layers)
        ]
        self.dec_out = nn.Conv(self.channels, (1,), name="dec_out")

    def encode(self, mel):
        """(b, t, 80) -> codes (b, t // 2**num_layers)."""
        x = mel
        for conv in self.enc_convs:
            x = nn.relu(conv(x))
        for rb in self.enc_res:
            x = rb(x)
        z = self.enc_out(x)
        dist = (jnp.sum(z * z, -1, keepdims=True) - 2.0 * z @ self.embed
                + jnp.sum(self.embed * self.embed, 0)[None, None])
        return jnp.argmin(dist, axis=-1)

    def decode(self, codes):
        """codes (b, n) -> mel (b, n * 2**num_layers, 80)."""
        z = self.embed.T[codes]
        x = self.dec_in(z)
        for rb in self.dec_res:
            x = rb(x)
        for conv in self.dec_ups:
            x = jnp.repeat(x, 2, axis=1)  # nearest x2 (UpsampledConv)
            x = nn.relu(conv(x))
        return self.dec_out(x)

    def __call__(self, mel):
        return self.decode(self.encode(mel))
