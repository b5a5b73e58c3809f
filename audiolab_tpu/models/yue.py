"""YuE-class two-stage LM music generation (vocal + instrumental).

Reference behavior (modules/yue/inference/, SURVEY §2.3, §3.5):
  - stage 1: LLaMA-arch token LM over xcodec semantic tokens; prompt =
    [genre tags | lyric segment | optional audio-prompt codes]; generates
    INTERLEAVED vocal/instrumental token pairs per frame ("cot" mode);
    BlockTokenRangeProcessor masks logits outside the legal codec range
    (infer.py:35); segment-wise CFG double batch (infer.py:330+)
  - stage 2: refinement LM upsamples stage-1 codebook-0 codes to the full
    8-codebook stream in 300-frame blocks, batched (infer.py:84-170)
  - decode: xcodec SoundStream -> Vocos upsample -> mix vocal + inst

TPU redesign: both stages are the shared TransformerLM core with scan
decode + donated caches; stage-2 blocks are BATCHED through one graph
instead of looped; token-range masking is a logit_processor inside the
scan (no host round trips)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.codecs import CodecConfig, SoundStreamCodec, Vocos, VocosConfig
from audiolab_tpu.models.lm import LMConfig, TransformerLM, init_cache


# ----------------------------------------------------------- vocabulary
#
# mm-tokenizer v0.2 layout (modules/yue/inference/codecmanipulator.py:28-57;
# models/mm_vocab.py holds the full table + the sentencepiece wrapper):
#   [0, text_size)        sentencepiece text tokens       (32000 upstream)
#   [text_size, +22)      special tokens <EOD>..<semanticodec>
#   codec ranges          per-codec global offsets; xcodec (the YuE codec)
#                         = 12 codebooks x 1024 starting at 45334
# Stage 1 emits interleaved vocal/inst xcodec CODEBOOK-0 tokens (both in
# [xcodec_base, xcodec_base+K)); stage 2 teacher-forces codebook 0 and
# emits codebooks 1..7 in the SAME vocab at xcodec_base + k*K.

# special-name -> index within the 22-token special block, in the
# mm_v0_2 id order (codecmanipulator.py:36-38)
_SPECIAL_ORDER = (
    "eod", "soa", "eoa", "soi", "eoi", "sov", "eov", "s_local", "e_local",
    "s_global", "e_global", "semantic", "acoustic", "stage1", "dac_16k",
    "dac_44k", "xcodec", "stage2", "semantic_mert", "semantic_hubert",
    "visual", "semanticodec",
)


@dataclass(frozen=True)
class YuEVocab:
    """mm-v0.2-shaped vocabulary, parametric so tests can shrink it.
    Defaults reproduce the published layout exactly: xcodec_base 45334,
    size 83734 (codecmanipulator.py:40-47)."""

    codebook_size: int = 1024
    text_size: int = 32000
    n_q_total: int = 12            # xcodec codebooks reserved in the vocab
    # codec ranges BEFORE xcodec in the id space (dac16k 4 cb + dac44k 9 cb
    # of 1024 upstream); parametrized as a codebook count multiplier
    pre_xcodec_codebooks: int = 13
    # ranges after xcodec (mert 1024 + hubert 512 + semanticodec 24576)
    post_xcodec_ids: int = 26112

    def special(self, name: str) -> int:
        return self.text_size + _SPECIAL_ORDER.index(name)

    @property
    def special_base(self) -> int:
        return self.text_size

    @property
    def xcodec_base(self) -> int:
        return (self.text_size + len(_SPECIAL_ORDER)
                + self.pre_xcodec_codebooks * self.codebook_size)

    def codebook_base(self, k: int) -> int:
        """LM-id base of xcodec codebook k (0..n_q_total-1)."""
        return self.xcodec_base + k * self.codebook_size

    # both stage-1 streams live in xcodec codebook 0 (interleaved)
    @property
    def vocal_base(self) -> int:
        return self.xcodec_base

    @property
    def inst_base(self) -> int:
        return self.xcodec_base

    @property
    def size(self) -> int:
        return (self.xcodec_base + self.n_q_total * self.codebook_size
                + self.post_xcodec_ids)


def encode_text(s: str, max_len: int = 512, text_size: int = 32000) -> np.ndarray:
    """Byte fallback text encoder for tokenizer-less (test/random) runs;
    real checkpoints use mm_vocab.MMTokenizer via YuEPipeline(tokenizer=)."""
    b = s.encode("utf-8")[:max_len]
    return (np.frombuffer(b, np.uint8).astype(np.int32)
            % min(256, text_size))


@dataclass
class YuEConfig:
    vocab: YuEVocab = field(default_factory=YuEVocab)
    stage1: LMConfig = field(default_factory=lambda: LMConfig(
        vocab_size=YuEVocab().size, dim=2048, n_layers=16, n_heads=16,
        n_kv_heads=16, ffn_dim=5632, max_seq_len=8192))
    # stage 2 shares the mm vocab (infer.py:128 masks within it)
    stage2: LMConfig = field(default_factory=lambda: LMConfig(
        vocab_size=YuEVocab().size, dim=1024, n_layers=8,
        n_heads=16, n_kv_heads=16, ffn_dim=2816, max_seq_len=4096))
    stage2_block: int = 300
    n_q: int = 8


def block_token_range_processor(lo: int, hi: int):
    """Mask logits outside [lo, hi) (BlockTokenRangeProcessor infer.py:35,
    inverted: the reference blocks ranges; we allow one range)."""

    def proc(logits, _i):
        v = logits.shape[-1]
        ar = jnp.arange(v)
        ok = (ar >= lo) & (ar < hi)
        return jnp.where(ok[None, :], logits, -jnp.inf)

    return proc


def stage1_generate(
    lm: TransformerLM,
    params,
    prompt_tokens: jnp.ndarray,     # (2, t_prompt) [cond; uncond] rows
    frames: int,
    vocab: YuEVocab,
    cfg_scale: float = 1.5,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.93,
    repetition_penalty: float = 1.2,
    valid_from=None,                # (2,) first real position per row
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Generate interleaved (vocal, inst) pairs -> (2, frames) codec codes.

    CFG double batch: row 0 = full prompt, row 1 = the unconditional
    context (built by YuEPipeline._prompt; the published run's equivalent
    is transformers' unbatched-CFG default — the last prompt token).

    Sampling matches the reference model.generate call (infer.py:493-509):
    CFG merge, then repetition penalty 1.2 over the conditional context
    ids (HF RepetitionPenaltyLogitsProcessor semantics), then the legal
    token-range mask, then temperature and nucleus top_p=0.93.  Left-pad
    positions (prompt bucketing and the shorter uncond row) are excluded
    from attention via ``valid_from``, the way HF's attention_mask
    excludes pads."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b2, t_prompt = prompt_tokens.shape
    assert b2 == 2, "pass [cond; uncond] rows"
    vf = (np.zeros(2, np.int32) if valid_from is None
          else np.asarray(valid_from, np.int32))
    # pad the prompt to a bucket so the jitted graph is reused across
    # lyric-segment lengths (left-pad with PAD, consistent with _prompt)
    bucket = -(-t_prompt // 128) * 128
    if bucket != t_prompt:
        # left-pad with eoa (the reference's pad_token_id, infer.py:502)
        pad = jnp.full((2, bucket - t_prompt), vocab.special("eoa"), jnp.int32)
        prompt_tokens = jnp.concatenate([pad, prompt_tokens], axis=1)
        vf = vf + (bucket - t_prompt)
    core = _stage1_core(lm, frames, bucket, vocab, cfg_scale, temperature,
                        top_k, top_p, repetition_penalty)
    return core(params, prompt_tokens, jnp.asarray(vf), rng)


from functools import lru_cache


@lru_cache(maxsize=32)
def _stage1_core(lm: TransformerLM, frames: int, t_prompt: int,
                 vocab: YuEVocab, cfg_scale: float, temperature: float,
                 top_k: int, top_p: float, repetition_penalty: float):
    """Prefill + decode scan as ONE cached jitted graph."""
    c = lm.cfg
    total = 2 * frames
    vb, ib = vocab.vocal_base, vocab.inst_base
    vsize = c.vocab_size

    @jax.jit
    def core(params, prompt_tokens, valid_from, rng):
        seq_len = t_prompt + total + 1
        # key-validity per row: left pads excluded from attention for the
        # whole trajectory (prefill AND decode)
        key_valid = (jnp.arange(seq_len)[None, :]
                     >= valid_from[:, None])[:, None, None, :]
        caches = init_cache(c, 2, seq_len)
        logits, caches = lm.apply(
            {"params": params}, prompt_tokens, jnp.arange(t_prompt), caches,
            key_valid)
        last = logits[:, -1]

        # repetition-penalty presence set over the CONDITIONAL context
        # (pads scatter into a scratch slot and are dropped)
        tok_or_scratch = jnp.where(
            jnp.arange(t_prompt) >= valid_from[0], prompt_tokens[0], vsize)
        seen = jnp.zeros((vsize + 1,), bool).at[tok_or_scratch].set(True)

        ar = jnp.arange(vsize)

        def body(carry, i):
            last, caches, rng, seen = carry
            rng, key = jax.random.split(rng)
            lc, lu = last[0], last[1]
            lg = lu + cfg_scale * (lc - lu)
            if repetition_penalty != 1.0:
                pen = jnp.where(lg > 0, lg / repetition_penalty,
                                lg * repetition_penalty)
                lg = jnp.where(seen[:vsize], pen, lg)
            # alternate legal ranges: even step -> vocal, odd -> inst
            is_vocal = (i % 2) == 0
            lo = jnp.where(is_vocal, vb, ib)
            hi = lo + vocab.codebook_size
            lg = jnp.where((ar >= lo) & (ar < hi), lg, -jnp.inf)
            lg = lg / jnp.maximum(temperature, 1e-6)
            if top_k > 0:
                k_eff = min(top_k, vsize)
                kth = jax.lax.top_k(lg[None], k_eff)[0][0, -1]
                lg = jnp.where(lg < kth, -jnp.inf, lg)
            if top_p > 0.0:
                srt = jnp.sort(lg)[::-1]
                cum = jnp.cumsum(jax.nn.softmax(srt))
                cutoff = srt[jnp.sum(cum < top_p)]
                lg = jnp.where(lg < cutoff, -jnp.inf, lg)
            tok = jax.random.categorical(key, lg)
            seen = seen.at[tok].set(True)
            tok2 = jnp.stack([tok, tok])[:, None]
            pos = jnp.asarray([t_prompt], jnp.int32) + i
            logits, caches = lm.apply({"params": params}, tok2, pos, caches,
                                      key_valid)
            return (logits[:, -1], caches, rng, seen), tok

        (_, _, _, _), toks = jax.lax.scan(body, (last, caches, rng, seen),
                                          jnp.arange(total))
        pairs = toks.reshape(frames, 2)
        vocal = pairs[:, 0] - vb
        inst = pairs[:, 1] - ib
        return jnp.stack([vocal, inst], axis=0)  # (2, frames)

    return core


def stage2_generate(
    lm: TransformerLM,
    params,
    codes0: jnp.ndarray,            # (b, t) codebook-0 codes (one track)
    vocab: YuEVocab,
    n_q: int = 8,
    block: int = 300,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Upsample codebook-0 -> n_q codebooks in batched 300-frame blocks,
    matching the published checkpoints' sequence layout (stage2_generate
    infer.py:84-160): prompt = [<SOA>, <stage_1>, cb0 x block, <stage_2>],
    then per FRAME the cb0 token is teacher-forced and the model greedily
    emits codebooks 1..n_q-1, every output masked to the xcodec
    codebook-1..7 range (BlockTokenRangeProcessor(0, 46358) +
    (53526, vocab), infer.py:128).

    TPU redesign: all blocks run as ONE batch through a single jitted
    prefill + scan (the reference loops frames with a full re-prefill per
    frame via model.generate)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b, t = codes0.shape
    pad = (-t) % block
    codes_p = jnp.pad(codes0, ((0, 0), (0, pad)))
    n_blocks = (t + pad) // block
    blocks = codes_p.reshape(b * n_blocks, block)

    # bucket the block count to a power of two so the jitted graph is
    # reused across track lengths (stage-2 dominates compile otherwise)
    nb = blocks.shape[0]
    nb_bucket = 1
    while nb_bucket < nb:
        nb_bucket *= 2
    if nb_bucket != nb:
        blocks = jnp.pad(blocks, ((0, nb_bucket - nb), (0, 0)))

    core = _stage2_core(lm, vocab, n_q, block, nb_bucket)
    full = core(params, blocks)[:nb]
    full = full.reshape(b, n_blocks, n_q, block)
    full = jnp.moveaxis(full, 2, 1).reshape(b, n_q, n_blocks * block)
    return full[:, :, :t]


@lru_cache(maxsize=32)
def _stage2_core(lm: TransformerLM, vocab: YuEVocab, n_q: int, block: int,
                 nb: int):
    """Stage-2 prefill + frame-major teacher-forced scan, ONE jitted graph.

    Sequence: [<SOA> <stage_1> cb0_0..cb0_{B-1} <stage_2>] then
    B x n_q tokens [cb0_f g1..g{n_q-1}]; generated tokens are masked to
    [codebook_base(1), codebook_base(n_q)) like the reference's block
    processors."""
    c = lm.cfg
    soa, st1, st2 = (vocab.special("soa"), vocab.special("stage1"),
                     vocab.special("stage2"))
    lo1 = vocab.codebook_base(1)
    hi = vocab.codebook_base(n_q)
    prompt_len = block + 3
    total = block * n_q

    @jax.jit
    def core(params, blocks):
        cb0 = blocks + vocab.xcodec_base         # (nb, block) LM ids
        prompt = jnp.concatenate([
            jnp.full((nb, 1), soa, jnp.int32),
            jnp.full((nb, 1), st1, jnp.int32),
            cb0.astype(jnp.int32),
            jnp.full((nb, 1), st2, jnp.int32),
        ], axis=1)
        caches = init_cache(c, nb, prompt_len + total + 1)
        mask = (jnp.arange(prompt_len + total + 1)[None, :]
                < prompt_len)[:, None, None, :]
        logits, caches = lm.apply({"params": params}, prompt,
                                  jnp.arange(prompt_len), caches, mask)
        last = logits[:, -1]
        ar = jnp.arange(c.vocab_size)

        def body(carry, i):
            last, caches = carry
            j = i % n_q                           # 0 = teacher-forced cb0
            f = i // n_q
            # the reference masks to ALL of codebooks 1..n_q-1
            # ([46358,53526), infer.py:128); masking to codebook j's own
            # 1024-id slice is tighter and equal on trained weights (the
            # model emits within the slice) while keeping random-weight
            # runs in-range
            lo_j = vocab.xcodec_base + j * vocab.codebook_size
            allowed = (ar >= jnp.maximum(lo_j, lo1)) & (
                ar < jnp.minimum(lo_j + vocab.codebook_size, hi))
            gen = jnp.argmax(jnp.where(allowed[None, :], last, -jnp.inf),
                             axis=-1)
            tok = jnp.where(j == 0, cb0[:, f], gen).astype(jnp.int32)
            pos = jnp.asarray([prompt_len], jnp.int32) + i
            logits, caches = lm.apply({"params": params}, tok[:, None], pos,
                                      caches)
            return (logits[:, -1], caches), tok

        (_, _), toks = jax.lax.scan(body, (last, caches), jnp.arange(total))
        # toks (total, nb) frame-major -> (nb, block, n_q) -> (nb, n_q, block)
        toks = jnp.swapaxes(toks, 0, 1).reshape(nb, block, n_q)
        toks = jnp.swapaxes(toks, 1, 2)
        offs = (vocab.xcodec_base
                + jnp.arange(n_q) * vocab.codebook_size)[None, :, None]
        return toks - offs

    return core


@dataclass
class YuEPipelineConfig:
    frame_rate: float = 50.0
    segment_frames: int = 512
    # reference generate args (infer.py:254-263,445): CFG 1.5 on the first
    # segment then 1.2, nucleus top_p 0.93, repetition penalty 1.2
    cfg_scale: float = 1.5
    cfg_scale_later: float = 1.2
    top_k: int = 0
    top_p: float = 0.93
    temperature: float = 1.0
    repetition_penalty: float = 1.2
    # "tail" = transformers unbatched-CFG default (uncond context is the
    # last prompt token — what the published run does); "lyrics_stripped"
    # conditions the uncond row on genre-only text instead
    uncond_mode: str = "tail"


class YuEPipeline:
    """generate_music equivalent (infer.py:245): lyrics segments ->
    stage1 -> stage2 -> xcodec decode -> vocal/inst mix."""

    def __init__(self, cfg: YuEConfig, s1_params, s2_params,
                 codec: SoundStreamCodec, codec_params,
                 vocos: Vocos | None = None, vocos_params=None,
                 pcfg: YuEPipelineConfig | None = None,
                 xcodec=None, xcodec_params=None, tokenizer=None):
        self.cfg = cfg
        # mm_vocab.MMTokenizer when the real tokenizer.model is available;
        # byte-fallback encode_text otherwise (random/test weights)
        self.tokenizer = tokenizer
        self.s1 = TransformerLM(cfg.stage1)
        self.s2 = TransformerLM(cfg.stage2)
        self.s1_params = s1_params
        self.s2_params = s2_params
        self.codec = codec
        self.codec_params = codec_params
        self.vocos = vocos
        self.vocos_params = vocos_params
        # checkpoint-faithful decode path (models/codecs.XCodecDecoder,
        # filled by utils/convert.load_xcodec_checkpoint) — preferred when
        # real YuE weights are loaded
        self.xcodec = xcodec
        self.xcodec_params = xcodec_params
        self.pcfg = pcfg or YuEPipelineConfig()

    def _tok(self, s: str) -> np.ndarray:
        if self.tokenizer is not None:
            return np.asarray(self.tokenizer.tokenize(s), np.int32)
        return encode_text(s, text_size=self.cfg.vocab.text_size)

    def _prompt(self, genre: str, lyrics: str, audio_codes=None,
                full_lyrics: str | None = None):
        """Stage-1 prompt rows [cond; uncond], upstream sequence layout
        (infer.py:397-467): head instruction text + [Genre] + full lyrics,
        optional [start_of_reference] <SOA> <xcodec> cb0-ids <EOA>
        [end_of_reference], then [start_of_segment] + section text +
        <SOA> <xcodec>.  The uncond CFG row drops the lyric text (the
        reference relies on transformers' unbatched CFG; a paired
        cond/uncond batch is the fixed-shape TPU equivalent)."""
        v = self.cfg.vocab
        head = ("Generate music from the given lyrics segment by segment."
                f"\n[Genre] {genre}\n{full_lyrics if full_lyrics is not None else lyrics}")
        soa, eoa = v.special("soa"), v.special("eoa")
        sep = v.special("xcodec")
        ref: list[int] = []
        if audio_codes is not None:
            cb0 = (np.asarray(audio_codes)[0].astype(np.int64)
                   + v.xcodec_base)
            ref = (self._tok("[start_of_reference]").tolist()
                   + [soa, sep] + cb0.tolist() + [eoa]
                   + self._tok("[end_of_reference]").tolist())
        seg_open = self._tok("[start_of_segment]").tolist()
        cond = np.concatenate([
            self._tok(head), ref, seg_open, self._tok(lyrics),
            [soa, sep],
        ]).astype(np.int32)
        if self.pcfg.uncond_mode == "tail":
            # transformers UnbatchedClassifierFreeGuidanceLogitsProcessor
            # with negative_prompt_ids=None: the unconditional context is
            # input_ids[:, -1:] — exactly what model.generate(...,
            # guidance_scale=...) runs for the published checkpoints
            uncond = cond[-1:]
        else:  # "lyrics_stripped": genre-only unconditional context
            uncond = np.concatenate([
                self._tok("Generate music from the given lyrics segment by "
                          f"segment.\n[Genre] {genre}\n"),
                seg_open, [soa, sep],
            ]).astype(np.int32)
        t = max(len(cond), len(uncond))
        pad = v.special("eoa")  # reference pads with eoa (pad_token_id=eoa)
        rows = np.full((2, t), pad, np.int32)
        rows[0, t - len(cond):] = cond       # left-pad so SOA aligns
        rows[1, t - len(uncond):] = uncond
        valid_from = np.asarray([t - len(cond), t - len(uncond)], np.int32)
        return jnp.asarray(rows), valid_from

    def generate_music(
        self,
        genre: str,
        lyrics: str,
        n_segments: int = 1,
        seconds_per_segment: float | None = None,
        audio_prompt_codes=None,
        seed: int = 0,
    ) -> dict:
        """Returns {"mix", "vocal", "inst", "sr"}."""
        p = self.pcfg
        frames = (p.segment_frames if seconds_per_segment is None
                  else int(seconds_per_segment * p.frame_rate))
        segments = [s.strip() for s in lyrics.split("\n\n") if s.strip()]
        segments = (segments or [lyrics])[:n_segments]
        while len(segments) < n_segments:
            segments.append(segments[-1])

        full_lyrics = "\n".join(segments)
        vocal_codes, inst_codes = [], []
        for i, seg in enumerate(segments):
            prompt, valid_from = self._prompt(
                genre, seg, audio_prompt_codes if i == 0 else None,
                full_lyrics=full_lyrics)
            codes = stage1_generate(
                self.s1, self.s1_params, prompt, frames, self.cfg.vocab,
                # guidance 1.5 on the first segment, then 1.2 (infer.py:445)
                cfg_scale=p.cfg_scale if i == 0 else p.cfg_scale_later,
                temperature=p.temperature, top_k=p.top_k, top_p=p.top_p,
                repetition_penalty=p.repetition_penalty,
                valid_from=valid_from,
                rng=jax.random.PRNGKey(seed + i),
            )
            vocal_codes.append(codes[0])
            inst_codes.append(codes[1])
        vocal0 = jnp.concatenate(vocal_codes)[None]   # (1, T)
        inst0 = jnp.concatenate(inst_codes)[None]

        both0 = jnp.concatenate([vocal0, inst0], axis=0)  # (2, T)
        full = stage2_generate(self.s2, self.s2_params, both0, self.cfg.vocab,
                               n_q=self.cfg.n_q, block=self.cfg.stage2_block,
                               rng=jax.random.PRNGKey(seed + 99))
        full = jnp.clip(full, 0, self.cfg.vocab.codebook_size - 1)

        if self.xcodec is not None:
            # real-checkpoint decode (SoundStream.decode semantics:
            # RVQ -> fc_post2 -> dac2 decoder; soundstream_hubert_new.py)
            xcodes = jnp.clip(full[:, : self.xcodec.cfg.n_q], 0,
                              self.xcodec.cfg.codebook_size - 1)
            audio = self.xcodec.apply({"params": self.xcodec_params}, xcodes)
        elif self.vocos is not None:
            # Vocos vocoder path (infer.py:617 xcodec decode -> Vocos
            # upsample): the RVQ latents drive the ConvNeXt→iSTFT head
            # directly — higher-rate audio without the SEANet decoder
            z = self.codec.apply({"params": self.codec_params}, full,
                                 method=lambda m, c: m.rvq.decode(c))
            audio = self.vocos.apply({"params": self.vocos_params}, z)
        else:
            audio = self.codec.apply({"params": self.codec_params}, full,
                                     method=SoundStreamCodec.decode)  # (2, n)
        vocal = np.asarray(audio[0])
        inst = np.asarray(audio[1])
        mix = vocal + inst
        peak = np.abs(mix).max() + 1e-9
        if peak > 0.99:
            mix = mix * (0.99 / peak)
        if self.xcodec is not None:
            sr = int(round(self.codec.cfg.frame_rate * self.xcodec.cfg.hop))
        elif self.vocos is not None:
            sr = int(round(self.codec.cfg.frame_rate * self.vocos.cfg.hop))
        else:
            sr = self.codec.cfg.sr
        return {"mix": mix, "vocal": vocal, "inst": inst, "sr": sr}

    # serve backend protocol (music_api): returns (samples, sr)
    def generate(self, prompt: str, lyrics: str = "", n_segments: int = 1,
                 **kw):
        out = self.generate_music(prompt, lyrics or prompt,
                                  n_segments=n_segments, **kw)
        return out["mix"], out["sr"]


def random_yue(seed: int = 0, with_vocos: bool = False) -> YuEPipeline:
    """Tiny random-weight pipeline (converter loads real weights)."""
    from audiolab_tpu.models.codecs import SEANetConfig

    # shrunken mm-v0.2-shaped layout (same structure, tiny ranges)
    vocab = YuEVocab(codebook_size=32, text_size=64, pre_xcodec_codebooks=2,
                     n_q_total=8, post_xcodec_ids=16)
    cfg = YuEConfig(
        vocab=vocab,
        stage1=LMConfig(vocab_size=vocab.size, dim=32, n_layers=2, n_heads=4,
                        n_kv_heads=2, ffn_dim=64, max_seq_len=2048,
                        dtype="float32"),
        stage2=LMConfig(vocab_size=vocab.size, dim=32, n_layers=2,
                        n_heads=4, n_kv_heads=2, ffn_dim=64, max_seq_len=4096,
                        dtype="float32"),
        stage2_block=8,
        n_q=4,
    )
    s1 = TransformerLM(cfg.stage1)
    s2 = TransformerLM(cfg.stage2)
    s1p = s1.init(jax.random.PRNGKey(seed), jnp.zeros((2, 4), jnp.int32))["params"]
    s2p = s2.init(jax.random.PRNGKey(seed + 1), jnp.zeros((2, 4), jnp.int32))["params"]
    ccfg = CodecConfig(sr=16000,
                       seanet=SEANetConfig(dim=32, n_filters=4, ratios=(4, 2),
                                           n_res=1),
                       n_q=4, codebook_size=32)
    codec = SoundStreamCodec(ccfg)
    cp = codec.init(jax.random.PRNGKey(seed + 2),
                    jnp.zeros((1, ccfg.seanet.hop * 8)))["params"]
    vocos = vp = None
    if with_vocos:
        vcfg = VocosConfig(dim=32, n_layers=1, n_fft=64, hop=16)
        vocos = Vocos(vcfg)
        vp = vocos.init(jax.random.PRNGKey(seed + 3),
                        jnp.zeros((1, 8, ccfg.seanet.dim)))["params"]
    return YuEPipeline(cfg, s1p, s2p, codec, cp, vocos=vocos, vocos_params=vp,
                       pcfg=YuEPipelineConfig(segment_frames=16))
