"""TTS pipelines — engine dispatch + Zonos engine.

Reference behavior (layouts/tts.py:570 generate_tts dispatches 4 engines;
:128-253 Zonos emotion-tag chunk parser; modules/zonos/model.py:190
generation; SURVEY §2.4):
  - text is split into sentence chunks; ``[emotion]`` tags set the emotion
    vector for following chunks; chunks synthesize independently and concat
    with short silence.
  - speaker embedding comes from a reference WAV (make_speaker_embedding,
    model.py:70).

TPU design: chunks are BATCHED into one generate() call (same compiled AR
graph, CFG double-batch inside) instead of the reference's serial
per-chunk loop."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.mel import log_mel, mel_spectrogram
from audiolab_tpu.kernels.resample import resample_poly_np
from audiolab_tpu.models.codecs import DACConfig, DACDecoder
from audiolab_tpu.models.zonos import (
    ZONOS_PHONEME_VOCAB,
    SpeakerEncoder,
    ZonosConfig,
    ZonosModel,
    generate,
    tokenize_phonemes_np,
    tokenize_text,
)

EMOTIONS = ("happiness", "sadness", "disgust", "fear", "surprise",
            "anger", "other", "neutral")

_TAG_RE = re.compile(r"\[(%s)\]" % "|".join(EMOTIONS), re.IGNORECASE)
_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def parse_emotion_chunks(text: str) -> list[tuple[str, np.ndarray]]:
    """Split text into (sentence, emotion_vector) chunks.

    ``[emotion]`` tags switch the 8-d emotion vector for subsequent text
    (layouts/tts.py:128-253 semantics)."""
    base = np.full(8, 0.05, np.float32)
    base[-1] = 1.0  # neutral default
    chunks: list[tuple[str, np.ndarray]] = []
    cur = base
    pos = 0
    for m in _TAG_RE.finditer(text):
        seg = text[pos : m.start()].strip()
        if seg:
            for s in _SENT_RE.split(seg):
                if s.strip():
                    chunks.append((s.strip(), cur))
        vec = np.full(8, 0.05, np.float32)
        vec[EMOTIONS.index(m.group(1).lower())] = 1.0
        cur = vec
        pos = m.end()
    tail = text[pos:].strip()
    if tail:
        for s in _SENT_RE.split(tail):
            if s.strip():
                chunks.append((s.strip(), cur))
    return chunks or [(text.strip() or " ", base)]


@dataclass
class ZonosTTSConfig:
    sr: int = 44100
    frame_rate: float = 86.0
    max_seconds: float = 30.0   # reference 30 s token cap (model.py:194)
    cfg_scale: float = 2.0
    # published sampling defaults (model.py:202, sampling.py:101-109)
    top_k: int = 0
    min_p: float = 0.1
    repetition_penalty: float = 3.0
    temperature: float = 1.0
    silence_ms: float = 120.0
    text_max_len: int = 256
    use_phonemes: bool = True   # rule-based G2P front-end (espeak stand-in,
                                # models/phonemize.py); False = raw chars


class ZonosTTS:
    """Holds model/decoder/speaker-encoder params; synthesizes text."""

    def __init__(
        self,
        model_cfg: ZonosConfig,
        params,
        dac_cfg: DACConfig,
        dac_params,
        spk_params=None,
        cfg: ZonosTTSConfig | None = None,
    ):
        self.cfg = cfg or ZonosTTSConfig()
        self.model = ZonosModel(model_cfg)
        self.params = params
        self.dac = DACDecoder(dac_cfg)
        self.dac_params = dac_params
        self.spk_enc = SpeakerEncoder(model_cfg.spk_dim)
        self.spk_params = spk_params
        self._default_spk = np.zeros((model_cfg.spk_dim,), np.float32)

    def make_speaker_embedding(self, wav: np.ndarray, sr: int) -> np.ndarray:
        """Reference WAV -> speaker vector (model.py:70 equivalent)."""
        if self.spk_params is None:
            return self._default_spk
        if sr != 16000:
            wav = resample_poly_np(np.asarray(wav, np.float32), sr, 16000)
        mel = log_mel(mel_spectrogram(jnp.asarray(wav)[None], sr=16000,
                                      n_fft=1024, hop=256, n_mels=80))
        e = self.spk_enc.apply({"params": self.spk_params}, mel)
        return np.asarray(e[0])

    def synthesize(
        self,
        text: str,
        speaker: np.ndarray | None = None,
        seed: int = 0,
        rate: float = 15.0,
        pitch: float = 20.0,
    ) -> tuple[np.ndarray, int]:
        """Text -> (waveform, sr). Chunks are batched into one AR graph."""
        c = self.cfg
        chunks = parse_emotion_chunks(text)
        n = len(chunks)
        tmax = c.text_max_len
        text_ids = np.zeros((n, tmax), np.int32)
        emotions = np.zeros((n, 8), np.float32)
        for i, (s, em) in enumerate(chunks):
            if self.model.cfg.vocab_text == ZONOS_PHONEME_VOCAB:
                # converted checkpoint: text_emb rows ARE the published
                # phoneme_embedder — ids must come from the espeak-IPA
                # front-end + symbol table (conditioning.py:148-158)
                from audiolab_tpu.models.phonemize import phonemize_ipa

                ids = tokenize_phonemes_np([phonemize_ipa(s)])[0][:tmax]
            elif c.use_phonemes:
                from audiolab_tpu.models.phonemize import phonemize_ids

                ids = phonemize_ids(s, tmax)
            else:
                ids = tokenize_text(s, tmax)
            text_ids[i, : len(ids)] = ids
            emotions[i] = em
        # frame budget scales with the longest chunk (same static shape for
        # the whole batch — padded chunks EOS out early)
        words = max(len(s.split()) for s, _ in chunks)
        secs = min(c.max_seconds, max(1.5, 0.45 * words + 0.8))
        frames = int(secs * c.frame_rate)

        spk = speaker if speaker is not None else self._default_spk
        spk_b = jnp.tile(jnp.asarray(spk)[None], (n, 1))
        codes = generate(
            self.model, self.params,
            jnp.asarray(text_ids), spk_b,
            max_frames=frames,
            emotion=jnp.asarray(emotions),
            rate=jnp.full((n, 1), rate),
            pitch=jnp.full((n, 1), pitch),
            cfg_scale=c.cfg_scale, temperature=c.temperature, top_k=c.top_k,
            min_p=c.min_p, repetition_penalty=c.repetition_penalty,
            rng=jax.random.PRNGKey(seed),
        )
        codes = jnp.clip(codes, 0, self.model.cfg.codebook_size - 3)  # drop eos/mask
        audio = np.asarray(self.dac.apply({"params": self.dac_params}, codes))
        sil = np.zeros(int(c.silence_ms / 1000.0 * c.sr), np.float32)
        parts = []
        for i in range(n):
            parts.append(audio[i])
            if i < n - 1:
                parts.append(sil)
        return np.concatenate(parts), c.sr


    # serve/tts_api backend protocol -------------------------------------
    voices = ["default"]

    def generate(self, text: str, voice: str = "default", speed: float = 1.0,
                 **kw) -> tuple[np.ndarray, int]:
        rate = 15.0 * float(speed)
        return self.synthesize(text, rate=rate, **kw)


class DiaTTSEngine:
    """Dia model behind the TTS backend protocol (the reference's 4th
    engine, layouts/tts.py:399).  Dialogue text with [S1]/[S2] tags."""

    voices = ["default"]

    def __init__(self, model, params, dac, dac_params, sr: int = 44100,
                 frames_per_word: int = 12):
        self.model = model
        self.params = params
        self.dac = dac
        self.dac_params = dac_params
        self.sr = sr
        self.frames_per_word = frames_per_word

    def generate(self, text: str, voice: str = "default", speed: float = 1.0,
                 seed: int = 0, **_):
        import jax as _jax

        from audiolab_tpu.models import dia as D

        ids = jnp.asarray(D.tokenize_dialogue(text))[None]
        frames = max(8, int(len(text.split()) * self.frames_per_word / speed))
        codes = D.generate(self.model, self.params, ids, max_frames=frames,
                           rng=_jax.random.PRNGKey(seed))
        codes = jnp.clip(codes, 0, self.model.cfg.codebook_size - 4)
        audio = np.asarray(self.dac.apply({"params": self.dac_params}, codes))
        return audio[0], self.sr


class XTTSEngine:
    """Coqui-XTTS-class engine (layouts/tts.py:570 'coqui' dispatch,
    handlers/tts.py:16-126): GPT over VQ codes + BigVGAN, voices cloned
    from reference audio (models/xtts.py)."""

    def __init__(self, model):
        self.model = model  # models.xtts.XTTS
        self._voices: dict[str, tuple[np.ndarray, int]] = {}

    @property
    def voices(self):
        return ["default"] + sorted(self._voices)

    def add_voice(self, name: str, wav: np.ndarray, sr: int) -> None:
        """Clone a voice from reference audio (XTTS's signature feature)."""
        self._voices[name] = (np.asarray(wav, np.float32), sr)

    def _ref(self, voice: str) -> tuple[np.ndarray, int]:
        if voice in self._voices:
            return self._voices[voice]
        # deterministic built-in reference (shaped noise through a comb)
        rng = np.random.default_rng(7)
        x = rng.standard_normal(24000).astype(np.float32) * 0.1
        for d in (89, 131):
            x[d:] += 0.6 * x[:-d]
        return x * 0.2, 24000

    def generate(self, text: str, voice: str = "default", speed: float = 1.0,
                 seed: int = 0, **_):
        ref, sr = self._ref(voice)
        n_codes = max(16, int(len(text.split()) * 18 / max(speed, 0.25)))
        return self.model.tts(text, ref, sr, max_codes=min(n_codes, 512),
                              seed=seed)


def register_default_backends(tts_api, zonos=None, dia=None, xtts=None,
                              chatterbox=None) -> None:
    """Engine table mirroring layouts/tts.py:570 generate_tts dispatch:
    four DISTINCT engines (zonos, coqui/XTTS, chatterbox, dia).  When a
    dedicated engine isn't supplied, the closest stack stands in so the
    endpoint stays live (aliases flagged in COVERAGE)."""
    if zonos is not None:
        tts_api.register_backend("zonos", zonos)
    if xtts is not None:
        tts_api.register_backend("coqui", xtts)
    elif zonos is not None:
        tts_api.register_backend("coqui", zonos)
    if dia is not None:
        tts_api.register_backend("dia", dia)
    if chatterbox is not None:
        tts_api.register_backend("chatterbox", chatterbox)
    elif dia is not None:
        tts_api.register_backend("chatterbox", dia)


def random_zonos(model_cfg: ZonosConfig | None = None, seed: int = 0):
    """Random-weight ZonosTTS (no pretrained weights are downloadable in
    this environment; the converter fills real weights when present)."""
    mc = model_cfg or ZonosConfig(dim=64, n_layers=2, attn_every=2, n_heads=4,
                                  d_state=4, n_codebooks=9, codebook_size=1026,
                                  spk_dim=64)
    model = ZonosModel(mc)
    k = jax.random.PRNGKey(seed)
    text = jnp.zeros((1, 4), jnp.int32)
    spk = jnp.zeros((1, mc.spk_dim))
    bos = jnp.full((1, mc.n_codebooks, 1), mc.masked_id, jnp.int32)
    params = model.init(k, text, spk, jnp.zeros((1, 8)), jnp.zeros((1, 1)),
                        jnp.zeros((1, 1)), bos, method=ZonosModel.prefill)["params"]
    dac_cfg = DACConfig(dim=64, rates=(8, 8, 4, 2), n_q=mc.n_codebooks,
                        codebook_size=mc.codebook_size, codebook_dim=8)
    dac = DACDecoder(dac_cfg)
    dp = dac.init(jax.random.PRNGKey(seed + 1),
                  jnp.zeros((1, mc.n_codebooks, 4), jnp.int32))["params"]
    se = SpeakerEncoder(mc.spk_dim)
    sp = se.init(jax.random.PRNGKey(seed + 2), jnp.zeros((1, 20, 80)))["params"]
    return ZonosTTS(mc, params, dac_cfg, dp, sp)


def random_xtts(seed: int = 0) -> "XTTSEngine":
    """Random-weight XTTS-class engine (converter/training fills real)."""
    from audiolab_tpu.models.xtts import XTTS, XTTSConfig

    cfg = XTTSConfig(dim=64, n_layers=2, n_heads=4, cond_latents=4,
                     max_seq_len=1024)
    return XTTSEngine(XTTS.random_init(cfg, seed))


def random_chatterbox(seed: int = 0) -> "ChatterboxCheckpointEngine":
    """Random-weight Chatterbox engine at tiny scale — the SAME
    checkpoint-faithful T3 + S3Gen(flow+HiFT) stack the converters fill
    from the published resemble-ai safetensors (utils/convert.py
    load_chatterbox_checkpoint), just initialized small so the demo
    backend and engine-API tests stay instant.  There is deliberately no
    second Chatterbox implementation."""
    from audiolab_tpu.models.chatterbox_s3gen import (CausalMaskedDiffWithXvec,
                                                      FlowConfig,
                                                      HiFTConfig,
                                                      HiFTGenerator)
    from audiolab_tpu.models.chatterbox_t3 import T3, T3CkptConfig

    t3_cfg = T3CkptConfig(text_vocab=40, speech_vocab=36, dim=32, n_layers=2,
                          n_heads=4, ffn_dim=64, max_text_tokens=64,
                          max_speech_tokens=64, speaker_embed_size=8,
                          perceiver_tokens=4, perceiver_heads=2,
                          start_text_token=38, stop_text_token=0,
                          start_speech_token=30, stop_speech_token=31)
    flow_cfg = FlowConfig(token_vocab=30, dim=32, mel_dim=8, xvector_dim=12,
                          heads=2, ffn_dim=64, n_layers=2, n_up_layers=1,
                          est_channels=16, est_mid_blocks=2, est_n_blocks=1,
                          est_heads=2, est_head_dim=4, n_timesteps=2)
    hift_cfg = HiFTConfig(in_channels=8, base_channels=16,
                          f0_cond_channels=12)

    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    t3 = T3(t3_cfg, max_seq_len=256)
    t3_p = t3.init(ks[0], jnp.zeros((1, 3), jnp.int32),
                   jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 8)),
                   jnp.zeros((1, 2), jnp.int32), jnp.zeros((1,)))["params"]
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    flow_p = flow.init(ks[1], jnp.zeros((1, 3), jnp.int32),
                       jnp.zeros((1, 12)), None,
                       jnp.zeros((1, 6, 8)))["params"]
    hift = HiFTGenerator(hift_cfg)
    hift_p = hift.init(ks[2], jnp.zeros((1, 4, 8)), ks[3])["params"]
    return ChatterboxCheckpointEngine(t3_cfg, t3_p, flow_cfg, flow_p,
                                      hift_cfg, hift_p)


# ------------------------------------------------ XTTS-v2 checkpoint engine

def xtts_cloning_mel(wav22k, mel_norms=None):
    """XTTS-v2 conditioning mel (models/xtts.py wav_to_mel_cloning at the
    v2 call site :265-277): 22.05 kHz, n_fft 2048, hop 256, win 1024 hann,
    POWER spectrogram, htk mel 0..8k/80, log(clamp 1e-5), divided by the
    checkpoint's mel_stats.  (b, t) -> (b, frames, 80)."""
    import jax.numpy as jnp

    from audiolab_tpu.kernels.mel import mel_filterbank
    from audiolab_tpu.kernels.stft import spectrogram

    spec = spectrogram(wav22k, n_fft=2048, hop=256, win_length=1024,
                       center=True, power=2.0)
    fb = jnp.asarray(mel_filterbank(22050, 2048, 80, 0.0, 8000.0,
                                    htk=True, norm=None))
    mel = jnp.log(jnp.clip(spec @ fb, 1e-5, None))
    if mel_norms is not None:
        mel = mel / jnp.asarray(mel_norms)[None, None, :]
    return mel


class XttsCheckpointEngine:
    """The converted XTTS-v2 stack behind one TTS-engine facade
    (reference handlers/tts.py:16-126 Coqui path): reference audio ->
    per-6s-chunk conditioning perceiver latents (meaned) + H/ASP d-vector,
    then text tokens -> AR GPT decode -> final-norm latents -> HiFi
    decoder at 24 kHz.  All five weighted modules load from the published
    model.pth via utils/convert.load_xtts_*_checkpoint."""

    sr_out = 24000

    def __init__(self, gpt, gpt_params, cond_enc, cond_params, perceiver,
                 perc_params, spk_enc, spk_vars, decoder, dec_params,
                 mel_norms=None, tokenize=None):
        self.gpt, self.gpt_params = gpt, gpt_params
        self.cond_enc, self.cond_params = cond_enc, cond_params
        self.perceiver, self.perc_params = perceiver, perc_params
        self.spk_enc, self.spk_vars = spk_enc, spk_vars
        self.decoder, self.dec_params = decoder, dec_params
        self.mel_norms = mel_norms
        self.tokenize = tokenize or (lambda s: np.frombuffer(
            s.encode()[: self.gpt.max_text - 1], np.uint8).astype(np.int32)
            % self.gpt.n_text)

    def conditioning(self, ref_wav, sr):
        from audiolab_tpu.kernels.resample import resample_poly_np
        from audiolab_tpu.models.xtts import speaker_mel

        x = np.asarray(ref_wav, np.float32)
        w22 = resample_poly_np(x, sr, 22050) if sr != 22050 else x
        chunk = 22050 * 6
        embs = []
        for i in range(0, len(w22), chunk):
            piece = w22[i : i + chunk]
            if len(piece) < 22050 * 0.33:
                continue
            mel = xtts_cloning_mel(jnp.asarray(piece)[None], self.mel_norms)
            h = self.cond_enc.apply({"params": self.cond_params}, mel)
            embs.append(self.perceiver.apply({"params": self.perc_params}, h))
        if not embs:
            # reference shorter than the 0.33 s chunk floor: zero-pad the
            # whole clip to the minimum and condition on that instead of
            # failing with an opaque empty-stack error
            min_len = int(22050 * 0.33) + 1
            piece = np.pad(w22, (0, max(0, min_len - len(w22))))
            mel = xtts_cloning_mel(jnp.asarray(piece)[None], self.mel_norms)
            h = self.cond_enc.apply({"params": self.cond_params}, mel)
            embs.append(self.perceiver.apply({"params": self.perc_params}, h))
        lat = jnp.mean(jnp.stack(embs), axis=0)
        w16 = resample_poly_np(x, sr, 16000) if sr != 16000 else x
        d = self.spk_enc.apply(self.spk_vars,
                               speaker_mel(jnp.asarray(w16)[None]),
                               l2_norm=True)
        return lat, d

    def synthesize(self, text, ref_wav=None, ref_sr=None, cond=None,
                   d_vector=None, max_steps=200, seed=0, **kw):
        from audiolab_tpu.models.xtts import xtts_gpt2_generate

        if cond is None:
            cond, d_vector = self.conditioning(ref_wav, ref_sr)
        ids = jnp.asarray(self.tokenize(text))[None]
        max_steps = min(max_steps, self.gpt.max_mel - 1)
        _, latents, lengths = xtts_gpt2_generate(
            self.gpt, self.gpt_params, ids, cond, max_steps,
            rng=jax.random.PRNGKey(seed), **kw)
        wav = self.decoder.apply({"params": self.dec_params}, latents,
                                 d_vector)
        # trim at the first EOS (upstream stops generation there): each
        # latent frame vocodes to a fixed number of samples
        n_valid = int(lengths[0])
        if n_valid < max_steps:
            per_frame = wav.shape[-1] // max_steps
            wav = wav[..., : max(per_frame * n_valid, per_frame)]
        return np.asarray(wav[0]), self.sr_out

    # ---- serve/tts_api backend protocol (voice store like CloningFacade)

    def register_voice(self, name: str, wav, sr: int) -> None:
        self.voices = getattr(self, "voices", {})
        self.voices[name] = self.conditioning(wav, sr)

    def generate(self, text: str, voice: str = "default", speed: float = 1.0):
        voices = getattr(self, "voices", {})
        if voice not in voices:
            if not voices:
                raise ValueError("no voices registered; call register_voice")
            voice = next(iter(voices))
        cond, d = voices[voice]
        return self.synthesize(text, cond=cond, d_vector=d)


# ------------------------------------------- Chatterbox checkpoint engine

def chatterbox_punc_norm(text: str) -> str:
    """Text cleanup matching the published package's pre-tokenize
    normalisation (chatterbox tts.py punc_norm): capitalise the first
    letter, collapse whitespace, map exotic punctuation to plain ASCII,
    ensure a terminal period."""
    if not text:
        return "You need to add some text for me to talk."
    text = text[0].upper() + text[1:]
    text = " ".join(text.split())
    for old, new in (("...", ", "), ("…", ", "), (":", ","), (" - ", ", "),
                     (";", ", "), ("—", "-"), ("–", "-"), (" ,", ","),
                     ("“", '"'), ("”", '"'), ("‘", "'"), ("’", "'")):
        text = text.replace(old, new)
    if text[-1] not in {".", "!", "?", "-", ","}:
        text += "."
    return text


class ChatterboxTokenizer:
    """chatterbox EnTokenizer: HF-tokenizers BPE from the checkpoint's
    tokenizer.json, spaces mapped to [SPACE] before encoding."""

    def __init__(self, vocab_file: str):
        from tokenizers import Tokenizer

        self.tokenizer = Tokenizer.from_file(vocab_file)

    def encode(self, text: str) -> list[int]:
        return self.tokenizer.encode(text.replace(" ", "[SPACE]")).ids


class ChatterboxCheckpointEngine:
    """The converted resemble-ai Chatterbox stack behind one TTS-engine
    facade (reference layouts/tts.py:381-396 run_chatterbox_tts):
    text -> punc_norm -> BPE -> T3 AR decode (CFG, exaggeration) ->
    25 Hz speech tokens -> S3Gen flow+HiFT -> 24 kHz wav.

    The voice comes from the checkpoint's builtin conditionals
    (``conds.pt``: T3 speaker emb + cond prompt tokens, S3Gen ref dict)
    or, for cloning, from reference audio — all three bundled encoders
    convert: the ve.safetensors VoiceEncoder (T3 speaker emb), the
    CAMPPlus xvector (``speaker_encoder.``, models/campplus.py) and the
    S3 speech tokenizer (``tokenizer.``, models/s3tokenizer.py) whose
    25 Hz ids prompt both T3 and the S3Gen flow alongside the 24 kHz
    ref mel (s3gen embed_ref)."""

    sr_out = 24000
    voices = ["default"]

    def __init__(self, t3_cfg, t3_params, flow_cfg, flow_params,
                 hift_cfg, hift_params, ve_params=None, tokenizer=None,
                 builtin=None, rand_noise=None, campplus_params=None,
                 campplus_cfg=None, s3tok_params=None, s3tok_cfg=None):
        from audiolab_tpu.models.chatterbox_s3gen import S3Token2Wav
        from audiolab_tpu.models.chatterbox_t3 import (VoiceEncoder,
                                                       VoiceEncoderConfig)

        self.t3_cfg, self.t3_params = t3_cfg, t3_params
        self.s3gen = S3Token2Wav(flow_cfg, flow_params, hift_cfg,
                                 hift_params, rand_noise)
        self.ve = VoiceEncoder(VoiceEncoderConfig())
        self.ve_params = ve_params
        self.campplus_params = campplus_params
        self.campplus_cfg = campplus_cfg
        self.s3tok_params = s3tok_params
        self.s3tok_cfg = s3tok_cfg
        self.tokenize = tokenizer or (lambda s: list(
            np.frombuffer(s.encode()[:500], np.uint8).astype(np.int32)
            % (t3_cfg.text_vocab - 2) + 1))
        # builtin: dict(speaker_emb, prompt_tokens?, emotion_adv?,
        #               ref_tokens?, ref_mel?, ref_xvector?)  [conds.pt]
        self.builtin = builtin or {}

    def conditioning(self, ref_wav, sr):
        """Reference audio -> (T3 speaker embedding, S3Gen ref dict).

        speaker emb: converted VoiceEncoder (voice_encoder.py
        embeds_from_wavs).  ref dict (s3gen embed_ref): CAMPPlus 192-d
        xvector over 16 kHz kaldi fbank, S3 tokenizer 25 Hz ids, and the
        24 kHz prompt mel trimmed to 2 frames/token."""
        from audiolab_tpu.kernels.resample import resample_poly_np
        from audiolab_tpu.models.chatterbox_t3 import utterance_embedding

        if self.ve_params is None:
            raise ValueError("no ve.safetensors loaded; cannot embed "
                             "reference audio")
        wav = np.asarray(ref_wav, np.float32)
        spk = utterance_embedding(
            lambda mels: self.ve.apply({"params": self.ve_params}, mels),
            wav, sr)
        rd = {}
        w16 = resample_poly_np(wav, sr, 16000) if sr != 16000 else wav
        if self.campplus_params is not None:
            from audiolab_tpu.models.campplus import (CAMPPlusConfig,
                                                      campplus_xvector)

            rd["ref_xvector"] = campplus_xvector(
                self.campplus_params, w16,
                self.campplus_cfg or CAMPPlusConfig())
        if self.s3tok_params is not None:
            from audiolab_tpu.models.chatterbox_s3gen import s3gen_ref_mel
            from audiolab_tpu.models.s3tokenizer import (S3TokenizerConfig,
                                                         tokenize_wav)

            tokens = tokenize_wav(self.s3tok_params, w16,
                                  self.s3tok_cfg or S3TokenizerConfig())
            w24 = resample_poly_np(wav, sr, 24000) if sr != 24000 else wav
            # 80 mels at checkpoint scale; sliced for tiny test configs
            mel = np.asarray(s3gen_ref_mel(
                w24[None]))[..., : self.s3gen.flow_cfg.mel_dim]
            # cosyvoice frontend aligns feat to 2 frames per token
            n_tok = min(tokens.shape[1], mel.shape[1] // 2)
            rd["ref_tokens"] = tokens[:, :n_tok]
            rd["ref_mel"] = mel[:, : 2 * n_tok]
        return spk, rd

    def synthesize(self, text, ref_wav=None, ref_sr=None, speaker_emb=None,
                   ref_dict=None, exaggeration=0.5, cfg_weight=0.5,
                   temperature=0.8, max_tokens=500, seed=0, **_):
        from audiolab_tpu.models.chatterbox_t3 import t3_generate

        c = self.t3_cfg
        ref_rd = None
        if speaker_emb is None:
            if ref_wav is not None:
                speaker_emb, ref_rd = self.conditioning(ref_wav, ref_sr)
            elif "speaker_emb" in self.builtin:
                speaker_emb = self.builtin["speaker_emb"]
            else:
                speaker_emb = np.zeros((c.speaker_embed_size,), np.float32)
        elif isinstance(speaker_emb, tuple):
            speaker_emb, ref_rd = speaker_emb
            if ref_rd is not None and not isinstance(ref_rd, dict):
                ref_rd = {"ref_xvector": ref_rd}
        ids = self.tokenize(chatterbox_punc_norm(text))
        ids = np.asarray([c.start_text_token] + list(ids)
                         + [c.stop_text_token], np.int32)[None]
        if ref_rd is not None and "ref_tokens" in ref_rd:
            # cloned voice: the reference's speech tokens prompt T3 too
            # (t3.py cond_prompt_speech_tokens, capped at 150)
            prompt = np.asarray(ref_rd["ref_tokens"],
                                np.int32)[:, : c.speech_cond_prompt_len]
        else:
            prompt = self.builtin.get("prompt_tokens")
        tokens = t3_generate(
            c, self.t3_params, ids, speaker_emb, prompt_tokens=prompt,
            emotion_adv=float(exaggeration), max_new_tokens=max_tokens,
            cfg_weight=float(cfg_weight), temperature=float(temperature),
            seed=seed)
        # S3Gen's token vocab is the 6561 FSQ codes; drop specials
        tokens = tokens[:, (tokens[0] < self.s3gen.flow_cfg.token_vocab)]
        if tokens.shape[1] == 0:
            tokens = np.zeros((1, 1), np.int32)
        if ref_dict is not None:
            rd = ref_dict
        elif ref_rd is not None:
            rd = ref_rd  # cloning: the reference's own embeddings/prompts
        else:
            rd = self.builtin
        xvec = np.asarray(
            rd.get("ref_xvector",
                   np.zeros((self.s3gen.flow_cfg.xvector_dim,),
                            np.float32))).reshape(1, -1)
        ref_tokens = rd.get("ref_tokens")
        ref_mel = rd.get("ref_mel")
        if ref_tokens is not None and ref_mel is not None:
            tokens = np.concatenate(
                [np.asarray(ref_tokens, np.int32).reshape(1, -1), tokens],
                axis=1)
            wav = self.s3gen.tokens_to_wav(
                jnp.asarray(tokens), jnp.asarray(xvec),
                prompt_mel=jnp.asarray(ref_mel, jnp.float32).reshape(
                    1, -1, self.s3gen.flow_cfg.mel_dim), seed=seed)
        else:
            wav = self.s3gen.tokens_to_wav(jnp.asarray(tokens),
                                           jnp.asarray(xvec), seed=seed)
        return np.asarray(wav[0]), self.sr_out

    # ---- serve/tts_api backend protocol

    def register_voice(self, name: str, wav, sr: int) -> None:
        self.voice_store = getattr(self, "voice_store", {})
        self.voice_store[name] = self.conditioning(wav, sr)

    def generate(self, text: str, voice: str = "default", speed: float = 1.0,
                 seed: int = 0, exaggeration: float = 0.5,
                 cfg_weight: float = 0.5, **_):
        store = getattr(self, "voice_store", {})
        spk = store.get(voice)
        return self.synthesize(text, speaker_emb=spk,
                               exaggeration=exaggeration,
                               cfg_weight=cfg_weight, seed=seed)


def random_xtts_checkpoint(seed: int = 0) -> XttsCheckpointEngine:
    """Tiny random-weight XttsCheckpointEngine (smoke tests)."""
    from audiolab_tpu.models.xtts import (
        XttsConditioningEncoder,
        XttsGPT2,
        XttsHifiganDecoder,
        XttsPerceiverResampler,
        XttsSpeakerEncoder,
    )

    dim, sdim = 32, 24
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    gpt = XttsGPT2(layers=2, dim=dim, heads=2, n_text=40, n_audio=30,
                   max_text=32, max_mel=64, start_text=38, stop_text=0)
    cond_enc = XttsConditioningEncoder(dim=dim, heads=4, blocks=2)
    perc = XttsPerceiverResampler(dim=dim, depth=1, num_latents=6, heads=2,
                                  dim_head=8)
    spk = XttsSpeakerEncoder(layers=(1, 1, 1, 1), num_filters=(8, 16, 32, 64),
                             proj_dim=sdim)
    dec = XttsHifiganDecoder(input_dim=dim, cond_dim=sdim,
                             upsample_rates=(4, 4), upsample_kernels=(8, 8),
                             resblock_kernels=(3,),
                             resblock_dilations=((1, 3),),
                             initial_channel=32)
    gp = gpt.init(ks[0], jnp.zeros((1, 4), jnp.int32),
                  jnp.zeros((1, 4), jnp.int32),
                  jnp.zeros((1, 6, dim)))["params"]
    cp = cond_enc.init(ks[1], jnp.zeros((1, 8, 80)))["params"]
    pp = perc.init(ks[2], jnp.zeros((1, 8, dim)))["params"]
    sv = spk.init(ks[3], jnp.zeros((1, 40, 64)))
    sv = {"params": sv["params"], "batch_stats": sv["batch_stats"]}
    dp = dec.init(ks[4], jnp.zeros((1, 4, dim)), jnp.zeros((1, sdim)))["params"]
    return XttsCheckpointEngine(gpt, gp, cond_enc, cp, perc, pp, spk, sv,
                                dec, dp)


# ------------------------------------------------------- XTTS tokenizer

_XTTS_EN_ABBREV = [
    ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
    ("co", "company"), ("jr", "junior"), ("maj", "major"), ("gen", "general"),
    ("drs", "doctors"), ("rev", "reverend"), ("lt", "lieutenant"),
    ("hon", "honorable"), ("sgt", "sergeant"), ("capt", "captain"),
    ("esq", "esquire"), ("ltd", "limited"), ("col", "colonel"),
    ("ft", "fort"),
]
_XTTS_EN_SYMBOLS = [("&", " and "), ("@", " at "), ("%", " percent "),
                    ("#", " hash "), ("$", " dollar "), ("£", " pound "),
                    ("°", " degree ")]
_ONES = ("zero one two three four five six seven eight nine ten eleven "
         "twelve thirteen fourteen fifteen sixteen seventeen eighteen "
         "nineteen").split()
_TENS = ("twenty thirty forty fifty sixty seventy eighty "
         "ninety").split()


def _int_words(n: int) -> str:
    """Own English number-to-words (num2words is not in this image)."""
    if n < 0:
        return "minus " + _int_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t = _TENS[n // 10 - 2]
        return t if n % 10 == 0 else f"{t} {_ONES[n % 10]}"
    for div, name in ((10 ** 9, "billion"), (10 ** 6, "million"),
                      (1000, "thousand"), (100, "hundred")):
        if n >= div:
            rest = n % div
            head = f"{_int_words(n // div)} {name}"
            return head if rest == 0 else f"{head} {_int_words(rest)}"
    return str(n)


class XttsTokenizer:
    """XTTS-v2 VoiceBpeTokenizer wrapper (TTS/tts/layers/xtts/
    tokenizer.py:609-686): exact BPE path — ``[lang]`` prefix, spaces to
    ``[SPACE]``, the checkpoint's vocab.json via the installed
    ``tokenizers`` library.  The text cleaner is an OWN-code English
    normalizer (lowercase, quote strip, abbreviation/symbol/number
    expansion, whitespace collapse); non-English text passes through the
    BPE exactly but without language-specific number expansion
    (num2words is not in this image — flagged stand-in)."""

    def __init__(self, vocab_file: str):
        from tokenizers import Tokenizer

        self.tokenizer = Tokenizer.from_file(vocab_file)

    def _clean_en(self, text: str) -> str:
        text = text.replace('"', "").lower()
        text = re.sub(r"\d+", lambda m: _int_words(int(m.group())), text)
        for abbr, full in _XTTS_EN_ABBREV:
            text = re.sub(rf"\b{abbr}\.", full, text)
        for sym, full in _XTTS_EN_SYMBOLS:
            text = text.replace(sym, full)
        return re.sub(r"\s+", " ", text).strip()

    def encode(self, text: str, lang: str = "en") -> list[int]:
        lang = lang.split("-")[0]
        if lang == "en":
            text = self._clean_en(text)
        lang = "zh-cn" if lang == "zh" else lang
        text = f"[{lang}]{text}".replace(" ", "[SPACE]")
        return self.tokenizer.encode(text).ids

    def decode(self, ids) -> str:
        txt = self.tokenizer.decode(list(ids), skip_special_tokens=False)
        return (txt.replace(" ", "").replace("[SPACE]", " ")
                .replace("[STOP]", "").replace("[UNK]", ""))
