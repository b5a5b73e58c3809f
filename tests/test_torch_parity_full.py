"""FULL-MODULE torch parity (VERDICT r1 item 3): seeded torch replicas of
the reference architectures (tests/torch_ref_models.py) -> state_dict ->
utils/convert.py -> flax, asserting waveform + activation parity and the
BASELINE mel-L1 < 1e-2 gate on the end-to-end RVC synthesizer.

This is the real checkpoint path: the torch state_dict key names match the
published checkpoints, so any layout/arch divergence the converter would
hit on a downloaded .pth shows up here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiolab_tpu.utils.convert import convert_hubert, convert_rvc  # noqa: E402

from tests.torch_ref_models import (  # noqa: E402
    HubertTorch,
    SynthesizerTrnMs768NSFsid,
)

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")

# small-but-structurally-complete config (all the v2-48k structure, fewer
# channels so CPU runtime stays in seconds)
CFG = dict(
    spec_channels=129,
    segment_size=5760,
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    upsample_rates=(12, 10, 2, 2),
    upsample_initial_channel=64,
    spk_embed_dim=4,
    gin_channels=16,
    sr=48000,
    feat_channels=48,
)
UPSAMPLE_KERNELS = (24, 20, 4, 4)


def _flax_cfg():
    from audiolab_tpu.models.rvc.synthesizer import SynthesizerConfig

    return SynthesizerConfig(upsample_kernel_sizes=UPSAMPLE_KERNELS, **CFG)


def _build_pair(seed=0):
    torch.manual_seed(seed)
    t_model = SynthesizerTrnMs768NSFsid(
        upsample_kernel_sizes=UPSAMPLE_KERNELS, **CFG).eval()

    from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn

    cfg = _flax_cfg()
    f_model = SynthesizerTrn(cfg)
    t = 24
    template = f_model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, t, cfg.feat_channels)), jnp.full((1,), t, jnp.int32),
        jnp.ones((1, t), jnp.int32), jnp.full((1, t), 200.0),
        jnp.zeros((1,), jnp.int32), None,
        method=SynthesizerTrn.infer,
    )["params"]
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = convert_rvc(sd, template, strict=False)
    return t_model, f_model, params, cfg


@pytest.fixture(scope="module")
def pair():
    return _build_pair()


def _mel_l1(a: np.ndarray, b: np.ndarray, sr: int) -> float:
    """BASELINE gate metric: L1 between log-mel spectrograms."""
    from audiolab_tpu.kernels.mel import log_mel, mel_spectrogram

    n = min(len(a), len(b))
    ma = log_mel(mel_spectrogram(jnp.asarray(a[:n])[None], sr=sr, n_fft=1024,
                                 hop=256, n_mels=80))
    mb = log_mel(mel_spectrogram(jnp.asarray(b[:n])[None], sr=sr, n_fft=1024,
                                 hop=256, n_mels=80))
    return float(jnp.mean(jnp.abs(ma - mb)))


def test_rvc_full_infer_parity(pair):
    """torch SynthesizerTrn.infer vs converted flax: waveform + mel gate."""
    t_model, f_model, params, cfg = pair
    rng = np.random.default_rng(1)
    b, t = 1, 40
    phone = rng.standard_normal((b, t, cfg.feat_channels)).astype(np.float32)
    lengths = np.full((b,), t, np.int64)
    pitch = rng.integers(1, 255, (b, t))
    # fully-voiced f0 so SineGen's additive noise (std 0.003) stays tiny
    pitchf = rng.uniform(120, 300, (b, t)).astype(np.float32)
    sid = np.zeros((b,), np.int64)

    with torch.no_grad():
        ref = t_model.infer(
            torch.from_numpy(phone), torch.from_numpy(lengths),
            torch.from_numpy(pitch), torch.from_numpy(pitchf),
            torch.from_numpy(sid), deterministic=True,
        ).numpy()[:, 0]

    from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn

    out = f_model.apply(
        {"params": params}, jnp.asarray(phone),
        jnp.asarray(lengths, jnp.int32), jnp.asarray(pitch, jnp.int32),
        jnp.asarray(pitchf), jnp.asarray(sid, jnp.int32), None,
        method=SynthesizerTrn.infer,
    )
    out = np.asarray(out)

    assert out.shape == ref.shape, (out.shape, ref.shape)
    # raw waveform agreement (both deterministic; SineGen noise is the only
    # stochastic residue and is ~0.003 * tanh-net gain)
    assert np.abs(out - ref).max() < 5e-2, np.abs(out - ref).max()
    mel = _mel_l1(out[0], ref[0], cfg.sr)
    assert mel < 1e-2, f"mel-L1 {mel} >= 1e-2 (BASELINE gate)"


def test_rvc_stage_activations(pair):
    """Per-stage parity: enc_p stats and reverse flow output."""
    t_model, f_model, params, cfg = pair
    rng = np.random.default_rng(2)
    b, t = 2, 17
    phone = rng.standard_normal((b, t, cfg.feat_channels)).astype(np.float32)
    lengths = np.array([t, t - 5], np.int64)
    pitch = rng.integers(1, 255, (b, t))

    with torch.no_grad():
        m_t, logs_t, mask_t = t_model.enc_p(
            torch.from_numpy(phone), torch.from_numpy(pitch),
            torch.from_numpy(lengths))
        g_t = t_model.emb_g(torch.zeros(b, dtype=torch.long)).unsqueeze(-1)
        z_t = t_model.flow(m_t, mask_t, g=g_t, reverse=True)

    enc_p_vars = {"params": params["enc_p"]}
    from audiolab_tpu.models.rvc.synthesizer import (
        ResidualCouplingBlock,
        TextEncoder,
    )

    m_f, logs_f, mask_f = TextEncoder(cfg).apply(
        enc_p_vars, jnp.asarray(phone), jnp.asarray(pitch, jnp.int32),
        jnp.asarray(lengths, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(m_f).transpose(0, 2, 1), m_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(logs_f).transpose(0, 2, 1), logs_t.numpy(), atol=2e-4)

    g_f = np.asarray(params["emb_g"]["embedding"])[0][None, None, :]
    z_f = ResidualCouplingBlock(cfg).apply(
        {"params": params["flow"]}, np.asarray(m_f),
        np.asarray(mask_f), g=jnp.asarray(g_f), reverse=True)
    np.testing.assert_allclose(
        np.asarray(z_f).transpose(0, 2, 1), z_t.numpy(), atol=5e-4)


def test_hubert_full_parity():
    """fairseq-named torch HuBERT -> converter -> flax: layer-12 features.

    Layer-9/12 feature parity is the linchpin of RVC voice quality
    (SURVEY hard-parts list)."""
    torch.manual_seed(3)
    dim, layers = 64, 3
    t_model = HubertTorch(dim=dim, ffn_dim=dim * 4, heads=4, layers=layers,
                          final_dim=32).eval()

    from audiolab_tpu.models.hubert import HubertConfig, HubertFeatureExtractor

    cfg = HubertConfig(dim=dim, ffn_dim=dim * 4, heads=4, layers=layers,
                       final_dim=32)
    f_model = HubertFeatureExtractor(version="v2", cfg=cfg)
    wav = (np.random.default_rng(4).standard_normal(8000) * 0.1
           ).astype(np.float32)[None]
    template = f_model.init(jax.random.PRNGKey(0), jnp.asarray(wav))["params"]
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = convert_hubert(sd, template, strict=False)

    with torch.no_grad():
        ref = t_model.extract_features(torch.from_numpy(wav),
                                       output_layer=layers).numpy()
    out = np.asarray(f_model.apply({"params": params}, jnp.asarray(wav)))
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_hubert_v1_final_proj_parity():
    """v1 path: layer-9 features + final_proj to 256-d (pipeline.py:186-191)."""
    torch.manual_seed(5)
    dim, layers = 64, 3
    t_model = HubertTorch(dim=dim, ffn_dim=dim * 4, heads=4, layers=layers,
                          final_dim=32).eval()

    from audiolab_tpu.models.hubert import HubertConfig, HubertFeatureExtractor

    cfg = HubertConfig(dim=dim, ffn_dim=dim * 4, heads=4, layers=layers,
                       final_dim=32)
    f_model = HubertFeatureExtractor(version="v1", cfg=cfg, output_layer=2)
    wav = (np.random.default_rng(6).standard_normal(6400) * 0.1
           ).astype(np.float32)[None]
    template = f_model.init(jax.random.PRNGKey(0), jnp.asarray(wav))["params"]
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = convert_hubert(sd, template, strict=False)

    with torch.no_grad():
        feats = t_model.extract_features(torch.from_numpy(wav), output_layer=2)
        ref = t_model.final_proj(feats).numpy()
    out = np.asarray(f_model.apply({"params": params}, jnp.asarray(wav)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4)


# ------------------------------------------------------------------ RMVPE

def test_rmvpe_full_parity():
    """torch RMVPE E2E (rmvpe.pt key names) -> convert_rmvpe -> flax.

    Runs a structurally identical small variant (same code path, loop
    counts come from the template) in float64: XLA CPU convs use reduced
    precision in fp32 on this host (~2e-3 relative), which would mask
    nothing but adds noise; fp64 gives exact layout validation.
    """
    from tests.torch_ref_models import RmvpeE2ETorch

    import jax as _jax

    small = dict(n_blocks=2, en_de_layers=3, inter_layers=2,
                 en_out_channels=2, gru_hidden=8)
    torch.manual_seed(7)
    t_model = RmvpeE2ETorch(**small).double().eval()
    # randomize BN affine + running stats so a swap/misroute shows up
    gen = torch.Generator().manual_seed(8)
    for mod in t_model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.normal_(0.0, 0.5, generator=gen)
                mod.running_var.uniform_(0.5, 1.5, generator=gen)
                mod.weight.uniform_(0.5, 1.5, generator=gen)
                mod.bias.normal_(0.0, 0.5, generator=gen)

    from audiolab_tpu.models.rmvpe import E2E
    from audiolab_tpu.utils.convert import convert_rmvpe

    f_model = E2E(**small)
    _jax.config.update("jax_enable_x64", True)
    try:
        mel = np.random.default_rng(9).standard_normal((1, 24, 128)) * 0.7
        variables = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 24, 128), jnp.float64)))
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        conv = convert_rmvpe(sd, variables, strict=True)
        conv = _jax.tree.map(lambda a: a.astype(np.float64), conv)

        with torch.no_grad():
            ref = t_model(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()
        out = np.asarray(f_model.apply(conv, jnp.asarray(mel)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-10)
    finally:
        _jax.config.update("jax_enable_x64", False)


def test_rmvpe_fullsize_mapping_covers_checkpoint():
    """Every leaf of the FULL-SIZE E2E(4,1,(2,2)) tree has a mapping and the
    shapes line up with a fabricated rmvpe.pt-shaped state dict (template
    via eval_shape -- no compile)."""
    from audiolab_tpu.models.rmvpe import E2E
    from audiolab_tpu.utils.convert import (
        convert_rmvpe,
        rmvpe_mapping,
        rmvpe_stats_mapping,
        synth_state_dict,
    )

    f_model = E2E()
    variables = jax.eval_shape(
        lambda: f_model.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 128), jnp.float32)))
    sd = synth_state_dict(variables["params"],
                          rmvpe_mapping(variables["params"]), seed=3)
    sd.update(synth_state_dict(variables["batch_stats"],
                               rmvpe_stats_mapping(variables["batch_stats"]),
                               seed=4))
    conv = convert_rmvpe(sd, variables, strict=True)  # raises on any gap
    n = len(jax.tree.leaves(conv))
    assert n == len(jax.tree.leaves(variables)), n


# ------------------------------------------------------------ BS-RoFormer

def test_bs_roformer_full_parity():
    """torch BS-RoFormer (lucidrains state-dict names, the published
    separation checkpoint format) -> convert_roformer -> flax, audio in /
    stems out, in float64."""
    from tests.torch_ref_models import BSRoformerTorch

    import jax as _jax

    bands = (2, 3, 4)  # sums to 9 = 16//2+1
    kw = dict(dim=16, depth=2, heads=2, dim_head=8, freqs_per_bands=bands,
              n_fft=16, hop=8, channels=2, ff_mult=2, time_depth=1,
              freq_depth=2, mask_est_depth=2)
    torch.manual_seed(11)
    t_model = BSRoformerTorch(num_stems=2, **kw).double().eval()

    from audiolab_tpu.models.separation.roformer import (
        BSRoformer,
        RoformerConfig,
    )
    from audiolab_tpu.utils.convert import convert_roformer

    cfg = RoformerConfig(stems=("vocals", "other"), dtype="float64", **kw)
    f_model = BSRoformer(cfg)

    _jax.config.update("jax_enable_x64", True)
    try:
        audio = np.random.default_rng(12).standard_normal((1, 2, 96)) * 0.3
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 2, 96), jnp.float64))
        )["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_roformer(sd, template, stems=("vocals", "other"),
                                  strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)

        with torch.no_grad():
            ref = t_model(torch.from_numpy(audio)).numpy()  # (1,2,2,96)
        out = f_model.apply({"params": params}, jnp.asarray(audio))
        # the library keeps its DFT basis / rope cos-sin tables in float32
        # (TPU-native choice), so fp64 agreement floors at ~1e-6; layout
        # errors would be O(signal) = 1e-2, three orders above this gate
        for s, stem in enumerate(("vocals", "other")):
            got = np.asarray(out[stem])
            assert got.shape == ref[:, s].shape
            np.testing.assert_allclose(got, ref[:, s], atol=5e-5,
                                       err_msg=stem)
    finally:
        _jax.config.update("jax_enable_x64", False)


def test_bs_roformer_residual_stem():
    """num_stems=1 checkpoints: the complement stem is the mix residual."""
    from audiolab_tpu.models.separation.roformer import (
        BSRoformer,
        RoformerConfig,
    )

    cfg = RoformerConfig(dim=8, depth=1, heads=2, dim_head=4,
                         freqs_per_bands=(4, 5), n_fft=16, hop=8,
                         stems=("vocals",), residual_stem="other")
    model = BSRoformer(cfg)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2, 64)), jnp.float32)
    out = model.apply(model.init(jax.random.PRNGKey(0), audio), audio)
    assert set(out) == {"vocals", "other"}
    np.testing.assert_allclose(np.asarray(out["vocals"] + out["other"]),
                               np.asarray(audio), atol=1e-4)


# -------------------------------------------------------------------- DAC

def test_dac_decoder_full_parity():
    """torch DAC decode path (published state-dict names) ->
    convert_dac -> flax, codes in / audio out, fp64."""
    from tests.torch_ref_models import DACDecoderTorch

    import jax as _jax

    torch.manual_seed(31)
    t_model = DACDecoderTorch(latent=32, decoder_dim=64, rates=(4, 2),
                              n_q=3, cb_size=32, cb_dim=4).double().eval()

    from audiolab_tpu.models.codecs import DACConfig, DACDecoder
    from audiolab_tpu.utils.convert import convert_dac

    cfg = DACConfig(dim=32, decoder_dim=64, rates=(4, 2), n_q=3,
                    codebook_size=32, codebook_dim=4)
    f_model = DACDecoder(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        codes = np.random.default_rng(32).integers(0, 32, (2, 3, 16))
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, 4), jnp.int32)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_dac(sd, template, strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(codes)).numpy()[:, 0]
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(codes)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        # the Snake activation computes in float32 on purpose (TPU VPU
        # path), flooring fp64 agreement at ~1e-7; layout errors are O(0.1)
        np.testing.assert_allclose(out, ref, atol=1e-6)
    finally:
        _jax.config.update("jax_enable_x64", False)


# ------------------------------------------------------------------ Vocos

def test_vocos_full_parity():
    """torch Vocos (charactr key names) -> convert_vocos -> flax: latents
    in / audio out (ConvNeXt trunk + iSTFT head), fp64."""
    from tests.torch_ref_models import VocosTorch

    import jax as _jax

    torch.manual_seed(41)
    t_model = VocosTorch(in_dim=16, dim=32, n_layers=2, n_fft=64,
                         hop=16).double().eval()

    from audiolab_tpu.models.codecs import Vocos, VocosConfig
    from audiolab_tpu.utils.convert import convert_vocos

    f_model = Vocos(VocosConfig(dim=32, n_layers=2, ffn_mult=3, n_fft=64,
                                hop=16))
    _jax.config.update("jax_enable_x64", True)
    try:
        z = np.random.default_rng(42).standard_normal((2, 12, 16)) * 0.5
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 8, 16), jnp.float64)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_vocos(sd, template, strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(z)).numpy()
        out = np.asarray(f_model.apply({"params": params}, jnp.asarray(z)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        # fp32 hann/iDFT tables in the library floor agreement ~1e-6
        np.testing.assert_allclose(out, ref, atol=5e-5)
    finally:
        _jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------- LLaMA-arch LM

def test_llama_lm_full_parity():
    """HF-LLaMA-named torch replica -> convert_llama -> TransformerLM:
    full-sequence logits parity in fp64, with GQA (kv_heads < heads).
    This is YuE stage-1/2's checkpoint format."""
    from tests.torch_ref_models import LlamaTorch

    import jax as _jax

    torch.manual_seed(51)
    t_model = LlamaTorch(vocab=64, dim=32, layers=2, heads=4, kv_heads=2,
                         ffn=64).double().eval()

    from audiolab_tpu.models.lm import LMConfig, TransformerLM
    from audiolab_tpu.utils.convert import convert_llama

    cfg = LMConfig(vocab_size=64, dim=32, n_layers=2, n_heads=4,
                   n_kv_heads=2, ffn_dim=64, max_seq_len=64,
                   dtype="float64")
    f_model = TransformerLM(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        ids = np.random.default_rng(52).integers(0, 64, (2, 12))
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 4), jnp.int32)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_llama(sd, template, strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(ids)).numpy()
        out, _ = f_model.apply({"params": params}, jnp.asarray(ids))
        out = np.asarray(out)
        assert out.shape == ref.shape, (out.shape, ref.shape)
        # apply_rope/RMSNorm pin float32 internally (TPU design), flooring
        # fp64 agreement at ~1e-7; layout errors would be O(1)
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        _jax.config.update("jax_enable_x64", False)


def test_llama_tied_embeddings_fallback():
    """Checkpoints without lm_head.weight reuse embed_tokens (tied)."""
    from audiolab_tpu.models.lm import LMConfig, TransformerLM
    from audiolab_tpu.utils.convert import convert_llama, llama_mapping, synth_state_dict

    cfg = LMConfig(vocab_size=16, dim=8, n_layers=1, n_heads=2,
                   n_kv_heads=2, ffn_dim=16, max_seq_len=16,
                   dtype="float32")
    model = TransformerLM(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32)))["params"]
    sd = synth_state_dict(template, llama_mapping(template), seed=5)
    del sd["lm_head.weight"]
    params = convert_llama(sd, template, strict=True)
    np.testing.assert_allclose(
        np.asarray(params["lm_head"]["kernel"]),
        np.asarray(params["tok_emb"]["embedding"]).T)


# -------------------------------------------------------------------- Dia

def test_dia_full_parity():
    """nari-labs-named torch Dia replica -> convert_dia -> flax DiaModel:
    teacher-forcing last-position logits parity in fp64 (GQA self-attn,
    rotary cross K at source positions, softmax scale 1.0)."""
    from tests.torch_ref_models import DiaTorch

    import jax as _jax

    from audiolab_tpu.models.dia import DiaConfig, DiaModel
    from audiolab_tpu.utils.convert import convert_dia

    torch.manual_seed(61)
    t_model = DiaTorch(dim_enc=16, dim_dec=32, n_enc=1, n_dec=2, heads=4,
                       kv_heads=2, hd_dec=8, xhd=8, enc_heads=2,
                       channels=3, vocab=20).double().eval()
    cfg = DiaConfig(dim_enc=16, dim_dec=32, n_layers_enc=1, n_layers_dec=2,
                    n_heads=4, kv_heads=2, head_dim_dec=8, cross_head_dim=8,
                    n_heads_enc=2, n_codebooks=3, codebook_size=20,
                    max_audio_len=32, max_text_len=16, dtype="float64")
    f_model = DiaModel(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(62)
        text = rng.integers(1, 256, (2, 8))
        codes = rng.integers(0, 20, (2, 3, 6))
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 8), jnp.int32),
                                 jnp.zeros((1, 3, 4), jnp.int32)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_dia(sd, template, cfg, strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(text),
                          torch.from_numpy(codes)).numpy()
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(text), jnp.asarray(codes)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        # fp32-pinned rope/RMSNorm internals floor agreement ~1e-6
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        _jax.config.update("jax_enable_x64", False)


# ----------------------------------------------------------- xcodec (YuE)

def test_xcodec_decoder_full_parity():
    """YuE xcodec decode path (encodec RVQ + dac2 decoder with the odd
    stride-5 block) -> convert_xcodec -> flax, fp64.  Exercises the
    torch-exact transposed conv (output_padding on odd strides)."""
    from tests.torch_ref_models import XCodecDecoderTorch

    import jax as _jax

    torch.manual_seed(91)
    t_model = XCodecDecoderTorch(n_q=2, bins=16, dim=12, acoustic=4,
                                 dec_dim=16, rates=(2, 5)).double().eval()

    from audiolab_tpu.models.codecs import XCodecConfig, XCodecDecoder
    from audiolab_tpu.utils.convert import convert_xcodec

    cfg = XCodecConfig(n_q=2, codebook_size=16, dim=12, acoustic_dim=4,
                       decoder_dim=16, rates=(2, 5))
    f_model = XCodecDecoder(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        codes = np.random.default_rng(92).integers(0, 16, (2, 2, 9))
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 2, 4), jnp.int32)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_xcodec(sd, template, strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(codes)).numpy()[:, 0]
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(codes)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        # fp32-pinned Snake floors agreement ~1e-7
        np.testing.assert_allclose(out, ref, atol=1e-6)
    finally:
        _jax.config.update("jax_enable_x64", False)


# ------------------------------------------------------------------ Zonos

def test_zonos_backbone_full_parity():
    """Zonos transformer-variant (mamba_ssm MHA + GatedMLP blocks) ->
    convert_zonos -> flax backbone/embeddings/heads, full-seq per-codebook
    logits in fp64.  (Hybrid Mamba2 mixers + espeak prefix conditioner are
    documented weights-gated cuts.)"""
    from tests.torch_ref_models import ZonosTorch

    import jax as _jax

    from audiolab_tpu.models.zonos import ZonosConfig, ZonosModel
    from audiolab_tpu.utils.convert import convert_zonos

    torch.manual_seed(101)
    t_model = ZonosTorch(dim=32, heads=4, layers=2, n_codebooks=3,
                         emb_size=20, head_size=19, hidden=128
                         ).double().eval()
    cfg = ZonosConfig(dim=32, n_layers=2, attn_every=1, n_heads=4,
                      n_codebooks=3, codebook_size=20, head_size=19,
                      max_seq_len=64, spk_dim=8)
    f_model = ZonosModel(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        codes = np.random.default_rng(102).integers(0, 20, (2, 3, 10))
        # template via a real init of the full model (prefill traces the
        # conditioners too; they stay random — unmapped by design)
        variables = f_model.init(
            {"params": _jax.random.PRNGKey(0)},
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, cfg.spk_dim)),
            jnp.zeros((1, 8)), jnp.zeros((1, 1)), jnp.zeros((1, 1)),
            jnp.zeros((1, 3, 1), jnp.int32), method=ZonosModel.prefill)
        template = variables["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_zonos(sd, template, cfg)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)

        with torch.no_grad():
            ref = t_model(torch.from_numpy(codes)).numpy()

        def fwd(m, c):
            x = m.embed_codes(c)
            h = m.backbone(x, jnp.arange(c.shape[2]))
            return jnp.stack([head(h) for head in m.heads], axis=1)

        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(codes), method=fwd))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        _jax.config.update("jax_enable_x64", False)


# ------------------------------------------------------- Mel-Band RoFormer

def test_mel_band_roformer_full_parity():
    """Overlapping mel bands: gather + scatter-add/count-normalize masks
    (lucidrains mel_band_roformer, the dereverb/denoise + Kim vocal
    checkpoints) -> same converter -> flax, fp64."""
    from tests.torch_ref_models import MelBandRoformerTorch

    import jax as _jax

    from audiolab_tpu.models.separation.roformer import (
        BSRoformer,
        RoformerConfig,
    )
    from audiolab_tpu.utils.convert import convert_roformer

    band_bins = ((0, 1, 2), (2, 3, 4, 5), (5, 6, 7, 8))  # overlaps at 2, 5
    kw = dict(dim=16, depth=1, heads=2, dim_head=8, n_fft=16, hop=8,
              channels=2, ff_mult=2, time_depth=1, freq_depth=1,
              mask_est_depth=2)
    torch.manual_seed(111)
    t_model = MelBandRoformerTorch(band_bins, num_stems=1,
                                   **kw).double().eval()

    cfg = RoformerConfig(stems=("vocals",), band_bins=band_bins,
                         dtype="float64", **kw)
    f_model = BSRoformer(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        audio = np.random.default_rng(112).standard_normal((1, 2, 96)) * 0.3
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 2, 96), jnp.float64))
        )["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_roformer(sd, template, stems=("vocals",),
                                  strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(audio)).numpy()[:, 0]
        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(audio))["vocals"])
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=5e-5)
    finally:
        _jax.config.update("jax_enable_x64", False)


def test_mel_band_bins_layout():
    from audiolab_tpu.models.separation.roformer import mel_band_bins

    bands = mel_band_bins(24, 2048, 44100)
    assert len(bands) == 24
    assert 0 in bands[0] and 1024 in bands[-1]
    covered = set()
    for b in bands:
        covered.update(b)
    assert covered == set(range(1025))  # every bin belongs to a band


# ---------------------------------------------------------------- Whisper

def test_whisper_full_parity():
    """OpenAI-whisper-named torch replica -> convert_whisper -> flax:
    teacher-forced logits parity in fp64 (tied-embedding head, stride-2
    conv front-end alignment, sinusoidal encoder positions)."""
    from tests.torch_ref_models import WhisperTorch

    import jax as _jax

    from audiolab_tpu.models.whisper import WhisperConfig, WhisperModel
    from audiolab_tpu.utils.convert import convert_whisper

    torch.manual_seed(121)
    t_model = WhisperTorch(n_mels=20, dim=64, heads=4, enc_layers=2,
                           dec_layers=2, vocab=100, n_text_ctx=32,
                           n_audio_ctx=50).double().eval()
    cfg = WhisperConfig(n_mels=20, dim=64, n_heads=4, n_audio_layers=2,
                        n_text_layers=2, vocab_size=100, n_text_ctx=32,
                        n_audio_ctx=50, sot=90, eot=89, no_timestamps=91,
                        timestamp_base=92)
    f_model = WhisperModel(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(122)
        mel = rng.standard_normal((2, 100, 20)) * 0.5
        toks = rng.integers(0, 100, (2, 7))
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 100, 20), jnp.float64),
                                 jnp.zeros((1, 4), jnp.int32)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_whisper(sd, template, strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(mel),
                          torch.from_numpy(toks)).numpy()
        xa = f_model.apply({"params": params}, jnp.asarray(mel),
                           method=WhisperModel.encode)
        out, _ = f_model.apply({"params": params}, jnp.asarray(toks), xa,
                               method=WhisperModel.decode)
        out = np.asarray(out)
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        _jax.config.update("jax_enable_x64", False)


# -------------------------------------------------------------- OpenVoice

def test_openvoice_full_parity():
    """OpenVoice tone-color converter (converter.pth key names:
    ref_enc/enc_q/flow/dec) -> convert_openvoice -> flax: full
    voice-conversion path (spec -> converted waveform) in fp64."""
    from tests.torch_ref_models import OpenVoiceTorch

    import jax as _jax

    from audiolab_tpu.models.openvoice import (
        ToneColorConfig,
        ToneColorConverter,
    )
    from audiolab_tpu.utils.convert import convert_openvoice

    torch.manual_seed(131)
    t_model = OpenVoiceTorch(spec_channels=129, inter=8, hidden=16,
                             gin=16).double().eval()
    cfg = ToneColorConfig(sr=8000, n_fft=256, hop=64, spec_channels=129,
                          inter_channels=8, hidden_channels=16,
                          gin_channels=16, upsample_rates=(4, 4, 2, 2),
                          upsample_kernel_sizes=(8, 8, 4, 4),
                          upsample_initial_channel=32)
    f_model = ToneColorConverter(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(132)
        spec = np.abs(rng.standard_normal((1, 12, 129))) * 0.5
        ref_a = np.abs(rng.standard_normal((1, 70, 129))) * 0.5
        ref_b = np.abs(rng.standard_normal((1, 70, 129))) * 0.5
        lengths = np.array([12], np.int64)
        template = _jax.eval_shape(
            lambda: f_model.init(
                _jax.random.PRNGKey(0),
                jnp.zeros((1, 8, 129), jnp.float64),
                jnp.full((1,), 8, jnp.int32),
                jnp.zeros((1, 9, 129), jnp.float64),
                jnp.zeros((1, 9, 129), jnp.float64)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_openvoice(sd, template, strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)

        with torch.no_grad():
            ref = t_model.voice_conversion(
                torch.from_numpy(spec.transpose(0, 2, 1)),
                torch.from_numpy(lengths),
                torch.from_numpy(ref_a),
                torch.from_numpy(ref_b)).numpy()[:, 0]
        out = np.asarray(f_model.apply(
            {"params": params}, jnp.asarray(spec),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(ref_a),
            jnp.asarray(ref_b)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        _jax.config.update("jax_enable_x64", False)


def test_zonos_hybrid_mamba2_full_parity():
    """Zonos HYBRID backbone (Mamba2 mixers + attention every 3rd layer)
    -> convert_zonos -> flax, full-seq logits in fp64.  Validates the SSD
    recurrence (per-head decay, gated RMSNorm) against a naive torch
    implementation with mamba_ssm key names."""
    from tests.torch_ref_models import ZonosHybridTorch

    import jax as _jax

    from audiolab_tpu.models.zonos import ZonosConfig, ZonosModel
    from audiolab_tpu.utils.convert import convert_zonos

    torch.manual_seed(141)
    t_model = ZonosHybridTorch(dim=32, heads=4, layers=3, attn_every=3,
                               n_codebooks=3, emb_size=20, head_size=19,
                               hidden=128, d_state=16, headdim=8
                               ).double().eval()
    cfg = ZonosConfig(dim=32, n_layers=3, attn_every=3, n_heads=4,
                      d_state=16, headdim=8, mixer="mamba2", n_codebooks=3,
                      codebook_size=20, head_size=19, max_seq_len=64,
                      spk_dim=8)
    f_model = ZonosModel(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        codes = np.random.default_rng(142).integers(0, 20, (2, 3, 10))
        variables = f_model.init(
            {"params": _jax.random.PRNGKey(0)},
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, cfg.spk_dim)),
            jnp.zeros((1, 8)), jnp.zeros((1, 1)), jnp.zeros((1, 1)),
            jnp.zeros((1, 3, 1), jnp.int32), method=ZonosModel.prefill)
        template = variables["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_zonos(sd, template, cfg)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)

        with torch.no_grad():
            ref = t_model(torch.from_numpy(codes)).numpy()

        def fwd(m, c):
            x = m.embed_codes(c)
            h = m.backbone(x, jnp.arange(c.shape[2]))
            return jnp.stack([head(h) for head in m.heads], axis=1)

        out = np.asarray(f_model.apply({"params": params},
                                       jnp.asarray(codes), method=fwd))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        _jax.config.update("jax_enable_x64", False)


# ----------------------------------------------------------- ADaMoS vocoder

def test_adamos_vocoder_full_parity():
    """ACE-Step's ADaMoS HiFiGAN vocoder (ConvNeXt backbone + SiLU
    HiFiGAN head) -> convert_adamos -> flax, mel in / audio out, fp64."""
    from tests.torch_ref_models import AdamosTorch

    import jax as _jax

    from audiolab_tpu.models.adamos_vocoder import AdamosConfig, AdamosVocoder
    from audiolab_tpu.utils.convert import convert_adamos

    torch.manual_seed(151)
    t_model = AdamosTorch(input_channels=8, depths=(1, 1), dims=(8, 16),
                          rates=(4, 2), kernels=(8, 4), res_k=(3, 7),
                          init_ch=16).double().eval()
    cfg = AdamosConfig(input_channels=8, depths=(1, 1), dims=(8, 16),
                       upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                       resblock_kernel_sizes=(3, 7),
                       resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
                       num_mels=16, upsample_initial_channel=16)
    f_model = AdamosVocoder(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        mel = np.random.default_rng(152).standard_normal((2, 12, 8)) * 0.5
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 6, 8), jnp.float64)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_adamos(sd, template, strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(mel.transpose(0, 2, 1))
                          ).numpy()[:, 0]
        out = np.asarray(f_model.apply({"params": params}, jnp.asarray(mel)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-6)
    finally:
        _jax.config.update("jax_enable_x64", False)


# ------------------------------------------------------------ ACE-Step DiT

def test_acestep_dit_full_parity():
    """torch ACE-Step transformer replica (published key names) ->
    convert_acestep_dit -> flax ACEStepDiT: velocity + SSL projections,
    fp64, with a partially-masked conditioning sequence."""
    from tests.torch_ref_models import ACEStepDiTTorch

    import jax as _jax

    torch.manual_seed(41)
    t_model = ACEStepDiTTorch().double().eval()

    from audiolab_tpu.models.acestep_dit import ACEStepDiT, ACEStepDiTConfig
    from audiolab_tpu.utils.convert import convert_acestep_dit

    cfg = ACEStepDiTConfig(
        in_channels=2, num_layers=2, num_attention_heads=2,
        attention_head_dim=4, out_channels=2, patch_height=4,
        speaker_embedding_dim=6, text_embedding_dim=5, lyric_vocab_size=20,
        lyric_hidden_size=12, ssl_latent_dims=(7, 9), ssl_encoder_depths=(0, 1),
        dtype="float64")
    f_model = ACEStepDiT(cfg)
    _jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(42)
        b, t, tl, tx = 2, 6, 5, 3
        latent = rng.standard_normal((b, 2, 4, t))
        mask = np.ones((b, t))
        text = rng.standard_normal((b, tx, 5))
        text_mask = np.ones((b, tx))
        spk = rng.standard_normal((b, 6))
        lyr = rng.standard_normal((b, tl, 12))
        lyr_mask = np.ones((b, tl))
        lyr_mask[:, -2:] = 0.0  # exercise the additive cross-attn mask
        tt = rng.uniform(0.1, 0.9, (b,))

        def init_fn():
            return f_model.init(
                _jax.random.PRNGKey(0), jnp.asarray(latent),
                jnp.asarray(mask), jnp.asarray(text), jnp.asarray(text_mask),
                jnp.asarray(spk), jnp.asarray(tt), jnp.asarray(lyr),
                jnp.asarray(lyr_mask), return_hidden=True)["params"]

        template = _jax.eval_shape(init_fn)
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_acestep_dit(sd, template, strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)

        with torch.no_grad():
            ref, ref_proj = t_model(
                torch.from_numpy(latent), torch.from_numpy(mask),
                torch.from_numpy(text), torch.from_numpy(text_mask),
                torch.from_numpy(spk), torch.from_numpy(tt),
                torch.from_numpy(lyr), torch.from_numpy(lyr_mask))
        out, proj = f_model.apply(
            {"params": params}, jnp.asarray(latent), jnp.asarray(mask),
            jnp.asarray(text), jnp.asarray(text_mask), jnp.asarray(spk),
            jnp.asarray(tt), jnp.asarray(lyr), jnp.asarray(lyr_mask),
            return_hidden=True)
        out = np.asarray(out)
        assert out.shape == tuple(ref.shape), (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref.numpy(), atol=1e-10)
        assert len(proj) == len(ref_proj) == 2
        for p, rp in zip(proj, ref_proj):
            np.testing.assert_allclose(np.asarray(p), rp.numpy(), atol=1e-10)
    finally:
        _jax.config.update("jax_enable_x64", False)


def test_acestep_dit_mapping_covers_published_shape():
    """Mapping completeness at the published geometry (patch (16,1),
    in_ch 8, 2048-wide patch conv) on a 3-layer slice: every template leaf
    fills from a fabricated checkpoint-shaped state dict."""
    from audiolab_tpu.models.acestep_dit import ACEStepDiT, ACEStepDiTConfig
    from audiolab_tpu.utils.convert import (
        acestep_dit_mapping,
        convert_acestep_dit,
        synth_state_dict,
    )

    cfg = ACEStepDiTConfig(num_layers=3, num_attention_heads=4,
                           attention_head_dim=8, ssl_latent_dims=(16, 24),
                           ssl_encoder_depths=(1, 2))
    f_model = ACEStepDiT(cfg)
    template = jax.eval_shape(
        lambda: f_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 4)),
            jnp.ones((1, 4)), jnp.zeros((1, 2, 768)), jnp.ones((1, 2)),
            jnp.zeros((1, 512)), jnp.full((1,), 0.5),
            jnp.zeros((1, 3, 1024)), jnp.ones((1, 3)),
            return_hidden=True)["params"])
    # embed_lyrics is a separate entry point; its table must convert too
    template = dict(template) | dict(jax.eval_shape(
        lambda: f_model.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 3), jnp.int32),
                             method=ACEStepDiT.embed_lyrics)["params"]))
    assert "lyric_embs" in template
    sd = synth_state_dict(template, acestep_dit_mapping(template), seed=5)
    conv = convert_acestep_dit(sd, template, strict=True)
    assert len(jax.tree.leaves(conv)) == len(jax.tree.leaves(template))


def test_acestep_lyric_conformer_parity():
    """torch wenet-style replica (pad-trick rel-shift) ->
    convert_acestep_lyric -> flax LyricConformerEncoder (gather rel-shift):
    fp64 with a padded batch."""
    from tests.torch_ref_models import LyricConformerTorch

    import jax as _jax

    torch.manual_seed(51)
    t_model = LyricConformerTorch().double().eval()

    from audiolab_tpu.models.acestep_dit import LyricConformerEncoder
    from audiolab_tpu.utils.convert import convert_acestep_lyric

    f_model = LyricConformerEncoder(dim=16, heads=2, ffn_dim=24,
                                    num_blocks=2, dtype="float64")
    _jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(52)
        x = rng.standard_normal((2, 7, 12))
        mask = np.ones((2, 7))
        mask[1, -3:] = 0.0
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0),
                                 jnp.zeros((1, 7, 12), jnp.float64),
                                 jnp.ones((1, 7)))["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_acestep_lyric(sd, template, strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
        out = np.asarray(f_model.apply({"params": params}, jnp.asarray(x),
                                       jnp.asarray(mask)))
        assert out.shape == ref.shape
        # padded rows diverge (softmax over zeroed cols feeds them) — they
        # are masked out downstream by the concatenated encoder mask
        valid = mask[..., None].astype(bool) & np.ones_like(ref, bool)
        np.testing.assert_allclose(out[valid[..., 0]], ref[valid[..., 0]],
                                   atol=1e-10)
    finally:
        _jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------- Zonos prefix bank

def test_zonos_prefix_conditioner_parity():
    """torch prefix-bank replica (published key names) ->
    convert_zonos_prefix -> flax ZonosPrefixConditioner, fp64; both with a
    full cond dict and with absent slots (learned uncond vectors)."""
    from tests.torch_ref_models import ZonosPrefixTorch

    import jax as _jax

    from audiolab_tpu.models.zonos import CondSpec, ZonosPrefixConditioner
    from audiolab_tpu.utils.convert import convert_zonos_prefix

    dim = 12
    specs = (
        CondSpec("EspeakPhonemeConditioner", "espeak"),
        CondSpec("PassthroughConditioner", "speaker", cond_dim=6,
                 projection="mlp", uncond_type="learned"),
        CondSpec("FourierConditioner", "emotion", input_dim=4,
                 uncond_type="learned"),
        CondSpec("FourierConditioner", "pitch_std", min_val=0.0,
                 max_val=400.0, projection="linear", uncond_type="learned"),
        CondSpec("IntegerConditioner", "language_id", min_val=-1.0,
                 max_val=10.0, uncond_type="learned"),
    )
    torch.manual_seed(61)
    t_model = ZonosPrefixTorch(dim, specs, projection="mlp").double().eval()
    with torch.no_grad():  # make uncond vectors non-zero so a swap shows
        for c in t_model.conditioners:
            if hasattr(c, "uncond_vector"):
                c.uncond_vector.normal_(0, 0.5)
                # keep f32-representable: the flax template is f32, so
                # fill_tree rounds through f32 before the f64 upcast
                c.uncond_vector.copy_(c.uncond_vector.float().double())

    f_model = ZonosPrefixConditioner(dim, specs, projection="mlp")
    _jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(62)
        full = {
            "espeak": np.asarray([[2, 30, 40, 3]]),
            "speaker": rng.standard_normal((1, 1, 6)),
            "emotion": rng.random((1, 1, 4)),
            "pitch_std": rng.random((1, 1, 1)) * 300,
            "language_id": np.asarray([[[3]]]),
        }
        fj = {"espeak": jnp.asarray(full["espeak"]),
              "speaker": jnp.asarray(full["speaker"]),
              "emotion": jnp.asarray(full["emotion"]),
              "pitch_std": jnp.asarray(full["pitch_std"]),
              "language_id": jnp.asarray(full["language_id"])}
        template = _jax.eval_shape(
            lambda: f_model.init(_jax.random.PRNGKey(0), fj)["params"])
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_zonos_prefix(sd, template, specs, projection="mlp",
                                      strict=True)
        params = _jax.tree.map(lambda a: a.astype(np.float64), params)

        ft = {"espeak": torch.from_numpy(full["espeak"]),
              "speaker": torch.from_numpy(full["speaker"]),
              "emotion": torch.from_numpy(full["emotion"]),
              "pitch_std": torch.from_numpy(full["pitch_std"]),
              "language_id": torch.from_numpy(full["language_id"])}
        with torch.no_grad():
            ref = t_model(ft).numpy()
        out = np.asarray(f_model.apply({"params": params}, fj))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-10)

        # absent slots -> learned uncond vectors
        part_t = {"espeak": ft["espeak"], "pitch_std": ft["pitch_std"]}
        part_f = {"espeak": fj["espeak"], "pitch_std": fj["pitch_std"]}
        with torch.no_grad():
            ref2 = t_model(part_t).numpy()
        out2 = np.asarray(f_model.apply({"params": params}, part_f))
        np.testing.assert_allclose(out2, ref2, atol=1e-10)
    finally:
        _jax.config.update("jax_enable_x64", False)
