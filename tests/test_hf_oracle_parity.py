"""Parity vs the INSTALLED transformers package — fully independent oracles.

The seeded torch replicas in tests/torch_ref_models.py are strong but were
written alongside the flax models; these tests instead check three core
architectures against implementations nobody in this repo wrote:

- LLaMA (YuE stage-1/2 checkpoint format, modules/yue/inference/infer.py:245
  loads AutoModelForCausalLM) vs transformers.LlamaForCausalLM
- HuBERT (RVC's feature extractor, modules/rvc/infer/modules/vc/utils.py:181)
  vs transformers.HubertModel (fairseq-weights-compatible architecture)
- Whisper (transcription engine, layouts/transcribe.py) vs
  transformers.WhisperModel

All in fp64 with f32-snapped weights (fill_tree rounds through the f32
template), per the repo parity recipe.
"""

import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tfm = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # torch-oracle/wheel-parity tier (pytest.ini: fast tier = -m "not slow")


def _snap_f32(model):
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(p.float().double())
    return model


def test_llama_vs_transformers():
    from transformers import LlamaConfig, LlamaForCausalLM

    from audiolab_tpu.models.lm import LMConfig, TransformerLM
    from audiolab_tpu.utils.convert import convert_llama

    torch.manual_seed(700)
    hf_cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
        attention_bias=False, tie_word_embeddings=False,
        attn_implementation="eager")
    t_model = _snap_f32(LlamaForCausalLM(hf_cfg).double().eval())

    cfg = LMConfig(vocab_size=64, dim=32, n_layers=2, n_heads=4,
                   n_kv_heads=2, ffn_dim=64, max_seq_len=64, dtype="float64")
    f_model = TransformerLM(cfg)
    jax.config.update("jax_enable_x64", True)
    try:
        ids = np.random.default_rng(701).integers(0, 64, (2, 12))
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 4), jnp.int32)))["params"]
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        params = convert_llama(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(ids)).logits.numpy()
        out, _ = f_model.apply({"params": params}, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def _hf_hubert_to_fairseq(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        if "masked_spec_embed" in k:
            continue
        nk = k
        nk = nk.replace("feature_projection.projection", "post_extract_proj")
        nk = nk.replace("feature_projection.layer_norm", "layer_norm")
        nk = re.sub(r"feature_extractor\.conv_layers\.(\d+)\.conv\.",
                    r"feature_extractor.conv_layers.\1.0.", nk)
        nk = nk.replace("feature_extractor.conv_layers.0.layer_norm",
                        "feature_extractor.conv_layers.0.2")
        nk = nk.replace("encoder.pos_conv_embed.conv", "encoder.pos_conv.0")
        nk = re.sub(r"encoder\.layers\.(\d+)\.attention\.",
                    r"encoder.layers.\1.self_attn.", nk)
        nk = re.sub(r"encoder\.layers\.(\d+)\.layer_norm\.",
                    r"encoder.layers.\1.self_attn_layer_norm.", nk)
        nk = nk.replace(".feed_forward.intermediate_dense", ".fc1")
        nk = nk.replace(".feed_forward.output_dense", ".fc2")
        out[nk] = v.detach().numpy()
    return out


def test_hubert_vs_transformers():
    from transformers import HubertConfig as HFHubertConfig
    from transformers import HubertModel

    from audiolab_tpu.models.hubert import HubertConfig, HubertFeatureExtractor
    from audiolab_tpu.utils.convert import convert_hubert

    torch.manual_seed(710)
    hf_cfg = HFHubertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=[512] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2], conv_stride=[5, 2, 2, 2, 2, 2, 2],
        feat_extract_norm="group", do_stable_layer_norm=False,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        layer_norm_eps=1e-5, hidden_act="gelu", feat_extract_activation="gelu",
        layerdrop=0.0, attn_implementation="eager")
    t_model = _snap_f32(HubertModel(hf_cfg).double().eval())

    cfg = HubertConfig(dim=64, ffn_dim=128, heads=4, layers=2)
    f_model = HubertFeatureExtractor(version="v2", cfg=cfg)
    jax.config.update("jax_enable_x64", True)
    try:
        wav = np.random.default_rng(711).standard_normal((2, 3200)) * 0.1
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3200))))["params"]
        sd = _hf_hubert_to_fairseq(t_model.state_dict())
        params = convert_hubert(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(wav)).last_hidden_state.numpy()
        out = np.asarray(f_model.apply({"params": params}, jnp.asarray(wav)))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def _hf_whisper_to_openai(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        nk = k
        if nk.startswith("model."):
            nk = nk[len("model."):]
        if nk == "encoder.embed_positions.weight":
            continue  # sinusoidal buffer — both sides compute it
        nk = nk.replace("decoder.embed_tokens", "decoder.token_embedding")
        if nk == "decoder.embed_positions.weight":
            nk = "decoder.positional_embedding"
        nk = nk.replace("encoder.layer_norm", "encoder.ln_post")
        nk = nk.replace("decoder.layer_norm", "decoder.ln")
        nk = re.sub(r"\.layers\.(\d+)\.", r".blocks.\1.", nk)
        nk = nk.replace(".self_attn_layer_norm", ".attn_ln")
        nk = nk.replace(".encoder_attn_layer_norm", ".cross_attn_ln")
        nk = nk.replace(".self_attn.", ".attn.")
        nk = nk.replace(".encoder_attn.", ".cross_attn.")
        for hf, oa in (("q_proj", "query"), ("k_proj", "key"),
                       ("v_proj", "value"), ("out_proj", "out")):
            nk = nk.replace(f".{hf}.", f".{oa}.")
        nk = nk.replace(".fc1.", ".mlp.0.")
        nk = nk.replace(".fc2.", ".mlp.2.")
        nk = nk.replace(".final_layer_norm", ".mlp_ln")
        out[nk] = v.detach().numpy()
    return out


def test_whisper_vs_transformers():
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperModel as HFWhisperModel
    from transformers.models.whisper.modeling_whisper import sinusoids

    from audiolab_tpu.models.whisper import WhisperConfig, WhisperModel
    from audiolab_tpu.utils.convert import convert_whisper

    torch.manual_seed(720)
    hf_cfg = HFWhisperConfig(
        vocab_size=100, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=256, decoder_ffn_dim=256, num_mel_bins=20,
        max_source_positions=50, max_target_positions=32,
        pad_token_id=0, bos_token_id=0, eos_token_id=1,
        decoder_start_token_id=2, suppress_tokens=None,
        begin_suppress_tokens=None, attn_implementation="eager")
    t_model = HFWhisperModel(hf_cfg).double().eval()
    with torch.no_grad():
        # pin the encoder positional table to the sinusoid formula real
        # checkpoints ship (transformers' own `sinusoids`); our flax model
        # computes the same table internally
        t_model.encoder.embed_positions.weight.copy_(sinusoids(50, 64))
    _snap_f32(t_model)

    cfg = WhisperConfig(n_mels=20, dim=64, n_heads=4, n_audio_layers=2,
                        n_text_layers=2, vocab_size=100, n_text_ctx=32,
                        n_audio_ctx=50, sot=90, eot=89, no_timestamps=91,
                        timestamp_base=92)
    f_model = WhisperModel(cfg)
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(721)
        mel = rng.standard_normal((2, 100, 20)) * 0.5
        toks = rng.integers(0, 100, (2, 7))
        template = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 100, 20), jnp.float64),
                                 jnp.zeros((1, 4), jnp.int32)))["params"]
        sd = _hf_whisper_to_openai(t_model.state_dict())
        params = convert_whisper(sd, template, strict=True)
        params = jax.tree.map(lambda a: a.astype(np.float64), params)
        with torch.no_grad():
            hid = t_model(
                input_features=torch.from_numpy(mel).transpose(1, 2),
                decoder_input_ids=torch.from_numpy(toks),
            ).last_hidden_state
            # tied-embedding logit head, as openai whisper (and our flax
            # model) computes it
            ref = (hid @ t_model.decoder.embed_tokens.weight.T).numpy()
        xa = f_model.apply({"params": params}, jnp.asarray(mel),
                           method=WhisperModel.encode)
        out, _ = f_model.apply({"params": params}, jnp.asarray(toks), xa,
                               method=WhisperModel.decode)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_mamba2_mixer_vs_transformers():
    """Zonos hybrid-backbone Mamba2 mixer (models/zonos.py Mamba2Block —
    the TPU associative-scan replacement for the mamba_ssm CUDA kernels,
    modules/zonos/backbone.py:4-6) vs the INSTALLED transformers
    Mamba2Mixer: one layer, same weights, fp64 teacher-forced parity.
    transformers' layout IS the mamba_ssm/Zonos checkpoint layout
    (in_proj fused [z|xBC|dt], depthwise conv over (x,B,C), per-head
    A_log/D/dt_bias, gated RMSNorm), so this independently validates
    both the block structure and the selective-scan kernel."""
    from dataclasses import replace as dc_replace

    from transformers import Mamba2Config
    from transformers.models.mamba2.modeling_mamba2 import Mamba2Mixer

    from audiolab_tpu.models.zonos import Mamba2Block, ZonosConfig

    torch.manual_seed(730)
    hf_cfg = Mamba2Config(
        hidden_size=32, state_size=16, head_dim=8, expand=2,
        conv_kernel=4, n_groups=1, chunk_size=8, num_heads=8,
        use_conv_bias=True, time_step_limit=(0.0, float("inf")))
    mixer = Mamba2Mixer(hf_cfg, layer_idx=0).double().eval()
    with torch.no_grad():
        for p in mixer.parameters():
            p.copy_(p.float().double())

    cfg = ZonosConfig(dim=32, d_state=16, d_conv=4, expand=2,
                      headdim=8, mixer="mamba2")
    block = Mamba2Block(cfg)

    sd = {k: v.detach().numpy() for k, v in mixer.state_dict().items()}
    params = {
        "in_proj": {"kernel": sd["in_proj.weight"].T},
        "conv_w": sd["conv1d.weight"][:, 0, :].T,   # (dim,1,k) -> (k, dim)
        "conv_b": sd["conv1d.bias"],
        "dt_bias": sd["dt_bias"],
        "a_log": sd["A_log"],
        "d_skip": sd["D"],
        "norm_w": sd["norm.weight"],
        "out_proj": {"kernel": sd["out_proj.weight"].T},
    }

    jax.config.update("jax_enable_x64", True)
    try:
        x = np.random.default_rng(731).standard_normal((2, 16, 32)) * 0.5
        with torch.no_grad():
            ref = mixer(torch.from_numpy(x)).numpy()
        params64 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
        out = block.apply({"params": params64}, jnp.asarray(x))
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

        # the single-token decode step must agree with the full scan
        state = block.apply({"params": params64}, 2,
                            method=Mamba2Block.init_state)
        outs = []
        for t in range(x.shape[1]):
            y, state = block.apply({"params": params64},
                                   jnp.asarray(x[:, t]), state,
                                   method=Mamba2Block.step)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.stack(outs, 1), ref, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)
