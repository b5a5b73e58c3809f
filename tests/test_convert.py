"""Weight-converter tests: layout transforms, full mapping coverage for
RVC + HuBERT trees, synthetic torch-dict round trip into a working model."""

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.hubert import HubertConfig, HubertFeatureExtractor
from audiolab_tpu.models.rvc.synthesizer import SynthesizerConfig, SynthesizerTrn
from audiolab_tpu.utils import convert as C


def test_fold_weight_norm_matches_torch_semantics():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((8, 4, 3)).astype(np.float32)
    g = np.abs(rng.standard_normal((8, 1, 1))).astype(np.float32)
    w = C.fold_weight_norm(g, v, dim=0)
    # per-out-channel norm of w equals g
    norms = np.sqrt((w * w).sum(axis=(1, 2)))
    np.testing.assert_allclose(norms, g[:, 0, 0], rtol=1e-5)


def test_extract_layouts():
    sd = {"x.weight": np.arange(24).reshape(4, 3, 2).astype(np.float32)}
    k = C.extract("conv_w", "x", sd)
    assert k.shape == (2, 3, 4)
    assert k[0, 0, 1] == sd["x.weight"][1, 0, 0]
    sd2 = {"l.weight": np.arange(6).reshape(2, 3).astype(np.float32)}
    assert C.extract("dense_w", "l", sd2).shape == (3, 2)


def _synth_template():
    cfg = SynthesizerConfig(
        spec_channels=129, segment_size=3840, inter_channels=16,
        hidden_channels=16, filter_channels=32, n_heads=2, n_layers=1,
        upsample_initial_channel=32, spk_embed_dim=4, gin_channels=16,
        feat_channels=32,
    )
    model = SynthesizerTrn(cfg)
    t = 8
    template = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, t, 32)), jnp.full((1,), t, jnp.int32),
        jnp.ones((1, t), jnp.int32), jnp.full((1, t), 200.0),
        jnp.zeros((1,), jnp.int32), None, method=SynthesizerTrn.infer,
    )["params"]
    return cfg, model, template


def test_rvc_mapping_covers_all_leaves():
    _, _, template = _synth_template()
    mapping = C.rvc_mapping(template)
    missing = [p for p in C.tree_paths(template) if p not in mapping]
    assert not missing, missing


def test_rvc_synthetic_roundtrip_runs_inference():
    cfg, model, template = _synth_template()
    mapping = C.rvc_mapping(template)
    sd = C.synth_state_dict(template, mapping, seed=1)
    params = C.convert_rvc(sd, template, strict=True)
    t = 8
    audio = model.apply(
        {"params": params}, jnp.zeros((1, t, 32)), jnp.full((1,), t, jnp.int32),
        jnp.ones((1, t), jnp.int32), jnp.full((1, t), 200.0),
        jnp.zeros((1,), jnp.int32), None, method=SynthesizerTrn.infer,
    )
    assert audio.shape == (1, t * cfg.upp)
    assert np.isfinite(np.asarray(audio)).all()
    # a known leaf is the exact transpose of its torch source
    k = params["enc_p"]["emb_phone"]["kernel"]
    np.testing.assert_allclose(k, sd["enc_p.emb_phone.weight"].T)


def test_hubert_mapping_coverage_and_roundtrip():
    model = HubertFeatureExtractor(
        version="v2", cfg=HubertConfig(dim=32, ffn_dim=64, heads=4, layers=1,
                                       final_dim=16))
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    mapping = C.hubert_mapping(template)
    missing = [p for p in C.tree_paths(template) if p not in mapping]
    assert not missing, missing
    sd = C.synth_state_dict(template, mapping, seed=2)
    params = C.convert_hubert(sd, template)
    feats = model.apply({"params": params}, jnp.zeros((1, 3200)))
    assert np.isfinite(np.asarray(feats)).all()


def test_whisper_mapping_coverage_and_roundtrip():
    from audiolab_tpu.models.whisper import WhisperConfig, WhisperModel

    cfg = WhisperConfig(n_mels=80, dim=64, n_heads=4, n_audio_layers=1,
                        n_text_layers=1, vocab_size=600, n_text_ctx=128,
                        sot=520, eot=519, no_timestamps=530, timestamp_base=531)
    model = WhisperModel(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3000, 80)),
                          jnp.zeros((1, 4), jnp.int32))["params"]
    mapping = C.whisper_mapping(template)
    missing = [p for p in C.tree_paths(template) if p not in mapping]
    assert not missing, missing
    sd = C.synth_state_dict(template, mapping, seed=3)
    params = C.convert_whisper(sd, template)
    logits = model.apply({"params": params}, jnp.zeros((1, 3000, 80)),
                         jnp.zeros((1, 4), jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_full_pipeline_loaders_fail_cleanly(tmp_path):
    """The one-call checkpoint assemblies (stable-audio-open, ACE-Step
    checkpoint dir) surface a clear FileNotFoundError when the published
    weights are absent (none are downloadable in this environment)."""
    import pytest

    from audiolab_tpu.utils.convert import (
        load_acestep_pipeline,
        load_stable_audio_pipeline,
    )

    with pytest.raises(FileNotFoundError):
        load_stable_audio_pipeline(str(tmp_path / "model.safetensors"),
                                   str(tmp_path / "t5.bin"),
                                   str(tmp_path / "spiece.model"))
    with pytest.raises(FileNotFoundError):
        load_acestep_pipeline(str(tmp_path))
