"""End-to-end RVC conversion pipeline test (tiny random models, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.models.hubert import HubertConfig, HubertFeatureExtractor
from audiolab_tpu.models.rvc.synthesizer import SynthesizerConfig, SynthesizerTrn
from audiolab_tpu.pipelines.rvc import RVCPipelineConfig, VoiceConverter

TINY_SYNTH = SynthesizerConfig(
    spec_channels=201,
    segment_size=1920,
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=1,
    upsample_rates=(10, 4, 2, 2),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(20, 8, 4, 4),
    spk_embed_dim=4,
    gin_channels=16,
    sr=16000,  # upp=160 -> 100 Hz frames at 16 kHz out
    feat_channels=64,
)
TINY_HUBERT = HubertConfig(dim=64, ffn_dim=128, heads=4, layers=2, final_dim=32)


@pytest.fixture(scope="module")
def converter():
    rng = jax.random.PRNGKey(0)
    hubert = HubertFeatureExtractor(version="v2", cfg=TINY_HUBERT)
    hubert_params = hubert.init(rng, jnp.zeros((1, 16000)))["params"]

    synth = SynthesizerTrn(TINY_SYNTH)
    t = 10
    synth_params = synth.init(
        rng,
        jnp.zeros((1, t, TINY_SYNTH.feat_channels)),
        jnp.full((1,), t, jnp.int32),
        jnp.ones((1, t), jnp.int32),
        jnp.full((1, t), 220.0),
        jnp.zeros((1,), jnp.int32),
        method=SynthesizerTrn.infer,
    )["params"]

    cfg = RVCPipelineConfig(
        version="v2", sr=16000, chunk_seconds=1.0, overlap_seconds=0.1, f0_method="yin"
    )
    return VoiceConverter(
        TINY_SYNTH,
        synth_params,
        hubert_params,
        rmvpe=None,
        index_features=None,
        cfg=cfg,
        hubert_cfg=TINY_HUBERT,
    )


def test_convert_end_to_end(converter):
    sr = 16000
    t = np.arange(sr * 2) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    y = converter.convert(x, sid=0, transpose=0, index_rate=0.0)
    assert y.ndim == 1
    # output at model sr covering the whole input duration (±1 frame)
    assert abs(len(y) - len(x)) < 1600
    assert np.isfinite(y).all()
    assert np.abs(y).max() <= 0.99 + 1e-6


def test_convert_with_index(converter, rng):
    sr = 16000
    x = (0.2 * rng.standard_normal(sr)).astype(np.float32)
    converter.index_features = jnp.asarray(
        rng.standard_normal((50, 64)).astype(np.float32)
    )
    y = converter.convert(x, index_rate=0.8)
    assert np.isfinite(y).all()
    converter.index_features = None


def test_convert_transpose_changes_output(converter):
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    y0 = converter.convert(x, transpose=0)
    y12 = converter.convert(x, transpose=12)
    assert not np.allclose(y0, y12)


def test_convert_with_rmvpe_f0(converter):
    """RMVPE f0 path through the pipeline (pipeline.py rmvpe default)."""
    from audiolab_tpu.models.rmvpe import RMVPE

    rm = RMVPE()  # random init on first use
    conv = VoiceConverter(
        TINY_SYNTH, converter.synth_params, converter.hubert_params,
        rmvpe=rm, index_features=None,
        cfg=RVCPipelineConfig(version="v2", sr=16000, chunk_seconds=1.0,
                              overlap_seconds=0.1, f0_method="rmvpe"),
        hubert_cfg=TINY_HUBERT,
    )
    sr = 16000
    x = (0.3 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    y = conv.convert(x, sid=0, transpose=2, index_rate=0.0)
    assert np.isfinite(y).all() and len(y) > 0


def test_debug_dump_and_sweep(converter, tmp_path, monkeypatch):
    """Reference debug mechanisms: SAVE_DEBUG_AUDIO-style intermediate dump
    (pipeline.py:78-104) and the test_clone parameter sweep harness
    (pipeline.py:659-795)."""
    import os

    vc = converter
    sr = 16000
    x = (0.3 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)

    dbg = tmp_path / "dbg"
    monkeypatch.setenv("AUDIOLAB_SAVE_DEBUG_AUDIO", str(dbg))
    vc.convert(x, sid=0)
    wavs = sorted(os.listdir(dbg))
    assert any("input16k_hp" in w for w in wavs)
    assert any("converted" in w for w in wavs)

    monkeypatch.delenv("AUDIOLAB_SAVE_DEBUG_AUDIO")
    paths = vc.sweep_convert(x, str(tmp_path / "sweep"),
                             index_rates=(0.0,), protects=(0.2, 0.5))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    assert "pr0.2" in paths[0] and "pr0.5" in paths[1]
