"""Heterogeneous ensemble: every checkpoint-member type blended in ONE
StemSeparator pass — the shape of the reference's default 7-model matrix
(3 RoFormers + MDX23C + 3 MDX-NET ONNX, stem_separator.py:379-386) plus
the htdemucs multistem member.  Validates that members with different
internal framings (chunk padding, trim margins, full-source heads) agree
on the EnsembleMember contract and blend/de-bleed on device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolab_tpu.pipelines.separate import (
    EnsembleMember,
    StemSeparator,
    htdemucs_member,
    mdx23c_member,
)


@pytest.fixture(scope="module")
def mix():
    sr = 8000
    t = np.arange(sr * 3) / sr
    voc = 0.3 * np.sin(2 * np.pi * 440 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    inst = 0.2 * np.sin(2 * np.pi * 110 * t)
    return np.stack([voc + inst, voc - inst]).astype(np.float32), sr


def _tiny_roformer():
    from audiolab_tpu.models.separation.roformer import (
        BSRoformer,
        RoformerConfig,
    )

    cfg = RoformerConfig(dim=16, depth=1, heads=2, n_fft=256, hop=64,
                         freqs_per_bands=(64, 65), channels=2)
    model = BSRoformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 8000)))["params"]
    return EnsembleMember(
        name="rf",
        apply_fn=lambda p, x: model.apply({"params": p}, x),
        params=params, weight_vocals=8.4, weight_inst=16.0)


def _tiny_mdx23c():
    from audiolab_tpu.models.separation.mdx23c import (
        MDX23CConfig,
        TFCTDFNetV3,
    )

    cfg = MDX23CConfig(sample_rate=8000, n_fft=256, hop_length=64,
                       dim_f=128, num_subbands=2, num_scales=2,
                       num_blocks_per_scale=1, channels=8, growth=8,
                       bottleneck_factor=2)
    model = TFCTDFNetV3(cfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 2, model.good_length(0.5))))["params"]
    return mdx23c_member(params, cfg, weight_vocals=7.2, weight_inst=14.9)


def _tiny_htdemucs():
    from audiolab_tpu.models.separation.htdemucs import (
        HTDemucs,
        HTDemucsConfig,
    )

    cfg = HTDemucsConfig(
        sources=("vocals", "other"), audio_channels=2, channels=4,
        growth=2, nfft=128, depth=2, kernel_size=8, stride=4,
        norm_starts=4, norm_groups=2, dconv_depth=2, dconv_comp=2,
        bottom_channels=8, t_layers=2, t_heads=2, t_hidden_scale=2.0,
        segment_seconds=1.0, samplerate=8000)
    model = HTDemucs(cfg)
    params = model.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 2, 8000)))["params"]
    return htdemucs_member(params, cfg, name="htd", weight_vocals=8.6,
                           weight_inst=16.0)


def test_mixed_member_ensemble(mix):
    audio, sr = mix
    members = [_tiny_roformer(), _tiny_mdx23c(), _tiny_htdemucs()]
    sep = StemSeparator(members, sr=sr, chunk_seconds=0.5,
                        overlap_seconds=0.1, device_batch=2)
    stems = sep.separate(audio)
    assert {"vocals", "instrumental"} <= set(stems)
    for name, s in stems.items():
        assert s.shape == audio.shape, name
        assert np.isfinite(s).all(), name
    # blended output is bounded by the ensemble contract (weighted avg +
    # median of per-member stems, not an explosion)
    peak = max(np.abs(s).max() for s in stems.values())
    assert peak < 10 * np.abs(audio).max()
