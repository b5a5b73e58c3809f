"""rtla + align tests: CRNN shapes, OLTW path properties, monotonic
cleanup, chroma, sentence grouping/matching, full take alignment."""

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.models.rtla import (
    CRNN,
    CRNNConfig,
    OLTW,
    StreamChunker,
    chroma_features,
    make_path_strictly_monotonic,
)
from audiolab_tpu.pipelines.align import (
    align_take,
    crossfade_concat,
    group_sentences,
    levenshtein,
    match_sentences,
)


def test_crnn_shapes():
    cfg = CRNNConfig(n_mels=16, n_classes=12, conv_ch=(4, 8), gru_dim=8)
    model = CRNN(cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 16)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel)["params"]
    out = model.apply({"params": params}, mel)
    assert out.shape == (2, 10, 12)
    # log-softmax rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-4)


def test_oltw_tracks_identity():
    rng = np.random.default_rng(1)
    ref = rng.standard_normal((40, 8)).astype(np.float32)
    path = OLTW(ref, window=8).align(ref)  # stream == reference
    assert path[-1][1] >= 30  # pointer advanced most of the way
    mono = make_path_strictly_monotonic(path)
    d = np.diff(mono, axis=0)
    assert (d > 0).all()


def test_stream_chunker():
    wav = np.zeros(16000, np.float32)
    chunks = list(StreamChunker(wav, 16000, hop_s=0.1))
    assert len(chunks) == 10 and all(len(c) == 1600 for c in chunks)


def test_chroma_unit_norm():
    sr = 16000
    t = np.arange(sr) / sr
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    ch = chroma_features(wav, sr)
    np.testing.assert_allclose(np.linalg.norm(ch, axis=1), 1.0, rtol=1e-4)
    assert ch[:, 9].mean() > 0.5  # A (440 Hz) dominates pitch class 9


def test_levenshtein_and_matching():
    assert levenshtein("kitten", "sitting") == 3
    words_m = [
        {"word": "hello", "start": 0.0, "end": 0.4},
        {"word": "world.", "start": 0.45, "end": 0.9},
        {"word": "second", "start": 2.0, "end": 2.4},
        {"word": "line", "start": 2.45, "end": 2.8},
    ]
    words_t = [
        {"word": "hello", "start": 0.1, "end": 0.5},
        {"word": "world.", "start": 0.55, "end": 1.0},
        {"word": "second", "start": 2.2, "end": 2.6},
        {"word": "line", "start": 2.65, "end": 3.0},
    ]
    ms = group_sentences(words_m)
    ts = group_sentences(words_t)
    assert len(ms) == 2 and len(ts) == 2
    pairs = match_sentences(ms, ts)
    assert pairs == [(0, 0), (1, 1)]


def test_crossfade_concat_length():
    a = np.ones(1000, np.float32)
    b = np.zeros(1000, np.float32)
    y = crossfade_concat([a, b], sr=16000, fade_ms=10.0)
    assert len(y) == 2000 - 160


def test_align_take_end_to_end():
    sr = 8000
    rng = np.random.default_rng(2)
    master = (0.2 * np.sin(2 * np.pi * 220 * np.arange(3 * sr) / sr)).astype(np.float32)
    take = (0.2 * np.sin(2 * np.pi * 220 * np.arange(3 * sr) / sr)).astype(np.float32)
    words_m = [{"word": "la", "start": 0.2, "end": 0.8},
               {"word": "la.", "start": 0.9, "end": 1.4}]
    words_t = [{"word": "la", "start": 0.3, "end": 0.9},
               {"word": "la.", "start": 1.0, "end": 1.6}]
    aligned, report = align_take(master, take, sr, words_m, words_t)
    assert len(aligned) == len(master)
    assert report["matched"] >= 1
    assert np.isfinite(aligned).all()


def test_align_take_dual_feature_phoneme_path():
    """The reference default FEATURES=["chroma","phoneme"] — OLTW runs on
    the stacked chroma + CRNN posteriorgram stream (stream_processor.py:
    27-36) when a phoneme model is supplied."""
    import jax

    from audiolab_tpu.models.rtla import RtlaCRNN, RtlaCRNNConfig
    from audiolab_tpu.pipelines.align import _dual_features

    sr = 16000
    model = RtlaCRNN(RtlaCRNNConfig(n_mels=66, num_lbl=9,
                                    model_complexity=1))
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 8, 66), np.float32))["params"]
    wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(3 * sr) / sr)).astype(
        np.float32)
    feats = _dual_features(wav, sr, 512, (model, params))
    assert feats.shape[-1] == 12 + 9          # chroma ++ posteriors
    assert np.isfinite(feats).all()

    words_m = [{"word": "la", "start": 0.2, "end": 0.8},
               {"word": "la.", "start": 0.9, "end": 1.4}]
    words_t = [{"word": "la", "start": 0.3, "end": 0.9},
               {"word": "la.", "start": 1.0, "end": 1.6}]
    aligned, report = align_take(wav, wav.copy(), sr, words_m, words_t,
                                 phoneme_model=(model, params))
    assert len(aligned) == len(wav)
    assert np.isfinite(aligned).all()
