"""Model-zoo structural/numerical tests (random weights, CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.models.rvc.synthesizer import (
    SynthesizerConfig,
    SynthesizerTrn,
    ResidualCouplingBlock,
    sine_source,
    config_for,
)
from audiolab_tpu.models.hubert import Hubert, HubertConfig, HubertFeatureExtractor
from audiolab_tpu.models.rmvpe import E2E, decode_f0, RMVPE, N_MELS
from audiolab_tpu.retrieval.index import knn_blend, _topk_l2, kmeans
from audiolab_tpu.kernels.attention import flash_attention, attention_reference
from audiolab_tpu.kernels.ssm import selective_scan, ssm_step, causal_conv1d, causal_conv1d_step
from audiolab_tpu.kernels.norms import rms_norm, layer_norm

TINY = SynthesizerConfig(
    spec_channels=201,
    segment_size=1920,
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=1,
    upsample_rates=(8, 6, 2, 2),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(16, 12, 4, 4),
    spk_embed_dim=4,
    gin_channels=16,
    sr=19200,  # upp=192, 100 Hz frames
    feat_channels=48,
)


def test_flow_invertibility():
    cfg = TINY
    flow = ResidualCouplingBlock(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 20, cfg.inter_channels))
    mask = jnp.ones((2, 20, 1))
    g = jax.random.normal(rng, (2, 1, cfg.gin_channels))
    params = flow.init(rng, x, mask, g=g)
    z = flow.apply(params, x, mask, g=g, reverse=False)
    back = flow.apply(params, z, mask, g=g, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_sine_source_phase_continuity():
    f0 = jnp.full((1, 50), 100.0)  # constant 100 Hz
    s = sine_source(f0, upp=160, sr=16000)  # (1, 8000, 1)
    x = np.asarray(s)[0, :, 0]
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freq = np.fft.rfftfreq(len(x), 1 / 16000)[spec.argmax()]
    assert abs(freq - 100.0) < 3.0


def test_sine_source_unvoiced_silent():
    f0 = jnp.zeros((1, 10))
    s = sine_source(f0, upp=160, sr=16000)
    assert np.abs(np.asarray(s)).max() == 0.0  # no rng -> no noise


def test_synthesizer_infer_shapes():
    cfg = TINY
    model = SynthesizerTrn(cfg)
    rng = jax.random.PRNGKey(0)
    b, t = 2, 25
    phone = jax.random.normal(rng, (b, t, cfg.feat_channels))
    pitch = jnp.ones((b, t), jnp.int32) * 100
    nsff0 = jnp.full((b, t), 220.0)
    lengths = jnp.full((b,), t, jnp.int32)
    sid = jnp.zeros((b,), jnp.int32)
    params = model.init(rng, phone, lengths, pitch, nsff0, sid, method=SynthesizerTrn.infer)
    audio = model.apply(params, phone, lengths, pitch, nsff0, sid, method=SynthesizerTrn.infer)
    assert audio.shape == (b, t * cfg.upp)
    assert np.isfinite(np.asarray(audio)).all()
    assert np.abs(np.asarray(audio)).max() <= 1.0  # tanh output


def test_synthesizer_train_forward():
    cfg = TINY
    model = SynthesizerTrn(cfg)
    rng = jax.random.PRNGKey(0)
    b, t = 2, 30
    phone = jax.random.normal(rng, (b, t, cfg.feat_channels))
    pitch = jnp.ones((b, t), jnp.int32) * 100
    pitchf = jnp.full((b, t), 220.0)
    y = jax.random.normal(rng, (b, t, cfg.spec_channels))
    lengths = jnp.full((b,), t, jnp.int32)
    sid = jnp.zeros((b,), jnp.int32)
    rngs = {"posterior": rng, "slice": rng, "noise": rng}
    params = model.init(rng, phone, lengths, pitch, pitchf, y, lengths, sid, rngs)
    o, ids, x_mask, y_mask, latents = model.apply(
        params, phone, lengths, pitch, pitchf, y, lengths, sid, rngs
    )
    assert o.shape == (b, cfg.segment_size // cfg.upp * cfg.upp, 1)
    z, z_p, m_p, logs_p, m_q, logs_q = latents
    assert z.shape == (b, t, cfg.inter_channels)


def test_config_for_presets():
    c = config_for(48000, "v2")
    assert c.upp == 480 and c.feat_channels == 768
    c1 = config_for(40000, "v1")
    assert c1.feat_channels == 256


def test_hubert_shapes():
    cfg = HubertConfig(dim=64, ffn_dim=128, heads=4, layers=2, final_dim=32)
    model = HubertFeatureExtractor(version="v2", cfg=cfg)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 16000)) * 0.1
    params = model.init(rng, wav)
    out = model.apply(params, wav)
    assert out.shape[0] == 2 and out.shape[2] == 64
    assert abs(out.shape[1] - 16000 // 320) <= 2  # ~50 Hz frames


def test_hubert_v1_projects():
    cfg = HubertConfig(dim=64, ffn_dim=128, heads=4, layers=2, final_dim=32)
    model = HubertFeatureExtractor(version="v1", cfg=cfg)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (1, 8000)) * 0.1
    params = model.init(rng, wav)
    out = model.apply(params, wav)
    assert out.shape[2] == 32


def test_rmvpe_shapes_and_decode():
    model = E2E()
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (1, 40, N_MELS))
    params = model.init(rng, mel)
    hidden = model.apply(params, mel)
    assert hidden.shape == (1, 40, 360)
    assert (np.asarray(hidden) >= 0).all() and (np.asarray(hidden) <= 1).all()
    f0 = decode_f0(hidden)
    assert f0.shape == (1, 40)


def test_rmvpe_decode_known_bin():
    # put all salience on bin 180 -> cents = 20*180+1997.38 -> f0
    hidden = jnp.zeros((1, 3, 360)).at[:, :, 180].set(1.0)
    f0 = np.asarray(decode_f0(hidden))
    expected = 10 * 2 ** ((20 * 180 + 1997.3794084376191) / 1200)
    np.testing.assert_allclose(f0, expected, rtol=1e-4)


def test_topk_exact_vs_numpy(rng):
    q = rng.standard_normal((7, 16)).astype(np.float32)
    data = rng.standard_normal((100, 16)).astype(np.float32)
    d2, idx = _topk_l2(jnp.asarray(q), jnp.asarray(data), k=4, block=32)
    ref = ((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    ref_idx = np.argsort(ref, axis=-1)[:, :4]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), -1), np.sort(ref_idx, -1))


def test_knn_blend_identity_at_zero_rate(rng):
    q = rng.standard_normal((5, 8)).astype(np.float32)
    data = rng.standard_normal((20, 8)).astype(np.float32)
    out = knn_blend(jnp.asarray(q), jnp.asarray(data), 0.0, k=3)
    np.testing.assert_allclose(np.asarray(out), q, atol=1e-5)


def test_kmeans_clusters(rng):
    # two well-separated blobs -> centroids land near blob means
    a = rng.standard_normal((50, 4)).astype(np.float32) * 0.1 + 5.0
    b = rng.standard_normal((50, 4)).astype(np.float32) * 0.1 - 5.0
    x = np.concatenate([a, b])
    c = np.asarray(kmeans(jnp.asarray(x), n_clusters=2, iters=10))
    c = c[np.argsort(c[:, 0])]
    np.testing.assert_allclose(c[0], b.mean(0), atol=0.5)
    np.testing.assert_allclose(c[1], a.mean(0), atol=0.5)


def test_flash_attention_matches_reference(rng):
    q = rng.standard_normal((2, 4, 65, 32)).astype(np.float32)
    k = rng.standard_normal((2, 4, 65, 32)).astype(np.float32)
    v = rng.standard_normal((2, 4, 65, 32)).astype(np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    ref = attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_causal(rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 16, 8)).astype(np.float32))
    out = flash_attention(q, q, q, causal=True)
    ref = attention_reference(q, q, q, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_causal_rect(rng):
    """tq != tk causal (KV-cache decode shape): both paths must apply the
    tril(k=tk-tq) diagonal offset (ADVICE r1: the Pallas kernel previously
    omitted it).  On CPU this exercises the fallback; the Pallas path is
    validated against a fp64 oracle on TPU (commit note)."""
    q = jnp.asarray(rng.standard_normal((1, 2, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 48, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 48, 8)).astype(np.float32))
    out = flash_attention(q, k, v, causal=True)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # last query row attends to ALL keys (offset diagonal), not just first tq
    full = attention_reference(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, -1], np.asarray(full)[:, :, -1], atol=2e-5)


def test_selective_scan_matches_sequential(rng):
    b, t, d, n = 2, 12, 4, 3
    u = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    delta = jax.nn.softplus(jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32)))
    a = -jnp.abs(jnp.asarray(rng.standard_normal((d, n)).astype(np.float32)))
    bb = jnp.asarray(rng.standard_normal((b, t, n)).astype(np.float32))
    cc = jnp.asarray(rng.standard_normal((b, t, n)).astype(np.float32))
    dd = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    y = selective_scan(u, delta, a, bb, cc, dd)

    h = jnp.zeros((b, d, n))
    ys = []
    for i in range(t):
        h, yt = ssm_step(h, u[:, i], delta[:, i], a, bb[:, i], cc[:, i], dd)
        ys.append(yt)
    y_seq = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_seq), atol=1e-4)


def test_causal_conv_step_matches_full(rng):
    b, t, c, k = 1, 10, 4, 3
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32))
    full = causal_conv1d(x, w)
    cache = jnp.zeros((b, k - 1, c))
    outs = []
    for i in range(t):
        cache, y = causal_conv1d_step(cache, x[:, i], w)
        outs.append(y)
    step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step), atol=1e-5)


def test_norms_match_reference(rng):
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256,)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((256,)).astype(np.float32))
    out = layer_norm(x, w, b)
    mu = x.mean(-1, keepdims=True)
    ref = (x - mu) / np.sqrt(np.asarray(x.var(-1, keepdims=True)) + 1e-5) * w + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    r = rms_norm(x, w)
    ref_r = x / np.sqrt(np.asarray((x * x).mean(-1, keepdims=True)) + 1e-5) * w
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref_r), atol=1e-4)


def test_bigvgan_shapes():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiolab_tpu.models.bigvgan import BigVGAN, BigVGANConfig

    cfg = BigVGANConfig(n_mels=16, upsample_rates=(4, 2),
                        upsample_kernel_sizes=(8, 4),
                        upsample_initial_channel=16)
    model = BigVGAN(cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 16)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel)["params"]
    y = model.apply({"params": params}, mel)
    assert y.shape == (2, 6 * cfg.hop)
    assert np.isfinite(np.asarray(y)).all()
    # speaker-conditioned variant
    g = jnp.ones((2, 8))
    params2 = model.init(jax.random.PRNGKey(1), mel, g)["params"]
    y2 = model.apply({"params": params2}, mel, g)
    assert y2.shape == y.shape


def test_flash_attention_tpu_paths(rng):
    """TPU-only gate for the two Pallas specializations: block_h head
    batching (general online-softmax kernel) and the single-kv-block nk1
    fast path with its closed-form padding correction.  Both must match
    the XLA reference at bf16 tolerance (measured max|err| 1.17e-2 at the
    RoFormer shape; layout/padding bugs would be O(1))."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("Pallas paths lower only on TPU")
    q = jnp.asarray(rng.standard_normal((4, 4, 90, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((4, 4, 90, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((4, 4, 90, 64)), jnp.bfloat16)
    ref = np.asarray(attention_reference(q, k, v).astype(jnp.float32))
    # nk1 path (single kv block, padded 90 -> 128), heads batched; bh=8
    # crosses a batch boundary (b=4, h=4 -> two batch elements per block)
    for bh in (1, 2, 4, 8):
        out = flash_attention(q, k, v, block_q=128, block_k=128, block_h=bh)
        np.testing.assert_allclose(
            np.asarray(out.astype(jnp.float32)), ref, atol=3e-2)
    # general online-softmax path (2 kv blocks), heads batched; bh=8 again
    # spans two batch elements per block
    for bh in (2, 8):
        out = flash_attention(q, k, v, block_q=128, block_k=64, block_h=bh)
        np.testing.assert_allclose(
            np.asarray(out.astype(jnp.float32)), ref, atol=3e-2)
