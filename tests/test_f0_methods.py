"""f0 method set (VERDICT r1 item 5): crepe parity, hybrid merge, dio
fallback, and cross-method agreement on synthetic glides
(reference: modules/rvc/pitch_extraction.py:24-352)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolab_tpu.dsp.f0 import f0_autocorr, f0_dio, merge_f0


def glide(sr=16000, dur=1.2, f0_start=120.0, f0_end=240.0):
    t = np.arange(int(sr * dur)) / sr
    f = f0_start * (f0_end / f0_start) ** (t / dur)
    phase = 2 * np.pi * np.cumsum(f) / sr
    x = 0.4 * np.sin(phase) + 0.15 * np.sin(2 * phase) + 0.05 * np.sin(3 * phase)
    return x.astype(np.float32), f


def _track_err(f0, f_true, sr=16000, hop=160):
    f0 = np.asarray(f0)
    centers = np.minimum(np.arange(len(f0)) * hop, len(f_true) - 1)
    ref = f_true[centers]
    m = f0 > 0
    # interior voiced frames only (edges are windowing-limited)
    m[:5] = m[-5:] = False
    assert m.mean() > 0.6, f"too few voiced frames: {m.mean()}"
    cents = 1200 * np.abs(np.log2(f0[m] / ref[m]))
    return np.median(cents)


def test_dio_tracks_glide():
    x, f = glide()
    f0 = f0_dio(x)
    assert _track_err(f0, f) < 30  # within 30 cents median


def test_yin_and_dio_agree_on_glide():
    x, f = glide()
    y, _ = f0_autocorr(jnp.asarray(x))
    d = f0_dio(x)
    n = min(len(np.asarray(y)), len(d))
    assert _track_err(np.asarray(y)[:n], f) < 20
    assert _track_err(d[:n], f) < 30


def test_merge_f0_median_skips_unvoiced():
    a = jnp.asarray([100.0, 0.0, 200.0, 0.0])
    b = jnp.asarray([110.0, 150.0, 0.0, 0.0])
    c = jnp.asarray([105.0, 160.0, 210.0, 0.0])
    m = np.asarray(merge_f0(jnp.stack([a, b, c]), "median"))
    assert m[0] == 105.0          # true median of 3 voiced
    assert m[1] == 155.0          # median of the 2 voiced entries
    assert m[2] == 205.0
    assert m[3] == 0.0            # all unvoiced stays unvoiced


def test_merge_f0_mean():
    a = jnp.asarray([100.0, 0.0])
    b = jnp.asarray([200.0, 0.0])
    m = np.asarray(merge_f0(jnp.stack([a, b]), "mean"))
    assert m[0] == 150.0 and m[1] == 0.0


def test_crepe_predict_shapes_and_range():
    from audiolab_tpu.models.crepe import CrepePredictor

    x, f = glide(dur=0.5)
    p = CrepePredictor(model="tiny")  # random weights: shape/finite checks
    f0, pd = p.predict(jnp.asarray(x))
    assert f0.shape == pd.shape == (1 + len(x) // 160,)
    f0 = np.asarray(f0)
    assert np.isfinite(f0).all()
    assert ((f0 == 0) | ((f0 >= 50) & (f0 <= 1101))).all()


def test_crepe_viterbi_follows_salience():
    """Viterbi on a synthetic salience ridge recovers the ridge."""
    from audiolab_tpu.models.crepe import bins_to_f0, viterbi_bins

    t, ridge = 50, np.linspace(80, 140, 50).astype(int)
    probs = np.full((t, 360), 0.01, np.float32)
    probs[np.arange(t), ridge] = 0.9
    bins = np.asarray(viterbi_bins(jnp.asarray(probs)))
    assert np.abs(bins - ridge).max() <= 1
    f0 = np.asarray(bins_to_f0(jnp.asarray(bins)))
    assert (f0 > 0).all()


def test_crepe_torch_parity():
    """Seeded torchcrepe-named replica -> convert_crepe -> flax (fp64)."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref_models import CrepeTorch

    from audiolab_tpu.models.crepe import Crepe
    from audiolab_tpu.utils.convert import convert_crepe

    torch.manual_seed(21)
    t_model = CrepeTorch("tiny").double().eval()
    gen = torch.Generator().manual_seed(22)
    for mod in t_model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.normal_(0.0, 0.5, generator=gen)
                mod.running_var.uniform_(0.5, 1.5, generator=gen)
                mod.weight.uniform_(0.5, 1.5, generator=gen)
                mod.bias.normal_(0.0, 0.5, generator=gen)

    f_model = Crepe(model="tiny")
    jax.config.update("jax_enable_x64", True)
    try:
        frames = np.random.default_rng(23).standard_normal((3, 1024))
        variables = jax.eval_shape(
            lambda: f_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1024), jnp.float64)))
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        conv = convert_crepe(sd, variables, strict=True)
        conv = jax.tree.map(lambda a: a.astype(np.float64), conv)
        with torch.no_grad():
            ref = t_model(torch.from_numpy(frames)).numpy()
        out = np.asarray(f_model.apply(conv, jnp.asarray(frames)))
        np.testing.assert_allclose(out, ref, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_pipeline_hybrid_f0():
    """VoiceConverter f0_method='hybrid'/list runs the merge path."""
    from audiolab_tpu.models.hubert import HubertConfig
    from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn, config_for
    from audiolab_tpu.pipelines.rvc import RVCPipelineConfig, VoiceConverter

    cfg = config_for(48000, "v2")
    hub_cfg = HubertConfig(dim=32, ffn_dim=64, heads=2, layers=1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    from audiolab_tpu.models.hubert import HubertFeatureExtractor

    hub = HubertFeatureExtractor(version="v2", cfg=hub_cfg)
    hp = hub.init(k1, jnp.zeros((1, 16000)))["params"]

    from dataclasses import replace

    small = replace(
        cfg, inter_channels=16, hidden_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, upsample_initial_channel=32,
        feat_channels=hub_cfg.dim,
    )
    synth = SynthesizerTrn(small)
    t = 50
    sp = synth.init(
        {"params": k2}, jnp.zeros((1, t, small.feat_channels)),
        jnp.full((1,), t, jnp.int32), jnp.ones((1, t), jnp.int32),
        jnp.full((1, t), 200.0), jnp.zeros((1,), jnp.int32), None,
        method=SynthesizerTrn.infer)["params"]

    vc = VoiceConverter(
        small, sp, hp, hubert_cfg=hub_cfg,
        cfg=RVCPipelineConfig(sr=48000, f0_method=["yin", "yin"],
                              chunk_seconds=1.0, device_batch=1))
    assert vc._f0_on_host()
    x = glide(dur=1.0)[0]
    out = vc.convert(x, sid=0)
    assert out.ndim == 1 and np.isfinite(out).all()


def test_f0_pm_steady_tone():
    """Boersma-AC (praat pm role): steady 220 Hz tone recovered within
    1 Hz, silence unvoiced."""
    import numpy as np

    from audiolab_tpu.dsp.f0 import f0_pm

    sr = 16000
    t = np.arange(sr) / sr
    x = np.concatenate([
        np.zeros(sr // 4, np.float64),
        0.5 * np.sin(2 * np.pi * 220.0 * t[: sr // 2]),
        np.zeros(sr // 4, np.float64),
    ])
    f0 = f0_pm(x, sr=sr, hop=160)
    mid = f0[len(f0) // 2 - 10: len(f0) // 2 + 10]
    assert np.all(mid > 0), mid
    assert abs(np.median(mid) - 220.0) < 1.0, np.median(mid)
    # leading silence: mostly unvoiced
    head = f0[: sr // 4 // 160 - 3]
    assert (head == 0).mean() > 0.7, head


def test_f0_pm_octave_stability_on_sweep():
    """Viterbi path keeps a gliding tone continuous (no octave jumps)."""
    import numpy as np

    from audiolab_tpu.dsp.f0 import f0_pm

    sr = 16000
    t = np.arange(2 * sr) / sr
    freq = 150.0 * (2.0 ** (t / 2.0))          # 150 -> 300 Hz glide
    phase = 2 * np.pi * np.cumsum(freq) / sr
    x = 0.4 * np.sin(phase)
    f0 = f0_pm(x, sr=sr, hop=160)
    voiced = f0[5:-5]
    ratio = voiced[1:] / np.maximum(voiced[:-1], 1e-6)
    assert np.all((ratio > 0.9) & (ratio < 1.1)), ratio.min()


def test_f0_pm_in_rvc_dispatch():
    import numpy as np

    from audiolab_tpu.dsp.f0 import f0_pm  # noqa: F401 (import works)
    from audiolab_tpu.pipelines.rvc import RVCPipelineConfig

    cfg = RVCPipelineConfig(sr=48000, f0_method="pm")
    assert cfg.f0_method == "pm"


def test_mangio_crepe_and_rmvpe_plus_variants():
    """The fork's extra f0 methods dispatch correctly: mangio-crepe skips
    periodicity gating and resamples to n//hop frames; rmvpe+ zeroes
    out-of-range estimates (pitch_extraction.py:44-55,196-203)."""
    from audiolab_tpu.models.crepe import CrepePredictor
    from audiolab_tpu.models.rmvpe import RMVPE

    x = glide(dur=0.5)[0]
    crepe = CrepePredictor(model="tiny")
    f0 = np.asarray(crepe.predict_mangio(x, hop=160))
    assert f0.shape == (len(x) // 160,)
    assert np.isfinite(f0).all() and (f0 >= 0).all()

    rmvpe = RMVPE()
    f0p = np.asarray(rmvpe.infer_with_pitch(jnp.asarray(x)[None],
                                            f0_min=100.0, f0_max=200.0))
    assert ((f0p == 0) | ((f0p >= 100.0) & (f0p <= 200.0))).all()


def test_pipeline_accepts_fork_method_names():
    """VoiceConverter dispatches every name in the reference's method
    dict that has a backing model here."""
    from audiolab_tpu.pipelines.rvc import RVCPipelineConfig, VoiceConverter
    from dataclasses import replace

    class _VC(VoiceConverter):
        def __init__(self, cfg):
            self.cfg = cfg
            self.rmvpe = None
            self.crepe = None

    for name, ok in (("pm", True), ("dio", True), ("harvest", True),
                     ("rmvpe", False), ("rmvpe+", False),
                     ("rmvpe_onnx", False), ("crepe", False),
                     ("crepe-tiny", False), ("mangio-crepe", False),
                     ("mangio-crepe-tiny", False)):
        vc = _VC(RVCPipelineConfig(f0_method=name))
        assert vc._f0_on_host() == ok, name
