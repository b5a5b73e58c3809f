"""Tests: PNG writer + F0 visualizer + spectrogram/waveform renders,
StableHLO export round trip, streaming VC continuity."""

import struct
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolab_tpu.utils.viz import (
    F0Visualizer,
    spectrogram_png,
    waveform_diff_png,
    write_png,
)


def _check_png(path):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def test_write_png(tmp_path):
    img = np.zeros((10, 20, 3), np.uint8)
    img[:, :, 0] = 255
    p = write_png(str(tmp_path / "t.png"), img)
    assert _check_png(p) == (20, 10)


def test_f0_visualizer(tmp_path):
    v = F0Visualizer(width=256, row_height=64)
    t = np.linspace(0, 1, 200)
    v.add_curve("source", 220 + 40 * np.sin(2 * np.pi * 3 * t))
    curve2 = 330 + 20 * np.sin(2 * np.pi * 5 * t)
    curve2[50:70] = 0  # unvoiced gap
    v.add_curve("converted", curve2)
    p = v.render(str(tmp_path / "f0.png"))
    w, h = _check_png(p)
    assert (w, h) == (256, 128)


def test_spectrogram_and_waveform_png(tmp_path):
    mag = np.abs(np.random.default_rng(0).standard_normal((100, 64)))
    p = spectrogram_png(str(tmp_path / "s.png"), mag)
    assert _check_png(p) == (100, 64)
    a = np.sin(np.linspace(0, 40, 4000)).astype(np.float32)
    p2 = waveform_diff_png(str(tmp_path / "w.png"), a, a * 0.5, width=128,
                           height=64)
    assert _check_png(p2) == (128, 64)


def test_stablehlo_export_roundtrip(tmp_path):
    from audiolab_tpu.utils.export import export_stablehlo, load_stablehlo

    def fn(x, y):
        return jnp.tanh(x) @ y

    x = jnp.ones((2, 4))
    y = jnp.ones((4, 3))
    p = export_stablehlo(fn, (x, y), str(tmp_path / "m.shlo"))
    call = load_stablehlo(p)
    out = call(x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(x, y)), rtol=1e-6)


def test_streaming_vc_blocks():
    from audiolab_tpu.models.hubert import HubertConfig, HubertFeatureExtractor
    from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn
    from audiolab_tpu.pipelines.rvc import RVCPipelineConfig, VoiceConverter
    from audiolab_tpu.pipelines.rvc_stream import StreamConfig, StreamingVC
    from tests.test_train import tiny_cfg

    scfg = tiny_cfg()
    synth = SynthesizerTrn(scfg)
    t = 8
    sp = synth.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, t, 32)),
        jnp.full((1,), t, jnp.int32), jnp.ones((1, t), jnp.int32),
        jnp.full((1, t), 200.0), jnp.zeros((1,), jnp.int32), None,
        method=SynthesizerTrn.infer)["params"]
    hcfg = HubertConfig(dim=32, ffn_dim=64, heads=4, layers=1, final_dim=16)
    hub = HubertFeatureExtractor(version="v2", cfg=hcfg)
    hp = hub.init(jax.random.PRNGKey(1), jnp.zeros((1, 16000)))["params"]
    vc = VoiceConverter(scfg, sp, hp, cfg=RVCPipelineConfig(sr=48000,
                                                            f0_method="yin"),
                        hubert_cfg=hcfg)
    stream = StreamingVC(vc, StreamConfig(block_seconds=0.1,
                                          context_seconds=0.3))
    rng = np.random.default_rng(0)
    outs = []
    for _ in range(3):
        block = (rng.standard_normal(stream.block) * 0.1).astype(np.float32)
        out = stream.push(block)
        assert out.shape == (stream.block_out,)
        assert np.isfinite(out).all()
        outs.append(out)
    assert len(np.concatenate(outs)) == 3 * stream.block_out


def test_daw_video_track(tmp_path):
    """Video inputs land as a DAW video track (reference
    util/video_track.py): Ableton gets an AudioTrack clip referencing the
    media with CRC/size/beat-timed end; Reaper a SOURCE VIDEO item."""
    import gzip

    import numpy as np

    from audiolab_tpu.core.audio_io import write_audio
    from audiolab_tpu.utils.daw import (
        write_ableton_project,
        write_reaper_project,
    )

    stem = str(tmp_path / "vocals.wav")
    write_audio(stem, np.zeros(4000, np.float32), 8000)
    vid = tmp_path / "clip.mp4"
    vid.write_bytes(b"\x00fake-video-bytes" * 100)

    als = write_ableton_project(str(tmp_path / "p.als"), [stem], bpm=120.0,
                                video_file=str(vid), video_duration_s=30.0)
    xml = gzip.open(als).read().decode()
    assert "clip.mp4" in xml and "OriginalCrc" in xml
    assert '<CurrentEnd Value="60.0"' in xml  # 30 s at 120 bpm = 60 beats
    assert "Samples/Imported/clip.mp4" in xml

    rpp = write_reaper_project(str(tmp_path / "p.rpp"), [stem],
                               video_file=str(vid))
    txt = open(rpp).read()
    assert "SOURCE VIDEO" in txt and "clip.mp4" in txt
