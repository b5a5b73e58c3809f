"""Wrapper-chain + processor tests (DSP fallbacks, no checkpoints)."""

import gzip
import os
import zipfile

import numpy as np
import pytest

from audiolab_tpu.core.audio_io import write_wav, read_audio
from audiolab_tpu.core.project import ProjectFiles
from audiolab_tpu.pipelines.base import all_processors, get_processor, TypedInput
from audiolab_tpu.pipelines.chain import run_chain
from audiolab_tpu.utils.daw import detect_bpm, write_ableton_project, write_reaper_project


@pytest.fixture
def song(tmp_path):
    """Synthetic 3 s 'song': 220 Hz vocal-ish center + wide noise bed."""
    sr = 22050
    t = np.arange(sr * 3) / sr
    vocal = 0.3 * np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    rng = np.random.default_rng(0)
    bed_l = 0.1 * rng.standard_normal(len(t))
    bed_r = 0.1 * rng.standard_normal(len(t))
    left = (vocal + bed_l).astype(np.float32)
    right = (vocal + bed_r).astype(np.float32)
    p = tmp_path / "song.wav"
    write_wav(p, np.stack([left, right]) * 0.8, sr)
    return str(p)


def test_typed_input_validation():
    ti = TypedInput(default=5, type=int, ge=0, le=10)
    assert ti.validate("x", None) == 5
    assert ti.validate("x", 7) == 7
    with pytest.raises(ValueError):
        ti.validate("x", 11)
    tb = TypedInput(default=False, type=bool)
    assert tb.validate("b", "true") is True


def test_processor_registry_order():
    procs = all_processors()
    titles = [p.title for p in procs]
    assert "Separate" in titles and "Compare" in titles
    priorities = [p.priority for p in procs]
    assert priorities == sorted(priorities)
    assert titles[-1] == "Compare"  # priority 1e6 (reference convention)


def test_project_files(tmp_path, song):
    proj = ProjectFiles(song, output_root=str(tmp_path / "out"))
    assert os.path.exists(proj.src_file)
    assert "source" in proj.src_file
    proj.add_output("stage1", [song])
    assert proj.last_outputs == [song]
    assert song in proj.all_outputs()


def test_separate_fallback_chain(tmp_path, song):
    projects = run_chain(
        ["Separate"],
        [song],
        settings={"Separate": {"noise_removal": "Nothing"}},
        output_root=str(tmp_path / "out"),
    )
    outs = projects[0].last_outputs
    assert len(outs) == 2
    assert any("(Vocals)" in f for f in outs)
    assert any("(Instrumental)" in f for f in outs)
    v = read_audio([f for f in outs if "(Vocals)" in f][0])
    i = read_audio([f for f in outs if "(Instrumental)" in f][0])
    src = read_audio(song)
    # stems sum approximately back to the source (vocals+inst=mix by construction)
    recon = v.samples + i.samples
    n = min(recon.shape[-1], src.samples.shape[-1])
    # without the transform chain, vocals+inst == mix by construction
    err = np.abs(recon[:, :n] - src.samples[:, :n]).mean()
    assert err < 2e-3  # PCM16 quantization + istft round-trip


def test_separate_cache_hit(tmp_path, song):
    root = str(tmp_path / "out")
    run_chain(["Separate"], [song], output_root=root)
    proj2 = run_chain(["Separate"], [song], output_root=root)
    assert len(proj2[0].last_outputs) == 2  # served from cache


def test_merge_remaster_convert_chain(tmp_path, song):
    projects = run_chain(
        ["Separate", "Merge", "Remaster", "Convert"],
        [song],
        settings={"Remaster": {"target_lufs": -16.0,
                               "use_source_track_as_reference": False}},
        output_root=str(tmp_path / "out"),
    )
    outs = projects[0].last_outputs
    assert len(outs) == 1
    assert outs[0].endswith(".wav")
    a = read_audio(outs[0])
    assert a.num_samples > 0
    from audiolab_tpu.dsp.loudness import integrated_loudness

    lufs = integrated_loudness(a.samples, a.sample_rate)
    assert abs(lufs - (-16.0)) < 3.0


def test_export_ableton(tmp_path, song):
    projects = run_chain(
        ["Separate", "Export"],
        [song],
        settings={"Export": {"project_format": "ableton"}},
        output_root=str(tmp_path / "out"),
    )
    # Export APPENDS the bundle after the passthrough stems
    # (wrappers/export.py:346-357)
    bundle = projects[0].last_outputs[-1]
    assert bundle.endswith(".zip")
    with zipfile.ZipFile(bundle) as z:
        names = z.namelist()
        assert any(n.endswith(".als") for n in names)
        als = [n for n in names if n.endswith(".als")][0]
        xml = gzip.decompress(z.read(als))
        assert b"Ableton" in xml and b"AudioTrack" in xml


def test_export_reaper(tmp_path, song):
    projects = run_chain(
        ["Separate", "Export"],
        [song],
        settings={"Export": {"project_format": "reaper"}},
        output_root=str(tmp_path / "out"),
    )
    bundle = projects[0].last_outputs[-1]
    with zipfile.ZipFile(bundle) as z:
        rpp = [n for n in z.namelist() if n.endswith(".rpp")][0]
        text = z.read(rpp).decode()
        assert "REAPER_PROJECT" in text and "<TRACK" in text


def test_compare_processor(tmp_path, song):
    projects = run_chain(
        ["Separate", "Merge", "Compare"], [song], output_root=str(tmp_path / "out")
    )
    outs = projects[0].last_outputs
    assert any(f.endswith("comparison.json") for f in outs)
    import json

    meta = json.load(open([f for f in outs if f.endswith(".json")][0]))
    assert "rms_diff" in meta and "spec_l1" in meta


def test_super_res_chain(tmp_path, song):
    projects = run_chain(
        ["Super Resolution"], [song], output_root=str(tmp_path / "out")
    )
    out = projects[0].last_outputs[0]
    a = read_audio(out)
    assert a.sample_rate == 48000


def test_detect_bpm_click_track():
    sr = 22050
    bpm = 120.0
    n = sr * 8
    x = np.zeros(n, dtype=np.float32)
    period = int(sr * 60 / bpm)
    for i in range(0, n, period):
        x[i : i + 200] = np.hanning(200) * 0.9
    est = detect_bpm(x, sr)
    assert any(abs(est - bpm * m) < 6 for m in (0.5, 1.0, 2.0))


def test_chain_failure_partial(tmp_path, song):
    # Clone without a configured converter fails; chain returns partial outputs
    projects = run_chain(
        ["Separate", "Clone", "Merge"], [song], output_root=str(tmp_path / "out")
    )
    assert len(projects[0].last_outputs) == 2  # stems from Separate survived


def test_multistem_separation():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiolab_tpu.models.separation.roformer import BSRoformer, RoformerConfig
    from audiolab_tpu.pipelines.separate import (
        MULTISTEM_6,
        EnsembleMember,
        StemSeparator,
    )

    cfg = RoformerConfig(stems=MULTISTEM_6, dim=16, depth=1, heads=2)
    model = BSRoformer(cfg)
    sr = 44100
    chunk = sr  # 1 s chunks for the test
    audio = (np.random.default_rng(0).standard_normal((2, int(2.5 * sr))) * 0.1
             ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, chunk)))["params"]

    member = EnsembleMember(
        name="ms", apply_fn=lambda x: model.apply({"params": params}, x),
        weight_vocals=1.0, weight_inst=1.0)
    sep = StemSeparator([member], sr=sr, chunk_seconds=1.0,
                        overlap_seconds=0.25)
    stems = sep.separate_multistem(audio, member)
    assert set(stems) == set(MULTISTEM_6)
    # reconstruction guarantee: stems sum to input
    total = sum(stems.values())
    np.testing.assert_allclose(total[:, : audio.shape[1]], audio, atol=2e-4)


def test_skip_separate_heuristic(tmp_path):
    import numpy as np

    from audiolab_tpu.core.audio_io import write_wav
    from audiolab_tpu.pipelines.chain import run_chain

    p = str(tmp_path / "song_tts_(Vocals).wav")
    write_wav(p, np.zeros(8000, np.float32), 16000)
    # chain with only Convert: Separate would be skipped anyway, but verify
    # run_chain drops Separate for pre-separated inputs without error
    projs = run_chain(["Separate", "Convert"], [p], {},
                      output_root=str(tmp_path / "out"))
    assert projs and projs[0].all_outputs() is not None


def test_distributed_single_host():
    from audiolab_tpu.core.distributed import init_distributed

    info = init_distributed()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1


def test_mesh_sharded_separation():
    """Inference fan-out: chunk batches sharded over an 8-device dp mesh
    produce the same stems as the unsharded path (ensemble members are
    embarrassingly parallel — VERDICT r1 item 10)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from audiolab_tpu.models.separation.roformer import BSRoformer, RoformerConfig
    from audiolab_tpu.pipelines.separate import EnsembleMember, StemSeparator

    cfg = RoformerConfig(dim=16, depth=1, heads=2, n_fft=64, hop=32,
                         freqs_per_bands=(16, 17), channels=2)
    model = BSRoformer(cfg)
    sr = 1000
    audio = (np.random.default_rng(1).standard_normal((2, int(5.5 * sr))) * 0.1
             ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, sr)))["params"]
    apply_fn = jax.jit(lambda x: model.apply({"params": params}, x))

    member = EnsembleMember(name="m", apply_fn=apply_fn)
    plain = StemSeparator([member], sr=sr, chunk_seconds=1.0,
                          overlap_seconds=0.25)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    sharded = StemSeparator([member], sr=sr, chunk_seconds=1.0,
                            overlap_seconds=0.25, device_batch=8, mesh=mesh)
    assert sharded.device_batch % 8 == 0

    a = plain.separate(audio)
    b = sharded.separate(audio)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-5)


def test_fused_member_matches_unfused(song):
    """params-mode members (fused one-dispatch graph) produce the same
    stems as the legacy closed-over-params path."""
    import jax
    import jax.numpy as jnp

    from audiolab_tpu.models.separation.roformer import BSRoformer, RoformerConfig
    from audiolab_tpu.pipelines.separate import EnsembleMember, StemSeparator

    cfg = RoformerConfig(dim=16, depth=1, heads=2, dim_head=8, n_fft=64,
                         hop=32, freqs_per_bands=(8, 25), dtype="float32")
    model = BSRoformer(cfg)
    sr = 8000
    from audiolab_tpu.core.audio_io import read_audio

    x = np.asarray(read_audio(song).samples, np.float32)[:, : sr * 2]
    if x.shape[0] == 1:
        x = np.tile(x, (2, 1))
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, sr)))["params"]

    legacy = EnsembleMember("m", lambda b: model.apply({"params": p}, b))
    fused = EnsembleMember("m", lambda q, b: model.apply({"params": q}, b),
                           params=p)
    kw = dict(sr=sr, chunk_seconds=0.5, overlap_seconds=0.1, device_batch=2)
    s1 = StemSeparator([legacy], **kw).separate(x)
    s2 = StemSeparator([fused], **kw).separate(x)
    np.testing.assert_allclose(s1["vocals"], s2["vocals"], atol=2e-3)
    np.testing.assert_allclose(s1["instrumental"], s2["instrumental"],
                               atol=2e-3)


def test_separate_full_option_set(tmp_path, song):
    """The reference wrapper's full field set (wrappers/separate.py:33-140):
    BG-vocal peel, drum split, reverb-IR capture, policy transforms, and
    extra stems kept when delete_extra_stems is off."""
    projects = run_chain(
        ["Separate"],
        [song],
        settings={"Separate": {
            "separate_bg_vocals": True,
            "bg_vocal_layers": 2,
            "separate_drums": True,
            "store_reverb_ir": True,
            "noise_removal": "Main Vocals",
            "reverb_removal": "All Vocals",
            "delete_extra_stems": False,
            "use_cache": False,
        }},
        output_root=str(tmp_path / "out"),
    )
    outs = projects[0].last_outputs
    names = [os.path.basename(f) for f in outs]
    assert any("(Vocals)" in n for n in names)
    assert any("(BG_Vocals)" in n for n in names)
    assert any("Bg_Vocals_2" in n for n in names)
    assert any("(Drums)" in n for n in names)
    # reverb IR captured for Merge's re-apply path
    assert os.path.exists(
        os.path.join(projects[0].project_dir, "reverb_params.json"))
    for f in outs:
        a = read_audio(f)
        assert np.isfinite(a.samples).all()
