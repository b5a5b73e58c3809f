"""AudioSR-class super-res training path (train/super_res.py): the
diffusion enhancer trains on band-limited->fullband pairs, checkpoints,
reloads, and plugs into the super_resolve pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolab_tpu.models.wavegrad import WaveGradConfig
from audiolab_tpu.train.super_res import (
    SRTrainConfig,
    band_limit,
    load_enhancer,
    train_superres,
)
from audiolab_tpu.train.wavetransfer import WTConfig


def _tiny_cfg(steps=6):
    model = WaveGradConfig(n_mels=16, hop=12, factors=(3, 2, 2),
                           ublock_ch=(16, 16, 8), dblock_ch=(8, 16),
                           base_ch=4)
    wt = WTConfig(sr=8000, n_mels=16, seg_frames=16, batch_size=2, lr=2e-3,
                  steps=steps, ckpt_every=steps, model=model)
    return SRTrainConfig(wt=wt, cutoff_lo_hz=800.0, cutoff_hi_hz=1500.0)


def test_band_limit_kills_highs():
    sr = 8000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 500 * t) + np.sin(2 * np.pi * 3000 * t)
    y = band_limit(x.astype(np.float32), sr, 1000.0)
    sp = np.abs(np.fft.rfft(y))
    f = np.fft.rfftfreq(len(y), 1 / sr)
    assert sp[np.argmin(np.abs(f - 500))] > 100 * sp[np.argmin(np.abs(f - 3000))]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("sr_data")
    from audiolab_tpu.core.audio_io import write_audio

    rng = np.random.default_rng(0)
    t = np.arange(8000 * 3) / 8000
    for i in range(2):
        x = (0.3 * np.sin(2 * np.pi * (300 + 80 * i) * t)
             + 0.2 * np.sin(2 * np.pi * 2500 * t)
             + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
        write_audio(str(d / f"clip{i}.wav"), x, 8000)
    cfg = _tiny_cfg()
    out = train_superres(str(d), cfg)
    return d, cfg, out


def test_train_runs_and_checkpoints(trained):
    d, cfg, out = trained
    assert np.isfinite(out["loss"])
    assert (d / "ckpt").exists()


def test_enhancer_reloads_and_resolves(trained):
    d, cfg, _ = trained
    fn = load_enhancer(str(d), cfg)
    from audiolab_tpu.pipelines.super_res import super_resolve

    rng = np.random.default_rng(1)
    low = band_limit(
        (0.3 * np.sin(2 * np.pi * 400 * np.arange(16000) / 8000)
         + 0.01 * rng.standard_normal(16000)).astype(np.float32),
        8000, 1000.0)
    out, osr = super_resolve(low, 8000, enhancer_fn=fn, chunk_seconds=0.5,
                             overlap_seconds=0.1, crossover_hz=1000.0)
    assert osr == 48000
    assert out.shape[-1] == 16000 * 6 and np.isfinite(out).all()


def test_training_reduces_fixed_eval_loss(tmp_path):
    """A few steps reduce the diffusion loss on a FIXED (batch, rng) eval."""
    import optax

    from audiolab_tpu.models.wavegrad import WaveGrad, diffusion_loss
    from audiolab_tpu.train.super_res import _pair_batches
    from audiolab_tpu.core.audio_io import write_audio

    cfg = _tiny_cfg()
    t = np.arange(8000 * 2) / 8000
    x = (0.4 * np.sin(2 * np.pi * 350 * t)
         + 0.2 * np.sin(2 * np.pi * 2200 * t)).astype(np.float32)
    write_audio(str(tmp_path / "a.wav"), x, 8000)
    gen = _pair_batches([str(tmp_path / "a.wav")], cfg,
                        np.random.default_rng(0))
    audio, mel = next(gen)
    model = WaveGrad(cfg.wt.model)
    params = model.init(jax.random.PRNGKey(0), audio, mel,
                        jnp.ones((audio.shape[0],)))["params"]
    tx = optax.adam(5e-3)
    opt = tx.init(params)
    eval_rng = jax.random.PRNGKey(123)

    @jax.jit
    def step(p, o, a, m, r):
        loss, g = jax.value_and_grad(
            lambda q: diffusion_loss(model, q, a, m, r))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    before = float(diffusion_loss(model, params, audio, mel, eval_rng))
    for i in range(20):
        a, m = next(gen)
        params, opt, _ = step(params, opt, a, m, jax.random.PRNGKey(i))
    after = float(diffusion_loss(model, params, audio, mel, eval_rng))
    assert after < before, (before, after)


def test_audiosr_checkpoint_pipeline_ddim():
    """Converted-layout AudioSR DDIM pipeline: deterministic per seed,
    conditioning-sensitive, sane cosine schedule."""
    import numpy as np

    from audiolab_tpu.models.audiosr_unet import (
        AudioSRUNet,
        AudioSRUNetConfig,
    )
    from audiolab_tpu.models.audiosr_vae import AudioSRVAE
    from audiolab_tpu.models.audiosr_vocoder import AudioSRVocoder
    from audiolab_tpu.pipelines.super_res import (
        AudioSRCheckpointPipeline,
        cosine_alphas_cumprod,
    )

    acp = cosine_alphas_cumprod(1000)
    assert acp.shape == (1000,) and np.all(np.diff(acp) < 0)

    rng = np.random.default_rng(0)
    vae = AudioSRVAE(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                     embed_dim=4)
    fbank = jnp.asarray(rng.standard_normal((1, 8, 16, 1)),
                        jnp.float32) * 0.3
    vp = vae.init(jax.random.PRNGKey(0), fbank)["params"]
    ucfg = AudioSRUNetConfig(in_channels=8, model_channels=32,
                             out_channels=4, num_res_blocks=1,
                             attention_resolutions=(2,),
                             channel_mult=(1, 2), num_head_channels=16)
    unet = AudioSRUNet(ucfg)
    up = unet.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 8)),
                   jnp.zeros((1,)))["params"]
    voc = AudioSRVocoder(num_mels=16, initial_channel=32,
                         upsample_rates=(6, 5, 4, 2, 2),
                         resblock_kernels=(3,),
                         resblock_dilations=((1, 3),))
    wp = voc.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 16)))["params"]
    pipe = AudioSRCheckpointPipeline(vae, vp, unet, up, voc, wp)
    wav = pipe.super_resolve(fbank, steps=3, seed=3)
    assert wav.shape == (1, 8 * 480) and bool(jnp.all(jnp.isfinite(wav)))
    assert bool(jnp.all(wav == pipe.super_resolve(fbank, steps=3, seed=3)))
    assert not bool(jnp.all(wav == pipe.super_resolve(fbank * -1.0,
                                                      steps=3, seed=3)))


def test_bddm_schedule_network():
    """BDDM: phi trains against a frozen score net and the reverse search
    yields a usable short schedule that drives the sampler."""
    import numpy as np

    from audiolab_tpu.models.wavegrad import (
        WaveGrad,
        WaveGradConfig,
        sample,
    )
    from audiolab_tpu.train.wavetransfer import (
        bddm_noise_scheduling,
        train_schedule_net,
    )

    cfg = WaveGradConfig(n_mels=16, hop=12, factors=(3, 2, 2),
                         ublock_ch=(32, 16, 16), dblock_ch=(16, 16),
                         base_ch=8)
    wg = WaveGrad(cfg)
    b, frames = 2, 6
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, frames * cfg.hop)) * 0.3, jnp.float32)
    mel = jnp.asarray(np.random.default_rng(1).standard_normal(
        (b, frames, 16)) * 0.5, jnp.float32)
    wgp = wg.init(jax.random.PRNGKey(0), audio, mel,
                  jnp.full((b,), 0.5))["params"]
    net, sp, losses = train_schedule_net(wg, wgp, audio, mel, steps=4,
                                         lr=1e-3)
    assert len(losses) == 4 and all(np.isfinite(losses))
    sched = bddm_noise_scheduling(wg, wgp, net, sp, mel, alpha_param=0.9,
                                  beta_param=0.05, max_steps=8)
    assert 1 <= len(sched.betas) <= 8
    assert np.all(sched.betas > 0) and np.all(sched.betas < 1)
    out = sample(wg, wgp, mel, sched, jax.random.PRNGKey(2))
    assert out.shape == (b, frames * cfg.hop)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_audiosr_fbank_framing_matches_torch():
    """audiosr's manual-reflect-pad center=False framing (utils.py:110-155)
    reproduced: our fbank path equals mel_basis @ |torch.stft| under the
    identical padding/window."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    from audiolab_tpu.kernels.mel import mel_filterbank
    from audiolab_tpu.pipelines.super_res import audiosr_fbank

    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 48000)).astype(np.float32) * 0.3
    ours = np.asarray(audiosr_fbank(jnp.asarray(x), n_mels=64))

    pad = (2048 - 480) // 2
    y = torch.nn.functional.pad(
        torch.from_numpy(x).unsqueeze(1), (pad, pad), mode="reflect"
    ).squeeze(1)
    spec = torch.stft(y, 2048, hop_length=480, win_length=2048,
                      window=torch.hann_window(2048), center=False,
                      normalized=False, onesided=True, return_complex=True)
    mag = torch.abs(spec)[0].numpy()            # (bins, t)
    basis = np.asarray(mel_filterbank(48000, 2048, 64, 20.0, 24000.0,
                                      htk=False, norm="slaney"))  # (bins, mels)
    ref = np.log(np.clip(basis.T @ mag, 1e-5, None)).T[None]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_audiosr_enhance_chunks_contract():
    """enhance_chunks satisfies the super_resolve enhancer contract on the
    tiny converted-stack pipeline: shape-preserving, finite, per-channel."""
    import numpy as np

    from audiolab_tpu.models.audiosr_unet import (
        AudioSRUNet,
        AudioSRUNetConfig,
    )
    from audiolab_tpu.models.audiosr_vae import AudioSRVAE
    from audiolab_tpu.models.audiosr_vocoder import AudioSRVocoder
    from audiolab_tpu.pipelines.super_res import AudioSRCheckpointPipeline

    vae = AudioSRVAE(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                     embed_dim=4)
    vp = vae.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, 64, 16, 1)))["params"]
    ucfg = AudioSRUNetConfig(in_channels=8, model_channels=32,
                             out_channels=4, num_res_blocks=1,
                             attention_resolutions=(2,),
                             channel_mult=(1, 2), num_head_channels=16)
    unet = AudioSRUNet(ucfg)
    up = unet.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 32, 8)),
                   jnp.zeros((1,)))["params"]
    voc = AudioSRVocoder(num_mels=16, initial_channel=32,
                         upsample_rates=(6, 5, 4, 2, 2),
                         resblock_kernels=(3,),
                         resblock_dilations=((1, 3),))
    wp = voc.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 16)))["params"]
    pipe = AudioSRCheckpointPipeline(vae, vp, unet, up, voc, wp, n_mels=16)
    rng = np.random.default_rng(3)
    chunks = rng.standard_normal((2, 2, 24000)).astype(np.float32) * 0.2
    out = np.asarray(pipe.enhance_chunks(jnp.asarray(chunks), steps=2))
    assert out.shape == chunks.shape
    assert np.isfinite(out).all()
