"""Fidelity gates (BASELINE.md: mel-spectrogram L1 < 1e-2).

Without downloadable reference weights, the measurable gate is internal
consistency: the production bf16-matmul conversion path must stay within
the mel-L1 budget of the full-precision path on the same weights."""

import jax
import jax.numpy as jnp
import numpy as np

from audiolab_tpu.kernels.mel import log_mel, mel_spectrogram


def mel_l1(a: np.ndarray, b: np.ndarray, sr: int) -> float:
    n = min(len(a), len(b))
    ma = log_mel(mel_spectrogram(jnp.asarray(a[:n])[None], sr=sr, n_fft=1024,
                                 hop=256, n_mels=80, power=1.0))
    mb = log_mel(mel_spectrogram(jnp.asarray(b[:n])[None], sr=sr, n_fft=1024,
                                 hop=256, n_mels=80, power=1.0))
    return float(jnp.mean(jnp.abs(ma - mb)))


def test_bf16_conversion_within_mel_budget():
    from audiolab_tpu.models.hubert import HubertConfig, HubertFeatureExtractor
    from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn
    from audiolab_tpu.pipelines.rvc import RVCPipelineConfig, VoiceConverter
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

    rng = np.random.default_rng(0)
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(24000) / 16000)
             + 0.02 * rng.standard_normal(24000)).astype(np.float32)

    outs = {}
    for prec in ("highest", "bfloat16"):
        vc = VoiceConverter(
            scfg, sp, hp, hubert_cfg=hcfg,
            cfg=RVCPipelineConfig(sr=48000, f0_method="yin",
                                  chunk_seconds=1.0, overlap_seconds=0.2,
                                  matmul_precision=prec))
        outs[prec] = vc.convert(audio, sid=0, seed=0)

    err = mel_l1(outs["bfloat16"], outs["highest"], 48000)
    assert err < 1e-2, f"bf16 path mel-L1 {err} exceeds budget"
