"""Headline benchmark: RVC voice-conversion chain real-time factor.

Runs the full jitted conversion graph (HuBERT features -> retrieval blend ->
f0 -> SynthesizerTrn/NSF-HiFiGAN) on a 4-minute 16 kHz track with full-size
v2-48k weights (randomly initialised — throughput is weight-independent) and
reports audio-seconds generated per wall second per chip.

Baseline (BASELINE.md): >=20x real-time per TPU v5e chip for the
separate->RVC chain; vs_baseline = RTF / 20.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/audiolab_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    from audiolab_tpu.models.hubert import HubertConfig, HubertFeatureExtractor
    from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn, config_for
    from audiolab_tpu.pipelines.rvc import RVCPipelineConfig, VoiceConverter

    dur_s = 240.0  # 4-minute song
    sr_in = 16000

    synth_cfg = config_for(48000, "v2")
    hub_cfg = HubertConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))

    # init on the CPU backend: init graphs compile in ms there vs minutes
    # through the TPU tunnel; params transfer to the TPU on first use
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        hub = HubertFeatureExtractor(version="v2", cfg=hub_cfg)
        hubert_params = hub.init(k1, jnp.zeros((1, 16000), jnp.float32))["params"]

        synth = SynthesizerTrn(synth_cfg)
        t = 100
        synth_params = synth.init(
            {"params": k2},
            jnp.zeros((1, t, synth_cfg.feat_channels), jnp.float32),
            jnp.full((1,), t, jnp.int32),
            jnp.ones((1, t), jnp.int32),
            jnp.full((1, t), 220.0, jnp.float32),
            jnp.zeros((1,), jnp.int32),
            None,
            method=SynthesizerTrn.infer,
        )["params"]
    dev = jax.devices()[0]
    hubert_params = jax.device_put(hubert_params, dev)
    synth_params = jax.device_put(synth_params, dev)

    # small retrieval index so the knn path is exercised too
    index = np.random.default_rng(0).standard_normal((4096, 768)).astype(np.float32)

    vc = VoiceConverter(
        synth_cfg,
        synth_params,
        hubert_params,
        rmvpe=None,  # autocorr f0 (jitted); RMVPE adds a fixed small cost
        index_features=index,
        cfg=RVCPipelineConfig(sr=48000, f0_method="yin"),
    )

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(dur_s * sr_in)) * 0.1).astype(np.float32)

    # warmup pass compiles the fixed device-batch graph; timed passes reuse
    # the executable (compiles are minutes-slow via the TPU tunnel); best of
    # 3 filters tunnel RPC jitter
    _ = vc.convert(audio, sid=0)

    elapsed = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        out = vc.convert(audio, sid=0)
        elapsed = min(elapsed, time.perf_counter() - t0)

    rtf = dur_s / elapsed
    print(
        json.dumps(
            {
                "metric": "rvc_chain_rtf_4min",
                "value": round(rtf, 3),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(rtf / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
