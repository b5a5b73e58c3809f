"""audiolab_tpu — TPU-native audio ML framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of d8ahazard/AudioLab
(reference layer map in SURVEY.md): stem separation, voice cloning (RVC),
TTS, music generation, timbre transfer, super-resolution, remastering,
transcription, alignment, and DAW export — engineered TPU-first:

- compute path: jit-compiled XLA graphs + Pallas kernels (MXU matmul STFT,
  blockwise flash attention, fused norms, associative-scan SSM)
- scaling: ``jax.sharding.Mesh`` + pjit/shard_map (dp/tp axes), XLA collectives
- host path: WAV/ffmpeg I/O, project management, REST serving (stdlib HTTP)

Layer map (bottom-up):
  core/      audio I/O, dtype policy, mesh, chunk planner, project files
  kernels/   Pallas/XLA: stft, mel, resample, norms, attention, ssm
  dsp/       jitted DSP: autotune, reverb, stereo, silence, harmony, loudness
  models/    flax: hubert, rmvpe, rvc, separators, codecs, LMs, diffusion
  retrieval/ on-TPU top-k feature index (faiss replacement)
  pipelines/ chainable processors (wrapper chain semantics of the reference)
  train/     pjit train steps, orbax checkpoints, bucketed batching
  serve/     REST API surface
"""

__version__ = "0.1.0"
