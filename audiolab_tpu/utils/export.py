"""Deployable model export (reference: modules/rvc/infer/lib/infer_pack/
models_onnx.py ONNX export variants + infer/lib/jit/ torch-jit export).

The TPU-native equivalent is ``jax.export``: a jitted function serialises
to portable StableHLO bytes that reload and run on any JAX backend without
the Python model code.  Same role as the reference's .onnx artifacts."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def export_stablehlo(fn, example_args, path: str) -> str:
    """Serialize jit(fn)(*example_args) to a StableHLO artifact file."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_stablehlo(path: str):
    """Reload an exported artifact; returns a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def export_rvc_synthesizer(params, cfg, path: str, frames: int = 100,
                           batch: int = 1) -> str:
    """Export the RVC inference graph (models_onnx.py equivalent)."""
    from audiolab_tpu.models.rvc.synthesizer import SynthesizerTrn

    model = SynthesizerTrn(cfg)

    def infer(params, phone, lengths, pitch, pitchf, sid):
        return model.apply({"params": params}, phone, lengths, pitch, pitchf,
                           sid, None, method=SynthesizerTrn.infer)

    args = (
        params,
        jnp.zeros((batch, frames, cfg.feat_channels), jnp.float32),
        jnp.full((batch,), frames, jnp.int32),
        jnp.ones((batch, frames), jnp.int32),
        jnp.full((batch, frames), 220.0, jnp.float32),
        jnp.zeros((batch,), jnp.int32),
    )
    return export_stablehlo(infer, args, path)
