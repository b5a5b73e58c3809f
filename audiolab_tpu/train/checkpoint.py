"""Checkpointing (reference: modules/rvc/infer/lib/train/utils.py:71-165
save/load of G/D + optimizer + step, and process_ckpt.py:13-56 ``savee``
deployable weight-only export).

Orbax handles the full train state (resume path); the deployable export is a
single npz of generator params + config — the TPU analogue of the
reference's stripped fp16 .pth (enc_q removed, config embedded)."""

from __future__ import annotations

import json
from dataclasses import asdict
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from audiolab_tpu.models.rvc.synthesizer import SynthesizerConfig


def checkpoint_manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        Path(ckpt_dir).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_train_state(mgr: ocp.CheckpointManager, step: int, state) -> None:
    mgr.save(step, args=ocp.args.StandardSave(state))


def restore_train_state(mgr: ocp.CheckpointManager, template):
    """Restore latest checkpoint into the template's structure, or None."""
    step = mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(template))


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def export_generator(path: str, g_params, cfg: SynthesizerConfig) -> str:
    """Deployable weight-only export (savee equivalent): drops enc_q (the
    train-only posterior encoder, process_ckpt.py:21), embeds config."""
    params = {k: v for k, v in g_params.items() if k != "enc_q"}
    flat = _flatten(jax.tree_util.tree_map(np.asarray, params))
    cfg_json = json.dumps(
        {k: (list(v) if isinstance(v, tuple) else v) for k, v in asdict(cfg).items()},
        default=lambda o: list(o),
    )
    np.savez(path, __config__=cfg_json, **flat)
    return path


def extract_small_model(ckpt_dir: str, out_path: str, cfg: SynthesizerConfig):
    """Deployable export from a full training checkpoint
    (process_ckpt.py:70 extract_small_model equivalent)."""
    mgr = checkpoint_manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    state = mgr.restore(step)
    g_params = state["g_params"] if isinstance(state, dict) else state.g_params
    return export_generator(out_path, g_params, cfg)


def merge_models(path_a: str, path_b: str, out_path: str,
                 alpha: float = 0.5) -> str:
    """Weighted merge of two exported generators with matching configs
    (process_ckpt.py:212 ckpt merge): w = alpha*a + (1-alpha)*b."""
    pa, cfg_a = load_generator(path_a)
    pb, cfg_b = load_generator(path_b)
    if cfg_a != cfg_b:
        raise ValueError("cannot merge: configs differ")
    merged = jax.tree_util.tree_map(
        lambda a, b: alpha * a + (1.0 - alpha) * b, pa, pb
    )
    return export_generator(out_path, merged, cfg_a)


def load_generator(path: str) -> tuple[dict, SynthesizerConfig]:
    data = np.load(path, allow_pickle=False)
    raw = json.loads(str(data["__config__"]))
    for k in ("resblock_kernel_sizes", "upsample_rates", "upsample_kernel_sizes"):
        raw[k] = tuple(raw[k])
    raw["resblock_dilation_sizes"] = tuple(tuple(d) for d in raw["resblock_dilation_sizes"])
    cfg = SynthesizerConfig(**raw)
    flat = {k: data[k] for k in data.files if k != "__config__"}
    return _unflatten(flat), cfg
