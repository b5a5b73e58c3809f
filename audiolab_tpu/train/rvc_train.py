"""REST-facing RVC training adapter (reference: layouts/rvc_train.py
train1key :524-727 behind /api/v1/rvc/train with the async job store).

Bridges uploaded dataset files -> prepare_dataset -> train_rvc -> deployable
export + retrieval index, reporting progress into the job store."""

from __future__ import annotations

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np


def hubert_weights_path() -> str | None:
    """Server-side HuBERT checkpoint location.  SECURITY: never taken from
    request bodies — a client-controlled path fed to ``torch.load`` is an
    arbitrary-code-execution primitive (pickle), and /api/v1/rvc/upload lets
    clients write bytes into a predictable models dir.  Weights are resolved
    only from the ``AUDIOLAB_WEIGHTS_DIR`` env var (set by the operator)."""
    wdir = os.environ.get("AUDIOLAB_WEIGHTS_DIR")
    if not wdir:
        return None
    for name in ("hubert_base.pt", "hubert_base.npz", "contentvec.pt"):
        p = os.path.join(wdir, name)
        if os.path.exists(p):
            return p
    return None


def _hubert_apply_for(settings: dict):
    """Feature extractor for preprocessing.  Uses converted HuBERT weights
    when the server's weights dir (``AUDIOLAB_WEIGHTS_DIR``) has a fairseq
    checkpoint; otherwise a deterministic random-init HuBERT (features are
    still a stable embedding — fine for pipeline wiring, not for production
    voice quality until weights are converted)."""
    from audiolab_tpu.models.hubert import HubertConfig, HubertFeatureExtractor

    dim = int(settings.get("feat_channels", 768))
    small = settings.get("small_hubert", True)
    cfg = (HubertConfig(dim=dim, ffn_dim=dim * 4, heads=max(1, dim // 64),
                        layers=2, final_dim=256)
           if small else HubertConfig())
    model = HubertFeatureExtractor(version=settings.get("version", "v2"), cfg=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16000), jnp.float32))["params"]
    path = hubert_weights_path()
    if path:
        from audiolab_tpu.utils.convert import convert_hubert, torch_load_weights

        sd = torch_load_weights(path)
        sd = sd.get("model", sd)
        sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
              if hasattr(v, "shape")}
        params = convert_hubert(sd, params, strict=False)
    return lambda wav: model.apply({"params": params}, wav)


def train_from_request(files: list[str], name: str, models_dir: str,
                       settings: dict, job_id: str | None = None) -> dict:
    from audiolab_tpu.serve.rvc_api import update_job
    from audiolab_tpu.train.trainer import (
        TrainRVCConfig,
        build_index,
        train_rvc,
    )

    def progress(step, msg, total):
        if job_id:
            update_job(job_id, min(0.99, step / max(total, 1)), msg)

    dataset_dir = os.path.dirname(files[0])
    exp_dir = os.path.join(os.path.dirname(models_dir), "exp", name)
    os.makedirs(exp_dir, exist_ok=True)
    sr = int(settings.get("sr", 48000))

    progress(1, "extracting features", 10)
    hubert_apply = _hubert_apply_for(settings)
    from audiolab_tpu.train.data import PreprocessConfig, preprocess_dataset, extract_features, write_filelist

    pre = PreprocessConfig(sr=sr,
                           slice_seconds=float(settings.get("slice_seconds", 3.7)))
    n = preprocess_dataset(dataset_dir, exp_dir, pre)
    if n == 0:
        raise ValueError("dataset produced no training slices (clips too "
                         "short or silent)")
    extract_features(exp_dir, hubert_apply)
    write_filelist(exp_dir, sid=int(settings.get("spk_id", 0)))
    progress(3, "building retrieval index", 10)
    index_path = build_index(exp_dir)

    progress(4, "training", 10)
    overrides = dict(settings.get("synth_overrides", {}))
    overrides.setdefault("feat_channels", int(settings.get("feat_channels", 768)))
    cfg = TrainRVCConfig(
        sr=sr,
        batch_size=int(settings.get("batch_size", 4)),
        epochs=int(settings.get("epochs", 10)),
        lr=float(settings.get("lr", 1e-4)),
        save_every_epoch=int(settings.get("save_every_epoch", 5)),
        synth_overrides=overrides,
    )
    metrics = train_rvc(exp_dir, cfg, callback=progress)

    os.makedirs(models_dir, exist_ok=True)
    model_path = os.path.join(models_dir, f"{name}.npz")
    shutil.copy2(os.path.join(exp_dir, "model_final.npz"), model_path)
    shutil.copy2(index_path, os.path.join(models_dir, f"{name}.index.npz"))
    return {"model": os.path.basename(model_path), "metrics": metrics}
