"""RVC training orchestrator — the ``train1key`` / ``train_main`` equivalent
(reference: layouts/rvc_train.py:524-727 and
modules/rvc/infer/modules/train/train.py:254-788).

Single host process; parallelism is the dp mesh inside the jitted step (no
mp.Process-per-GPU, no DDP — SURVEY §2.6).  Includes the reference's
LossTracker EMA smoothing + best-checkpoint/early-stop logic
(train.py:57-239) re-done as a small pure-python class.
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import numpy as np

from audiolab_tpu.core.mesh import get_mesh
from audiolab_tpu.models.rvc.synthesizer import SynthesizerConfig, config_for
from audiolab_tpu.retrieval.index import FeatureIndex
from audiolab_tpu.train.checkpoint import (
    checkpoint_manager,
    export_generator,
    restore_train_state,
    save_train_state,
)
from audiolab_tpu.train.data import (
    LoaderConfig,
    PreprocessConfig,
    RVCDataLoader,
    extract_features,
    preprocess_dataset,
    write_filelist,
)
from audiolab_tpu.train.rvc import create_train_state, make_train_step

log = logging.getLogger(__name__)


class LossTracker:
    """EMA loss smoothing + plateau / upslope early-stop
    (train.py:57-239 semantics: smoothed gen-total; 'best' tracked; stop on
    sustained upslope or long plateau)."""

    def __init__(self, ema: float = 0.95, patience: int = 25, min_delta: float = 1e-3):
        self.ema_w = ema
        self.patience = patience
        self.min_delta = min_delta
        self.ema: float | None = None
        self.best = float("inf")
        self.best_step = 0
        self.stale = 0

    def update(self, loss: float, step: int) -> None:
        self.ema = loss if self.ema is None else self.ema_w * self.ema + (1 - self.ema_w) * loss
        if self.ema < self.best - self.min_delta:
            self.best = self.ema
            self.best_step = step
            self.stale = 0
        else:
            self.stale += 1

    @property
    def is_best(self) -> bool:
        return self.stale == 0

    def should_early_stop(self) -> bool:
        return self.stale >= self.patience


@dataclass
class TrainRVCConfig:
    sr: int = 48000
    version: str = "v2"
    batch_size: int = 4
    epochs: int = 20
    lr: float = 1e-4
    save_every_epoch: int = 5
    spk_id: int = 0
    use_mesh: bool = True
    early_stop: bool = True
    synth_overrides: dict = field(default_factory=dict)


def prepare_dataset(dataset_dir: str, exp_dir: str, hubert_apply, sr: int = 48000,
                    spk_id: int = 0) -> str:
    """preprocess -> feature/f0 extract -> filelist (train1key steps 1-3)."""
    n = preprocess_dataset(dataset_dir, exp_dir, PreprocessConfig(sr=sr))
    log.info("preprocess: %d slices", n)
    m = extract_features(exp_dir, hubert_apply)
    log.info("features: %d", m)
    return write_filelist(exp_dir, sid=spk_id)


def build_index(exp_dir: str, n_clusters: int | None = None) -> str:
    """faiss-free retrieval index from extracted features (on-TPU k-means
    when the row count is large — layouts/rvc_train.py:448-524 equivalent)."""
    feats = []
    for p in sorted((Path(exp_dir) / "feats").glob("*.npy")):
        feats.append(np.load(p))
    if not feats:
        raise ValueError(f"no features in {exp_dir}/feats")
    rows = np.concatenate(feats, axis=0).astype(np.float32)
    idx = FeatureIndex.build(rows, **({"n_clusters": n_clusters} if n_clusters else {}))
    out = str(Path(exp_dir) / "index.npz")
    idx.save(out)
    return out


def train_rvc(
    exp_dir: str,
    cfg: TrainRVCConfig | None = None,
    callback=None,
) -> dict:
    """Epoch loop with resume, periodic + best checkpointing, small export.

    Returns final metrics dict."""
    cfg = cfg or TrainRVCConfig()
    exp = Path(exp_dir)
    synth_cfg = config_for(cfg.sr, cfg.version)
    if cfg.synth_overrides:
        from dataclasses import replace

        synth_cfg = replace(synth_cfg, **cfg.synth_overrides)

    hop = {32000: 320, 40000: 400, 48000: 480}[cfg.sr]
    n_fft = {32000: 1024, 40000: 2048, 48000: 2048}[cfg.sr]
    loader = RVCDataLoader(
        str(exp / "filelist.json"),
        LoaderConfig(sr=cfg.sr, n_fft=n_fft, hop=hop,
                     win_length=n_fft, batch_size=cfg.batch_size),
    )
    steps_per_epoch = max(1, len(loader))

    state, gen, disc = create_train_state(
        synth_cfg, jax.random.PRNGKey(0), batch_size=cfg.batch_size,
        spec_frames=64, lr=cfg.lr, steps_per_epoch=steps_per_epoch,
    )
    n_dev = len(jax.devices())
    mesh = (get_mesh() if cfg.use_mesh and n_dev > 1
            and cfg.batch_size % n_dev == 0 else None)
    step_fn = make_train_step(
        synth_cfg, gen, disc, lr=cfg.lr, steps_per_epoch=steps_per_epoch, mesh=mesh
    )

    mgr = checkpoint_manager(str(exp / "ckpt"))
    restored = restore_train_state(mgr, state)
    if restored is not None:
        state = restored
        log.info("resumed from step %d", int(state.step))

    tracker = LossTracker()
    rng = jax.random.PRNGKey(1)
    metrics = {}
    t_start = time.time()
    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, cfg.epochs):
        for batch in loader.batches():
            state, metrics = step_fn(state, batch, rng)
        gen_total = float(metrics["loss_gen_total"])
        tracker.update(gen_total, int(state.step))
        if callback:
            callback(epoch + 1, f"epoch {epoch + 1}: gen {gen_total:.3f} "
                     f"disc {float(metrics['loss_disc']):.3f}", cfg.epochs)
        log.info("epoch %d step %d gen %.3f disc %.3f mel %.3f (%.1fs)",
                 epoch + 1, int(state.step), gen_total,
                 float(metrics["loss_disc"]), float(metrics["loss_mel"]),
                 time.time() - t_start)
        if tracker.is_best:
            export_generator(str(exp / "model_best.npz"), state.g_params, synth_cfg)
        if (epoch + 1) % cfg.save_every_epoch == 0 or epoch + 1 == cfg.epochs:
            save_train_state(mgr, int(state.step), state)
        if cfg.early_stop and tracker.should_early_stop():
            log.info("early stop at epoch %d", epoch + 1)
            break
    mgr.wait_until_finished()
    export_generator(str(exp / "model_final.npz"), state.g_params, synth_cfg)
    (exp / "train_state.json").write_text(
        json.dumps({"step": int(state.step),
                    "metrics": {k: float(v) for k, v in metrics.items()}})
    )
    return {k: float(v) for k, v in metrics.items()}
