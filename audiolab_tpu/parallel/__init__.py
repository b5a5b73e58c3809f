"""Parallelism layer: mesh setup lives in core/mesh; this package holds the
sharding rules per model family (SURVEY §2.6 — the reference has DP only;
TP is the planned mesh axis for the largest LMs, e.g. YuE stage-1)."""

from audiolab_tpu.parallel.tp import lm_tp_shardings, shard_lm_params

__all__ = ["lm_tp_shardings", "shard_lm_params"]
