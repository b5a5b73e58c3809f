"""Tensor-parallel sharding rules for the shared TransformerLM core.

Megatron-style layout over the mesh axis ``tp``:
  - attention wq/wk/wv kernels: column-parallel  (dim, heads*hd) -> P(None, tp)
  - attention wo kernel:        row-parallel     (heads*hd, dim) -> P(tp, None)
  - MLP w1/w3:                  column-parallel
  - MLP w2:                     row-parallel
  - embeddings / norms / head:  replicated (vocab-parallel embedding is a
    later optimization; the head matmul dominates only at small dim)

XLA inserts the all-reduces at the row-parallel boundaries from these
shardings alone — no explicit collectives in model code ("How to Scale
Your Model" recipe; SURVEY §2.6 TP row)."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("wq", "wk", "wv", "w1", "w3")
ROW_PARALLEL = ("wo", "w2")


def _spec_for(path: tuple[str, ...], leaf) -> P:
    names = [p for p in path]
    for i, name in enumerate(names):
        if name in COLUMN_PARALLEL and i + 1 < len(names) and names[i + 1] == "kernel":
            return P(None, "tp")
        if name in ROW_PARALLEL and i + 1 < len(names) and names[i + 1] == "kernel":
            return P("tp", None)
    return P()  # replicated


def lm_tp_shardings(params, mesh: Mesh):
    """Params pytree -> NamedSharding pytree (same structure)."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return NamedSharding(mesh, _spec_for(path, tree))

    return walk(params, ())


def shard_lm_params(params, mesh: Mesh):
    """Place params onto the mesh with TP shardings."""
    shardings = lm_tp_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
