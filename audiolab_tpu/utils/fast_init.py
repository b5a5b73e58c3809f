"""Shape-only parameter construction for benchmarks.

``flax.Module.init`` traces AND compiles the whole forward graph just to
produce a parameter tree — through a tunneled TPU backend (or even the CPU
backend at dim-512 RoFormer scale) that compile costs hundreds of seconds
and is pure waste when only the *shapes* matter (throughput benchmarks use
random weights; the reference ships no downloadable checkpoints in this
environment).  ``fast_init`` gets the shape tree from ``jax.eval_shape``
(trace only, no compile) and fills it with numpy on the host in
milliseconds.

Fill rules keep the tree numerically sane so forward passes neither
overflow nor collapse to all-zeros:
  - 1-D params named like norm gains (scale/gamma/weight of a *Norm) -> 1
  - biases / batch-norm means -> 0, batch-norm vars -> 1
  - everything else -> N(0, 0.02)
"""

from __future__ import annotations

import re

import jax
import numpy as np

_ONES = re.compile(r"(^|/)(scale|gamma|var(iance)?|g)$")
_ZEROS = re.compile(r"(^|/)(bias|b|mean|beta)$")


def _fill(path: str, shape, dtype, rng: np.random.Generator):
    if _ONES.search(path) or (path.endswith("weight") and len(shape) == 1):
        return np.ones(shape, dtype)
    if _ZEROS.search(path):
        return np.zeros(shape, dtype)
    return (rng.standard_normal(shape) * 0.02).astype(dtype)


def fast_init(init_fn, *args, seed: int = 0, **kwargs):
    """Numpy-filled variables matching ``init_fn(*args)``'s shape tree.

    ``init_fn`` is typically ``model.init`` (already bound to its rngs via a
    lambda) — e.g. ``fast_init(lambda: model.init(key, x))``.  Returns the
    same pytree structure with host numpy arrays as leaves; callers
    ``jax.device_put`` it wherever it should live.
    """
    shapes = jax.eval_shape(init_fn, *args, **kwargs)
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, leaf in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        ).lower()
        leaves.append(_fill(name, leaf.shape, leaf.dtype, rng))
    return jax.tree_util.tree_unflatten(treedef, leaves)
