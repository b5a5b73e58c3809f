"""On-TPU feature retrieval — the faiss replacement (SURVEY §2.5).

The reference builds a faiss IVF-Flat index over training HuBERT features
(layouts/rvc_train.py:448-524, optional 10k MiniBatchKMeans) and at inference
searches k=8 neighbours, blending the reconstructed features with
1/d² weights scaled by index_rate (pipeline.py:194-203).

TPU redesign: features are ≤768-d and ≤~1M rows — exact blocked top-k over a
resident HBM matrix beats an IVF approximation: one MXU matmul per block with
a running ``lax.top_k`` merge, no host round trip, exact results.  K-means
(for compaction parity with the reference's optional 10k-centroid training)
is plain Lloyd's in jitted JAX.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "block"))
def _topk_l2(
    queries: jnp.ndarray,  # (t, d)
    data: jnp.ndarray,     # (n, d)
    k: int = 8,
    block: int = 8192,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN by squared L2: returns (dist² (t,k), idx (t,k))."""
    t, d = queries.shape
    n = data.shape[0]
    nb = -(-n // block)
    n_pad = nb * block
    data_p = jnp.pad(data, ((0, n_pad - n), (0, 0)))
    q_norm = jnp.sum(queries * queries, axis=-1, keepdims=True)  # (t,1)

    def body(carry, i):
        best_d, best_i = carry
        blk = jax.lax.dynamic_slice_in_dim(data_p, i * block, block, axis=0)
        x_norm = jnp.sum(blk * blk, axis=-1)[None, :]  # (1,block)
        d2 = q_norm + x_norm - 2.0 * jnp.dot(
            queries, blk.T, preferred_element_type=jnp.float32
        )
        ids = i * block + jax.lax.broadcasted_iota(jnp.int32, (t, block), 1)
        d2 = jnp.where(ids < n, d2, jnp.inf)  # mask padding rows
        cand_d = jnp.concatenate([best_d, d2], axis=-1)
        cand_i = jnp.concatenate([best_i, ids], axis=-1)
        neg_d, pos = jax.lax.top_k(-cand_d, k)
        return (-neg_d, jnp.take_along_axis(cand_i, pos, axis=-1)), None

    init = (jnp.full((t, k), jnp.inf), jnp.full((t, k), -1, jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(nb))
    return best_d, best_i


@partial(jax.jit, static_argnames=("k",))
def knn_blend(
    queries: jnp.ndarray,   # (t, d)
    data: jnp.ndarray,      # (n, d)
    index_rate: float | jnp.ndarray = 0.75,
    k: int = 8,
) -> jnp.ndarray:
    """RVC retrieval mix: 1/d²-weighted average of k neighbours blended with
    the query at index_rate (pipeline.py:194-203)."""
    d2, idx = _topk_l2(queries, data, k=k)
    w = 1.0 / jnp.maximum(d2, 1e-9)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neigh = data[idx]  # (t, k, d)
    blended = jnp.einsum("tk,tkd->td", w, neigh)
    return index_rate * blended + (1.0 - index_rate) * queries


@partial(jax.jit, static_argnames=("n_clusters", "iters"))
def kmeans(
    x: jnp.ndarray, n_clusters: int = 10000, iters: int = 20, seed: int = 0
) -> jnp.ndarray:
    """Lloyd's k-means on device; replaces sklearn MiniBatchKMeans
    (layouts/rvc_train.py:448-524 10k-centroid compaction)."""
    n = x.shape[0]
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (n_clusters,), replace=n < n_clusters)
    centroids = x[init_idx]

    def step(c, _):
        # assign via blocked top-1
        d2, idx = _topk_l2(x, c, k=1)
        assign = idx[:, 0]
        one_hot = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)  # (n, c)
        counts = one_hot.sum(axis=0)[:, None]
        sums = one_hot.T @ x
        newc = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), c)
        return newc, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


class FeatureIndex:
    """Host-side wrapper: build/save/load a feature matrix + query it.

    Serialization: a plain .npz (replaces the faiss .index file; the train
    layout writes it next to the model like the reference does)."""

    def __init__(self, features: np.ndarray):
        self.features = np.ascontiguousarray(features, dtype=np.float32)
        self._device = None

    @classmethod
    def build(
        cls, features: np.ndarray, compact_threshold: int = 200_000, n_clusters: int = 10_000
    ) -> "FeatureIndex":
        """Optionally k-means-compact very large feature sets (parity with
        rvc_train.py's >200k-row MiniBatchKMeans path)."""
        if len(features) > compact_threshold:
            features = np.asarray(kmeans(jnp.asarray(features), n_clusters=n_clusters))
        return cls(features)

    def save(self, path: str) -> None:
        np.savez_compressed(path, features=self.features)

    @classmethod
    def load(cls, path: str) -> "FeatureIndex":
        return cls(np.load(path)["features"])

    def device_data(self) -> jnp.ndarray:
        if self._device is None:
            self._device = jnp.asarray(self.features)
        return self._device

    def blend(self, queries: jnp.ndarray, index_rate: float = 0.75, k: int = 8) -> jnp.ndarray:
        return knn_blend(queries, self.device_data(), index_rate, k=k)
