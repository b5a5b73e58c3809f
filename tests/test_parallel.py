"""Tensor-parallel tests: TP-sharded LM forward matches the replicated
forward bit-for-bit (modulo float assoc), on a dp×tp CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiolab_tpu.models.lm import LMConfig, TransformerLM
from audiolab_tpu.parallel import lm_tp_shardings, shard_lm_params


def test_tp_sharded_forward_matches_replicated():
    cfg = LMConfig(vocab_size=64, dim=32, n_layers=2, n_heads=4, n_kv_heads=4,
                   ffn_dim=64, max_seq_len=32, dtype="float32")
    lm = TransformerLM(cfg)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 64, (4, 10)),
                       jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), toks)["params"]
    ref, _ = jax.jit(lambda p, t: lm.apply({"params": p}, t))(params, toks)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "tp"))
    sharded = shard_lm_params(params, mesh)
    # sanity: at least one leaf actually sharded over tp
    sh = lm_tp_shardings(params, mesh)
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s.spec, sh,
                               is_leaf=lambda x: isinstance(x, NamedSharding)))
    assert any("tp" in str(s) for s in specs)

    data_sharding = NamedSharding(mesh, P("dp"))
    toks_s = jax.device_put(toks, data_sharding)
    out, _ = jax.jit(lambda p, t: lm.apply({"params": p}, t))(sharded, toks_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
