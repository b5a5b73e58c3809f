"""CLAP (laion_clap wheel) — checkpoint-layout-faithful pieces.

Text branch (vendored reference: the laion_clap wheel's
clap_module/model.py:505-514, 602-640 "roberta" path): a transformers
RobertaModel (BERT-arch with the RoBERTa position-id convention:
pad_id 1, positions start at pad_id+1 for non-pad tokens) whose
pooler_output feeds a Linear-ReLU-Linear projection into the 512-d joint
space.  Oracle-tested against the installed transformers RobertaModel in
tests/test_sao_parity.py.

The HTSAT swin audio branch remains a documented cut; text embeddings
alone already serve text-conditioned retrieval/ranking over audio
embeddings produced elsewhere.

Conversion: utils/convert.convert_clap_text.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ClapTextConfig:
    vocab_size: int = 50265
    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 514
    type_vocab: int = 1
    pad_id: int = 1
    joint_dim: int = 512


class _RobertaLayer(nn.Module):
    cfg: ClapTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        b, t, d = x.shape
        dk = d // c.heads
        q = nn.Dense(d, name="q")(x)
        k = nn.Dense(d, name="k")(x)
        v = nn.Dense(d, name="v")(x)
        q, k, v = (a.reshape(b, t, c.heads, dk).transpose(0, 2, 1, 3)
                   for a in (q, k, v))
        acc = jnp.promote_types(x.dtype, jnp.float32)
        w = jnp.einsum("bhid,bhjd->bhij", q.astype(acc), k.astype(acc))
        w = w / jnp.sqrt(jnp.asarray(dk, acc))
        w = jnp.where(mask[:, None, None, :] > 0, w,
                      jnp.finfo(acc).min)
        w = jax.nn.softmax(w, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", w, v.astype(acc)).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = nn.LayerNorm(epsilon=1e-5, name="attn_ln")(
            x + nn.Dense(d, name="attn_out")(o))
        h = nn.Dense(c.ffn_dim, name="ffn_in")(x)
        h = nn.gelu(h, approximate=False)
        return nn.LayerNorm(epsilon=1e-5, name="ffn_ln")(
            x + nn.Dense(d, name="ffn_out")(h))


class ClapTextBranch(nn.Module):
    """input_ids (b, t) + attention_mask (b, t) -> 512-d joint embedding
    (RobertaModel pooler -> text_projection)."""

    cfg: ClapTextConfig = ClapTextConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        c = self.cfg
        # RoBERTa position ids: cumsum over non-pad + pad_id
        mask = (input_ids != c.pad_id).astype(jnp.int32)
        pos = jnp.cumsum(mask, axis=1) * mask + c.pad_id
        x = nn.Embed(c.vocab_size, c.dim, name="word_emb")(input_ids)
        x = x + nn.Embed(c.max_positions, c.dim, name="pos_emb")(pos)
        x = x + nn.Embed(c.type_vocab, c.dim, name="type_emb")(
            jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=1e-5, name="emb_ln")(x)
        for i in range(c.layers):
            x = _RobertaLayer(c, name=f"layer_{i}")(x, attention_mask)
        pooled = jnp.tanh(nn.Dense(c.dim, name="pooler")(x[:, 0]))
        h = nn.Dense(c.joint_dim, name="proj0")(pooled)
        return nn.Dense(c.joint_dim, name="proj1")(nn.relu(h))
