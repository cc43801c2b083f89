"""Random model init for training-from-scratch.

Mirrors init_model / randomize_model of the reference trainer
(train-text-from-scratch.cpp:246-393) but emits the same dense
TransformerParams pytree the inference runtime consumes, so a trained
checkpoint generates text through the standard Context with zero glue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.transformer import Block, TransformerParams


def _normal(key, shape, scale, dtype):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_transformer(
    cfg: ModelConfig, key: jax.Array, *, scale: float = 0.02,
    dtype=jnp.float32,
) -> TransformerParams:
    """Gaussian init (randomize_model, train-text-from-scratch.cpp:329-393)."""
    e, v, f = cfg.n_embd, cfg.n_vocab, cfg.n_ff
    kv_dim = cfg.kv_heads * cfg.head_dim
    keys = iter(jax.random.split(key, 8 + 12 * cfg.n_layer))
    nrm = lambda shape: _normal(next(keys), shape, scale, dtype)
    ones = lambda n: jnp.ones((n,), jnp.float32)

    has_ln_bias = cfg.norm in ("layernorm", "rmsnorm_bias")
    blocks = []
    for _ in range(cfg.n_layer):
        blk = Block(
            attn_norm_w=ones(e),
            attn_norm_b=jnp.zeros((e,), jnp.float32) if has_ln_bias else None,
            wq=nrm((e, e)), wk=nrm((kv_dim, e)), wv=nrm((kv_dim, e)),
            wo=nrm((e, e)),
            bq=jnp.zeros((e,), jnp.float32) if cfg.qkv_bias else None,
            bk=jnp.zeros((kv_dim,), jnp.float32) if cfg.qkv_bias else None,
            bv=jnp.zeros((kv_dim,), jnp.float32) if cfg.qkv_bias else None,
            bo=jnp.zeros((e,), jnp.float32) if cfg.qkv_bias else None,
            w_up=nrm((f, e)), w_down=nrm((e, f)),
            b_up=jnp.zeros((f,), jnp.float32) if cfg.qkv_bias else None,
            b_down=jnp.zeros((e,), jnp.float32) if cfg.qkv_bias else None,
        )
        if cfg.ffn_gated:
            blk.w_gate = nrm((f, e))
        if not cfg.ffn_norm_shared:
            blk.ffn_norm_w = ones(e)
            if has_ln_bias:
                blk.ffn_norm_b = jnp.zeros((e,), jnp.float32)
        blocks.append(blk)

    return TransformerParams(
        tok_embeddings=nrm((v, e)),
        blocks=tuple(blocks),
        out_norm_w=ones(e),
        out_norm_b=jnp.zeros((e,), jnp.float32) if has_ln_bias else None,
        output=nrm((v, e)),
    )
