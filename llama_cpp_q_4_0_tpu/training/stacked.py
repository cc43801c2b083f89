"""Stacked-layer training forward: lax.scan over layers + rematerialization.

The per-layer python loop in models/transformer.py is right for inference
(each layer owns distinctly-quantized weights), but training at depth wants
the XLA-native form: stack every layer's parameters along a leading [L]
axis and `lax.scan` one layer body over them — compile time stops growing
with n_layer, and `jax.checkpoint` on the body trades FLOPs for activation
memory (the remat knob the task calls out; the reference has no analogue —
ggml materializes every activation in its arena).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models.config import ModelConfig
from ..models.transformer import Block, TransformerParams, _act, _embed, _norm, _mm
from ..ops.layers import attention, rope
from .train import cross_entropy_loss


def stack_params(params: TransformerParams) -> TransformerParams:
    """blocks tuple(L x Block) -> one Block of [L, ...] leaves."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params.blocks)
    return TransformerParams(
        tok_embeddings=params.tok_embeddings,
        blocks=(stacked,),
        out_norm_w=params.out_norm_w,
        out_norm_b=params.out_norm_b,
        output=params.output,
    )


def unstack_params(params: TransformerParams, n_layer: int) -> TransformerParams:
    """Inverse of stack_params (e.g. to hand a trained model to Context)."""
    (stacked,) = params.blocks
    blocks = tuple(
        jax.tree.map(lambda x: x[i], stacked) for i in range(n_layer)
    )
    return TransformerParams(
        tok_embeddings=params.tok_embeddings,
        blocks=blocks,
        out_norm_w=params.out_norm_w,
        out_norm_b=params.out_norm_b,
        output=params.output,
    )


def layer_apply(cfg: ModelConfig, blk: Block, x: jax.Array) -> jax.Array:
    """One transformer layer on a full causal sequence [B, T, E] (training
    form: no KV cache).  Shared by the layer scan and the pipeline stages
    (parallel/pipeline.py)."""
    b, t = x.shape[:2]
    hd = cfg.head_dim
    h_q, h_kv = cfg.n_head, cfg.kv_heads
    pos_b = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :], (b, t))
    kv_mask = jnp.ones((b, t), bool)
    scale = 1.0 / math.sqrt(hd)
    h = _norm(cfg, x, blk.attn_norm_w, blk.attn_norm_b)
    q = _mm(h, blk.wq, blk.bq, cfg=cfg).reshape(b, t, h_q, hd)
    k = _mm(h, blk.wk, blk.bk, cfg=cfg).reshape(b, t, h_kv, hd)
    v = _mm(h, blk.wv, blk.bv, cfg=cfg).reshape(b, t, h_kv, hd)
    if cfg.n_rot > 0:
        q = rope(q, pos_b, cfg.n_rot, neox=cfg.rope_neox, base=cfg.rope_base)
        k = rope(k, pos_b, cfg.n_rot, neox=cfg.rope_neox, base=cfg.rope_base)
    a = attention(q, k, v, pos_b, kv_mask, scale)
    attn_out = _mm(a.reshape(b, t, h_q * hd), blk.wo, blk.bo, cfg=cfg)

    def ffn(h_in):
        if cfg.ffn_gated:
            inner = (_act(cfg, _mm(h_in, blk.w_gate, cfg=cfg))
                     * _mm(h_in, blk.w_up, cfg=cfg))
            return _mm(inner, blk.w_down, cfg=cfg)
        return _mm(_act(cfg, _mm(h_in, blk.w_up, blk.b_up, cfg=cfg)),
                   blk.w_down, blk.b_down, cfg=cfg)

    if cfg.parallel_residual:
        ff_in = h if cfg.ffn_norm_shared else _norm(
            cfg, x, blk.ffn_norm_w, blk.ffn_norm_b)
        return x + attn_out + ffn(ff_in)
    x = x + attn_out
    return x + ffn(_norm(cfg, x, blk.ffn_norm_w, blk.ffn_norm_b))


def stacked_forward(cfg: ModelConfig, params: TransformerParams,
                    tokens: jax.Array, *, remat: bool = False) -> jax.Array:
    """Full-sequence causal logits [B, T, V]; params from stack_params."""
    (stacked,) = params.blocks

    def layer(x, blk: Block):
        return layer_apply(cfg, blk, x)

    body = jax.checkpoint(layer) if remat else layer

    def scan_body(x, blk):
        return body(x, blk), None

    x = _embed(params, tokens)
    x, _ = jax.lax.scan(scan_body, x, stacked)
    x = _norm(cfg, x, params.out_norm_w, params.out_norm_b)
    return _mm(x, params.output, cfg=cfg)


def stacked_lm_loss(cfg: ModelConfig, params, tokens, targets, *,
                    remat: bool = False) -> jax.Array:
    logits = stacked_forward(cfg, params, tokens, remat=remat)
    return cross_entropy_loss(logits, targets)


def make_stacked_train_step(cfg: ModelConfig,
                            tx: optax.GradientTransformation,
                            *, remat: bool = True,
                            donate: bool = True) -> Callable:
    """Scan-over-layers train step: constant compile time in depth,
    remat-bounded activation memory."""
    loss_fn = partial(stacked_lm_loss, cfg, remat=remat)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, tokens, targets))(params)
        updates, opt_state = tx.update(
            grads, opt_state, params, value=loss, grad=grads,
            value_fn=lambda p: loss_fn(p, tokens, targets))
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
