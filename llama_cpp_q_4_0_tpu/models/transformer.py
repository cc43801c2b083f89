"""Unified decoder-only transformer serving four reference families.

One forward function, switched by ModelConfig, replaces the four near-clone
graph builders of the reference (llama_eval_internal llama.cpp:1217-1643,
gptneox.cpp:1150-1350, falcon.cpp:1147-1400, bonsai.cpp:1190-1420):

  llama   — RMSNorm, separate wq/wk/wv, adjacent-pair RoPE, SwiGLU, serial
  gptneox — LayerNorm+biases, fused QKV (per-head interleave), partial NeoX
            RoPE, GELU MLP, parallel or serial residual with its own ln_ff
  falcon  — LayerNorm, fused MQA QKV (1 kv head), NeoX RoPE, GELU MLP,
            parallel residual sharing the input norm
  bonsai  — RMSNorm+bias(+min-shift), fused MQA QKV, NeoX RoPE, grelu MLP,
            parallel residual sharing the input norm

KV cache is a preallocated [B, S, H_kv, D] buffer per layer updated with
dynamic_update_slice + masking (replacing ggml's growing views,
llama.cpp:1362-1374).  K is roped at insert time with its absolute position
— mathematically identical to the NeoX-family "rope the whole cache each
step from position 0" trick (gptneox.cpp:1220-1230) since cache slot index
== absolute position.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import QTensor, q_matmul
from ..ops.kvcache import QuantKV, quantize_kv  # re-exported for users
from ..ops.layers import attention, gelu, layer_norm, rms_norm, rope, silu
from .config import ModelConfig

Param = Any  # QTensor | jax.Array | None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "attn_norm_w", "attn_norm_b",
        "wq", "wk", "wv", "bq", "bk", "bv", "wo", "bo",
        "ffn_norm_w", "ffn_norm_b",
        "w_gate", "w_up", "w_down", "b_up", "b_down",
        "wqkv", "b_qkv", "w_gateup",
    ],
    meta_fields=[],
)
@dataclass
class Block:
    attn_norm_w: Param = None
    attn_norm_b: Param = None
    wq: Param = None
    wk: Param = None
    wv: Param = None
    bq: Param = None
    bk: Param = None
    bv: Param = None
    wo: Param = None
    bo: Param = None
    ffn_norm_w: Param = None
    ffn_norm_b: Param = None
    w_gate: Param = None  # llama w1
    w_up: Param = None  # llama w3 / mlp fc
    w_down: Param = None  # llama w2 / mlp proj
    b_up: Param = None
    b_down: Param = None
    # load-time fused projections (models/fuse.py): one matmul instead of
    # three/two; populated instead of wq/wk/wv / w_gate/w_up
    wqkv: Param = None
    b_qkv: Param = None
    w_gateup: Param = None


def _kv_view(cache, w: int):
    """First w cache slots; QuantKV stays quantized (ops/layers.py
    attention folds its scales into the score/prob tensors)."""
    if isinstance(cache, QuantKV):
        return QuantKV(cache.data[:, :w], cache.scale[:, :w])
    return cache[:, :w]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["tok_embeddings", "blocks", "out_norm_w", "out_norm_b", "output"],
    meta_fields=[],
)
@dataclass
class TransformerParams:
    tok_embeddings: Param
    blocks: tuple
    out_norm_w: Param
    out_norm_b: Param
    output: Param


def bonsai_rms_norm(x, weight, bias, eps: float = 1e-5):
    """BonsaiRMSNorm: T5LayerNorm shifted positive (bonsai.cpp:1139-1158)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    cur = xf * jax.lax.rsqrt(var + eps)
    cur = cur - jnp.min(cur, axis=-1, keepdims=True) + eps
    return cur * weight.astype(jnp.float32) + bias.astype(jnp.float32)


def grelu(x):
    """Bonsai hybrid relu/gelu activation (ggml_ext_grelu, bonsai.cpp:1105)."""
    relu_part = jnp.maximum(x, 0.0)
    x1 = jnp.minimum(x, 0.0)
    tanh_part = jnp.tanh(x1 * math.sqrt(2.0 / math.pi))
    return relu_part + x1 * (tanh_part + 1.0)


def _norm(cfg: ModelConfig, x, w, b):
    if cfg.act_f16_table and cfg.norm == "rmsnorm":
        # parity gates: ggml accumulates the square sum in DOUBLE and
        # scales by 1.0f/sqrtf (ggml.c:10424-10439); the f32-rsqrt
        # default differs by ~1 ulp, which the next layer's activation
        # quantizer amplifies (NOTES-NEXT-ROUND #16)
        from ..ops.layers import rms_norm_ref

        return rms_norm_ref(x, w, cfg.norm_eps)
    if cfg.norm == "rmsnorm":
        return rms_norm(x, w, cfg.norm_eps)
    if cfg.norm == "layernorm":
        return layer_norm(x, w, b, cfg.norm_eps)
    if cfg.norm == "rmsnorm_bias":
        return bonsai_rms_norm(x, w, b)
    raise ValueError(cfg.norm)


def _act(cfg: ModelConfig, x):
    try:
        fn = {"silu": silu, "gelu": gelu, "bonsai_hybrid": grelu}[cfg.act]
    except KeyError:
        raise ValueError(cfg.act) from None
    if cfg.act_f16_table:
        from ..ops.layers import act_f16_table

        return act_f16_table(fn, x)
    return fn(x)


def _embed(params: TransformerParams, tokens):
    emb = params.tok_embeddings
    if isinstance(emb, QTensor):
        return emb.rows(tokens)
    return jnp.take(emb, tokens, axis=0).astype(jnp.float32)


def _mm(x, w, b=None, *, cfg: ModelConfig):
    if cfg.compute_dtype == "ref_int8":
        # reference-exact quantized mul_mat semantics (parity gates)
        from ..ops.qmatmul import q_matmul_ref_int8

        out = q_matmul_ref_int8(x, w)
    else:
        dt = jnp.float32 if cfg.compute_dtype == "float32" else jnp.bfloat16
        out = q_matmul(x, w, compute_dtype=dt,
                       use_pallas=False if dt == jnp.float32 else None)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out


def _ffn(cfg: ModelConfig, blk: Block, h):
    if cfg.ffn_gated:
        if blk.w_gateup is not None:
            gu = _mm(h, blk.w_gateup, cfg=cfg)
            f = gu.shape[-1] // 2
            inner = _act(cfg, gu[..., :f]) * gu[..., f:]
        else:
            inner = _act(cfg, _mm(h, blk.w_gate, cfg=cfg)) * _mm(h, blk.w_up, cfg=cfg)
        return _mm(inner, blk.w_down, cfg=cfg)
    return _mm(_act(cfg, _mm(h, blk.w_up, blk.b_up, cfg=cfg)), blk.w_down,
               blk.b_down, cfg=cfg)


def _qkv(cfg: ModelConfig, blk: Block, h, b, t):
    """Q/K/V projections, fused when the loader merged them."""
    h_all, h_kv, hd = cfg.n_head, cfg.kv_heads, cfg.head_dim
    if blk.wqkv is not None:
        qkv = _mm(h, blk.wqkv, blk.b_qkv, cfg=cfg)
        e = h_all * hd
        kvd = h_kv * hd
        q = qkv[..., :e]
        k = qkv[..., e:e + kvd]
        v = qkv[..., e + kvd:]
    else:
        q = _mm(h, blk.wq, blk.bq, cfg=cfg)
        k = _mm(h, blk.wk, blk.bk, cfg=cfg)
        v = _mm(h, blk.wv, blk.bv, cfg=cfg)
    return (q.reshape(b, t, h_all, hd), k.reshape(b, t, h_kv, hd),
            v.reshape(b, t, h_kv, hd))


def forward(
    cfg: ModelConfig,
    params: TransformerParams,
    tokens: jax.Array,  # [B, T] int32
    n_past: jax.Array,  # scalar int32
    cache_k: tuple,  # L x [B, S, H_kv, D]
    cache_v: tuple,
    *,
    last_only: bool = False,
    with_embedding: bool = False,
    kv_window: int | None = None,
    last_index: jax.Array | None = None,
    attention_fn=None,
):
    """Returns (logits [B, T|1, n_vocab] f32, new_cache_k, new_cache_v);
    with_embedding=True additionally returns the post-norm hidden state
    (llama_get_embeddings, llama.h:335 / llama.cpp:1610) as second element.

    kv_window (static) restricts attention to the first kv_window cache
    slots — the caller guarantees n_past + t <= kv_window.  This is the
    static-shape answer to ggml's growing KV views (llama.cpp:1362-1374):
    early in a long context, attention streams a short prefix of the cache
    instead of all n_ctx slots, at the cost of one compile per bucket.

    attention_fn (static): replaces the cache-window attention with
    `attention_fn(q, k, v, scale)` over THIS call's fresh roped K/V —
    only valid when n_past == 0 and the call covers the whole sequence
    (then cache contents == fresh K/V and causal masking is equivalent).
    Used by the sequence-parallel ring-attention prefill path
    (parallel/ring_attention.ring_prefill_fn)."""
    b, t = tokens.shape[:2]
    s = cache_k[0].shape[1]
    w = s if kv_window is None else min(kv_window, s)
    h_all, h_kv, hd = cfg.n_head, cfg.kv_heads, cfg.head_dim
    # n_past: scalar (all rows aligned) or [B] (continuous batching — each
    # slot at its own position)
    per_row = jnp.ndim(n_past) == 1
    n_past_v = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32), (b,))
    pos_b = n_past_v[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    kv_mask = (jnp.arange(w, dtype=jnp.int32)[None, :]
               < (n_past_v[:, None] + t))
    scale = 1.0 / math.sqrt(hd)

    # per-row inserts are SCATTERS over [B,1]x[B,T] indices: a batched
    # dynamic_update_slice with per-row offsets has no HLO form, so the
    # previous vmap(dynamic_update_slice) lowered to a select that read
    # and wrote the ENTIRE cache per layer per step — measured 59.4 vs
    # 34.7 ms/step (per-row vs scalar n_past) at occ=16 w=2048 q8, and
    # the whole-cache traffic compounded inside the engine's chunked
    # tick scan (148 ms/step, engine-steady 2026-08-20).  The scatter
    # writes only the b*t inserted positions and aliases in place.
    rows_b = jnp.arange(b, dtype=jnp.int32)[:, None]  # [B, 1]

    def cache_insert(cache, val):
        if isinstance(cache, QuantKV):
            q, sc = quantize_kv(val)
            if not per_row:
                return QuantKV(
                    jax.lax.dynamic_update_slice(cache.data, q,
                                                 (0, n_past, 0, 0)),
                    jax.lax.dynamic_update_slice(cache.scale, sc,
                                                 (0, n_past, 0)),
                )
            return QuantKV(
                cache.data.at[rows_b, pos_b].set(
                    q, mode="promise_in_bounds", unique_indices=True),
                cache.scale.at[rows_b, pos_b].set(
                    sc, mode="promise_in_bounds", unique_indices=True),
            )
        if not per_row:
            return jax.lax.dynamic_update_slice(
                cache, val.astype(cache.dtype), (0, n_past, 0, 0)
            )
        return cache.at[rows_b, pos_b].set(
            val.astype(cache.dtype), mode="promise_in_bounds",
            unique_indices=True)

    if tokens.ndim == 3:
        # raw input embeddings [B, T, E] (llama_eval_embd, llama.h:239-244 —
        # the embd-input / multimodal front door)
        x = tokens.astype(jnp.float32)
    else:
        x = _embed(params, tokens)  # [B, T, E] f32
    new_k, new_v = [], []
    for l, blk in enumerate(params.blocks):
        h = _norm(cfg, x, blk.attn_norm_w, blk.attn_norm_b)
        q, k, v = _qkv(cfg, blk, h, b, t)
        if cfg.n_rot > 0:
            q = rope(q, pos_b, cfg.n_rot, neox=cfg.rope_neox, base=cfg.rope_base)
            k = rope(k, pos_b, cfg.n_rot, neox=cfg.rope_neox, base=cfg.rope_base)
        ck = cache_insert(cache_k[l], k)
        cv = cache_insert(cache_v[l], v)
        new_k.append(ck)
        new_v.append(cv)

        if attention_fn is not None:
            # feed the CACHE-ROUNDTRIPPED K/V (what the plain path reads
            # back), so the ring path matches its numerics exactly
            def rt(cache, val):
                if isinstance(cache, QuantKV):
                    qv, sc = quantize_kv(val)
                    return qv.astype(jnp.float32) * sc[..., None]
                return val.astype(cache.dtype).astype(jnp.float32)

            a = attention_fn(q, rt(cache_k[l], k), rt(cache_v[l], v), scale)
        else:
            a = attention(q, _kv_view(ck, w), _kv_view(cv, w), pos_b,
                          kv_mask, scale,
                          ref_f16_softmax=cfg.act_f16_table)
        attn_out = _mm(a.reshape(b, t, cfg.n_embd), blk.wo, blk.bo, cfg=cfg)

        if cfg.parallel_residual:
            ff_in = h if cfg.ffn_norm_shared else _norm(
                cfg, x, blk.ffn_norm_w, blk.ffn_norm_b
            )
            x = x + attn_out + _ffn(cfg, blk, ff_in)
        else:
            x = x + attn_out
            ff_in = _norm(cfg, x, blk.ffn_norm_w, blk.ffn_norm_b)
            x = x + _ffn(cfg, blk, ff_in)

    if last_index is not None:
        # bucket-padded prompt: head matmul + transfer for ONE row (the
        # real last token), not the whole padded window
        x = jax.lax.dynamic_slice_in_dim(x, last_index, 1, axis=1)
    elif last_only:
        x = x[:, -1:, :]
    x = _norm(cfg, x, params.out_norm_w, params.out_norm_b)
    logits = _mm(x, params.output, cfg=cfg)
    if with_embedding:
        return logits, x, tuple(new_k), tuple(new_v)
    return logits, tuple(new_k), tuple(new_v)


def init_cache(cfg: ModelConfig, batch: int, n_ctx: int | None = None,
               dtype=jnp.bfloat16):
    """Preallocated KV buffers (kv_cache_init, llama.cpp:733-776).

    dtype jnp.int8 (CLI --cache-type q8) selects the scaled-int8 QuantKV
    layout; any float dtype a plain cast cache."""
    s = n_ctx or cfg.n_ctx
    shape = (batch, s, cfg.kv_heads, cfg.head_dim)
    if dtype == jnp.int8:
        def mk():
            return QuantKV(jnp.zeros(shape, jnp.int8),
                           jnp.zeros(shape[:3], jnp.float32))

        return (tuple(mk() for _ in range(cfg.n_layer)),
                tuple(mk() for _ in range(cfg.n_layer)))
    k = tuple(jnp.zeros(shape, dtype) for _ in range(cfg.n_layer))
    v = tuple(jnp.zeros(shape, dtype) for _ in range(cfg.n_layer))
    return k, v
