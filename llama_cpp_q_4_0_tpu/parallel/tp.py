"""Explicit tensor-parallel decode via shard_map — the multi-chip hot path.

GSPMD partitions the pure-XLA fallback automatically, but Pallas kernels
are custom calls XLA cannot split: on a real multi-chip mesh they would run
replicated.  This module is the Megatron-style forward written with
`shard_map`, so every chip runs the fused dequant-matmul kernel on its own
weight shard and the only communication is two psums per layer (attention
output + FFN down-projection) and one logits all-gather — the collective
schedule the reference emulated with cudaMemcpyAsync gathers
(ggml-cuda.cu:2485-2538), here riding ICI.

Sharding contract (matches parallel/shard.py):
  wq/wk/wv/w_gate/w_up : column-parallel (output dim over tp)
  wo/w_down            : row-parallel (reduce dim over tp) -> psum
  embedding/output     : column-parallel over vocab -> all_gather logits
  KV cache             : heads over tp (MQA: replicated KV, local Q heads)
"""

from __future__ import annotations

import dataclasses
import functools
import math
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.4.35
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.config import ModelConfig
from ..models.transformer import Block, TransformerParams, _act, _mm, _norm
from ..ops.layers import attention, rope
from ..ops.qtensor import QTensor
from .shard import BLOCK_COL, BLOCK_ROW


def _wspec(w, dim: str) -> P:
    """PartitionSpec tree for one weight (mirrors shard.put_weight)."""
    if w is None:
        return None
    if isinstance(w, QTensor):
        if dim == "col":
            leaf = P(None, "tp")
            sleaf = P(None, None, "tp") if w.packed else leaf
        elif dim == "row":
            # row-parallel packed tensors arrive shard-major
            # (QTensor.repack_row_shards): leading axis splits per chip
            leaf = P("tp", None)
            sleaf = P("tp", None, None) if w.packed else leaf
        else:
            leaf = P(None, None)
            sleaf = P(None, None, None) if w.packed else leaf
        return QTensor(levels_t=leaf, gscale_t=sleaf,
                       gbias_t=sleaf if w.gbias_t is not None else None,
                       gsize=w.gsize, qtype=w.qtype, shape=w.shape,
                       pack_zero=w.pack_zero)
    if w.ndim == 2:
        return {"col": P("tp", None), "row": P(None, "tp"), "rep": P()}[dim]
    return P("tp") if dim == "col" else P()


def param_specs(cfg: ModelConfig, params: TransformerParams,
                kv_sharded: bool) -> TransformerParams:
    """Spec pytree matching params (KV projections replicated for MQA)."""
    def block_specs(blk: Block) -> Block:
        kw = {}
        for f in Block.__dataclass_fields__:
            w = getattr(blk, f)
            dim = "col" if f in BLOCK_COL else "row" if f in BLOCK_ROW else "rep"
            if f in ("wk", "wv", "bk", "bv") and not kv_sharded:
                dim = "rep"
            kw[f] = _wspec(w, dim)
        return Block(**kw)

    return TransformerParams(
        tok_embeddings=_wspec(params.tok_embeddings, "col"),
        blocks=tuple(block_specs(b) for b in params.blocks),
        out_norm_w=_wspec(params.out_norm_w, "rep"),
        out_norm_b=_wspec(params.out_norm_b, "rep"),
        output=_wspec(params.output, "col"),
    )


def prepare_tp_params(params: TransformerParams, mesh: Mesh,
                      cfg: ModelConfig) -> TransformerParams:
    """Place params for tp_forward: column weights (packed OK) sharded on
    the output dim; row-parallel weights *unpacked* (see QTensor.unpack) and
    sharded on the reduce dim; MQA KV projections replicated."""
    from .shard import put_weight

    kv_sharded = cfg.kv_heads % mesh.shape["tp"] == 0 \
        and mesh.shape["tp"] <= cfg.kv_heads
    # fused projections cannot column-shard (shards would straddle the
    # q/k/v and gate/up boundaries): split them back first
    from ..models.fuse import defuse_projections

    params = defuse_projections(cfg, params)

    def place_block(blk: Block) -> Block:
        kw = {}
        for f in Block.__dataclass_fields__:
            w = getattr(blk, f)
            dim = "col" if f in BLOCK_COL else "row" if f in BLOCK_ROW else "rep"
            if f in ("wk", "wv", "bk", "bv") and not kv_sharded:
                dim = "rep"
            if dim == "row" and isinstance(w, QTensor):
                tp = mesh.shape["tp"]
                kl = w.shape[1] // tp
                if (w.shape[1] % tp == 0 and kl % 2 == 0
                        and (kl // 2) % w.gsize == 0):
                    # per-shard split-half repack keeps 4-bit streaming on
                    # every chip (levels arrive shard-major)
                    from jax.sharding import NamedSharding

                    rs = w.repack_row_shards(tp)
                    kw[f] = QTensor(
                        levels_t=jax.device_put(
                            rs.levels_t, NamedSharding(mesh, P("tp", None))),
                        gscale_t=jax.device_put(
                            rs.gscale_t, NamedSharding(mesh, P("tp", None, None))),
                        gbias_t=None if rs.gbias_t is None else jax.device_put(
                            rs.gbias_t, NamedSharding(mesh, P("tp", None, None))),
                        gsize=rs.gsize, qtype=rs.qtype, shape=rs.shape,
                        pack_zero=rs.pack_zero,
                    )
                    continue
                w = w.unpack()
            kw[f] = put_weight(w, mesh, dim)
        return Block(**kw)

    return TransformerParams(
        tok_embeddings=put_weight(params.tok_embeddings, mesh, "col"),
        blocks=tuple(place_block(b) for b in params.blocks),
        out_norm_w=put_weight(params.out_norm_w, mesh, "rep"),
        out_norm_b=put_weight(params.out_norm_b, mesh, "rep"),
        output=put_weight(params.output, mesh, "col"),
    )


def _localize(w):
    """Fix QTensor shape metadata to the local shard inside shard_map."""
    if not isinstance(w, QTensor):
        return w
    if w.packed:  # packed tensors are only ever column-sharded
        return dataclasses.replace(w, shape=(w.levels_t.shape[1], w.shape[1]))
    k_l, n_l = w.levels_t.shape
    return dataclasses.replace(w, shape=(n_l, k_l))


@functools.lru_cache(maxsize=8)
def spec_forward(mesh: Mesh):
    """forward_fn adapter with transformer.forward's signature: the verify /
    engine forward runs through the explicit shard_map TP path.  Handles
    scalar AND per-row n_past plus kv_window (tp_forward implements both),
    so it composes with device speculation and the batch engine's staggered
    slot occupancy.  lru_cached per mesh so the static forward_fn hash is
    stable across calls."""

    def fwd(cfg, params, toks, n_past, ck, cv, *, last_only, kv_window):
        return tp_forward(cfg, params, toks, n_past, ck, cv, mesh,
                          last_only=last_only, kv_window=kv_window)

    return fwd


def tp_forward(
    cfg: ModelConfig,
    params: TransformerParams,   # sharded per parallel/shard.py
    tokens: jax.Array,           # [B, T] replicated
    n_past: jax.Array,           # scalar, or [B] (continuous batching)
    cache_k: tuple,              # [B, S, H_kv, D], heads sharded when possible
    cache_v: tuple,
    mesh: Mesh,
    *,
    last_only: bool = True,
    kv_window: int | None = None,
):
    """Returns (logits, new_cache_k, new_cache_v) — numerically the regular
    forward, communication written out explicitly.

    n_past may be per-row ([B]) so the explicit-TP path composes with the
    batch engine's staggered slot occupancy, and kv_window (static) slices
    the attended cache prefix — both exactly as models.transformer.forward.

    NOTE: builds a fresh shard_map closure per call — wrap the call in one
    jax.jit at your call site (as the tests/dryrun do) so the decode loop
    reuses a single compiled executable."""
    tp = mesh.shape["tp"]
    assert cfg.n_head % tp == 0, (cfg.n_head, tp)
    kv_sharded = cfg.kv_heads % tp == 0 and tp <= cfg.kv_heads
    lcfg = dataclasses.replace(
        cfg,
        n_head=cfg.n_head // tp,
        n_kv_head=(cfg.kv_heads // tp) if kv_sharded else cfg.kv_heads,
    )
    specs = param_specs(cfg, params, kv_sharded)
    cache_spec = P(None, None, "tp", None) if kv_sharded else P()
    b, t = tokens.shape

    def body(params, tokens, n_past, cache_k, cache_v):
        params = jax.tree.map(_localize, params,
                              is_leaf=lambda x: isinstance(x, QTensor))
        # head_dim from the GLOBAL config — lcfg.head_dim would divide
        # n_embd by the local head count
        h_q, h_kv, hd = lcfg.n_head, lcfg.kv_heads, cfg.head_dim
        per_row = jnp.ndim(n_past) == 1
        n_past_v = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32), (b,))
        pos_b = n_past_v[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        s = cache_k[0].shape[1]
        w = s if kv_window is None else min(kv_window, s)
        kv_mask = (jnp.arange(w, dtype=jnp.int32)[None, :]
                   < (n_past_v[:, None] + t))
        scale = 1.0 / math.sqrt(hd)

        # vocab-sharded embedding: local rows + psum of masked gather
        emb = params.tok_embeddings
        vshard = (emb.shape[0] if isinstance(emb, QTensor) else emb.shape[0])
        v0 = jax.lax.axis_index("tp") * vshard
        local = tokens - v0
        in_range = (local >= 0) & (local < vshard)
        safe = jnp.where(in_range, local, 0)
        rows = (emb.rows(safe) if isinstance(emb, QTensor)
                else jnp.take(emb, safe, axis=0).astype(jnp.float32))
        x = jax.lax.psum(
            jnp.where(in_range[..., None], rows, 0.0), "tp")

        new_k, new_v = [], []
        for l, blk in enumerate(params.blocks):
            h = _norm(lcfg, x, blk.attn_norm_w, blk.attn_norm_b)
            q = _mm(h, blk.wq, blk.bq, cfg=lcfg).reshape(b, t, h_q, hd)
            k = _mm(h, blk.wk, blk.bk, cfg=lcfg).reshape(b, t, h_kv, hd)
            v = _mm(h, blk.wv, blk.bv, cfg=lcfg).reshape(b, t, h_kv, hd)
            if lcfg.n_rot > 0:
                q = rope(q, pos_b, lcfg.n_rot, neox=lcfg.rope_neox,
                         base=lcfg.rope_base)
                k = rope(k, pos_b, lcfg.n_rot, neox=lcfg.rope_neox,
                         base=lcfg.rope_base)
            if per_row:
                # scatter, not vmap(dynamic_update_slice): batched DUS
                # with per-row offsets has no HLO form and lowers to a
                # whole-cache select (59.4 vs 34.2 ms/step at occ=16
                # w=2048 in the single-device forward, 2026-08-20)
                rows_b = jnp.arange(b, dtype=jnp.int32)[:, None]
                ck = cache_k[l].at[rows_b, pos_b].set(
                    k.astype(cache_k[l].dtype), mode="promise_in_bounds",
                    unique_indices=True)
                cv = cache_v[l].at[rows_b, pos_b].set(
                    v.astype(cache_v[l].dtype), mode="promise_in_bounds",
                    unique_indices=True)
            else:
                ck = jax.lax.dynamic_update_slice(
                    cache_k[l], k.astype(cache_k[l].dtype), (0, n_past, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    cache_v[l], v.astype(cache_v[l].dtype), (0, n_past, 0, 0))
            new_k.append(ck)
            new_v.append(cv)
            a = attention(q, ck[:, :w], cv[:, :w], pos_b, kv_mask, scale)
            # row-parallel wo: local heads produce a partial sum -> psum
            attn_out = jax.lax.psum(
                _mm(a.reshape(b, t, h_q * hd), blk.wo, cfg=lcfg), "tp")
            if blk.bo is not None:
                attn_out = attn_out + blk.bo.astype(jnp.float32)

            def ffn(h_in):
                if lcfg.ffn_gated:
                    inner = (_act(lcfg, _mm(h_in, blk.w_gate, cfg=lcfg))
                             * _mm(h_in, blk.w_up, cfg=lcfg))
                else:
                    inner = _act(lcfg, _mm(h_in, blk.w_up, blk.b_up, cfg=lcfg))
                out = jax.lax.psum(_mm(inner, blk.w_down, cfg=lcfg), "tp")
                if blk.b_down is not None:
                    out = out + blk.b_down.astype(jnp.float32)
                return out

            if lcfg.parallel_residual:
                ff_in = h if lcfg.ffn_norm_shared else _norm(
                    lcfg, x, blk.ffn_norm_w, blk.ffn_norm_b)
                x = x + attn_out + ffn(ff_in)
            else:
                x = x + attn_out
                x = x + ffn(_norm(lcfg, x, blk.ffn_norm_w, blk.ffn_norm_b))

        if last_only:
            x = x[:, -1:, :]
        x = _norm(lcfg, x, params.out_norm_w, params.out_norm_b)
        logits_local = _mm(x, params.output, cfg=lcfg)  # [B, T, V/tp]
        logits = jax.lax.all_gather(logits_local, "tp", axis=2, tiled=True)
        return logits, tuple(new_k), tuple(new_v)

    kwargs = dict(
        mesh=mesh,
        in_specs=(specs, P(), P(),
                  tuple(cache_spec for _ in cache_k),
                  tuple(cache_spec for _ in cache_v)),
        out_specs=(P(), tuple(cache_spec for _ in cache_k),
                   tuple(cache_spec for _ in cache_v)),
    )
    try:  # jax>=0.7 renamed check_rep -> check_vma
        fn = shard_map(body, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover
        fn = shard_map(body, check_rep=False, **kwargs)
    return fn(params, tokens, n_past, cache_k, cache_v)
