"""Sharding rules: map model params / KV caches onto the mesh.

This replaces the reference's per-tensor `backend` tag + row-split tables
(GGML_BACKEND_GPU_SPLIT, ggml.h:260; ggml_cuda_set_tensor_split,
ggml-cuda.cu:1863-1881) with Megatron-style NamedShardings:

  column-parallel (shard output dim N on tp): wq wk wv w_gate w_up, embedding,
      output head — each chip holds a slice of the output features; no
      communication on the forward matmul.
  row-parallel (shard reduce dim K on tp): wo w_down — XLA inserts one psum
      per row-parallel matmul, riding ICI (the all-reduce the CUDA backend
      emulated with cudaMemcpyAsync gathers, ggml-cuda.cu:2485-2538).

QTensors shard blockwise: levels_t [K, N] and gscale_t [K/gsize, N] carry the
same spec on matching axes, so every chip holds whole quant groups and the
fused Pallas kernel runs unchanged on its local shard.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.transformer import Block, TransformerParams
from ..ops.qtensor import QTensor


def _put(x, mesh: Mesh, spec: P):
    if x is None:
        return None
    return jax.device_put(x, NamedSharding(mesh, spec))


def put_weight(w: Any, mesh: Mesh, dim: str, axis: str = "tp"):
    """Place a weight (QTensor [N, K] or dense [N, K] / [N]) on the mesh.

    dim='col' shards the output dim N; dim='row' shards the reduce dim K;
    dim='rep' replicates."""
    if w is None:
        return None
    if isinstance(w, QTensor):
        if dim == "col":
            spec = P(None, axis)  # levels_t [K, N]: shard N
        elif dim == "row":
            spec = P(axis, None)
        else:
            spec = P(None, None)
        # packed scales are [2, groups, N] — same spec shifted right one axis
        sspec = P(None, *spec) if w.packed else spec
        return QTensor(
            levels_t=_put(w.levels_t, mesh, spec),
            gscale_t=_put(w.gscale_t, mesh, sspec),
            gbias_t=_put(w.gbias_t, mesh, sspec),
            gsize=w.gsize, qtype=w.qtype, shape=w.shape,
            pack_zero=w.pack_zero,
        )
    if w.ndim == 2:  # dense [N, K]
        spec = {"col": P(axis, None), "row": P(None, axis), "rep": P()}[dim]
        return _put(w, mesh, spec)
    if w.ndim == 1:
        return _put(w, mesh, P(axis) if dim == "col" else P())
    return _put(w, mesh, P())


# Which Block fields are column- vs row-parallel (everything else replicated).
BLOCK_COL = ("wq", "wk", "wv", "bq", "bk", "bv", "w_gate", "w_up", "b_up",
             "wqkv", "b_qkv", "w_gateup")
BLOCK_ROW = ("wo", "w_down")


def shard_block(blk: Block, mesh: Mesh) -> Block:
    kw = {}
    for f in Block.__dataclass_fields__:
        w = getattr(blk, f)
        dim = "col" if f in BLOCK_COL else "row" if f in BLOCK_ROW else "rep"
        kw[f] = put_weight(w, mesh, dim)
    return Block(**kw)


def shard_transformer(params: TransformerParams, mesh: Mesh) -> TransformerParams:
    return TransformerParams(
        tok_embeddings=put_weight(params.tok_embeddings, mesh, "col"),
        blocks=tuple(shard_block(b, mesh) for b in params.blocks),
        out_norm_w=put_weight(params.out_norm_w, mesh, "rep"),
        out_norm_b=put_weight(params.out_norm_b, mesh, "rep"),
        output=put_weight(params.output, mesh, "col"),
    )


def cache_spec(cfg: ModelConfig, mesh: Mesh) -> P:
    """KV cache [B, S, H_kv, D]: batch on dp; context slots on sp when the
    mesh has a sequence axis (context length then scales with chips — the
    multi-chip answer to the reference's fixed single-device n_ctx,
    llama.cpp:733-776); heads on tp when they divide (falcon/bonsai MQA has
    1 KV head -> replicated over tp, broadcast is free compared to
    materializing ggml_repeat, falcon.cpp:1225-1227)."""
    tp = mesh.shape["tp"]
    heads = "tp" if cfg.kv_heads % tp == 0 and tp <= cfg.kv_heads else None
    seq = "sp" if mesh.shape.get("sp", 1) > 1 else None
    return P("dp", seq, heads, None)


def shard_cache(cache_k, cache_v, cfg: ModelConfig, mesh: Mesh):
    from ..ops.kvcache import QuantKV

    spec = cache_spec(cfg, mesh)

    def put(c):
        if isinstance(c, QuantKV):  # scale [B, S, H] drops the D axis
            return QuantKV(_put(c.data, mesh, spec),
                           _put(c.scale, mesh, P(*spec[:3])))
        return _put(c, mesh, spec)

    k = tuple(put(c) for c in cache_k)
    v = tuple(put(c) for c in cache_v)
    return k, v


def shard_tokens(tokens, mesh: Mesh, sequence_parallel: bool = False):
    """[B, T] tokens: batch on dp, optionally tokens on sp (prefill/training
    sequence parallelism — XLA all-gathers K/V inside attention over ICI)."""
    return _put(tokens, mesh, P("dp", "sp" if sequence_parallel else None))


def replicate(x, mesh: Mesh):
    return jax.tree.map(lambda a: _put(a, mesh, P()), x)
