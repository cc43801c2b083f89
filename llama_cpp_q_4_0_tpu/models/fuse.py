"""Load-time projection fusion: QKV and gate/up as single matmuls.

The reference's NeoX-family checkpoints ship fused QKV (c_attn_attn,
gptneox.cpp:122-146) and the loader splits them; ironically the TPU wants
the opposite — decode latency has a fixed per-kernel dispatch cost, so
wq/wk/wv (same input, same reduce dim) fuse back into one [Nq+Nk+Nv, K]
matmul, and SwiGLU's gate/up likewise.  Fusion happens once at load on the
packed planar arrays (a column concat — the layouts are K-major), only when
formats match; the forward slices the fused output.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops.qtensor import QTensor
from .config import ModelConfig
from .transformer import TransformerParams


def _concat_n(ws: list) -> object | None:
    """Concat weights along the OUTPUT dim; None if incompatible."""
    if any(w is None for w in ws):
        return None
    if all(isinstance(w, QTensor) for w in ws):
        w0 = ws[0]
        if not all(
            w.qtype == w0.qtype and w.gsize == w0.gsize
            and w.pack_zero == w0.pack_zero and w.shape[1] == w0.shape[1]
            and w.levels_t.shape[0] == w0.levels_t.shape[0]
            for w in ws
        ):
            return None
        axis_s = 2 if w0.packed else 1
        return QTensor(
            levels_t=jnp.concatenate([w.levels_t for w in ws], axis=1),
            gscale_t=jnp.concatenate([w.gscale_t for w in ws], axis=axis_s),
            gbias_t=None if w0.gbias_t is None else jnp.concatenate(
                [w.gbias_t for w in ws], axis=axis_s),
            gsize=w0.gsize, qtype=w0.qtype,
            shape=(sum(w.shape[0] for w in ws), w0.shape[1]),
            pack_zero=w0.pack_zero,
        )
    if all(not isinstance(w, QTensor) for w in ws):
        if len({w.shape[1] for w in ws}) != 1 or len({w.dtype for w in ws}) != 1:
            return None
        return jnp.concatenate(list(ws), axis=0)
    return None


def _concat_bias(bs: list):
    if all(b is None for b in bs):
        return None, True
    if any(b is None for b in bs):
        return None, False
    return jnp.concatenate(list(bs), axis=0), True


def _slice_n(w, lo: int, hi: int):
    """Slice a weight along the OUTPUT dim (inverse of _concat_n)."""
    if isinstance(w, QTensor):
        axis_s = 2 if w.packed else 1
        return QTensor(
            levels_t=w.levels_t[:, lo:hi],
            gscale_t=(w.gscale_t[:, :, lo:hi] if w.packed
                      else w.gscale_t[:, lo:hi]),
            gbias_t=None if w.gbias_t is None else (
                w.gbias_t[:, :, lo:hi] if w.packed else w.gbias_t[:, lo:hi]),
            gsize=w.gsize, qtype=w.qtype, shape=(hi - lo, w.shape[1]),
            pack_zero=w.pack_zero,
        )
    return w[lo:hi]


def defuse_projections(cfg: ModelConfig, params: TransformerParams) -> TransformerParams:
    """Inverse of fuse_projections — needed before tensor-parallel
    placement: a column shard of fused [Q|K|V] rows would straddle the
    q/k/v boundaries."""
    e = cfg.n_embd
    kvd = cfg.kv_heads * cfg.head_dim
    blocks = []
    for blk in params.blocks:
        kw = {}
        if blk.wqkv is not None:
            kw.update(
                wq=_slice_n(blk.wqkv, 0, e),
                wk=_slice_n(blk.wqkv, e, e + kvd),
                wv=_slice_n(blk.wqkv, e + kvd, e + 2 * kvd),
                wqkv=None,
            )
            if blk.b_qkv is not None:
                kw.update(bq=blk.b_qkv[:e], bk=blk.b_qkv[e:e + kvd],
                          bv=blk.b_qkv[e + kvd:], b_qkv=None)
        if blk.w_gateup is not None:
            f = blk.w_gateup.shape[0] // 2
            kw.update(w_gate=_slice_n(blk.w_gateup, 0, f),
                      w_up=_slice_n(blk.w_gateup, f, 2 * f),
                      w_gateup=None)
        blocks.append(dataclasses.replace(blk, **kw) if kw else blk)
    return dataclasses.replace(params, blocks=tuple(blocks))


def fuse_projections(cfg: ModelConfig, params: TransformerParams) -> TransformerParams:
    """Returns params with per-block fused QKV / gate-up where formats allow
    (no numeric change; forward slices the fused outputs)."""
    blocks = []
    for blk in params.blocks:
        kw = {}
        qkv = _concat_n([blk.wq, blk.wk, blk.wv])
        if qkv is not None:
            b_qkv, ok = _concat_bias([blk.bq, blk.bk, blk.bv])
            if ok:
                kw.update(wqkv=qkv, b_qkv=b_qkv, wq=None, wk=None, wv=None,
                          bq=None, bk=None, bv=None)
        if cfg.ffn_gated:
            gu = _concat_n([blk.w_gate, blk.w_up])
            if gu is not None:
                kw.update(w_gateup=gu, w_gate=None, w_up=None)
        blocks.append(dataclasses.replace(blk, **kw) if kw else blk)
    return dataclasses.replace(params, blocks=tuple(blocks))
