"""GGJT file -> device params for llama/gptneox/falcon/bonsai.

Tensor-name maps mirror the reference loaders (llama.cpp:1023-1084,
gptneox.cpp:1000-1025, falcon.cpp:1001-1025, bonsai.cpp:992-1017).  Fused
QKV tensors are split into separate Q/K/V QTensors at load time — quant
blocks are per-row, so row regrouping is exact:

  gptneox: per-head interleave [q_h | k_h | v_h] x n_head (gptneox.cpp:1157)
  falcon/bonsai MQA: [q rows 0..E) | k rows E..E+D) | v rows E+D..E+2D)
                     (falcon.cpp:1147-1223)

llama's wq/wk stay in their on-disk permuted layout (convert.py:271-275)
because our rope(neox=False) implements the matching adjacent-pair rotation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..formats.ggjt import GGJTFile
from ..ops import QTensor
from ..quant.pack import pack_planar
from ..quant.types import GGMLType
from .config import ModelConfig
from .transformer import Block, TransformerParams


def _dense(arr: np.ndarray, dtype=jnp.float32):
    return jnp.asarray(np.ascontiguousarray(arr, dtype=np.float32), dtype=dtype)


def _q4_0_native(raw: np.ndarray, shape: tuple[int, int]) -> QTensor | None:
    """Fast path: C++ multithreaded block_q4_0 -> packed planar repack
    (native/ggjt_native.cpp), skipping the numpy transpose pipeline."""
    from .. import native

    n, k = shape
    if k % 64 != 0 or not native.available():
        return None
    res = native.pack_q4_0(raw, n, k)
    if res is None:
        return None
    packed, scales = res
    return QTensor(
        levels_t=jnp.asarray(packed), gscale_t=jnp.asarray(scales),
        gbias_t=None, gsize=32, qtype=GGMLType.Q4_0, shape=(n, k),
        pack_zero=8,
    )


def load_tensor(gf: GGJTFile, name: str, dense_dtype=jnp.bfloat16):
    """2-D quantized -> QTensor; 2-D float -> dense array; 1-D -> f32 array."""
    t = gf.tensors[name]
    if t.qtype in (GGMLType.F32, GGMLType.F16):
        arr = gf.tensor_f32(name)
        if len(t.shape) == 1:
            return _dense(arr, jnp.float32)
        return _dense(arr, dense_dtype)
    if t.qtype == GGMLType.Q4_0:
        qt = _q4_0_native(gf.tensor_bytes(name), t.shape)
        if qt is not None:
            return qt
    blocks = gf.tensor_blocks(name)
    return QTensor.from_planar(pack_planar(blocks, t.qtype, t.shape,
                                           qk_k=gf.qk_k))


def _load_rows(gf: GGJTFile, name: str, row_groups: list[np.ndarray],
               dense_dtype=jnp.bfloat16):
    """Split a [N, K] tensor into row groups (for fused QKV)."""
    t = gf.tensors[name]
    n, k = t.shape
    if t.qtype in (GGMLType.F32, GGMLType.F16):
        arr = gf.tensor_f32(name)
        return [_dense(arr[g], dense_dtype) for g in row_groups]
    from ..quant.types import type_traits

    nb = k // type_traits(t.qtype, gf.qk_k).block_size
    blocks = gf.tensor_blocks(name).reshape(n, nb)
    return [
        QTensor.from_planar(pack_planar(blocks[g], t.qtype, (len(g), k),
                                        qk_k=gf.qk_k))
        for g in row_groups
    ]


def _split_1d(gf: GGJTFile, name: str, row_groups):
    arr = gf.tensor_f32(name)
    return [_dense(arr[g], jnp.float32) for g in row_groups]


def _qkv_groups(cfg: ModelConfig) -> list[np.ndarray]:
    e, d, h = cfg.n_embd, cfg.head_dim, cfg.n_head
    if cfg.arch == "gptneox":
        base = np.arange(d)
        q = np.concatenate([hh * 3 * d + base for hh in range(h)])
        k = np.concatenate([hh * 3 * d + d + base for hh in range(h)])
        v = np.concatenate([hh * 3 * d + 2 * d + base for hh in range(h)])
        return [q, k, v]
    # falcon / bonsai MQA: contiguous [Q | K(1 head) | V(1 head)]
    return [np.arange(e), np.arange(e, e + d), np.arange(e + d, e + 2 * d)]


def config_from_ggjt(gf: GGJTFile, n_ctx: int = 2048) -> ModelConfig:
    hp = dict(gf.hparams)
    if gf.arch == "llama":
        return ModelConfig.llama(
            n_vocab=hp["n_vocab"], n_embd=hp["n_embd"], n_mult=hp["n_mult"],
            n_head=hp["n_head"], n_layer=hp["n_layer"], n_rot=hp["n_rot"],
            n_ctx=n_ctx,
        )
    if gf.arch == "gptneox":
        return ModelConfig.gptneox(
            hp["n_vocab"], hp["n_embd"], hp["n_head"], hp["n_layer"],
            hp["n_rot"], hp.get("use_parallel_residual", 1), n_ctx=n_ctx,
        )
    if gf.arch == "falcon":
        return ModelConfig.falcon(
            hp["n_vocab"], hp["n_embd"], hp["n_head"], hp["n_layer"],
            hp.get("parallel_attn", 1), n_ctx=n_ctx,
        )
    if gf.arch == "bonsai":
        return ModelConfig.bonsai(
            hp["n_vocab"], hp["n_embd"], hp["n_head"], hp["n_layer"],
            hp.get("parallel_attn", 1), n_ctx=n_ctx,
        )
    if gf.arch == "rwkv":
        return ModelConfig.rwkv(
            hp["n_vocab"], hp["n_embd"], hp["n_layer"],
            hp.get("rescale_every", 6), n_ctx=n_ctx,
        )
    raise ValueError(gf.arch)


def load_transformer(gf: GGJTFile, cfg: ModelConfig,
                     fuse: bool = True) -> TransformerParams:
    L = cfg.n_layer
    dense_dtype = jnp.float32 if cfg.compute_dtype == "float32" else jnp.bfloat16
    load_tensor_ = lambda gf_, name: load_tensor(gf_, name, dense_dtype)
    blocks = []
    if cfg.arch == "llama":
        for i in range(L):
            p = f"layers.{i}."
            blocks.append(Block(
                attn_norm_w=load_tensor_(gf, p + "attention_norm.weight"),
                wq=load_tensor_(gf, p + "attention.wq.weight"),
                wk=load_tensor_(gf, p + "attention.wk.weight"),
                wv=load_tensor_(gf, p + "attention.wv.weight"),
                wo=load_tensor_(gf, p + "attention.wo.weight"),
                ffn_norm_w=load_tensor_(gf, p + "ffn_norm.weight"),
                w_gate=load_tensor_(gf, p + "feed_forward.w1.weight"),
                w_down=load_tensor_(gf, p + "feed_forward.w2.weight"),
                w_up=load_tensor_(gf, p + "feed_forward.w3.weight"),
            ))
        params = TransformerParams(
            tok_embeddings=load_tensor_(gf, "tok_embeddings.weight"),
            blocks=tuple(blocks),
            out_norm_w=load_tensor_(gf, "norm.weight"),
            out_norm_b=None,
            output=load_tensor_(gf, "output.weight"),
        )
        if fuse:
            from .fuse import fuse_projections

            params = fuse_projections(cfg, params)
        return params

    groups = _qkv_groups(cfg)
    if cfg.arch == "gptneox":
        pre, qkv, dense_name = "gpt_neox.layers.", ".attention.query_key_value", ".attention.dense"
        emb, fnorm, out = "gpt_neox.embed_in.weight", "gpt_neox.final_layer_norm", "embed_out.weight"
    else:  # falcon / bonsai share HF-falcon naming (falcon.cpp:1001, bonsai.cpp:992)
        pre, qkv, dense_name = "transformer.h.", ".self_attention.query_key_value", ".self_attention.dense"
        emb, fnorm, out = "transformer.word_embeddings.weight", "transformer.ln_f", "lm_head.weight"

    for i in range(L):
        p = f"{pre}{i}"
        wq, wk, wv = _load_rows(gf, p + qkv + ".weight", groups, dense_dtype)
        bq = bk = bv = None
        if cfg.qkv_bias:
            bq, bk, bv = _split_1d(gf, p + qkv + ".bias", groups)
        has_ln_bias = cfg.norm in ("layernorm", "rmsnorm_bias")
        blk = Block(
            attn_norm_w=load_tensor_(gf, p + ".input_layernorm.weight"),
            attn_norm_b=load_tensor_(gf, p + ".input_layernorm.bias") if has_ln_bias else None,
            wq=wq, wk=wk, wv=wv, bq=bq, bk=bk, bv=bv,
            wo=load_tensor_(gf, p + dense_name + ".weight"),
            bo=load_tensor_(gf, p + dense_name + ".bias") if cfg.qkv_bias else None,
            w_up=load_tensor_(gf, p + ".mlp.dense_h_to_4h.weight"),
            b_up=load_tensor_(gf, p + ".mlp.dense_h_to_4h.bias") if cfg.qkv_bias else None,
            w_down=load_tensor_(gf, p + ".mlp.dense_4h_to_h.weight"),
            b_down=load_tensor_(gf, p + ".mlp.dense_4h_to_h.bias") if cfg.qkv_bias else None,
        )
        if not cfg.ffn_norm_shared:
            blk.ffn_norm_w = load_tensor_(gf, p + ".post_attention_layernorm.weight")
            blk.ffn_norm_b = load_tensor_(gf, p + ".post_attention_layernorm.bias")
        elif not cfg.parallel_residual:
            # falcon/bonsai serial mode uses a post-attention norm
            name = p + ".post_attn_layernorm.weight"
            if name in gf.tensors:
                blk.ffn_norm_w = load_tensor_(gf, name)
                blk.ffn_norm_b = load_tensor_(gf, p + ".post_attn_layernorm.bias")
        blocks.append(blk)

    params = TransformerParams(
        tok_embeddings=load_tensor_(gf, emb),
        blocks=tuple(blocks),
        out_norm_w=load_tensor_(gf, fnorm + ".weight"),
        out_norm_b=load_tensor_(gf, fnorm + ".bias"),
        output=load_tensor_(gf, out),
    )
    if fuse:
        from .fuse import fuse_projections

        params = fuse_projections(cfg, params)
    return params


def load_rwkv(gf: GGJTFile, cfg: ModelConfig):
    """GGJT -> RwkvParams (tensor names from rwkv.cpp:1157-1217)."""
    from .rwkv import RwkvLayer, RwkvParams

    dense_dtype = jnp.float32 if cfg.compute_dtype == "float32" else jnp.bfloat16
    lt = lambda name: load_tensor(gf, name, dense_dtype)
    layers = []
    for i in range(cfg.n_layer):
        p = f"rwkv.blocks.{i}"
        layers.append(RwkvLayer(
            ln1_g=lt(p + ".ln1.weight"), ln1_b=lt(p + ".ln1.bias"),
            ln2_g=lt(p + ".ln2.weight"), ln2_b=lt(p + ".ln2.bias"),
            att_time_mix_k=lt(p + ".attention.time_mix_key"),
            att_time_mix_v=lt(p + ".attention.time_mix_value"),
            att_time_mix_r=lt(p + ".attention.time_mix_receptance"),
            att_time_first=lt(p + ".attention.time_first"),
            att_time_decay=lt(p + ".attention.time_decay"),
            att_key=lt(p + ".attention.key.weight"),
            att_value=lt(p + ".attention.value.weight"),
            att_receptance=lt(p + ".attention.receptance.weight"),
            att_output=lt(p + ".attention.output.weight"),
            ff_time_mix_k=lt(p + ".feed_forward.time_mix_key"),
            ff_time_mix_r=lt(p + ".feed_forward.time_mix_receptance"),
            ff_key=lt(p + ".feed_forward.key.weight"),
            ff_receptance=lt(p + ".feed_forward.receptance.weight"),
            ff_value=lt(p + ".feed_forward.value.weight"),
        ))
    return RwkvParams(
        wte=lt("rwkv.embeddings.weight"),
        ln_pre_g=lt("rwkv.blocks.0.pre_ln.weight"),
        ln_pre_b=lt("rwkv.blocks.0.pre_ln.bias"),
        layers=tuple(layers),
        ln_out_g=lt("rwkv.ln_out.weight"),
        ln_out_b=lt("rwkv.ln_out.bias"),
        head=lt("head.weight"),
    )
