"""Fused decode attention over the KV cache — flash-form streaming.

TPU re-design of the reference's attention chain (llama_eval_internal's
KQ -> mask -> softmax -> KQV, llama.cpp:1396-1445, and the fused
ggml_flash_attn variant, ggml.c:13928): instead of materializing
[B, H, T, S] score tensors (and, for the int8 KV cache, a full f32
dequantized cache copy), each grid step streams one [BS, H, D] KV tile
HBM->VMEM, dequantizes it in registers, and folds it into a running
online-softmax state (m, l, acc) — the standard flash decomposition.

Why this exists (measured on v5e, round 1): with the scaled-int8 KV cache
the XLA einsum path upconverts the whole [B, S, H, D] cache to f32 and
applies per-token scales elementwise, writing + re-reading 4x the cache
bytes — a 13% engine-throughput loss at batch 16.  Here int8 KV streams
from HBM exactly once and the scales multiply the small [BS, H] score
tile in VMEM.

Layout notes (v5e):
- KV tiles keep the cache's natural [S, H, D] order: H rides sublanes,
  D lanes.  Scores come out [BS, H] via a lane reduction over D; the K
  scale tile [BS, H] and the kv-mask column [BS, 1] both broadcast onto
  that layout for free.
- The one unavoidable relayout is p [BS, H] -> [BS, H, 1] for the
  probs x V contraction (H moves lanes -> sublanes); it is 32x smaller
  than the tiles streamed per step.
- q_positions live in SMEM (scalars steer the causal mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _mha_decode_kernel(
    qpos_ref, q_ref, kd_ref, vd_ref, mask_ref, *rest,
    n_s: int, t: int, rep: int, scale: float, has_ks: bool, has_vs: bool,
):
    idx = 0
    ks_ref = vs_ref = None
    if has_ks:
        ks_ref = rest[idx]
        idx += 1
    if has_vs:
        vs_ref = rest[idx]
        idx += 1
    out_ref, m_ref, l_ref, acc_ref = rest[idx], rest[idx + 1], rest[idx + 2], rest[idx + 3]

    i = pl.program_id(0)  # batch row (qpos is a full-array SMEM block:
    # a (1, t) block would violate Mosaic's (8, 128)-divisible-or-full rule
    # for b > 1 — caught on chip, r3 gate)
    j = pl.program_id(1)
    bs = kd_ref.shape[1]
    g_heads = kd_ref.shape[2]  # n_kv heads (== n_head when rep == 1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kf = kd_ref[0].astype(jnp.float32)  # [BS, G, D]
    vf = vd_ref[0].astype(jnp.float32)
    ks = ks_ref[0] if has_ks else None  # [BS, G]
    vs = vs_ref[0] if has_vs else None
    if rep > 1:
        # MQA/GQA: expand the G stored heads to the H query heads ONCE per
        # grid step, in registers ([BS, 1, D] sublane-axis concats — never
        # in HBM), then run the identical rep == 1 vector path below.  The
        # reference materializes the repeat through ggml_repeat instead
        # (falcon.cpp:1194-1227 "cheap hack").  Per-head unrolled reduces
        # (the first attempt) blew Mosaic's 16 MiB vector stack at t=16,
        # and grouped MXU dots lower to a single bf16 pass (1.4e-3 drift,
        # ignores precision=HIGHEST) — this keeps VPU-f32 exactness at
        # bounded program size.
        kf = jnp.concatenate(
            [kf[:, g : g + 1] for g in range(g_heads) for _ in range(rep)],
            axis=1)  # [BS, H, D]
        vf = jnp.concatenate(
            [vf[:, g : g + 1] for g in range(g_heads) for _ in range(rep)],
            axis=1)
        if has_ks:
            ks = jnp.concatenate(
                [ks[:, g : g + 1] for g in range(g_heads)
                 for _ in range(rep)], axis=1)  # [BS, H]
        if has_vs:
            vs = jnp.concatenate(
                [vs[:, g : g + 1] for g in range(g_heads)
                 for _ in range(rep)], axis=1)
    # int32 compare: v5e Mosaic rejects 8-bit vector comparisons ("Target
    # does not support this comparison"), like its int8 arith.subi gap —
    # widen in registers, the HBM stream stays int8
    maskv = mask_ref[0].astype(jnp.int32) > 0  # [BS, 1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0) + j * bs

    for ti in range(t):
        valid = maskv & (slot <= qpos_ref[i, ti])  # [BS, 1]
        # per-head dot: H in sublanes-of-scores, lane reduction over D
        s = jnp.sum(q_ref[0, ti][None] * kf, axis=-1) * scale  # [BS, H]
        if has_ks:
            s = s * ks
        s = jnp.where(valid, s, NEG)
        m_prev = m_ref[ti : ti + 1]  # [1, H]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(valid, p, 0.0)
        l_ref[ti : ti + 1] = l_ref[ti : ti + 1] * corr + jnp.sum(
            p, axis=0, keepdims=True
        )
        m_ref[ti : ti + 1] = m_new
        if has_vs:
            p = p * vs
        # [BS, H] -> [BS, H, 1]: the one lane->sublane relayout (see
        # module docstring); contraction over BS is a cheap major reduce
        pv = jnp.sum(p[:, :, None] * vf, axis=0)  # [H, D]
        acc_ref[ti] = acc_ref[ti] * jnp.swapaxes(corr, 0, 1) + pv

    @pl.when(j == n_s - 1)
    def _():
        for ti in range(t):
            lt = jnp.swapaxes(l_ref[ti : ti + 1], 0, 1)  # [H, 1]
            out_ref[0, ti] = acc_ref[ti] / jnp.maximum(lt, 1e-30)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_s", "interpret"),
)
def mha_decode(
    q: jax.Array,  # [B, T, H, D] f32
    kd: jax.Array,  # [B, S, H, D] int8 | bf16 | f32
    ks: jax.Array | None,  # [B, S, H] f32 (int8-KV per-token-head scales)
    vd: jax.Array,
    vs: jax.Array | None,
    q_positions: jax.Array,  # [B, T] int32
    kv_mask: jax.Array,  # [B, S] bool
    scale: float,
    *,
    block_s: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused streaming attention for the decode/verify path (small T).

    Semantics identical to ops.layers.attention: causal masking by absolute
    position (cache slot index == position), kv_mask gating, K scale folded
    into scores and V scale into probabilities (exact — scale multiplies
    are associative over the softmax-weighted sum).  MQA/GQA (n_kv < n_head)
    reduces each query head against its group's single stored KV head in
    registers — the reference materializes the repeat instead
    (falcon.cpp:1194-1227 "cheap hack", ggml_repeat)."""
    b, t, h, d = q.shape
    s, g = kd.shape[1], kd.shape[2]
    assert h % g == 0, (h, g)
    rep = h // g
    bs = min(block_s, s)
    assert s % bs == 0, (s, bs)
    n_s = s // bs
    grid = (b, n_s)

    has_ks = ks is not None
    has_vs = vs is not None
    maske = kv_mask.astype(jnp.int8)[:, :, None]  # [B, S, 1]

    in_specs = [
        pl.BlockSpec((b, t), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, t, h, d), lambda i, j: (i, 0, 0, 0)),
        pl.BlockSpec((1, bs, g, d), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, bs, g, d), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, bs, 1), lambda i, j: (i, j, 0)),
    ]
    args = [q_positions, q, kd, vd, maske]
    if has_ks:
        in_specs.append(pl.BlockSpec((1, bs, g), lambda i, j: (i, j, 0)))
        args.append(ks)
    if has_vs:
        in_specs.append(pl.BlockSpec((1, bs, g), lambda i, j: (i, j, 0)))
        args.append(vs)

    kv_bytes = kd.dtype.itemsize
    bytes_accessed = (
        2 * b * s * g * d * kv_bytes
        + (4 * b * s * g * 2 if has_ks else 0)
        + 8 * b * t * h * d
    )
    return pl.pallas_call(
        functools.partial(
            _mha_decode_kernel, n_s=n_s, t=t, rep=rep, scale=scale,
            has_ks=has_ks, has_vs=has_vs,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t, h, d), lambda i, j: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, h, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t, h), jnp.float32),
            pltpu.VMEM((t, h), jnp.float32),
            pltpu.VMEM((t, h, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t * h * d * s,
            bytes_accessed=bytes_accessed,
            transcendentals=b * t * h * s,
        ),
        interpret=interpret,
    )(*args)
