"""Quantized matmul dispatch: one entry point for every format and model.

q_matmul(x, w) computes x @ W^T where W is a QTensor ([N, K] row-major like
ggml weights) or a dense array.  On TPU it calls the fused Pallas kernel
(ops/pallas/qmm.py); elsewhere (CPU tests) an XLA dequant+dot fallback with
identical semantics.  This is the single indirection that replaces the
reference's quantize_fns vtable + mul_mat dispatch (ggml.c:1618, 11226).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .qtensor import QTensor
from .lowrank import LowRankPatched
from .pallas.qmm import qmm, qmm_packed, qmm_packed_q8x


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _precision(compute_dtype):
    # f32 compute means *really* f32: stop TPU matmuls from dropping to the
    # default bf16 passes (used by the reference-parity path)
    return jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None


def _xla_qmm(x2: jax.Array, w: QTensor, compute_dtype) -> jax.Array:
    n, k = w.shape
    g = k // w.gsize
    lv = w.levels_full().astype(jnp.float32).reshape(g, w.gsize, n)
    deq = (lv * w.gscale_full()[:, None, :]).reshape(k, n).astype(compute_dtype)
    out = jnp.dot(x2.astype(compute_dtype), deq, preferred_element_type=jnp.float32,
                  precision=_precision(compute_dtype))
    gb = w.gbias_full()
    if gb is not None:
        xg = x2.astype(jnp.float32).reshape(x2.shape[0], g, w.gsize).sum(axis=2)
        out = out + jnp.dot(xg, gb, preferred_element_type=jnp.float32,
                            precision=_precision(compute_dtype))
    return out


def _quantize_row_q8_0(x2: jax.Array, gsize: int):
    """quantize_row_q8_0 semantics (ggml.c:1135-1169): per-group
    d = amax/127 (stored fp16), q = C-roundf(x/d) half away from zero.
    Returns (levels f32 [B, G, gsize], d f32 [B, G])."""
    b, k = x2.shape
    g = k // gsize
    xf = x2.astype(jnp.float32).reshape(b, g, gsize)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    dq = amax / jnp.float32(127.0)
    idq = jnp.where(dq > 0, 1.0 / dq, 0.0)
    v = xf * idq[..., None]
    xq = jnp.trunc(v + jnp.where(v >= 0, 0.5, -0.5))
    return xq, dq.astype(jnp.float16).astype(jnp.float32)


def q_matmul_ref_int8(x: jax.Array, w) -> jax.Array:
    """REFERENCE-EXACT quantized mul_mat: quantize the activations to
    q8_0 per 32-group and take integer dots per group, rescaled by
    d_x*d_w in f32 — what the reference actually computes for every
    quantized matmul (ggml_compute_forward_mul_mat_q_f32's
    quantize_row_q8_0 + ggml_vec_dot_q4_0_q8_0, ggml.c:11353-11367).

    Used by the parity gates (ModelConfig.compute_dtype == 'ref_int8') to
    compare logits against the compiled reference with NO activation-
    precision slack, and as the model-level semantic spec for the
    int8-activation Pallas kernel (ops/pallas/qmm.py qmm_packed_q8x).
    Formats whose reference dot is not the plain q8_0 integer form
    (affine q4_1/q5_1, k-quants with q8_K activations, dense f16/f32)
    fall back to the f32 path."""
    if (not isinstance(w, QTensor) or w.gbias_full() is not None
            or w.gsize != 32):
        return q_matmul(x, w, use_pallas=False, compute_dtype=jnp.float32)
    lead, k = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, k)
    n, _ = w.shape
    g = k // w.gsize
    lv = w.levels_full().astype(jnp.float32).reshape(g, w.gsize, n)
    sc = w.gscale_full()  # [G, N] f32 (fp16-origin scales already exact)
    xq, d = _quantize_row_q8_0(x2, w.gsize)
    # integer dot per group: |q8|<=127, |levels|<=16 -> products < 2^12,
    # group sums < 2^17 — exact in f32
    dot = jnp.einsum("bgk,gkn->bgn", xq, lv,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bgn,bg,gn->bn", dot, d, sc,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(*lead, n)


def q_matmul(
    x: jax.Array,
    w: QTensor | jax.Array,
    *,
    use_pallas: bool | None = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """x [..., K] @ W[N, K]^T -> [..., N] float32."""
    if isinstance(w, LowRankPatched):
        # unmerged LoRA: exact quantized base + two skinny matmuls
        from .lowrank import lowrank_apply

        base = q_matmul(x, w.base, use_pallas=use_pallas,
                        compute_dtype=compute_dtype)
        lead, k = x.shape[:-1], x.shape[-1]
        corr = lowrank_apply(x.reshape(-1, k), w)
        return base + corr.reshape(*lead, -1)
    if not isinstance(w, QTensor):
        # dense path (f16/f32 tensors from the model file stay dense)
        return jax.lax.dot_general(
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(compute_dtype),
        )

    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    b = x2.shape[0]
    if use_pallas is None:
        use_pallas = _on_tpu()

    n = w.shape[0]
    if use_pallas and n % 128 == 0 and k % 256 == 0:
        # tile defaults validated at MODEL level on v5e (single-kernel
        # sweeps mislead: cross-op DMA overlap favors deeper k tiles)
        import os

        bn_env = int(os.environ.get("QMM_BLOCK_N", "0"))
        block_n = bn_env or (512 if n % 512 == 0 else 256 if n % 256 == 0 else 128)
        if n % block_n != 0:
            block_n = 512 if n % 512 == 0 else 256 if n % 256 == 0 else 128
        if w.packed:
            k2p = w.levels_t.shape[0]  # padded half-panel (multiple of 256)
            bk_env = int(os.environ.get("QMM_BLOCK_K", "0"))
            cands = (bk_env,) if bk_env else (2048, 1024, 512, 256)
            block_k = max((bk for bk in cands
                           if k2p % bk == 0 and bk % w.gsize == 0
                           and (bk // w.gsize) % 8 == 0),
                          default=0)
            if not block_k:
                block_k = max(bk for bk in (2048, 1024, 512, 256)
                              if k2p % bk == 0 and bk % w.gsize == 0
                              and (bk // w.gsize) % 8 == 0)
            q8x = os.environ.get("QMM_Q8X")
            if q8x and w.gbias_t is None and b <= 128:
                # int8-activation MXU path (reference q8_0-activation
                # analogue; experimental, model-level numbers pending)
                out = qmm_packed_q8x(
                    x2, w.levels_t, w.gscale_t,
                    gsize=w.gsize, zero=w.pack_zero,
                    block_n=block_n, block_k=block_k,
                    int8_mxu=(q8x != "bf16"),
                )
            else:
                out = qmm_packed(
                    x2, w.levels_t, w.gscale_t, w.gbias_t,
                    gsize=w.gsize, zero=w.pack_zero,
                    block_n=block_n, block_k=block_k,
                )
        else:
            block_k = 1024 if k % 1024 == 0 else 512 if k % 512 == 0 else 256
            out = qmm(
                x2, w.levels_t, w.gscale_t, w.gbias_t,
                gsize=w.gsize, block_n=block_n, block_k=block_k,
            )
    else:
        out = _xla_qmm(x2, w, compute_dtype)
    return out.reshape(*lead, n)
