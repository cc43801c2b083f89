"""Fused dequantize-matmul Pallas TPU kernel — THE hot path.

TPU re-design of the reference's quantized matmul driver
(ggml_compute_forward_mul_mat_q_f32, ggml.c:11226-11424) and its CUDA twin
(dequantize_mul_mat_vec, ggml-cuda.cu:614-1245): instead of per-row SIMD
dots across pthreads, each grid step streams an int8-level weight tile
HBM->VMEM, dequantizes it on the VPU (per-group scale multiply), and feeds
the MXU with a bf16 tile, accumulating f32 partial sums over the K grid axis.

Layout: weights live *transposed* in HBM — levels_t int8 [K, N], scales
[K/gsize, N] — so the 32/16-element quant groups broadcast along sublanes
(a free major-dim reshape) rather than lanes, and the MXU consumes the
dequantized [BK, BN] tile directly with no in-kernel transpose.

The per-group *bias* of affine formats (q4_1/q5_1/q2_K/q4_K/q5_K) is applied
algebraically — sum_g bias[g,n] * (sum_{k in g} x[b,k]) — as a second small
matmul over group-summed activations, so no bias broadcast is needed.

One kernel serves every quant format and every model family (the TPU
analogue of the quantize_fns vtable, ggml.c:1618).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dequant_tile(lvt_ref, gst_ref, gsize: int) -> jax.Array:
    """int8 [BK, BN] levels * [BK/gsize, BN] scales -> bf16 [BK, BN]."""
    bk, bn = lvt_ref.shape
    lv = lvt_ref[:].astype(jnp.float32).reshape(bk // gsize, gsize, bn)
    w = lv * gst_ref[:].astype(jnp.float32)[:, None, :]
    return w.reshape(bk, bn).astype(jnp.bfloat16)


def _qmm_kernel(x_ref, lvt_ref, gst_ref, out_ref, acc_ref, *, n_k: int, gsize: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _dequant_tile(lvt_ref, gst_ref, gsize)
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _qmm_bias_kernel(
    x_ref, lvt_ref, gst_ref, gbt_ref, out_ref, acc_ref, *, n_k: int, gsize: int
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b, bk = x_ref.shape
    w = _dequant_tile(lvt_ref, gst_ref, gsize)
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    # affine bias: sum_g gbias[g,n] * sum_{k in g} x[b,k]
    xg = x_ref[:].astype(jnp.float32).reshape(b, bk // gsize, gsize).sum(axis=2)
    acc += jnp.dot(xg, gbt_ref[:], preferred_element_type=jnp.float32)
    acc_ref[:] += acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("gsize", "block_n", "block_k", "interpret"),
)
def qmm(
    x: jax.Array,
    levels_t: jax.Array,
    gscale_t: jax.Array,
    gbias_t: jax.Array | None = None,
    *,
    gsize: int = 32,
    block_n: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """x [B, K] @ dequant(levels_t [K, N]) -> [B, N] float32."""
    b, k = x.shape
    k2, n = levels_t.shape
    assert k == k2, (x.shape, levels_t.shape)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    assert n % block_n == 0 and k % block_k == 0, (n, k, block_n, block_k)
    assert block_k % gsize == 0
    n_k = k // block_k
    grid = (n // block_n, n_k)

    in_specs = [
        pl.BlockSpec((b, block_k), lambda i, kk: (0, kk)),
        pl.BlockSpec((block_k, block_n), lambda i, kk: (kk, i)),
        pl.BlockSpec((block_k // gsize, block_n), lambda i, kk: (kk, i)),
    ]
    args = [x, levels_t, gscale_t]
    kern = functools.partial(_qmm_kernel, n_k=n_k, gsize=gsize)
    if gbias_t is not None:
        in_specs.append(
            pl.BlockSpec((block_k // gsize, block_n), lambda i, kk: (kk, i))
        )
        args.append(gbias_t)
        kern = functools.partial(_qmm_bias_kernel, n_k=n_k, gsize=gsize)

    flops = 2 * b * n * k
    bytes_accessed = (
        n * k
        + 4 * (k // gsize) * n * (2 if gbias_t is not None else 1)
        + 2 * b * k
        + 4 * b * n
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, block_n), lambda i, kk: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*args)
