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


def _u16_view(a: jax.Array | None) -> jax.Array | None:
    """fp16 arrays enter Pallas as raw uint16 bits (free XLA bitcast)."""
    if a is not None and a.dtype == jnp.float16:
        return jax.lax.bitcast_convert_type(a, jnp.uint16)
    return a


def _scales_f32(tile: jax.Array) -> jax.Array:
    """Scale tile -> f32.  fp16 scales (ggml's block 'd') arrive as raw
    uint16 bits — Mosaic has no f16 type — and are decoded with integer ops:
    normals get a rebiasing bit-shuffle, subnormals the exact m * 2^-24."""
    if tile.dtype != jnp.uint16:
        return tile.astype(jnp.float32)
    bits = tile.astype(jnp.int32)
    s = (bits >> 15) & 1
    e = (bits >> 10) & 0x1F
    m = bits & 0x3FF
    f_norm = pltpu.bitcast(
        (s << 31) | ((e + 112) << 23) | (m << 13), jnp.float32
    )
    f_sub = m.astype(jnp.float32) * jnp.float32(5.9604644775390625e-08)
    f_sub = jnp.where(s == 1, -f_sub, f_sub)
    return jnp.where(e == 0, f_sub, f_norm)


def _dequant_tile(lvt_ref, gst_ref, gsize: int) -> jax.Array:
    """int8 [BK, BN] levels * [BK/gsize, BN] scales -> bf16 [BK, BN]."""
    bk, bn = lvt_ref.shape
    lv = lvt_ref[:].astype(jnp.float32).reshape(bk // gsize, gsize, bn)
    w = lv * _scales_f32(gst_ref[:])[:, None, :]
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
    x_ref, xg_ref, lvt_ref, gst_ref, gbt_ref, out_ref, acc_ref, *, n_k: int,
    gsize: int
):
    k = pl.program_id(1)

    # affine-bias seed: sum_g gbias[g,n] * sum_{k in g} x[b,k], computed
    # once per n-block from the FULL-K group sums (xg precomputed in XLA:
    # splitting the lane axis in-kernel is an unsupported Mosaic shape
    # cast, and a K-blocked xg tile would be under-aligned)
    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.dot(xg_ref[:], _scales_f32(gbt_ref[:]),
                             preferred_element_type=jnp.float32)

    w = _dequant_tile(lvt_ref, gst_ref, gsize)
    acc_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _qmm_packed_kernel(
    xlo_ref, xhi_ref, p_ref, slo_ref, shi_ref, out_ref, acc_ref,
    *, n_k: int, gsize: int, zero: int, fuse_panels: bool = False,
    fma_fold: bool = False,
):
    """Split-half 4-bit tile: low nibbles are the k-panel at this grid step,
    high nibbles the panel K/2 later; each gets its own x slice and scale
    tile, so unpacking is two masks — no shuffles (see ops/qtensor.py).

    fuse_panels concatenates the lo/hi panels along the contraction axis
    and issues ONE [b, 2bk] x [2bk, bn] dot instead of two — halves MXU
    issue count for small-batch shapes where per-pass overhead, not FLOPs,
    dominates (T=8 verify investigation, VERDICT r3 #4).

    fma_fold folds the pack zero-point into the dequant multiply-add
    instead of an integer subtract: w = nib*d + (-zero*d), with the offset
    computed once per SCALE element (1/gsize the tile).  Mathematically
    (nib - zero)*d to within one f32 rounding (2^-24 — invisible after the
    bf16 cast), so unlike the params-level fold_zero_points it carries NO
    accuracy cost (that fold keeps unsigned-magnitude products through the
    MXU and cancels later — measured 3.1e-2 logits drift) and streams no
    gbias plane.  The high nibble needs no mask at all: the packed byte is
    uint8, so p >> 4 is already in [0, 15]."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk, bn = p_ref.shape
    p = p_ref[:].astype(jnp.int32)
    lo, hi = p & 0xF, p >> 4
    if zero and not fma_fold:  # zero-folded tensors (pack_zero 0) skip this
        lo, hi = lo - zero, hi - zero
    lo = lo.astype(jnp.float32).reshape(bk // gsize, gsize, bn)
    hi = hi.astype(jnp.float32).reshape(bk // gsize, gsize, bn)
    slo = _scales_f32(slo_ref[0])[:, None, :]
    shi = _scales_f32(shi_ref[0])[:, None, :]
    if zero and fma_fold:
        wlo = (lo * slo + slo * jnp.float32(-zero)).reshape(bk, bn).astype(jnp.bfloat16)
        whi = (hi * shi + shi * jnp.float32(-zero)).reshape(bk, bn).astype(jnp.bfloat16)
    else:
        wlo = (lo * slo).reshape(bk, bn).astype(jnp.bfloat16)
        whi = (hi * shi).reshape(bk, bn).astype(jnp.bfloat16)
    if fuse_panels:
        x = jnp.concatenate(
            [xlo_ref[:].astype(jnp.bfloat16), xhi_ref[:].astype(jnp.bfloat16)],
            axis=1)
        w = jnp.concatenate([wlo, whi], axis=0)
        acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    else:
        acc = jnp.dot(xlo_ref[:].astype(jnp.bfloat16), wlo,
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(xhi_ref[:].astype(jnp.bfloat16), whi,
                       preferred_element_type=jnp.float32)
        acc_ref[:] += acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _qmm_packed_kfold_kernel(
    xlo_ref, xhi_ref, xglo_ref, xghi_ref, p_ref, slo_ref, shi_ref,
    out_ref, acc_ref, *, n_k: int, gsize: int, zero: int,
):
    """Zero-fold WITHOUT the gbias stream (the r5 decode-bytes lever).

    The q4_0 fold bias is just -zero * d[g,n], so instead of streaming a
    precomputed gbias plane (0.79 GiB extra per decoded token at 7B — the
    folded view's entire byte cost) the bias term is accumulated per K
    block from the scale tile that is ALREADY resident in VMEM:
        acc += -zero * (xg_blk @ s_blk)
    Weight unpack stays mask/shift-only (the zero-fold VPU win: no
    per-nibble subtract); the bias rides two [b, ng] x [ng, bn] MXU dots
    per grid step, ~1/gsize of the weight dot's FLOPs.  Unlike fma_fold
    (ruled out on chip 2026-08-20: per-element FMA on the full weight
    tile) this adds NO per-weight VPU work — it removes bytes at zero
    unpack cost, the only lever class that has ever won on the
    VPU-constrained decode path (NOTES r4 3x lesson).  Numerics are the
    unsigned-magnitude product + cancellation class of the params-level
    fold (documented ~3.1e-2 model-level logits drift), with the bias
    association per-K-block instead of one full-K seed."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk, bn = p_ref.shape
    p = p_ref[:].astype(jnp.int32)
    lo = (p & 0xF).astype(jnp.float32).reshape(bk // gsize, gsize, bn)
    hi = (p >> 4).astype(jnp.float32).reshape(bk // gsize, gsize, bn)
    slo = _scales_f32(slo_ref[0])  # [ng, bn]
    shi = _scales_f32(shi_ref[0])
    wlo = (lo * slo[:, None, :]).reshape(bk, bn).astype(jnp.bfloat16)
    whi = (hi * shi[:, None, :]).reshape(bk, bn).astype(jnp.bfloat16)
    acc = jnp.dot(xlo_ref[:].astype(jnp.bfloat16), wlo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi_ref[:].astype(jnp.bfloat16), whi,
                   preferred_element_type=jnp.float32)
    acc += jnp.float32(-zero) * (
        jnp.dot(xglo_ref[0], slo, preferred_element_type=jnp.float32)
        + jnp.dot(xghi_ref[0], shi, preferred_element_type=jnp.float32))
    acc_ref[:] += acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _qmm_packed_bias_kernel(
    xlo_ref, xhi_ref, xglo_ref, xghi_ref, p_ref, slo_ref, shi_ref, blo_ref,
    bhi_ref, out_ref, acc_ref, *, n_k: int, gsize: int, zero: int,
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():  # full-K bias seed (see _qmm_bias_kernel)
        acc_ref[:] = (
            jnp.dot(xglo_ref[:], _scales_f32(blo_ref[0]),
                    preferred_element_type=jnp.float32)
            + jnp.dot(xghi_ref[:], _scales_f32(bhi_ref[0]),
                      preferred_element_type=jnp.float32)
        )

    bk = xlo_ref.shape[1]
    bn = p_ref.shape[1]
    p = p_ref[:].astype(jnp.int32)
    lo, hi = p & 0xF, p >> 4  # uint8 source: >> 4 is already in [0, 15]
    if zero:  # static: zero-folded tensors (pack_zero 0) skip the subtracts
        lo, hi = lo - zero, hi - zero
    lo = lo.astype(jnp.float32).reshape(bk // gsize, gsize, bn)
    hi = hi.astype(jnp.float32).reshape(bk // gsize, gsize, bn)
    wlo = (lo * _scales_f32(slo_ref[0])[:, None, :]).reshape(bk, bn).astype(jnp.bfloat16)
    whi = (hi * _scales_f32(shi_ref[0])[:, None, :]).reshape(bk, bn).astype(jnp.bfloat16)
    acc = jnp.dot(xlo_ref[:].astype(jnp.bfloat16), wlo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi_ref[:].astype(jnp.bfloat16), whi,
                   preferred_element_type=jnp.float32)
    acc_ref[:] += acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _qmm_packed_q8x_kernel(
    xlo_ref, xhi_ref, sxlo_ref, sxhi_ref, p_ref, slo_ref, shi_ref,
    out_ref, acc_ref, *, n_k: int, gsize: int, zero: int, n_groups: int,
    int8_mxu: bool, resident: bool,
):
    """int8-activation split-half kernel (the reference's q8_0-activation
    path, ggml.c:11353-11367 + ggml_vec_dot_q4_0_q8_0, mapped to the MXU).

    Per quant group g the product is EXACT integer arithmetic:
        y += d_x[b,g] * d_w[g,n] * (sum_{k in g} xq[b,k] * wlev[k,n])
    The group dot rides the MXU ([gsize, B]^T x [gsize, BN] int8 -> int32);
    only the two group scales touch the VPU, so dequant drops from ~5 f32
    ops/weight (mask, convert, scale-mul, bf16-cast) to 2 int ops/weight
    (nibble mask/shift) — the VPU was the decode-side bottleneck at small
    batch (NOTES-NEXT-ROUND 12a).

    The group loop is STATICALLY UNROLLED (n_groups <= 16, enforced by the
    caller): every x/scale slice below is compile-time, so the activation
    planes can use LANE-COMPACT layouts — xq [G, gsize, B] (b on lanes),
    sx [B, G] (g on lanes, static column picks).  The previous layouts
    ([G, B, gsize] / [G, B, 8], chosen for dynamic leading-dim slicing
    inside a fori_loop) lane-padded their minor dims 32->128 / 8->128 in
    VMEM — a 4x/16x inflation scaling with b that hit 19.62M scoped vmem
    at b=512 prefill shapes (hw-validate-r4c 2026-08-20).

    int8_mxu=False runs the dots in bf16: still EXACT (|levels| <= 8,
    |xq| <= 127 — products < 2^10 and f32 accumulation is exact below
    2^24), at the bf16 MXU rate instead of the 2x int8 rate.

    resident=True keeps the FULL xq planes in VMEM (constant index map —
    fetched once) and indexes this k-block's groups with a dynamic
    LEADING-dim slice (the chip-proven pattern of the old fori_loop
    kernel).  Without it, n_k > 1 forces a re-fetch of the planes on
    every n-block: b*K bytes x (N/block_n) steps ~ 6 GB of restream per
    7B prefill-512 pass — the bf16 packed kernel dodges this only
    because its k2p-sized block makes the x index constant (n_k == 1),
    which the 16-group unroll cap forbids here."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dt = jnp.int8 if int8_mxu else jnp.bfloat16
    pt = jnp.int32 if int8_mxu else jnp.float32
    dn = (((0,), (0,)), ((), ()))  # contract the sublane dim of both sides
    slo = _scales_f32(slo_ref[0])  # [G, BN]
    shi = _scales_f32(shi_ref[0])
    sxlo = sxlo_ref[0]  # [B, G] (leading n_k axis blocked to 1 — a 2-D
    sxhi = sxhi_ref[0]  # [B, G_block] block is only lowerable at n_k == 1)

    acc = jnp.zeros(acc_ref.shape, jnp.float32)
    for g in range(n_groups):
        # mask/shift/subtract in int32: Mosaic has no i8 arith.subi
        # lowering (failed to legalize on v5e) — int32 vector arith is the
        # same path the bf16 kernels use; the int8 cast for the MXU
        # happens after
        pg = p_ref[g * gsize:(g + 1) * gsize, :].astype(jnp.int32)
        for x_ref, sx, lv, s in (
            (xlo_ref, sxlo, (pg & 0xF) - zero, slo),
            (xhi_ref, sxhi, (pg >> 4) - zero, shi),
        ):
            xg = (x_ref[pl.ds(k * n_groups + g, 1)][0] if resident
                  else x_ref[g])
            d = jax.lax.dot_general(
                xg.astype(dt), lv.astype(dt),
                dimension_numbers=dn, preferred_element_type=pt)
            # d_x: static column [B, 1] broadcast across BN;
            # d_w: static row [1, BN] broadcast across B
            acc = acc + (d.astype(jnp.float32)
                         * sx[:, g:g + 1] * s[g:g + 1, :])
    acc_ref[:] += acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _quantize_q8x(x: jax.Array, gsize: int, k2p: int):
    """Per-group symmetric int8 activation quantization + split-half
    arrangement (quantize_row_q8_0 semantics, ggml.c:1135-1169: d = amax/127,
    q = round(x/d)).

    Returns (xq_lo, xq_hi int8 [G2P, gsize, B], sx_lo, sx_hi f32 [B, G2P])
    where G2P = k2p // gsize and plane rows beyond the real K/2 are zero.
    b rides the LANES of the int8 planes and the scale planes are 2-D so
    every VMEM tile is lane-compact (see _qmm_packed_q8x_kernel)."""
    b, k = x.shape
    k2 = k // 2
    g2 = k2 // gsize
    g2p = k2p // gsize
    xf = x.astype(jnp.float32).reshape(b, 2 * g2, gsize)
    amax = jnp.max(jnp.abs(xf), axis=-1)  # [B, 2*G2]
    dq = amax / jnp.float32(127.0)
    idq = jnp.where(dq > 0, 1.0 / dq, 0.0)
    v = xf * idq[..., None]
    # C roundf exactly (half away from zero): trunc(v + .5) alone
    # mis-rounds one ulp below a tie — see qmatmul._quantize_row_q8_0
    t = jnp.trunc(v)
    xq = jnp.where(jnp.abs(v - t) == 0.5, t + jnp.sign(v),
                   jnp.round(v)).astype(jnp.int8)
    # the reference stores block_q8_0.d as fp16 — fold that rounding in so
    # the kernel's scale product matches vec_dot_q4_0_q8_0 exactly
    d = dq.astype(jnp.float16).astype(jnp.float32)
    xqt = xq.transpose(1, 2, 0)  # [2*G2, gsize, B]
    pad = ((0, g2p - g2), (0, 0), (0, 0))
    xq_lo = jnp.pad(xqt[:g2], pad)
    xq_hi = jnp.pad(xqt[g2:], pad)
    spad = ((0, 0), (0, g2p - g2))
    sx_lo = jnp.pad(d[:, :g2], spad)
    sx_hi = jnp.pad(d[:, g2:], spad)
    return xq_lo, xq_hi, sx_lo, sx_hi


def q8x_plan(b: int, k2p: int, n: int, gsize: int, block_n: int,
             block_k: int, scale_itemsize: int = 4):
    """Derive feasible (block_k, block_n, vmem_bytes, resident) for
    qmm_packed_q8x.

    Models Mosaic's padded VMEM tiles (int8 sublane tile 32, lane tile 128,
    double-buffered pipelined inputs) and shrinks block_k then block_n
    until the estimate fits 90% of the scoped-vmem limit — hand-tuned
    block envs once sent a 19.62M-scoped-vmem kernel to the chip and every
    tune-q8x-prefill variant died rc=1 (hw-validate-r4c 2026-08-20).

    resident=True (preferred whenever the full xq planes fit): constant
    index map, planes fetched ONCE instead of once per n-block — without
    it the n_k > 1 grid restreams b*K activation bytes x N/block_n times
    (~6 GB per 7B prefill-512 pass).  QMM_Q8X_RESIDENT=0/1 overrides.
    Shared with scripts/preflight.py so queue configs are vetted on the
    CPU before they touch hardware."""
    import os

    bl = -(-b // 128) * 128  # lane pad
    b8 = -(-b // 8) * 8      # sublane pad
    g2p = k2p // gsize

    def vmem(bk_, bn_, res):
        ng_ = bk_ // gsize
        bnp = max(bn_, 128)
        if res:  # full planes, single-buffered (constant index map)
            xq = 2 * g2p * max(gsize, 32) * bl
        else:    # per-block planes, double-buffered
            xq = 4 * ng_ * max(gsize, 32) * bl
        return (
            xq
            + 4 * b8 * 128 * 4                     # sx planes (ng -> 128)
            + 2 * bk_ * bnp                        # packed tile (uint8)
            + 4 * (-(-ng_ // 8) * 8) * bnp * scale_itemsize
            + 3 * b8 * bnp * 4                     # out x2 + acc scratch
        )

    block_n = min(block_n, n)
    # static unroll bound: <= 16 groups per block (the all-64-groups
    # unrolled variant blew a 560 s Mosaic compile, 2026-08-18)
    bk = min(block_k, 16 * gsize, k2p)
    while k2p % bk:
        bk //= 2
    limit = 0.9 * 1024 * int(os.environ.get("QMM_SCOPED_VMEM_KIB", "16384"))
    env_res = os.environ.get("QMM_Q8X_RESIDENT")
    res_order = ([False] if env_res == "0"
                 else [True] if env_res == "1" else [True, False])
    for res in res_order:
        bk_, bn_ = bk, block_n
        while (bk_ > 8 * gsize and k2p % (bk_ // 2) == 0
               and vmem(bk_, bn_, res) > limit):
            bk_ //= 2
        while (bn_ > 128 and n % (bn_ // 2) == 0
               and vmem(bk_, bn_, res) > limit):
            bn_ //= 2
        if vmem(bk_, bn_, res) <= limit or res is res_order[-1]:
            return bk_, bn_, vmem(bk_, bn_, res), res


@functools.partial(
    jax.jit,
    static_argnames=("gsize", "zero", "block_n", "block_k", "int8_mxu",
                     "interpret"),
)
def qmm_packed_q8x(
    x: jax.Array,
    packed_t: jax.Array,
    gscale_t: jax.Array,
    *,
    gsize: int = 32,
    zero: int = 8,
    block_n: int = 256,
    block_k: int = 512,
    int8_mxu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """x [B, K] @ dequant(packed nibbles) -> [B, N] f32 via int8-quantized
    activations (see _qmm_packed_q8x_kernel).  Non-bias packed formats only
    (q4_0 path); layout contract identical to qmm_packed.  block_k/block_n
    are upper bounds — q8x_plan shrinks them to fit scoped VMEM."""
    b, k = x.shape
    k2p, n = packed_t.shape
    assert k // 2 <= k2p, (x.shape, packed_t.shape)
    bk, block_n, _, resident = q8x_plan(
        b, k2p, n, gsize, block_n, block_k,
        2 if gscale_t.dtype == jnp.float16 else 4)
    assert n % block_n == 0 and k2p % bk == 0, (n, k2p, block_n, bk)
    assert bk % gsize == 0 and (bk // gsize) % 8 == 0
    n_k = k2p // bk
    n_groups = bk // gsize
    g2p = k2p // gsize
    grid = (n // block_n, n_k)

    xq_lo, xq_hi, sx_lo, sx_hi = _quantize_q8x(x, gsize, k2p)
    gscale_t = _u16_view(gscale_t)

    if resident:  # full planes, fetched once (constant index map)
        x_spec = pl.BlockSpec((g2p, gsize, b), lambda i, kk: (0, 0, 0))
    else:
        x_spec = pl.BlockSpec((n_groups, gsize, b), lambda i, kk: (kk, 0, 0))
    # sx planes ride a leading n_k axis: a (b, ng) block of a [b, G] array
    # is only lowerable when ng == G (Mosaic: last block dim must be
    # 128-divisible or full) — [n_k, b, ng] with a (1, b, ng) block makes
    # every block dim equal its array dim (caught on chip, r5 gate)
    sx_lo = sx_lo.reshape(b, n_k, n_groups).swapaxes(0, 1)
    sx_hi = sx_hi.reshape(b, n_k, n_groups).swapaxes(0, 1)
    in_specs = [
        x_spec,
        x_spec,
        pl.BlockSpec((1, b, n_groups), lambda i, kk: (kk, 0, 0)),
        pl.BlockSpec((1, b, n_groups), lambda i, kk: (kk, 0, 0)),
        pl.BlockSpec((bk, block_n), lambda i, kk: (kk, i)),
        pl.BlockSpec((1, n_groups, block_n), lambda i, kk: (0, kk, i)),
        pl.BlockSpec((1, n_groups, block_n), lambda i, kk: (1, kk, i)),
    ]
    flops = 2 * b * n * k
    bytes_accessed = k2p * n + 8 * (k2p // gsize) * n + b * k + 4 * b * n
    return pl.pallas_call(
        functools.partial(_qmm_packed_q8x_kernel, n_k=n_k, gsize=gsize,
                          zero=zero, n_groups=n_groups, int8_mxu=int8_mxu,
                          resident=resident),
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
    )(xq_lo, xq_hi, sx_lo, sx_hi, packed_t, gscale_t, gscale_t)


@functools.partial(
    jax.jit,
    static_argnames=("gsize", "zero", "block_n", "block_k", "fuse_panels",
                     "fma_fold", "kfold", "interpret"),
)
def qmm_packed(
    x: jax.Array,
    packed_t: jax.Array,  # uint8 [K2P, N] (K2P = K/2 padded to 256)
    gscale_t: jax.Array,  # f32 [2, K2P/gsize, N] (lo/hi planes)
    gbias_t: jax.Array | None = None,
    *,
    gsize: int = 32,
    zero: int = 8,
    block_n: int = 256,
    block_k: int = 2048,
    fuse_panels: bool = False,
    fma_fold: bool = False,
    kfold: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """x [B, K] @ dequant(split-half packed nibbles) -> [B, N] f32.

    Layout contract is QTensor's packed form (ops/qtensor.py): pad columns
    carry zero scales, so the padded x slices contribute nothing.

    kfold=True (non-bias formats with zero > 0 only): zero-fold with the
    bias term computed in-kernel from the streamed scale tiles instead of
    a gbias plane — see _qmm_packed_kfold_kernel."""
    b, k = x.shape
    k2p, n = packed_t.shape
    k2 = k // 2
    assert k2 <= k2p, (x.shape, packed_t.shape)
    block_n = min(block_n, n)
    bk = min(block_k, k2p)  # block over one half-panel
    assert n % block_n == 0 and k2p % bk == 0, (n, k2p, block_n, bk)
    assert bk % gsize == 0 and (bk // gsize) % 8 == 0
    n_k = k2p // bk
    grid = (n // block_n, n_k)

    pad = k2p - k2
    x_lo = jnp.pad(x[:, :k2], ((0, 0), (0, pad)))
    x_hi = jnp.pad(x[:, k2:], ((0, 0), (0, pad)))
    gscale_t = _u16_view(gscale_t)
    gbias_t = _u16_view(gbias_t)
    g2p = k2p // gsize

    in_specs = [
        pl.BlockSpec((b, bk), lambda i, kk: (0, kk)),
        pl.BlockSpec((b, bk), lambda i, kk: (0, kk)),
        pl.BlockSpec((bk, block_n), lambda i, kk: (kk, i)),
        pl.BlockSpec((1, bk // gsize, block_n), lambda i, kk: (0, kk, i)),
        pl.BlockSpec((1, bk // gsize, block_n), lambda i, kk: (1, kk, i)),
    ]
    args = [x_lo, x_hi, packed_t, gscale_t, gscale_t]
    kern = functools.partial(_qmm_packed_kernel, n_k=n_k, gsize=gsize,
                             zero=zero, fuse_panels=fuse_panels,
                             fma_fold=fma_fold)
    if kfold:
        assert gbias_t is None and zero > 0, (gbias_t, zero)
        ng = bk // gsize
        xg_lo = x_lo.astype(jnp.float32).reshape(b, g2p, gsize).sum(axis=2)
        xg_hi = x_hi.astype(jnp.float32).reshape(b, g2p, gsize).sum(axis=2)
        # leading n_k axis: a (b, ng) block of [b, G] is only lowerable
        # at n_k == 1 (Mosaic last-dim rule; caught on chip, r5 gate)
        xg_lo = xg_lo.reshape(b, n_k, ng).swapaxes(0, 1)
        xg_hi = xg_hi.reshape(b, n_k, ng).swapaxes(0, 1)
        in_specs.insert(2, pl.BlockSpec((1, b, ng), lambda i, kk: (kk, 0, 0)))
        in_specs.insert(3, pl.BlockSpec((1, b, ng), lambda i, kk: (kk, 0, 0)))
        args = [x_lo, x_hi, xg_lo, xg_hi, packed_t, gscale_t, gscale_t]
        kern = functools.partial(_qmm_packed_kfold_kernel, n_k=n_k,
                                 gsize=gsize, zero=zero)
    elif gbias_t is not None:
        xg_lo = x_lo.astype(jnp.float32).reshape(b, g2p, gsize).sum(axis=2)
        xg_hi = x_hi.astype(jnp.float32).reshape(b, g2p, gsize).sum(axis=2)
        in_specs.insert(2, pl.BlockSpec((b, g2p), lambda i, kk: (0, 0)))
        in_specs.insert(3, pl.BlockSpec((b, g2p), lambda i, kk: (0, 0)))
        in_specs += [
            pl.BlockSpec((1, g2p, block_n), lambda i, kk: (0, 0, i)),
            pl.BlockSpec((1, g2p, block_n), lambda i, kk: (1, 0, i)),
        ]
        args = [x_lo, x_hi, xg_lo, xg_hi, packed_t, gscale_t, gscale_t,
                gbias_t, gbias_t]
        kern = functools.partial(_qmm_packed_bias_kernel, n_k=n_k, gsize=gsize,
                                 zero=zero)

    flops = 2 * b * n * k
    bytes_accessed = (
        k2p * n
        + 8 * (k2p // gsize) * n * (2 if gbias_t is not None else 1)
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


@functools.partial(
    jax.jit,
    static_argnames=("gsize", "block_n", "block_k", "interpret"),
)
def qmm(  # noqa: D417 — unpacked int8 variant (5-bit+ formats)
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
    gscale_t = _u16_view(gscale_t)
    gbias_t = _u16_view(gbias_t)
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
        g_all = k // gsize
        xg = x.astype(jnp.float32).reshape(b, g_all, gsize).sum(axis=2)
        in_specs.insert(1, pl.BlockSpec((b, g_all), lambda i, kk: (0, 0)))
        in_specs.append(
            pl.BlockSpec((g_all, block_n), lambda i, kk: (0, i))
        )
        args = [x, xg, levels_t, gscale_t, gbias_t]
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
