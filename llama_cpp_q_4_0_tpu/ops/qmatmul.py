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


def _quantize_row_q8_0(x2: jax.Array, gsize: int, f16_d: bool):
    """quantize_row_q8_0 / _q8_1 semantics (ggml.c:1135-1169, 1283-1316):
    per-group d = amax/127 (q8_0 stores it fp16, q8_1 keeps f32),
    q = C-roundf(x/d) half away from zero.
    Returns (levels f32 [B, G, gsize], d f32 [B, G])."""
    b, k = x2.shape
    g = k // gsize
    xf = x2.astype(jnp.float32).reshape(b, g, gsize)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    dq = amax / jnp.float32(127.0)
    idq = jnp.where(dq > 0, 1.0 / dq, 0.0)
    v = xf * idq[..., None]
    # C roundf exactly: round-half-even except exact .5 ties go away from
    # zero (trunc(v + .5) alone mis-rounds v one ulp below a tie, where
    # the f32 add lands exactly on the integer)
    t = jnp.trunc(v)
    xq = jnp.where(jnp.abs(v - t) == 0.5, t + jnp.sign(v), jnp.round(v))
    if f16_d:
        dq = dq.astype(jnp.float16).astype(jnp.float32)
    return xq, dq


def _quantize_row_q8_K(x2: jax.Array):
    """quantize_row_q8_K_reference semantics (k_quants.c:1133-1168):
    per-256-superblock iscale = -128/(signed max-abs value),
    q = min(127, nearest_int(iscale*x)) with nearest_int's
    round-half-to-even (the 12582912.0f magic constant), d = 1/iscale f32.
    Returns (levels f32 [B, G256, 256], d f32 [B, G256])."""
    b, k = x2.shape
    g = k // 256
    xf = x2.astype(jnp.float32).reshape(b, g, 256)
    am = jnp.argmax(jnp.abs(xf), axis=-1)
    mx = jnp.take_along_axis(xf, am[..., None], axis=-1)[..., 0]
    nonzero = mx != 0
    iscale = jnp.where(nonzero, jnp.float32(-128.0) / mx, 0.0)
    xq = jnp.minimum(127.0, jnp.round(xf * iscale[..., None]))
    xq = jnp.where(nonzero[..., None], xq, 0.0)
    d = jnp.where(nonzero, 1.0 / jnp.where(nonzero, iscale, 1.0), 0.0)
    return xq, d


def q_matmul_ref_int8(x: jax.Array, w) -> jax.Array:
    """REFERENCE-EXACT quantized mul_mat: quantize the activations the
    way the reference does (q8_0 for the 32-group legacy formats, q8_1
    for the affine ones, q8_K per-256 superblock for k-quants) and take
    integer dots per group, rescaled by d_x*d_w in f32 + the affine
    bias * group-sum term — what the reference actually computes for
    every quantized matmul (ggml_compute_forward_mul_mat_q_f32's
    quantize_row_q_dot + vec_dot_q, ggml.c:1618-1747, 11353-11367).

    The planar QTensor levels ARE the reference's integer quants and
    gscale/gbias the affine pair (quant/pack.py), so
        out = sum_g gscale[g,n]*d_x[b,G(g)]*intdot + gbias[g,n]*d_x*bsum
    is algebraically the reference's vec_dot for every format.

    Used by the parity gates (ModelConfig.compute_dtype == 'ref_int8') to
    compare logits against the compiled reference with NO activation-
    precision slack (bit-exact for q8_0 models), and as the model-level
    semantic spec for the int8-activation Pallas kernel
    (ops/pallas/qmm.py qmm_packed_q8x).  Dense f16/f32 weights fall back
    to the f32 path."""
    from ..quant.types import GGMLType

    K_QUANTS = (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                GGMLType.Q5_K, GGMLType.Q6_K)
    if not isinstance(w, QTensor):
        return q_matmul(x, w, use_pallas=False, compute_dtype=jnp.float32)
    lead, k = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, k)
    b = x2.shape[0]
    n, _ = w.shape
    g = k // w.gsize
    lv = w.levels_full().astype(jnp.float32).reshape(g, w.gsize, n)
    sc = w.gscale_full()  # [G, N] f32
    gb = w.gbias_full()   # [G, N] f32 | None
    if w.qtype in K_QUANTS:
        xq, d = _quantize_row_q8_K(x2)
        ratio = 256 // w.gsize
    else:
        xq, d = _quantize_row_q8_0(x2, w.gsize, f16_d=gb is None)
        ratio = 1
    xq = xq.reshape(b, g, w.gsize)
    dg = jnp.repeat(d, ratio, axis=1) if ratio > 1 else d  # [B, G]
    # integer dot per group: |q8|<=128, |levels|<=63 -> products < 2^13,
    # group sums < 2^19 — exact in f32
    dot = jnp.einsum("bgk,gkn->bgn", xq, lv,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bgn,bg,gn->bn", dot, dg, sc,
                     precision=jax.lax.Precision.HIGHEST)
    if gb is not None:
        bsum = jnp.sum(xq, axis=-1)  # [B, G] int sums, exact in f32
        out = out + jnp.einsum("bg,bg,gn->bn", bsum, dg, gb,
                               precision=jax.lax.Precision.HIGHEST)
    return out.reshape(*lead, n)


# Largest x-row count a single qmm_packed call may see: the kernels tile
# N and K but stream the whole [B, bk] x tile per grid step, so B beyond
# this emits un-compilable (VMEM) or pathologically slow Mosaic kernels.
# 2048 = the largest chip-validated shape (tpu-smoke 2026-08-20).
MAX_PALLAS_ROWS = 2048


def use_kfold(b: int, w) -> bool:
    """r5 TPU DECODE DEFAULT: route packed no-bias tensors through the
    kfold kernel (in-kernel zero-fold, no gbias planes — see
    ops/pallas/qmm.py _qmm_packed_kfold_kernel) for decode-shaped calls.
    QMM_KFOLD: unset = auto (b <= QMM_KFOLD_MAX_B, default 32 — the r4
    split-view boundary: decode/verify bucketed t <= 32 fold, prefills
    stay raw).  A 128 boundary was tried (decode MXU is flat to ~128)
    and REVERTED: it reintroduced fold numerics into 33..128-token
    prefills, where cross-program comparisons see the fold's ~2-3e-2
    drift class (test_flash_prefill_on_chip regressed to 1.8e-2), and
    bought nothing measurable — kfold vs plain at T=8 is noise (10.94
    vs 10.96 ab median); the fold's win is T=1 (9.82 vs 10.10).
    '0' = off, '1' = every eligible shape."""
    import os

    env = os.environ.get("QMM_KFOLD", "")
    if env == "0" or w.gbias_t is not None or not w.pack_zero:
        return False
    return env == "1" or b <= int(os.environ.get("QMM_KFOLD_MAX_B", "32"))


def packed_vmem_bytes(b: int, bk: int, bn: int, gsize: int,
                      scale_itemsize: int = 4) -> int:
    """Scoped-VMEM model for one qmm_packed grid step (pipelined inputs
    DOUBLE-buffered):
      2 x f32 [b, bk] lo+hi x tiles          -> 2 * 2 * 4*b*bk
      1 x u8  [bk, bn] packed tile           -> 2 * bk*bn
      2 x scale tiles [bk/gsize, bn]         -> 2 * 2 * sb
      wlo/whi bf16 dequant temporaries       -> 2 * 2*bk*bn
      acc scratch + out block f32 [b, bn]    -> 2 * 4*b*bn
    Shared by the q_matmul dispatch guard and scripts/preflight.py so
    queue configs are vetted on the host before they touch hardware."""
    sb = (bk // gsize) * bn * scale_itemsize
    return 16 * b * bk + 2 * bk * bn + 4 * sb + 4 * bk * bn + 8 * b * bn


def packed_block_plan(b: int, k2p: int, n: int, gsize: int,
                      scale_itemsize: int = 4):
    """Mirror q_matmul's no-env packed block selection + scoped-vmem
    shrink: returns (block_k, block_n, vmem_bytes).  Preflight-only —
    the dispatch keeps its inline loops so env overrides behave exactly
    as before.  n_k == 1 tiles are not pipelined (single-buffered): the
    model HALVES there, exactly like the dispatch — the old guard SKIP
    let a b=2048 n_k=1 lane-chunk qmm reach the chip at 18.62M scoped
    vmem (> 16M, r5 lane bring-up 2026-08-20)."""
    import os

    def vmem(bk, bn):
        v = packed_vmem_bytes(b, bk, bn, gsize, scale_itemsize)
        return v if k2p // bk > 1 else v // 2

    block_n = 512 if n % 512 == 0 else 256 if n % 256 == 0 else 128
    block_k = max(bk for bk in (2048, 1024, 512, 256)
                  if k2p % bk == 0 and bk % gsize == 0
                  and (bk // gsize) % 8 == 0)
    limit = 0.9 * 1024 * int(os.environ.get("QMM_SCOPED_VMEM_KIB", "16384"))
    while block_k > 256 and vmem(block_k, block_n) > limit:
        nxt = block_k // 2
        if k2p % nxt or nxt % gsize or (nxt // gsize) % 8:
            break
        block_k = nxt
    while (block_n > 128 and n % (block_n // 2) == 0
           and vmem(block_k, block_n) > limit):
        block_n //= 2
    return block_k, block_n, vmem(block_k, block_n)


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
    # batch-axis backstop: the Pallas kernels tile N and K but stream the
    # whole [B, bk] x tile per grid step, so B is bounded by VMEM.  B=2048
    # is chip-validated (tpu-smoke); beyond it, split into row chunks —
    # without this, a 16x2048 batched prefill admission emitted a b=32768
    # kernel whose remote compile ground 45 min (2026-08-20).
    if use_pallas and b > MAX_PALLAS_ROWS:
        step = MAX_PALLAS_ROWS
        outs = [q_matmul(x2[i : i + step], w, use_pallas=use_pallas,
                         compute_dtype=compute_dtype)
                for i in range(0, b, step)]
        return jnp.concatenate(outs, axis=0).reshape(*lead, w.shape[0])

    n = w.shape[0]
    if use_pallas and n % 128 == 0 and k % 256 == 0:
        # tile defaults validated at MODEL level on v5e (single-kernel
        # sweeps mislead: cross-op DMA overlap favors deeper k tiles)
        import os

        # big-batch branch (the reference's dequant+BLAS sgemm analogue,
        # ggml.c:11304-11351): at prefill batch sizes the matmul is
        # compute-bound, so paying 4x weight bytes for a full-rate bf16
        # MXU GEMM with XLA-fused dequant can beat the in-kernel VPU
        # unpack.  Env-gated until model-level chip numbers land:
        # QMM_PREFILL_XLA=<min_rows> (e.g. 256).
        px = int(os.environ.get("QMM_PREFILL_XLA", "0"))
        if px and b >= px:
            return _xla_qmm(x2, w, compute_dtype).reshape(*lead, n)

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
            # scoped-VMEM guard: model the kernel's live VMEM for a block
            # choice and halve bk until it fits Mosaic's scoped budget
            # (default 16 MiB; overridable via the same
            # --xla_tpu_scoped_vmem_limit_kib flag Mosaic reads).  Live at
            # once with n_k > 1 (pipelined grid => input blocks are
            # DOUBLE-buffered):
            #   2 x f32 [b, bk] lo+hi x tiles          -> 2 * 2 * 4*b*bk
            #   1 x u8  [bk, bn] packed tile           -> 2 * bk*bn
            #   2 x scale tiles [bk/gsize, bn]         -> 2 * 2 * sb
            #   wlo/whi bf16 dequant temporaries       -> 2 * 2*bk*bn
            #   acc scratch + out block f32 [b, bn]    -> 2 * 4*b*bn
            # (measured anchor: RWKV b=256, k2p=4096, bk=2048, bn=512
            # -> Mosaic "scoped vmem 16.80M > 16M" compile OOM, observed
            # AGAIN 2026-08-20: the first guard compared its 16,252,928-
            # BYTE estimate against the 16,777,216-byte limit — 16.25 MB
            # vs 16 MiB, a units slip that ACCEPTED the broken config its
            # comment claimed to reject.  The model also under-counts
            # Mosaic's real stack (measured 16.80 MiB there, +8%), so the
            # comparison now demands 10% headroom: the broken config
            # (model 16.25 MB > 0.9 x limit = 15.1 MB) is rejected while
            # every measured-good config stays accepted (decode b<=16
            # bk=2048 -> 7.4 MB; prefill b=512 bk=1024 -> 13.9 MB, today's
            # 60 ms number).  n_k == 1 tiles are not pipelined (single-
            # buffered): halve the model there instead of SKIPPING the
            # guard — the old skip let a b=2048 n_k=1 lane-chunk qmm
            # reach the chip at 18.62M scoped vmem (> 16M, r5 lane
            # bring-up 2026-08-20).
            def _vmem_model(bk, bn):
                v = packed_vmem_bytes(b, bk, bn, w.gsize,
                                      w.gscale_t.dtype.itemsize)
                return v if k2p // bk > 1 else v // 2

            vmem_limit = 1024 * int(os.environ.get(
                "QMM_SCOPED_VMEM_KIB", "16384"))
            while (not bk_env
                   and _vmem_model(block_k, block_n) > 0.9 * vmem_limit
                   and block_k > 256):
                nxt = block_k // 2
                if (k2p % nxt or nxt % w.gsize or (nxt // w.gsize) % 8):
                    break
                block_k = nxt
            # large-row calls (T=2048 prefills: b = 2048 padded rows) keep
            # the model over budget even at bk=256 — the x tiles and out
            # block scale with b*bn, so shrink block_n next (floor 128)
            while (not bn_env and block_n > 128 and n % (block_n // 2) == 0
                   and _vmem_model(block_k, block_n) > 0.9 * vmem_limit):
                block_n //= 2
            q8x = os.environ.get("QMM_Q8X")
            if (q8x and w.gbias_t is None
                    and b <= int(os.environ.get("QMM_Q8X_MAX_B", "128"))):
                # int8-activation MXU path (reference q8_0-activation
                # analogue).  Ruled out for decode shapes on chip (T=1
                # 28.45 ms vs 11 default, 2026-08-19) but never tried at
                # prefill (b=512), where the matmul is COMPUTE-bound and
                # the int8 MXU runs 2x bf16 rate on v5e —
                # QMM_Q8X_MAX_B=512 lifts the cap for that experiment.
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
                    # experimental: one concatenated lo|hi dot per grid
                    # step instead of two (small-batch MXU issue overhead)
                    fuse_panels=bool(os.environ.get("QMM_FUSE_PANELS"))
                    and w.gbias_t is None,
                    # experimental: in-kernel zero fold via the dequant
                    # multiply-add (no gbias stream, no accuracy cost)
                    fma_fold=bool(os.environ.get("QMM_FMA")),
                    # kfold (r5 TPU DECODE DEFAULT, see use_kfold): won
                    # or tied every ab-decode combo (10.15/10.18/10.99 vs
                    # zerofold 10.19/10.35/11.64 ms, 2026-08-20) with no
                    # gbias planes — retires the r4 split param views
                    kfold=use_kfold(b, w),
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
