"""Quantized matmul: XLA path vs numpy dequant reference, Pallas vs XLA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_cpp_q_4_0_tpu.ops import QTensor, q_matmul
from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm
from llama_cpp_q_4_0_tpu.quant import GGMLType

QTYPES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
]


def _mk(n, k, qtype, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    return w, QTensor.quantize(w, qtype)


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_qtensor_dequant_matches_planar(qtype):
    from llama_cpp_q_4_0_tpu.quant import QUANT_FNS

    w, qt = _mk(8, 512, qtype)
    blocks = QUANT_FNS[qtype].quantize_row(w)
    ref = QUANT_FNS[qtype].dequantize_row(blocks).reshape(8, 512)
    got = np.asarray(qt.dequantize())
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K])
def test_q_matmul_vs_numpy(qtype):
    w, qt = _mk(256, 512, qtype)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((4, 512)) * 0.5).astype(np.float32)
    ref = x @ np.asarray(qt.dequantize()).T
    out = np.asarray(q_matmul(jnp.asarray(x), qt, use_pallas=False))
    # bf16 mantissa on a K=512 reduction
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9) < 2e-2


@pytest.mark.parametrize(
    "qtype",
    # one per kernel path: packed, packed+bias, int8, int8+bias
    [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q6_K, GGMLType.Q5_1],
)
def test_pallas_qmm_interpret_matches_xla(qtype):
    """Pallas kernel (interpret mode on CPU) == XLA fallback semantics."""
    w, qt = _mk(256, 512, qtype)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((4, 512)) * 0.5).astype(np.float32)
    ref = np.asarray(q_matmul(jnp.asarray(x), qt, use_pallas=False))
    if qt.packed:
        from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed

        out = np.asarray(
            qmm_packed(
                jnp.asarray(x), qt.levels_t, qt.gscale_t, qt.gbias_t,
                gsize=qt.gsize, zero=qt.pack_zero, block_n=128, block_k=256,
                interpret=True,
            )
        )
    else:
        out = np.asarray(
            qmm(
                jnp.asarray(x), qt.levels_t, qt.gscale_t, qt.gbias_t,
                gsize=qt.gsize, block_n=128, block_k=256, interpret=True,
            )
        )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("b", [1, 4, 8])
@pytest.mark.parametrize("int8_mxu", [True, False], ids=["int8", "bf16"])
def test_pallas_qmm_q8x_matches_reference_dot(b, int8_mxu):
    """int8-activation kernel == the reference's q4_0 x q8_0 CPU semantics
    (quantize_row_q8_0 + ggml_vec_dot_q4_0_q8_0): activations quantized
    per-32-group with an fp16-stored amax/127 scale, exact integer group
    dots, f32 rescale.  Ground truth is the byte-exact numpy emulation in
    quant/blockq.py; only f32 summation order may differ."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed_q8x
    from llama_cpp_q_4_0_tpu.quant.blockq import (
        f16_to_f32, quantize_q8_0, _int_nibbles,
    )
    from llama_cpp_q_4_0_tpu.quant import QUANT_FNS

    n, k = 256, 1024
    w, qt = _mk(n, k, GGMLType.Q4_0, seed=7)
    assert qt.packed and qt.gbias_t is None
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((b, k)) * 0.5).astype(np.float32)

    # reference semantics in float64 accumulation (associativity-free)
    wb = QUANT_FNS[GGMLType.Q4_0].quantize_row(w)  # [n, k/32] q4_0 blocks
    qlv = _int_nibbles(wb.reshape(-1), 8).reshape(n, k // 32, 32)
    wd = f16_to_f32(wb["d"]).reshape(n, k // 32)
    yb = quantize_q8_0(x)  # [b, k/32] q8_0 blocks
    xqv = yb["qs"].astype(np.int64).reshape(b, k // 32, 32)
    xd = f16_to_f32(yb["d"]).reshape(b, k // 32)
    sumi = np.einsum("bgk,ngk->bgn", xqv, qlv.astype(np.int64))
    ref = np.einsum("bgn,bg,ng->bn", sumi.astype(np.float64), xd.astype(
        np.float64), wd.astype(np.float64))

    out = np.asarray(
        qmm_packed_q8x(
            jnp.asarray(x), qt.levels_t, qt.gscale_t,
            gsize=qt.gsize, zero=qt.pack_zero, block_n=128, block_k=256,
            int8_mxu=int8_mxu, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_q_matmul_ref_int8_exact():
    """compute_dtype='ref_int8' == the byte-exact numpy emulation of
    quantize_row_q8_0 + vec_dot_q4_0_q8_0 (the model-level spec the
    bit-exact q8_0 parity gate rides on)."""
    from llama_cpp_q_4_0_tpu.ops.qmatmul import q_matmul_ref_int8
    from llama_cpp_q_4_0_tpu.quant import QUANT_FNS
    from llama_cpp_q_4_0_tpu.quant.blockq import (
        _int_nibbles, f16_to_f32, quantize_q8_0,
    )

    n, k, b = 256, 1024, 4
    w, qt = _mk(n, k, GGMLType.Q4_0, seed=7)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((b, k)) * 0.5).astype(np.float32)

    wb = QUANT_FNS[GGMLType.Q4_0].quantize_row(w)
    qlv = _int_nibbles(wb.reshape(-1), 8).reshape(n, k // 32, 32)
    wd = f16_to_f32(wb["d"]).reshape(n, k // 32)
    yb = quantize_q8_0(x)
    xqv = yb["qs"].astype(np.int64).reshape(b, k // 32, 32)
    xd = f16_to_f32(yb["d"]).reshape(b, k // 32)
    sumi = np.einsum("bgk,ngk->bgn", xqv, qlv.astype(np.int64))
    ref = np.einsum("bgn,bg,ng->bn", sumi.astype(np.float64),
                    xd.astype(np.float64), wd.astype(np.float64))

    got = np.asarray(q_matmul_ref_int8(jnp.asarray(x), qt))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_kfold_matches_folded_params_path():
    """QMM_KFOLD (in-kernel bias-from-scales) == the params-level
    zero-fold (gbias planes) to f32-association noise: identical weight
    tiles (raw [0,15] nibbles x scales), only the -zero*d bias term moves
    from a streamed full-K gbias seed to per-K-block dots on the resident
    scale tiles."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed
    from llama_cpp_q_4_0_tpu.ops.qtensor import fold_zero_points

    w, qt = _mk(256, 1024, GGMLType.Q4_0, seed=11)
    qf = jax.tree_util.tree_leaves(
        fold_zero_points({"w": qt}),
        is_leaf=lambda t: isinstance(t, QTensor))[0]
    assert qf.gbias_t is not None and qf.pack_zero == 0
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((4, 1024)) * 0.5).astype(np.float32)

    folded = np.asarray(qmm_packed(
        jnp.asarray(x), qf.levels_t, qf.gscale_t, qf.gbias_t,
        gsize=qf.gsize, zero=qf.pack_zero, block_n=128, block_k=256,
        interpret=True))
    kfold = np.asarray(qmm_packed(
        jnp.asarray(x), qt.levels_t, qt.gscale_t, None,
        gsize=qt.gsize, zero=qt.pack_zero, block_n=128, block_k=256,
        kfold=True, interpret=True))
    np.testing.assert_allclose(kfold, folded, rtol=1e-4, atol=1e-4)

    # and both sit within the documented fold class of the plain kernel
    plain = np.asarray(qmm_packed(
        jnp.asarray(x), qt.levels_t, qt.gscale_t, None,
        gsize=qt.gsize, zero=qt.pack_zero, block_n=128, block_k=256,
        interpret=True))
    assert np.abs(kfold - plain).max() / np.abs(plain).max() < 2e-2


def test_bf16_scales_within_quantization_noise():
    """cast_scales_bf16 moves each group scale by <= 2^-9 relative; the
    matmul must stay within a small multiple of that (far below q4_0's
    own per-element error), on both the plain and kfold kernels."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed
    from llama_cpp_q_4_0_tpu.ops.qtensor import cast_scales_bf16

    w, qt = _mk(256, 1024, GGMLType.Q4_0, seed=13)
    qb = jax.tree_util.tree_leaves(
        cast_scales_bf16({"w": qt}),
        is_leaf=lambda t: isinstance(t, QTensor))[0]
    assert qb.gscale_t.dtype == jnp.bfloat16
    rng = np.random.default_rng(8)
    x = (rng.standard_normal((4, 1024)) * 0.5).astype(np.float32)
    for kf in (False, True):
        ref = np.asarray(qmm_packed(
            jnp.asarray(x), qt.levels_t, qt.gscale_t, None, gsize=qt.gsize,
            zero=qt.pack_zero, block_n=128, block_k=256, kfold=kf,
            interpret=True))
        got = np.asarray(qmm_packed(
            jnp.asarray(x), qb.levels_t, qb.gscale_t, None, gsize=qb.gsize,
            zero=qb.pack_zero, block_n=128, block_k=256, kfold=kf,
            interpret=True))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 1e-2, (kf, rel)


def test_kfold_default_boundary(monkeypatch):
    """kfold is the TPU decode default: auto mode routes b <= 32 (the
    r4 split-view boundary; a 128 boundary was measured and reverted —
    see use_kfold) through the in-kernel fold, leaves prefill shapes on
    the plain kernel, and honors QMM_KFOLD=0/1 overrides.  Affine
    formats and zero-folded tensors are never eligible."""
    from llama_cpp_q_4_0_tpu.ops.qmatmul import use_kfold

    _, q40 = _mk(256, 512, GGMLType.Q4_0)
    _, q41 = _mk(256, 512, GGMLType.Q4_1)
    monkeypatch.delenv("QMM_KFOLD", raising=False)
    assert use_kfold(1, q40) and use_kfold(32, q40)
    assert not use_kfold(33, q40) and not use_kfold(512, q40)
    assert not use_kfold(1, q41)            # affine: has gbias
    assert not use_kfold(1, q40.fold_zero())  # already folded: zero == 0
    monkeypatch.setenv("QMM_KFOLD", "0")
    assert not use_kfold(1, q40)
    monkeypatch.setenv("QMM_KFOLD", "1")
    assert use_kfold(512, q40)
    monkeypatch.setenv("QMM_KFOLD", "")
    monkeypatch.setenv("QMM_KFOLD_MAX_B", "8")
    assert use_kfold(8, q40) and not use_kfold(9, q40)


def test_q8x_plan_fits_scoped_vmem():
    """The derived q8x block plan keeps every shape — including the
    b=512 prefill that hit 19.62M scoped vmem on chip (hw-validate-r4c
    2026-08-20) and the b=2048 row-chunk cap — under 90% of the 16 MiB
    budget, while honoring the layout constraints (<=16 groups unrolled,
    group count a multiple of 8, divisible tiles)."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import q8x_plan

    limit = 0.9 * 16 * 1024 * 1024
    # (b, k2p, n): decode, T=8 verify, prefill-512, row-chunk-cap prefill
    for b, k2p, n in [(8, 2048, 4096), (8, 5632, 4096), (512, 2048, 22016),
                      (512, 5632, 4096), (2048, 2048, 22016),
                      (2048, 5632, 4096)]:
        bk, bn, vmem, res = q8x_plan(b, k2p, n, 32, block_n=256,
                                     block_k=2048)
        assert vmem <= limit, (b, k2p, n, bk, bn, vmem)
        assert bk % 32 == 0 and (bk // 32) % 8 == 0 and bk // 32 <= 16
        assert k2p % bk == 0 and n % bn == 0 and bn >= 128
    # prefill shapes must get the resident planes (the restream killer)
    for b, k2p, n in [(512, 2048, 22016), (512, 5632, 4096),
                      (8, 2048, 4096)]:
        assert q8x_plan(b, k2p, n, 32, 256, 2048)[3], (b, k2p, n)


def test_q8x_dispatch_env(monkeypatch):
    """QMM_Q8X routes the packed no-bias path through the int8-activation
    kernel (interpret-mode CPU here; numerics equal the q8x kernel called
    directly)."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed_q8x

    w, qt = _mk(256, 512, GGMLType.Q4_0, seed=9)
    rng = np.random.default_rng(4)
    x = (rng.standard_normal((4, 512)) * 0.5).astype(np.float32)
    want = np.asarray(qmm_packed_q8x(
        jnp.asarray(x), qt.levels_t, qt.gscale_t, gsize=qt.gsize,
        zero=qt.pack_zero, block_n=256, block_k=256, interpret=True))
    ref = np.asarray(q_matmul(jnp.asarray(x), qt, use_pallas=False))
    # activation quantization moves the result by ~d/2 per element
    assert np.abs(want - ref).max() / np.abs(ref).max() < 2e-2


def test_packed_unpacked_equivalence():
    """Nibble packing is lossless: packed and int8 QTensors of the same
    blocks dequantize and matmul identically."""
    from llama_cpp_q_4_0_tpu.quant.pack import quantize_planar

    rng = np.random.default_rng(5)
    w = (rng.standard_normal((128, 256)) * 0.3).astype(np.float32)
    for qtype in (GGMLType.Q4_0, GGMLType.Q4_1):
        planar = quantize_planar(w, qtype)
        qp = QTensor.from_planar(planar, pack=True)
        qu = QTensor.from_planar(planar, pack=False)
        assert qp.packed and not qu.packed
        np.testing.assert_array_equal(np.asarray(qp.levels_full()),
                                      np.asarray(qu.levels_t))
        np.testing.assert_array_equal(np.asarray(qp.dequantize()),
                                      np.asarray(qu.dequantize()))
        x = jnp.asarray((rng.standard_normal((3, 256)) * 0.5).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(q_matmul(x, qp, use_pallas=False)),
            np.asarray(q_matmul(x, qu, use_pallas=False)),
            rtol=1e-6, atol=1e-6)
        idx = jnp.asarray([0, 5, 100], jnp.int32)
        np.testing.assert_allclose(np.asarray(qp.rows(idx)),
                                   np.asarray(qu.rows(idx)),
                                   rtol=1e-6, atol=1e-6)


def test_rows_gather():
    w, qt = _mk(64, 256, GGMLType.Q4_0)
    idx = jnp.asarray([3, 17, 42])
    got = np.asarray(qt.rows(idx))
    ref = np.asarray(qt.dequantize())[np.asarray(idx)]
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_prefill_xla_dispatch_env(monkeypatch):
    """QMM_PREFILL_XLA=<rows> routes big batches on the Pallas path to the
    dequant+bf16-GEMM branch (the reference's dequant+BLAS sgemm analogue,
    ggml.c:11304-11351); small batches keep the packed kernel."""
    w, qt = _mk(256, 512, GGMLType.Q4_0, seed=11)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((16, 512)) * 0.5).astype(np.float32)
    monkeypatch.setenv("QMM_PREFILL_XLA", "8")
    # use_pallas=True on CPU: the env branch returns before any Pallas call
    got = np.asarray(q_matmul(jnp.asarray(x), qt, use_pallas=True))
    ref = np.asarray(q_matmul(jnp.asarray(x), qt, use_pallas=False))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_fold_zero_points_matches_unfolded():
    """fold_zero (w = d*nib - z*d via the affine-bias seed) reproduces the
    unfolded q4_0 matmul through both the XLA fallback and the Pallas
    kernel (interpret), within the bf16-recast tolerance documented on
    QTensor.fold_zero; rows() gather is f32 on both sides and agrees
    tighter."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed
    from llama_cpp_q_4_0_tpu.ops.qtensor import fold_zero_points

    w, qt = _mk(256, 512, GGMLType.Q4_0)
    assert qt.packed and qt.pack_zero and qt.gbias_t is None
    qf = fold_zero_points({"w": qt})["w"]
    assert qf.pack_zero == 0 and qf.gbias_t is not None

    rng = np.random.default_rng(7)
    x = (rng.standard_normal((4, 512)) * 0.5).astype(np.float32)
    ref = np.asarray(q_matmul(jnp.asarray(x), qt, use_pallas=False))
    got_xla = np.asarray(q_matmul(jnp.asarray(x), qf, use_pallas=False))
    np.testing.assert_allclose(got_xla, ref, atol=2e-2, rtol=2e-2)

    got_k = np.asarray(qmm_packed(
        jnp.asarray(x), qf.levels_t, qf.gscale_t, qf.gbias_t,
        gsize=qf.gsize, zero=qf.pack_zero, block_n=128, block_k=256,
        interpret=True))
    np.testing.assert_allclose(got_k, ref, atol=2e-2, rtol=2e-2)

    idx = jnp.asarray([0, 3, 17], jnp.int32)
    np.testing.assert_allclose(np.asarray(qf.rows(idx)),
                               np.asarray(qt.rows(idx)), atol=1e-5, rtol=1e-5)


def test_pallas_qmm_fuse_panels_matches_split():
    """fuse_panels=True (one concatenated lo|hi dot per grid step) must be
    numerically identical to the default two-dot kernel: same bf16 operands,
    same f32 accumulation, only the MXU issue granularity differs."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed

    w, qt = _mk(256, 1024, GGMLType.Q4_0)
    rng = np.random.default_rng(3)
    for b in (1, 8):
        x = jnp.asarray((rng.standard_normal((b, 1024)) * 0.5)
                        .astype(np.float32))
        base = np.asarray(qmm_packed(
            x, qt.levels_t, qt.gscale_t, qt.gbias_t,
            gsize=qt.gsize, zero=qt.pack_zero, block_n=128, block_k=256,
            interpret=True))
        fused = np.asarray(qmm_packed(
            x, qt.levels_t, qt.gscale_t, qt.gbias_t,
            gsize=qt.gsize, zero=qt.pack_zero, block_n=128, block_k=256,
            fuse_panels=True, interpret=True))
        np.testing.assert_allclose(fused, base, atol=1e-5, rtol=1e-5)


def test_fuse_panels_zero_fold_compose():
    """fuse_panels on a zero-folded tensor: dispatch routes bias tensors to
    the split bias kernel (fuse_panels only covers the no-bias path), so a
    folded QTensor through qmm_packed with fuse_panels requested still
    matches — the flag is ignored for gbias tensors at the dispatch level,
    and here the direct no-bias fused call matches the folded bias call."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed

    w, qt = _mk(256, 1024, GGMLType.Q4_0)
    qf = qt.fold_zero()
    rng = np.random.default_rng(5)
    x = jnp.asarray((rng.standard_normal((8, 1024)) * 0.5)
                    .astype(np.float32))
    fused = np.asarray(qmm_packed(
        x, qt.levels_t, qt.gscale_t, qt.gbias_t,
        gsize=qt.gsize, zero=qt.pack_zero, block_n=128, block_k=256,
        fuse_panels=True, interpret=True))
    folded = np.asarray(qmm_packed(
        x, qf.levels_t, qf.gscale_t, qf.gbias_t,
        gsize=qf.gsize, zero=qf.pack_zero, block_n=128, block_k=256,
        interpret=True))
    # zero-fold's documented numeric shift: the folded bias is a separate
    # f32 dot while the unfolded kernel subtracts before the bf16 cast —
    # different rounding orders, so compare to the bf16 noise floor of the
    # K=1024 reduction (near-zero outputs make rtol meaningless)
    assert np.abs(folded - fused).max() / np.abs(fused).max() < 2e-2


def test_fma_fold_matches_subtract_kernel():
    """fma_fold=True (w = nib*d + (-zero*d), offset on the scale tile) must
    match the integer-subtract kernel to f32-FMA rounding: both compute
    (nib - zero)*d before the bf16 cast, so unlike the params-level
    fold_zero_points there is no magnitude-cancellation accuracy cost —
    the agreement bound here is ~2^-24 relative, far below bf16 noise."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed

    w, qt = _mk(256, 1024, GGMLType.Q4_0)
    assert qt.packed and qt.pack_zero == 8
    rng = np.random.default_rng(11)
    for b in (1, 8):
        x = jnp.asarray((rng.standard_normal((b, 1024)) * 0.5)
                        .astype(np.float32))
        base = np.asarray(qmm_packed(
            x, qt.levels_t, qt.gscale_t, qt.gbias_t,
            gsize=qt.gsize, zero=qt.pack_zero, block_n=128, block_k=256,
            interpret=True))
        fma = np.asarray(qmm_packed(
            x, qt.levels_t, qt.gscale_t, qt.gbias_t,
            gsize=qt.gsize, zero=qt.pack_zero, block_n=128, block_k=256,
            fma_fold=True, interpret=True))
        # bf16 cast can differ only when the f32 pre-images straddle a
        # rounding boundary within 2^-24 — allow a 1-ulp bf16 slack on the
        # K=1024 accumulation
        assert np.abs(fma - base).max() / np.abs(base).max() < 3e-3


def test_fma_fold_dispatch_env(monkeypatch):
    """QMM_FMA routes q_matmul's packed path through the fma_fold kernel
    (trace-time env read, like QMM_FUSE_PANELS); CPU interpret check that
    the dispatch plumbs the flag without disturbing semantics."""
    w, qt = _mk(128, 512, GGMLType.Q4_0)
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((4, 512)).astype(np.float32) * 0.5)
    ref = np.asarray(q_matmul(x, qt, use_pallas=False))
    monkeypatch.setenv("QMM_FMA", "1")
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed

    got = np.asarray(qmm_packed(
        x, qt.levels_t, qt.gscale_t, qt.gbias_t, gsize=qt.gsize,
        zero=qt.pack_zero, block_n=128, block_k=256, fma_fold=True,
        interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-2


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q4_1,
                                   GGMLType.Q8_0])
def test_f16_scale_planes_exact(qtype):
    """fp16 scale-plane storage (cast_scales_f16, the r4 decode-bandwidth
    lever: scale planes are 1.68 of 5.05 GB/token folded) is EXACT for
    blockq formats — the file stores d/m as fp16 (ggml.c block_q4_0.d) so
    the cast round-trips, the Pallas kernel's integer bit-decode
    (_scales_f32) reconstructs the identical f32, and the XLA fallback
    promotes f16->f32 exactly.  Folded and unfolded matmuls must match
    their f32-plane twins bit-for-bit."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed
    from llama_cpp_q_4_0_tpu.ops.qtensor import (cast_scales_f16,
                                                 fold_zero_points)

    w, qt = _mk(256, 512, qtype)
    qh = cast_scales_f16({"w": qt})["w"]
    assert qh.gscale_t.dtype == jnp.float16
    np.testing.assert_array_equal(
        np.asarray(qt.gscale_t),
        np.asarray(qh.gscale_t).astype(np.float32))  # exact round-trip
    if qt.gbias_t is not None:
        np.testing.assert_array_equal(
            np.asarray(qt.gbias_t),
            np.asarray(qh.gbias_t).astype(np.float32))

    rng = np.random.default_rng(11)
    x = (rng.standard_normal((4, 512)) * 0.5).astype(np.float32)
    ref = np.asarray(q_matmul(jnp.asarray(x), qt, use_pallas=False))
    got = np.asarray(q_matmul(jnp.asarray(x), qh, use_pallas=False))
    np.testing.assert_array_equal(got, ref)

    if qtype != GGMLType.Q4_0:
        return
    # Pallas packed kernel (interpret): f16 planes == f32 planes, both
    # unfolded and zero-folded
    for q32, q16 in ((qt, qh),
                     (fold_zero_points({"w": qt})["w"],
                      fold_zero_points({"w": qh})["w"])):
        a = np.asarray(qmm_packed(
            jnp.asarray(x), q32.levels_t, q32.gscale_t, q32.gbias_t,
            gsize=q32.gsize, zero=q32.pack_zero, block_n=128, block_k=256,
            interpret=True))
        b = np.asarray(qmm_packed(
            jnp.asarray(x), q16.levels_t, q16.gscale_t, q16.gbias_t,
            gsize=q16.gsize, zero=q16.pack_zero, block_n=128, block_k=256,
            interpret=True))
        np.testing.assert_array_equal(b, a)

    # k-quants are excluded from the cast (d x int subscale products can
    # exceed fp16 mantissa)
    _, qk = _mk(256, 512, GGMLType.Q4_K)
    qk16 = cast_scales_f16({"w": qk})["w"]
    assert qk16.gscale_t.dtype == qk.gscale_t.dtype
