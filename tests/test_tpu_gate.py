"""Hardware gate (`LLAMA_TPU_TESTS=1 python -m pytest tests/ -m tpu -q`).

Pallas interpret mode does NOT catch Mosaic lowering bugs — two real
round-1 regressions (lane-axis reshape, under-aligned scale tiles) only
surfaced on the chip.  This module is the driver-runnable on-chip gate the
round-1 verdict asked for (VERDICT #5): qmm kernel numerics against the
XLA fallback for EVERY quant format, all five architecture decodes through
the full stack, one device-resident speculative tick, and the fused
attention / int8-activation kernels.

Run it STRICTLY ALONE (one python process at a time on the tunnel) and
expect the first run to spend minutes compiling.
"""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

ALL_QTYPES = None  # populated lazily (imports touch jax)


def _qtypes():
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType

    return (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
            GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
            GGMLType.Q5_K, GGMLType.Q6_K)


@pytest.fixture(scope="module", autouse=True)
def _cache():
    from llama_cpp_q_4_0_tpu.utils.compile_cache import enable

    enable()


@pytest.mark.parametrize("qt", [q for q in range(10)])
def test_qmm_formats_on_chip(qt):
    """Fused Pallas kernel == XLA dequant+dot fallback ON THE CHIP, every
    format, vector (b=1) and small-batch (b=8) shapes."""
    from llama_cpp_q_4_0_tpu.ops import QTensor, q_matmul

    qtype = _qtypes()[qt]
    rng = np.random.default_rng(qt)
    w = (rng.standard_normal((512, 512)) * 0.1).astype(np.float32)
    q = QTensor.quantize(w, qtype)
    deq = np.asarray(q.dequantize())
    for b in (1, 8):
        x = (rng.standard_normal((b, 512)) * 0.5).astype(np.float32)
        want = np.asarray(q_matmul(jnp.asarray(x), q, use_pallas=False,
                                   compute_dtype=jnp.float32))
        got = np.asarray(q_matmul(jnp.asarray(x), q, use_pallas=True))
        # pallas accumulates bf16 MXU products in f32; the fallback runs
        # f32*f32 — bound the difference by the bf16 mantissa on the
        # dequantized magnitudes
        scale = np.abs(deq).max() * np.abs(x).max() * 512
        assert np.abs(got - want).max() < 2e-2 * scale, qtype


def _make_ctx(arch, d):
    from llama_cpp_q_4_0_tpu.formats import fixtures
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (config_from_ggjt,
                                                    load_rwkv,
                                                    load_transformer)
    from llama_cpp_q_4_0_tpu.runtime.context import Context, RwkvContext

    makers = {
        "llama": (fixtures.make_llama_ggjt, {"n_head": 4}),
        "gptneox": (fixtures.make_gptneox_ggjt, {"n_head": 4}),
        "falcon": (fixtures.make_falcon_like_ggjt,
                   {"arch": "falcon", "n_head": 4}),
        "bonsai": (fixtures.make_falcon_like_ggjt,
                   {"arch": "bonsai", "n_head": 4}),
        "rwkv": (fixtures.make_rwkv_ggjt, {}),
    }
    mk, kw = makers[arch]
    p = os.path.join(d, f"{arch}.bin")
    mk(p, n_vocab=256, n_embd=64, n_layer=2, **kw)
    gf = read_ggjt(p, arch)
    cfg = config_from_ggjt(gf, n_ctx=64)
    if arch == "rwkv":
        return RwkvContext(cfg, load_rwkv(gf, cfg))
    return Context(cfg, load_transformer(gf, cfg), n_ctx=64)


@pytest.mark.parametrize("arch", ["llama", "gptneox", "falcon", "bonsai",
                                  "rwkv"])
def test_arch_decode_on_chip(arch):
    """Full stack (fixture file -> loader -> Context -> greedy decode) on
    the chip: finite logits and run-to-run deterministic tokens."""
    def run():
        with tempfile.TemporaryDirectory() as d:
            ctx = _make_ctx(arch, d)
            logits = ctx.eval(np.asarray([[3, 9, 27]], np.int32))
            toks = []
            for _ in range(4):
                t = int(np.argmax(logits[0, -1]))
                toks.append(t)
                logits = ctx.eval(np.asarray([[t]], np.int32))
            assert np.isfinite(logits).all(), arch
            return toks

    assert run() == run(), arch


@pytest.mark.parametrize("qtname", ["Q4_K", "Q5_0", "Q8_0", "Q2_K", "Q6_K"])
def test_kquant_model_on_chip(qtname):
    from llama_cpp_q_4_0_tpu.formats import fixtures
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (config_from_ggjt,
                                                    load_transformer)
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.bin")
        fixtures.make_llama_ggjt(p, n_vocab=256, n_embd=256, n_mult=256,
                                 n_head=4, n_layer=2,
                                 qtype=getattr(GGMLType, qtname))
        gf = read_ggjt(p, "llama")
        cfg = config_from_ggjt(gf, n_ctx=64)
        ctx = Context(cfg, load_transformer(gf, cfg), n_ctx=64)
        logits = ctx.eval(np.asarray([[3, 9, 27, 6]], np.int32))
        assert np.isfinite(logits).all()


@pytest.mark.parametrize("qtname", ["Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K"])
def test_qkk64_model_on_chip(qtname):
    """GGML_QKK_64 variant on chip: a 64-but-not-256-divisible model
    (n_embd=192) loads via qk_k auto-detection and its on-chip f32 logits
    match an on-chip forward over the explicitly dequantized dense weights
    — finite-but-wrong lowering of the 64-variant planar layouts fails
    this, not just NaNs."""
    import dataclasses

    from llama_cpp_q_4_0_tpu.formats import fixtures
    from llama_cpp_q_4_0_tpu.formats.ggjt import GGJTWriter, read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (config_from_ggjt,
                                                    load_transformer)
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m64.bin")
        fixtures.make_llama_ggjt(p, n_vocab=256, n_embd=192, n_mult=192,
                                 n_head=3, n_layer=2,
                                 qtype=getattr(GGMLType, qtname), qk_k=64)
        gf = read_ggjt(p, "llama")
        assert gf.qk_k == 64
        cfg = dataclasses.replace(config_from_ggjt(gf, n_ctx=64),
                                  compute_dtype="float32")
        toks = np.asarray([[3, 9, 27, 6]], np.int32)
        ctx = Context(cfg, load_transformer(gf, cfg), n_ctx=64,
                      cache_dtype=jnp.float32)
        logits = np.asarray(ctx.eval(toks))
        assert np.isfinite(logits).all()

        dense = os.path.join(d, "dense.bin")
        with GGJTWriter(dense, "llama", gf.hparams, 0, gf.vocab) as w:
            for name, t in gf.tensors.items():
                w.write_tensor(name, GGMLType.F32, t.ne,
                               np.ascontiguousarray(
                                   gf.tensor_f32(name), np.float32).tobytes())
        gfd = read_ggjt(dense, "llama")
        ctx_d = Context(cfg, load_transformer(gfd, cfg), n_ctx=64,
                        cache_dtype=jnp.float32)
        want = np.asarray(ctx_d.eval(toks))
        np.testing.assert_allclose(logits, want, rtol=2e-3, atol=2e-3)


def test_spec_chunk_tick_on_chip():
    """One device-resident speculative tick: greedy output token-identical
    to the plain generate loop (the round-1 exactness contract, on chip)."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
    from llama_cpp_q_4_0_tpu.runtime.device_spec import generate_ondevice_spec
    from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate
    from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams
    from llama_cpp_q_4_0_tpu.runtime.speculative import SpecParams

    greedy = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                            repeat_last_n=0)
    with tempfile.TemporaryDirectory() as d:
        ctx = _make_ctx("llama", d)
        prompt = [3, 9, 27, 3, 9, 27, 3, 9]
        want = list(generate(ctx, prompt, GenerateParams(
            n_predict=8, sampling=greedy, ignore_eos=True), eos_token=-1))
        ctx.reset()
        got = generate_ondevice_spec(
            ctx, prompt, 8, sampling=DeviceSampling(temp=-1.0),
            spec=SpecParams(n_draft=3), n_steps=2, ignore_eos=True)
        assert got == want, (want, got)


def test_rwkv_parallel_prefill_on_chip():
    """Associative-scan prefill == sequential token scan ON CHIP (the
    tropical-max / linear-recurrence scans have no interpret-mode
    equivalent risk, but their XLA-TPU lowering does)."""
    import dataclasses

    from llama_cpp_q_4_0_tpu.formats import fixtures
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models import rwkv as rwkv_mod
    from llama_cpp_q_4_0_tpu.models.loading import (config_from_ggjt,
                                                    load_rwkv)

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "r.bin")
        fixtures.make_rwkv_ggjt(p, n_vocab=256, n_embd=64, n_layer=2)
        gf = read_ggjt(p, "rwkv")
        cfg = config_from_ggjt(gf)
        params = load_rwkv(gf, cfg)
        toks = jnp.asarray([[3, 9, 27, 6, 101, 7, 55, 2, 19, 19, 4, 88]],
                           jnp.int32)
        seq_l, seq_st = rwkv_mod.forward(cfg, params, toks,
                                         rwkv_mod.init_state(cfg, 1),
                                         parallel=False)
        par_l, par_st = rwkv_mod.forward(cfg, params, toks,
                                         rwkv_mod.init_state(cfg, 1),
                                         parallel=True)
        # measured on v5e (scripts/debug-rwkv-prefill.py, 2026-08-18): the
        # two paths diverge DIFFUSELY by <=3.5e-3 logits / 4.4e-3 state —
        # bf16-MXU rounding amplified by the documented scan reassociation
        # (_layer_parallel docstring).  exp(-1e30) sentinel handling and the
        # associative-scan lowerings were verified exact on chip (H1/H2), so
        # a REAL lowering bug would show as O(1) localized garbage; 1e-2
        # passes the physical noise while still catching that.
        np.testing.assert_allclose(np.asarray(par_l), np.asarray(seq_l),
                                   rtol=1e-2, atol=1e-2)
        for k in seq_st:
            np.testing.assert_allclose(np.asarray(par_st[k]),
                                       np.asarray(seq_st[k]),
                                       rtol=1e-2, atol=1e-2, err_msg=k)


def test_rwkv_spec_tick_on_chip():
    """RWKV device-resident speculative tick: greedy token parity with the
    plain decode loop on chip (state-gather rollback included)."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
    from llama_cpp_q_4_0_tpu.runtime.device_spec import (
        generate_ondevice_spec_rwkv,
    )
    from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate
    from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams
    from llama_cpp_q_4_0_tpu.runtime.speculative import SpecParams

    greedy = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                            repeat_last_n=0)
    with tempfile.TemporaryDirectory() as d:
        ctx = _make_ctx("rwkv", d)
        prompt = [3, 9, 27, 3, 9, 27, 3, 9]
        want = list(generate(ctx, prompt, GenerateParams(
            n_predict=8, sampling=greedy, ignore_eos=True), eos_token=-1))
        ctx.reset()
        got = generate_ondevice_spec_rwkv(
            ctx, prompt, 8, sampling=DeviceSampling(temp=-1.0),
            spec=SpecParams(n_draft=3), n_steps=2, ignore_eos=True)
        assert got == want, (want, got)


def test_mha_decode_kernel_on_chip(monkeypatch):
    """Fused Pallas decode attention == einsum attention on the chip
    (f32 and scaled-int8 KV).  The einsum REFERENCE side pins the exact
    f32 chain (ATTN_MXU=0): the r5 storage-dtype MXU default would add
    bf16-input rounding to the reference for the int8-KV cases."""
    monkeypatch.setenv("ATTN_MXU", "0")
    from llama_cpp_q_4_0_tpu.ops.kvcache import QuantKV, quantize_kv
    from llama_cpp_q_4_0_tpu.ops.layers import attention
    from llama_cpp_q_4_0_tpu.ops.pallas.attention import mha_decode

    rng = np.random.default_rng(0)
    b, t, s, h, d = 2, 1, 512, 8, 128
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    pos = jnp.full((b, t), 100, jnp.int32)
    mask = jnp.asarray(np.arange(s)[None] < 101) & jnp.ones((b, 1), bool)

    want = np.asarray(attention(q, k, v, pos, mask, 0.088))
    got = np.asarray(mha_decode(q, k, None, v, None, pos, mask, 0.088))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    want = np.asarray(attention(q, QuantKV(kq, ks), QuantKV(vq, vs), pos,
                                mask, 0.088))
    got = np.asarray(mha_decode(q, kq, ks, vq, vs, pos, mask, 0.088))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mha_decode_grouped_on_chip(monkeypatch):
    """MQA/GQA + speculative-verify shapes in the fused kernel on chip:
    grouped MXU contraction (rep > 1), t up to 16, f32 + int8 KV.
    Reference side pinned exact (see test_mha_decode_kernel_on_chip)."""
    monkeypatch.setenv("ATTN_MXU", "0")
    from llama_cpp_q_4_0_tpu.ops.kvcache import QuantKV, quantize_kv
    from llama_cpp_q_4_0_tpu.ops.layers import attention
    from llama_cpp_q_4_0_tpu.ops.pallas.attention import mha_decode

    for (g, t, quant, seed) in [(1, 1, False, 0), (1, 8, True, 1),
                                (2, 16, False, 2), (8, 16, True, 3)]:
        rng = np.random.default_rng(seed)
        b, s, h, d = 2, 512, 8, 128
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, s, g, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, s, g, d)), jnp.float32)
        pos = jnp.broadcast_to(100 + jnp.arange(t), (b, t)).astype(jnp.int32)
        mask = jnp.asarray(np.arange(s)[None] < 100 + t) & jnp.ones((b, 1), bool)
        if quant:
            kq, ksc = quantize_kv(k)
            vq, vsc = quantize_kv(v)
            want = np.asarray(attention(q, QuantKV(kq, ksc), QuantKV(vq, vsc),
                                        pos, mask, 0.088))
            got = np.asarray(mha_decode(q, kq, ksc, vq, vsc, pos, mask, 0.088))
        else:
            want = np.asarray(attention(q, k, v, pos, mask, 0.088))
            got = np.asarray(mha_decode(q, k, None, v, None, pos, mask, 0.088))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=f"g={g} t={t} quant={quant}")


def test_flash_prefill_on_chip(monkeypatch, tmp_path):
    """JAX's shipped TPU flash kernel through the prefill attention_fn
    hook == the einsum path, end-to-end through Context (head_dim 128)."""
    from llama_cpp_q_4_0_tpu.formats import fixtures
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (config_from_ggjt,
                                                    load_transformer)
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    p = os.path.join(str(tmp_path), "m.bin")
    fixtures.make_llama_ggjt(p, n_vocab=256, n_embd=512, n_mult=256,
                             n_head=4, n_layer=2)
    gf = read_ggjt(p, "llama")
    cfg = config_from_ggjt(gf, n_ctx=256)
    params = load_transformer(gf, cfg)
    prompt = np.asarray([list(range(2, 130))], np.int32)  # T=128

    monkeypatch.setenv("FLASH_PREFILL", "0")  # einsum reference path
    want = Context(cfg, params, n_ctx=256).eval(prompt, logits_all=True)
    monkeypatch.setenv("FLASH_PREFILL", "1")
    got = Context(cfg, params, n_ctx=256).eval(prompt, logits_all=True)
    scale = np.abs(want).max()
    # measured 3.3e-3 on chip (2026-08-19 r3 gate): the flash kernel's bf16
    # MXU matmuls + blockwise online-softmax reassociation vs the einsum
    # path — diffuse, same class as the RWKV scan delta (NOTES r2); 1e-2
    # bounds it while still catching real lowering bugs (those are >1e-1)
    assert np.abs(got - want).max() / scale < 1e-2


def test_qmm_q8x_kernel_on_chip():
    """int8-activation MXU kernel == reference q8_0-dot semantics on chip
    (both int8 and bf16 MXU modes)."""
    from llama_cpp_q_4_0_tpu.ops import QTensor, q_matmul
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed_q8x
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType

    rng = np.random.default_rng(0)
    w = (rng.standard_normal((1024, 1024)) * 0.1).astype(np.float32)
    q = QTensor.quantize(w, GGMLType.Q4_0)
    x = (rng.standard_normal((8, 1024)) * 0.5).astype(np.float32)
    ref = np.asarray(q_matmul(jnp.asarray(x), q, use_pallas=False,
                              compute_dtype=jnp.float32))
    for mode in (True, False):
        got = np.asarray(qmm_packed_q8x(
            jnp.asarray(x), q.levels_t, q.gscale_t, gsize=q.gsize,
            zero=q.pack_zero, block_n=256, block_k=512, int8_mxu=mode))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 2e-2, (mode, rel)


def test_zero_fold_matches_on_chip(monkeypatch, tmp_path):
    """QMM_ZERO_FOLD (mask/shift-only q4_0 unpack via the affine-bias
    seed) end-to-end through Context.

    Tolerance is the MEASURED chip drift, 3.1e-2 (2026-08-19 gate run):
    folding +8 into the bias seed makes the bf16 weight products
    unsigned-[0,15]-sized — ~2x the magnitude of the (q-8) products — and
    the -8d*sum(x) seed then cancels that back down, amplifying bf16 MXU
    rounding ~2x vs the unfolded kernel.  (r4: ab-decode measured the fold
    at −4.8% decode and it became the TPU default — QMM_ZERO_FOLD=0 is now
    the explicit opt-out this test uses for its unfolded reference.  The
    in-kernel fma_fold variant avoids this drift entirely; see
    test_qmm_fma_fold_on_chip.)"""
    from llama_cpp_q_4_0_tpu.formats import fixtures
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (config_from_ggjt,
                                                    load_transformer)
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    p = os.path.join(str(tmp_path), "m.bin")
    fixtures.make_llama_ggjt(p, n_vocab=256, n_embd=512, n_mult=256,
                             n_head=4, n_layer=2)
    gf = read_ggjt(p, "llama")
    cfg = config_from_ggjt(gf, n_ctx=128)
    params = load_transformer(gf, cfg)
    prompt = np.asarray([[2, 9, 23, 41]], np.int32)

    monkeypatch.setenv("QMM_ZERO_FOLD", "0")  # default folds on TPU now
    want = Context(cfg, params, n_ctx=128).eval(prompt)
    monkeypatch.setenv("QMM_ZERO_FOLD", "1")
    got = Context(cfg, params, n_ctx=128).eval(prompt)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 5e-2


def test_qmm_kfold_on_chip():
    """kfold kernel (in-kernel bias-from-scales, NO gbias stream) vs the
    params-level zero-fold ON CHIP: identical raw-nibble weight tiles, so
    the agreement bound is the f32 association of the bias term (per-K-
    block dots vs one full-K seed) — far tighter than either path's
    3.1e-2 drift vs unfolded."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed
    from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType

    rng = np.random.default_rng(43)
    w = (rng.standard_normal((512, 4096)) * 0.1).astype(np.float32)
    q = QTensor.quantize(w, GGMLType.Q4_0)
    qf = q.fold_zero()
    assert q.pack_zero == 8 and qf.pack_zero == 0 and qf.gbias_t is not None
    for b in (1, 8, 512):
        x = jnp.asarray((rng.standard_normal((b, 4096)) * 0.5)
                        .astype(np.float32))
        folded = np.asarray(qmm_packed(
            x, qf.levels_t, qf.gscale_t, qf.gbias_t, gsize=qf.gsize,
            zero=qf.pack_zero, block_n=256, block_k=1024))
        kf = np.asarray(qmm_packed(
            x, q.levels_t, q.gscale_t, None, gsize=q.gsize,
            zero=q.pack_zero, block_n=256, block_k=1024, kfold=True))
        assert np.abs(kf - folded).max() / np.abs(folded).max() < 3e-3, b


def test_qmm_fma_fold_on_chip():
    """fma_fold kernel (w = nib*d + (-zero*d), r4) vs the integer-subtract
    kernel ON CHIP: both round the same (nib-zero)*d value to bf16, so the
    agreement bound is f32-FMA noise on the K reduction — far tighter than
    the 3.1e-2 drift of the params-level zero fold."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed
    from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType

    rng = np.random.default_rng(42)
    w = (rng.standard_normal((512, 4096)) * 0.1).astype(np.float32)
    q = QTensor.quantize(w, GGMLType.Q4_0)
    assert q.packed and q.pack_zero == 8
    for b in (1, 8):
        x = jnp.asarray((rng.standard_normal((b, 4096)) * 0.5)
                        .astype(np.float32))
        base = np.asarray(qmm_packed(
            x, q.levels_t, q.gscale_t, q.gbias_t, gsize=q.gsize,
            zero=q.pack_zero, block_n=256, block_k=1024))
        fma = np.asarray(qmm_packed(
            x, q.levels_t, q.gscale_t, q.gbias_t, gsize=q.gsize,
            zero=q.pack_zero, block_n=256, block_k=1024, fma_fold=True))
        assert np.abs(fma - base).max() / np.abs(base).max() < 3e-3, b
