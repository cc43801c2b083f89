"""GGML_QKK_64 end-to-end: quantize -> file -> load -> forward -> ppl.

tests/test_quantize_oracle.py proves the QK_K=64 quantizers byte-exact
against a ``-DGGML_QKK_64`` reference build; this file gates the rest of
the chain the reference's compile-time variant implies (k_quants.h:10-16):
the quantize tool can WRITE 64-super-block files (for tensors 64- but not
256-divisible), the ggjt reader AUTO-DETECTS which variant wrote a file
(the container has no marker — the reference simply can't cross-load), the
model loader packs the 64-variant blocks to the planar device layout, and
the full perplexity loop matches the QKK_64-compiled reference binary on a
file whose row sizes a QK_K=256 build would reject.
"""

import dataclasses
import os
import subprocess

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.quant.registry import dequantize, quantize
from llama_cpp_q_4_0_tpu.quant.types import GGMLType, type_traits

REF = "/root/reference"
BUILD64 = "/tmp/refbuild_qkk64"
PPL_ORACLE64 = f"{BUILD64}/ref_perplexity_qkk64"

K64_WEIGHT_TYPES = [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                    GGMLType.Q5_K, GGMLType.Q6_K]


# --------------------------------------------------------- planar packing

@pytest.mark.parametrize("qtype", K64_WEIGHT_TYPES, ids=lambda t: t.name)
def test_pack_planar_qkk64_matches_dequant(qtype):
    """PlanarQuant.dequantize (the device layout every matmul consumes) is
    f32-bitwise identical to dequantize_row for every 64-variant format."""
    from llama_cpp_q_4_0_tpu.quant.pack import pack_planar

    rng = np.random.default_rng(7)
    n, k = 4, 192  # 64- but not 256-divisible rows
    w = (rng.standard_normal((n, k)) * 0.3).astype(np.float32)
    blocks = quantize(w, qtype, qk_k=64)
    want = dequantize(blocks, qtype, qk_k=64).reshape(n, k)
    got = pack_planar(blocks, qtype, (n, k), qk_k=64).dequantize()
    np.testing.assert_array_equal(got, want, err_msg=qtype.name)


def test_row_size_bytes_variants():
    """Byte sizes follow the chosen build variant's structs."""
    from llama_cpp_q_4_0_tpu.quant.types import row_size_bytes

    assert row_size_bytes(GGMLType.Q4_K, 256) == 144
    assert row_size_bytes(GGMLType.Q4_K, 256, qk_k=64) == 4 * 38
    assert row_size_bytes(GGMLType.Q4_0, 256, qk_k=64) == 8 * 18  # unchanged
    with pytest.raises(ValueError):
        row_size_bytes(GGMLType.Q4_K, 192)  # needs the 64 variant
    assert row_size_bytes(GGMLType.Q4_K, 192, qk_k=64) == 3 * 38
    assert type_traits(GGMLType.Q6_K, 64).block_size == 64


# ------------------------------------------------- file IO + model loading

def _mk_f32_192(path, seed=9):
    """Tiny llama whose row sizes are 64- but NOT 256-divisible, so k-quants
    require the QKK_64 variant (n_embd=192, n_ff=576)."""
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt

    return make_llama_ggjt(
        path, n_vocab=512, n_embd=192, n_mult=192, n_head=3, n_layer=2,
        qtype=GGMLType.F32, seed=seed)


def test_ggjt_qkk64_autodetect_and_forward(tmp_path):
    """quantize CLI --qkk64 writes a loadable file: the reader detects
    qk_k=64 with no hint, and the loaded QTensor forward equals a forward
    over the explicitly dequantized f32 weights."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.cli import quantize as qcli
    from llama_cpp_q_4_0_tpu.formats.ggjt import GGJTWriter, read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    f32 = str(tmp_path / "f32.ggjt")
    _mk_f32_192(f32)
    q = str(tmp_path / "q4k64.ggjt")
    rc = qcli.run(qcli.build_parser().parse_args([f32, q, "q4_k", "--qkk64"]))
    assert rc == 0

    gf = read_ggjt(q, "llama")  # no qk_k hint
    assert gf.qk_k == 64
    assert gf.tensors["layers.0.attention.wq.weight"].qtype == GGMLType.Q4_K
    # output.weight upgrade rule applies under the 64 divisibility test
    assert gf.tensors["output.weight"].qtype == GGMLType.Q6_K

    n_ctx = 32
    cfg = dataclasses.replace(config_from_ggjt(gf, n_ctx=n_ctx),
                              compute_dtype="float32")
    params_q = load_transformer(gf, cfg)

    # dense twin: dequantize every tensor into an F32 file, load that
    dense = str(tmp_path / "dense.ggjt")
    with GGJTWriter(dense, "llama", gf.hparams, 0, gf.vocab) as w:
        for name, t in gf.tensors.items():
            w.write_tensor(name, GGMLType.F32, t.ne,
                           np.ascontiguousarray(
                               gf.tensor_f32(name), np.float32).tobytes())
    gfd = read_ggjt(dense, "llama")
    params_d = load_transformer(gfd, cfg)

    toks = np.asarray([[1, 5, 42, 7, 100, 9, 250, 3]], np.int32)
    lq = Context(cfg, params_q, n_ctx=n_ctx, cache_dtype=jnp.float32).eval(toks)
    ld = Context(cfg, params_d, n_ctx=n_ctx, cache_dtype=jnp.float32).eval(toks)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(ld),
                               rtol=1e-4, atol=1e-4)


def test_quantize_256_rejects_odd_rows(tmp_path):
    """Without --qkk64 the default build's divisibility rule fires — the
    same error a QK_K=256 reference build raises (k_quants asserts)."""
    from llama_cpp_q_4_0_tpu.formats.quantize import (
        QuantizeParams, quantize_model,
    )
    from llama_cpp_q_4_0_tpu.quant.types import LlamaFType

    f32 = str(tmp_path / "f32.ggjt")
    _mk_f32_192(f32)
    with pytest.raises(ValueError, match="not divisible"):
        quantize_model(f32, str(tmp_path / "q.ggjt"),
                       QuantizeParams(ftype=LlamaFType.MOSTLY_Q4_K_S),
                       arch="llama", progress=lambda *a: None)


# ------------------------------------------------ compiled-reference gate

@pytest.fixture(scope="module")
def ppl_oracle64_bin():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    if not os.path.exists(PPL_ORACLE64):
        os.makedirs(BUILD64, exist_ok=True)
        src = os.path.join(os.path.dirname(__file__), "oracle",
                           "ref_perplexity.cpp")
        flags = ["-O2", "-fPIC", "-pthread", "-DGGML_USE_K_QUANTS",
                 "-DGGML_QKK_64", f"-I{REF}"]
        try:
            for cf in ("ggml.c", "k_quants.c"):
                obj = f"{BUILD64}/{cf.replace('.c', '.o')}"
                if not os.path.exists(obj):
                    subprocess.run(["gcc", *flags, "-c", f"{REF}/{cf}",
                                    "-o", obj], check=True,
                                   capture_output=True, text=True)
            subprocess.run(
                ["g++", "-std=c++11", *flags, src, f"{REF}/llama.cpp",
                 f"{BUILD64}/ggml.o", f"{BUILD64}/k_quants.o",
                 "-o", PPL_ORACLE64],
                check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build QKK_64 ppl oracle: "
                        f"{getattr(e, 'stderr', '')[-500:]}")
    return PPL_ORACLE64


def test_qkk64_ppl_matches_reference(tmp_path, ppl_oracle64_bin):
    """Full-chain quality gate on a 64-only model: our quantize tool writes
    the file, the QKK_64-compiled reference computes its perplexity, and
    our runtime must match it — proving file-format, loader, planar dequant,
    forward, and windowing agree with the reference's -DGGML_QKK_64 build."""
    from test_perplexity_oracle import _our_ppl, _ref_ppl

    from llama_cpp_q_4_0_tpu.cli import quantize as qcli

    f32 = str(tmp_path / "f32.ggjt")
    _mk_f32_192(f32, seed=3)
    q = str(tmp_path / "q4k64.ggjt")
    rc = qcli.run(qcli.build_parser().parse_args([f32, q, "q4_k", "--qkk64"]))
    assert rc == 0

    n_ctx, n_batch = 64, 32
    rng = np.random.default_rng(11)
    tokens = rng.integers(3, 500, 3 * n_ctx).tolist()

    for path in (f32, q):
        ref_nll, ref_count, ref_ppl = _ref_ppl(
            ppl_oracle64_bin, path, n_ctx, n_batch, tokens)
        got = _our_ppl(path, n_ctx, n_batch, tokens)
        assert got.count == ref_count
        rel = abs(got.ppl - ref_ppl) / ref_ppl
        assert rel < 5e-3, f"{path}: ours {got.ppl} vs ref {ref_ppl} " \
                           f"(rel {rel:.4f})"
