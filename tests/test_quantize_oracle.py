"""Bit-exactness oracle: compare our quantizers against the compiled reference.

Builds /root/reference's ggml.c + k_quants.c into a shared library (test-time
only; no reference code enters this repo) and checks that
``ggml_quantize_chunk`` produces byte-identical blocks to our numpy
quantizers, and that round-tripping through the reference's dequantizer
matches ours exactly.  Skipped when the reference tree or a C compiler is
unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.quant import GGMLType, QUANT_FNS, TYPE_TRAITS

REF = "/root/reference"
LIB = "/tmp/refbuild/libggml_ref.so"


@pytest.fixture(scope="module")
def reflib():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    if not os.path.exists(LIB):
        os.makedirs(os.path.dirname(LIB), exist_ok=True)
        try:
            subprocess.run(
                [
                    "gcc", "-O2", "-fPIC", "-shared", "-pthread",
                    "-DGGML_USE_K_QUANTS", f"-I{REF}",
                    f"{REF}/ggml.c", f"{REF}/k_quants.c", "-o", LIB,
                ],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("cannot build reference oracle")
    lib = ctypes.CDLL(LIB)

    class InitParams(ctypes.Structure):
        _fields_ = [
            ("mem_size", ctypes.c_size_t),
            ("mem_buffer", ctypes.c_void_p),
            ("no_alloc", ctypes.c_bool),
        ]

    lib.ggml_init.restype = ctypes.c_void_p
    lib.ggml_init.argtypes = [InitParams]
    ctx = lib.ggml_init(InitParams(16 * 1024 * 1024, None, False))  # builds f16 tables
    assert ctx
    lib.ggml_quantize_chunk.restype = ctypes.c_size_t
    lib.ggml_quantize_chunk.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


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


def ref_quantize(lib, qtype: GGMLType, data: np.ndarray) -> bytes:
    n = data.size
    tr = TYPE_TRAITS[qtype]
    nbytes = n // tr.block_size * tr.type_size
    dst = ctypes.create_string_buffer(nbytes + 256)
    hist = (ctypes.c_int64 * 16)()
    src = np.ascontiguousarray(data, dtype=np.float32)
    written = lib.ggml_quantize_chunk(
        int(qtype),
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.cast(dst, ctypes.c_void_p),
        0,
        n,
        hist,
    )
    assert written == nbytes, (written, nbytes)
    return dst.raw[:nbytes]


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("seed", [0, 1])
def test_quantize_bit_exact(reflib, qtype, seed):
    rng = np.random.default_rng(seed)
    n = 8 * TYPE_TRAITS[qtype].block_size
    if seed == 0:
        i = np.arange(n, dtype=np.float32)
        data = (0.1 + 2.0 * np.cos(i + 0.4)).astype(np.float32)
    else:
        data = rng.standard_normal(n).astype(np.float32)
    ref_bytes = ref_quantize(reflib, qtype, data)
    our_bytes = QUANT_FNS[qtype].quantize_row(data).tobytes()
    assert ref_bytes == our_bytes, f"{qtype.name}: byte mismatch"


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_quantize_histogram_matches_reference(reflib, qtype):
    """formats.quantize._histogram == the hist ggml_quantize_chunk fills
    (ggml.c:19157-19283; k-quants deliberately collect none,
    k_quants.c:405)."""
    from llama_cpp_q_4_0_tpu.formats.quantize import _histogram

    rng = np.random.default_rng(3)
    n = 16 * TYPE_TRAITS[qtype].block_size
    data = rng.standard_normal(n).astype(np.float32)
    tr = TYPE_TRAITS[qtype]
    dst = ctypes.create_string_buffer(n // tr.block_size * tr.type_size + 256)
    hist = (ctypes.c_int64 * 16)()
    src = np.ascontiguousarray(data, dtype=np.float32)
    reflib.ggml_quantize_chunk(
        int(qtype), src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.cast(dst, ctypes.c_void_p), 0, n, hist)
    ours = _histogram(QUANT_FNS[qtype].quantize_row(data), qtype)
    np.testing.assert_array_equal(ours, np.ctypeslib.as_array(hist),
                                  err_msg=qtype.name)


# --------------------------------------------------------------------------
# GGML_QKK_64 build variant (k_quants.h:10-16): QK_K=64 super-blocks with
# different structs AND different quantization algorithms for q3/q4/q5_K.
# Oracle: a second reference build compiled with -DGGML_QKK_64.
# --------------------------------------------------------------------------

LIB64 = "/tmp/refbuild/libggml_ref_qkk64.so"


@pytest.fixture(scope="module")
def reflib64():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    if not os.path.exists(LIB64):
        os.makedirs(os.path.dirname(LIB64), exist_ok=True)
        try:
            subprocess.run(
                [
                    "gcc", "-O2", "-fPIC", "-shared", "-pthread",
                    "-DGGML_USE_K_QUANTS", "-DGGML_QKK_64", f"-I{REF}",
                    f"{REF}/ggml.c", f"{REF}/k_quants.c", "-o", LIB64,
                ],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("cannot build QKK_64 reference oracle")
    lib = ctypes.CDLL(LIB64)

    class InitParams(ctypes.Structure):
        _fields_ = [
            ("mem_size", ctypes.c_size_t),
            ("mem_buffer", ctypes.c_void_p),
            ("no_alloc", ctypes.c_bool),
        ]

    lib.ggml_init.restype = ctypes.c_void_p
    lib.ggml_init.argtypes = [InitParams]
    assert lib.ggml_init(InitParams(16 * 1024 * 1024, None, False))
    lib.ggml_quantize_chunk.restype = ctypes.c_size_t
    lib.ggml_quantize_chunk.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


K64_QTYPES = [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
              GGMLType.Q5_K, GGMLType.Q6_K]


def _k64_data(seed, n):
    if seed == 0:
        i = np.arange(n, dtype=np.float32)
        return (0.1 + 2.0 * np.cos(i + 0.4)).astype(np.float32)
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


@pytest.mark.parametrize("qtype", K64_QTYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("seed", [0, 1])
def test_qkk64_quantize_bit_exact(reflib64, qtype, seed):
    from llama_cpp_q_4_0_tpu.quant.kquants64 import QUANT_FNS_64

    quant, _, dt = QUANT_FNS_64[qtype]
    n = 8 * 64
    data = _k64_data(seed, n)
    nbytes = n // 64 * dt.itemsize
    dst = ctypes.create_string_buffer(nbytes + 256)
    hist = (ctypes.c_int64 * 16)()
    src = np.ascontiguousarray(data, dtype=np.float32)
    written = reflib64.ggml_quantize_chunk(
        int(qtype), src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.cast(dst, ctypes.c_void_p), 0, n, hist)
    assert written == nbytes, (written, nbytes)
    our = quant(data).tobytes()
    assert dst.raw[:nbytes] == our, f"{qtype.name}-64: byte mismatch"


@pytest.mark.parametrize("qtype", K64_QTYPES + [GGMLType.Q8_K],
                         ids=lambda t: t.name)
def test_qkk64_dequantize_matches_reference(reflib64, qtype):
    """Round-trip: our quantized bytes through the REFERENCE dequantizer
    must equal our dequantizer exactly (f32-bitwise)."""
    from llama_cpp_q_4_0_tpu.quant.kquants64 import QUANT_FNS_64

    quant, dequant, dt = QUANT_FNS_64[qtype]
    n = 8 * 64
    data = _k64_data(1, n)
    blocks = quant(data)
    fn = getattr(reflib64, f"dequantize_row_{TYPE_TRAITS[qtype].name}")
    fn.restype = None
    fn.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                   ctypes.c_int]
    out = np.zeros(n, dtype=np.float32)
    raw = np.frombuffer(blocks.tobytes(), dtype=np.uint8).copy()
    fn(raw.ctypes.data_as(ctypes.c_void_p),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    ours = dequant(blocks)
    np.testing.assert_array_equal(out, ours, err_msg=f"{qtype.name}-64")


def test_qkk64_q8_quantize_bit_exact(reflib64):
    """q8_K-64 (activation side; not in ggml_quantize_chunk) via the
    exported quantize_row_q8_K_reference."""
    from llama_cpp_q_4_0_tpu.quant.kquants64 import (
        BLOCK_Q8_K64, quantize_q8_K64,
    )

    n = 8 * 64
    data = _k64_data(2, n)
    fn = reflib64.quantize_row_q8_K_reference
    fn.restype = None
    fn.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
                   ctypes.c_int]
    dst = ctypes.create_string_buffer(n // 64 * BLOCK_Q8_K64.itemsize)
    src = np.ascontiguousarray(data, dtype=np.float32)
    fn(src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       ctypes.cast(dst, ctypes.c_void_p), n)
    assert dst.raw == quantize_q8_K64(data).tobytes()
