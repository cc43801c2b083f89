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
