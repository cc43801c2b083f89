"""Quantization round-trip / dot-product gates.

Port of tests/test-quantize-fns.cpp: same synthetic data (0.1 + 2cos(i+off)),
same error metrics (array_rmse = sqrt(sum)/n), same thresholds.
"""

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.quant import GGMLType, QUANT_FNS, TYPE_TRAITS

MAX_QUANTIZATION_TOTAL_ERROR = 0.002
MAX_QUANTIZATION_TOTAL_ERROR_2BITS = 0.0075
MAX_QUANTIZATION_TOTAL_ERROR_3BITS = 0.0040
MAX_DOT_PRODUCT_ERROR = 0.02

TEST_SIZE = 32 * 128

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


def generate_data(offset: float, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float32)
    return (0.1 + 2.0 * np.cos(i + np.float32(offset))).astype(np.float32)


def array_rmse(a1: np.ndarray, a2: np.ndarray) -> float:
    diff = a1.astype(np.float64) - a2.astype(np.float64)
    return float(np.sqrt((diff * diff).sum()) / len(a1))


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_roundtrip_rmse(qtype):
    fns = QUANT_FNS[qtype]
    data = generate_data(0.0, TEST_SIZE)
    blocks = fns.quantize_row(data)
    out = fns.dequantize_row(blocks)
    err = array_rmse(data, out)
    if qtype == GGMLType.Q2_K:
        limit = MAX_QUANTIZATION_TOTAL_ERROR_2BITS
    elif qtype == GGMLType.Q3_K:
        limit = MAX_QUANTIZATION_TOTAL_ERROR_3BITS
    else:
        limit = MAX_QUANTIZATION_TOTAL_ERROR
    assert err < limit, f"{qtype.name}: rmse {err} >= {limit}"


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda t: t.name)
def test_dot_product(qtype):
    fns = QUANT_FNS[qtype]
    data1 = generate_data(0.0, TEST_SIZE)
    data2 = generate_data(1.0, TEST_SIZE)
    xq = fns.quantize_row(data1)
    yq = fns.quantize_row_dot(data2)
    result = fns.vec_dot(xq, yq)
    dot_ref = float(np.dot(data1.astype(np.float64), data2.astype(np.float64)))
    err = abs(result - dot_ref) / TEST_SIZE
    assert err < MAX_DOT_PRODUCT_ERROR, f"{qtype.name}: dot err {err}"


@pytest.mark.parametrize("qtype", QTYPES + [GGMLType.Q8_K], ids=lambda t: t.name)
def test_block_byte_layout(qtype):
    """Serialized blocks must have the exact ggml byte size and reparse."""
    fns = QUANT_FNS[qtype]
    tr = TYPE_TRAITS[qtype]
    data = generate_data(0.5, 4 * tr.block_size)
    blocks = fns.quantize_row(data)
    raw = blocks.tobytes()
    assert len(raw) == 4 * tr.type_size
    reparsed = np.frombuffer(raw, dtype=tr.block_dtype)
    out1 = fns.dequantize_row(blocks)
    out2 = fns.dequantize_row(reparsed)
    np.testing.assert_array_equal(out1, out2)


def test_q8_1_sum_field():
    from llama_cpp_q_4_0_tpu.quant.blockq import quantize_q8_1

    data = generate_data(0.3, 256)
    b = quantize_q8_1(data)
    qs = b["qs"].astype(np.int32).sum(axis=-1)
    np.testing.assert_allclose(b["s"], qs * b["d"], rtol=1e-6)
