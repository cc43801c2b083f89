"""The quant-fn vtable: one indirection serving every format.

TPU re-design of ``quantize_fns[GGML_TYPE_COUNT]`` (ggml.c:1618-1716) — the
single table that lets one matmul driver serve all quant formats and all
model architectures.  Here it also carries the k-quant dot products
(k_quants.h:145-149) expressed as integer math over unpacked levels, which
is the numerics spec the Pallas kernels implement.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from . import blockq, kquants
from .types import GGMLType, QK_K

F32 = np.float32


@dataclass(frozen=True)
class QuantFns:
    """Per-type function row (mirrors quantize_fns_t, ggml.h:1524-1533)."""

    quantize_row: Callable[[np.ndarray], np.ndarray]
    quantize_row_reference: Callable[[np.ndarray], np.ndarray]
    dequantize_row: Callable[[np.ndarray], np.ndarray]
    quantize_row_dot: Callable[[np.ndarray], np.ndarray]  # activation-side quant
    vec_dot: Callable[[np.ndarray, np.ndarray], float]
    vec_dot_type: GGMLType


def _levels_q2_K(b):
    sc = (b["scales"] & 0xF).astype(np.int32)
    mn = (b["scales"] >> 4).astype(np.int32)
    L = kquants._unpack2(b["qs"])
    return L, sc, mn


def vec_dot_q2_K_q8_K(xb: np.ndarray, yb: np.ndarray) -> float:
    """sum_g d*sc_g*(q2 . q8)_g - dmin*mn_g*bsum_g  (k_quants.c scalar path)."""
    x = xb.reshape(-1)
    y = yb.reshape(-1)
    L, sc, mn = _levels_q2_K(x)
    q8 = y["qs"].astype(np.int32).reshape(-1, 16, 16)
    dots = (L.reshape(-1, 16, 16) * q8).sum(axis=2)
    d = blockq.f16_to_f32(x["d"]) * y["d"].astype(F32)
    dmin = blockq.f16_to_f32(x["dmin"]) * y["d"].astype(F32)
    sumi = (sc.astype(F32) * dots.astype(F32)).sum(axis=1)
    summin = (mn.astype(F32) * y["bsums"].astype(F32)).sum(axis=1)
    return float((d * sumi - dmin * summin).sum(dtype=F32))


def vec_dot_q3_K_q8_K(xb: np.ndarray, yb: np.ndarray) -> float:
    x = xb.reshape(-1)
    y = yb.reshape(-1)
    nb = x.shape[0]
    sc = kquants._q3_unpack_scales(x["scales"])
    L = kquants._unpack2(x["qs"])
    bits = np.zeros((nb, QK_K), dtype=np.int32)
    for bit in range(8):
        bits[:, bit * 32 : (bit + 1) * 32] = (x["hmask"] >> bit) & 1
    q = L - np.where(bits == 1, 0, 4)
    q8 = y["qs"].astype(np.int32).reshape(nb, 16, 16)
    dots = (q.reshape(nb, 16, 16) * q8).sum(axis=2)
    d = blockq.f16_to_f32(x["d"]) * y["d"].astype(F32)
    sumi = (sc.astype(F32) * dots.astype(F32)).sum(axis=1)
    return float((d * sumi).sum(dtype=F32))


def vec_dot_q4_K_q8_K(xb: np.ndarray, yb: np.ndarray) -> float:
    x = xb.reshape(-1)
    y = yb.reshape(-1)
    nb = x.shape[0]
    sc, mn = kquants.unpack_scale_min_k4(x["scales"])
    L = kquants._unpack_nibble_pairs(x["qs"])
    q8 = y["qs"].astype(np.int32).reshape(nb, 8, 32)
    dots = (L.reshape(nb, 8, 32) * q8).sum(axis=2)
    d = blockq.f16_to_f32(x["d"]) * y["d"].astype(F32)
    dmin = blockq.f16_to_f32(x["dmin"]) * y["d"].astype(F32)
    bs2 = y["bsums"].astype(np.int32).reshape(nb, 8, 2).sum(axis=2)
    sumi = (sc.astype(F32) * dots.astype(F32)).sum(axis=1)
    summin = (mn.astype(F32) * bs2.astype(F32)).sum(axis=1)
    return float((d * sumi - dmin * summin).sum(dtype=F32))


def vec_dot_q5_K_q8_K(xb: np.ndarray, yb: np.ndarray) -> float:
    x = xb.reshape(-1)
    y = yb.reshape(-1)
    nb = x.shape[0]
    sc, mn = kquants.unpack_scale_min_k4(x["scales"])
    L = np.zeros((nb, QK_K), dtype=np.int32)
    for seg in range(4):
        byte = x["qs"][:, seg * 32 : (seg + 1) * 32]
        hi1 = ((x["qh"] >> (2 * seg)) & 1).astype(np.int32)
        hi2 = ((x["qh"] >> (2 * seg + 1)) & 1).astype(np.int32)
        L[:, seg * 64 : seg * 64 + 32] = (byte & 0xF).astype(np.int32) + 16 * hi1
        L[:, seg * 64 + 32 : seg * 64 + 64] = (byte >> 4).astype(np.int32) + 16 * hi2
    q8 = y["qs"].astype(np.int32).reshape(nb, 8, 32)
    dots = (L.reshape(nb, 8, 32) * q8).sum(axis=2)
    d = blockq.f16_to_f32(x["d"]) * y["d"].astype(F32)
    dmin = blockq.f16_to_f32(x["dmin"]) * y["d"].astype(F32)
    bs2 = y["bsums"].astype(np.int32).reshape(nb, 8, 2).sum(axis=2)
    sumi = (sc.astype(F32) * dots.astype(F32)).sum(axis=1)
    summin = (mn.astype(F32) * bs2.astype(F32)).sum(axis=1)
    return float((d * sumi - dmin * summin).sum(dtype=F32))


def vec_dot_q6_K_q8_K(xb: np.ndarray, yb: np.ndarray) -> float:
    x = xb.reshape(-1)
    y = yb.reshape(-1)
    nb = x.shape[0]
    q = np.zeros((nb, QK_K), dtype=np.int32)
    for half in range(2):
        o = half * 128
        ql = x["ql"][:, half * 64 : half * 64 + 64]
        qh = x["qh"][:, half * 32 : half * 32 + 32]
        q[:, o : o + 32] = ((ql[:, :32] & 0xF).astype(np.int32) | (((qh >> 0) & 3).astype(np.int32) << 4)) - 32
        q[:, o + 32 : o + 64] = ((ql[:, 32:] & 0xF).astype(np.int32) | (((qh >> 2) & 3).astype(np.int32) << 4)) - 32
        q[:, o + 64 : o + 96] = ((ql[:, :32] >> 4).astype(np.int32) | (((qh >> 4) & 3).astype(np.int32) << 4)) - 32
        q[:, o + 96 : o + 128] = ((ql[:, 32:] >> 4).astype(np.int32) | (((qh >> 6) & 3).astype(np.int32) << 4)) - 32
    q8 = y["qs"].astype(np.int32).reshape(nb, 16, 16)
    dots = (q.reshape(nb, 16, 16) * q8).sum(axis=2)
    d = blockq.f16_to_f32(x["d"]) * y["d"].astype(F32)
    sumi = (x["scales"].astype(F32) * dots.astype(F32)).sum(axis=1)
    return float((d * sumi).sum(dtype=F32))


QUANT_FNS: dict[GGMLType, QuantFns] = {
    GGMLType.Q4_0: QuantFns(
        blockq.quantize_q4_0, blockq.quantize_q4_0, blockq.dequantize_q4_0,
        blockq.quantize_q8_0, blockq.vec_dot_q4_0_q8_0, GGMLType.Q8_0,
    ),
    GGMLType.Q4_1: QuantFns(
        blockq.quantize_q4_1, blockq.quantize_q4_1, blockq.dequantize_q4_1,
        blockq.quantize_q8_1, blockq.vec_dot_q4_1_q8_1, GGMLType.Q8_1,
    ),
    GGMLType.Q5_0: QuantFns(
        blockq.quantize_q5_0, blockq.quantize_q5_0, blockq.dequantize_q5_0,
        blockq.quantize_q8_0, blockq.vec_dot_q5_0_q8_0, GGMLType.Q8_0,
    ),
    GGMLType.Q5_1: QuantFns(
        blockq.quantize_q5_1, blockq.quantize_q5_1, blockq.dequantize_q5_1,
        blockq.quantize_q8_1, blockq.vec_dot_q5_1_q8_1, GGMLType.Q8_1,
    ),
    GGMLType.Q8_0: QuantFns(
        blockq.quantize_q8_0, blockq.quantize_q8_0, blockq.dequantize_q8_0,
        blockq.quantize_q8_0, blockq.vec_dot_q8_0_q8_0, GGMLType.Q8_0,
    ),
    GGMLType.Q8_1: QuantFns(
        blockq.quantize_q8_1, blockq.quantize_q8_1, blockq.dequantize_q8_1,
        blockq.quantize_q8_1, None, GGMLType.Q8_1,
    ),
    GGMLType.Q2_K: QuantFns(
        kquants.quantize_q2_K, kquants.quantize_q2_K, kquants.dequantize_q2_K,
        kquants.quantize_q8_K, vec_dot_q2_K_q8_K, GGMLType.Q8_K,
    ),
    GGMLType.Q3_K: QuantFns(
        kquants.quantize_q3_K, kquants.quantize_q3_K, kquants.dequantize_q3_K,
        kquants.quantize_q8_K, vec_dot_q3_K_q8_K, GGMLType.Q8_K,
    ),
    GGMLType.Q4_K: QuantFns(
        kquants.quantize_q4_K, kquants.quantize_q4_K, kquants.dequantize_q4_K,
        kquants.quantize_q8_K, vec_dot_q4_K_q8_K, GGMLType.Q8_K,
    ),
    GGMLType.Q5_K: QuantFns(
        kquants.quantize_q5_K, kquants.quantize_q5_K, kquants.dequantize_q5_K,
        kquants.quantize_q8_K, vec_dot_q5_K_q8_K, GGMLType.Q8_K,
    ),
    GGMLType.Q6_K: QuantFns(
        kquants.quantize_q6_K, kquants.quantize_q6_K, kquants.dequantize_q6_K,
        kquants.quantize_q8_K, vec_dot_q6_K_q8_K, GGMLType.Q8_K,
    ),
    GGMLType.Q8_K: QuantFns(
        kquants.quantize_q8_K, kquants.quantize_q8_K, kquants.dequantize_q8_K,
        kquants.quantize_q8_K, None, GGMLType.Q8_K,
    ),
}


def _fns_64(t: GGMLType):
    from .kquants64 import QUANT_FNS_64

    if t not in QUANT_FNS_64:
        raise ValueError(f"{t.name} has no GGML_QKK_64 variant")
    return QUANT_FNS_64[t]


def quantize(x: np.ndarray, t: GGMLType, qk_k: int = 256) -> np.ndarray:
    """Quantize float32 rows to blocks of type t (qk_k selects the k-quant
    super-block build variant; non-K formats are variant-independent)."""
    if qk_k == 64 and t in (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                            GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_K):
        return _fns_64(t)[0](x)
    # C++ fast path for the flagship format (native/ggjt_native.cpp);
    # bit-exact with the numpy quantizer below (tests/test_native.py)
    if t == GGMLType.Q4_0 and getattr(x, "ndim", 0) == 2 and x.shape[1] % 32 == 0:
        from .. import native

        raw = native.quantize_q4_0(np.asarray(x, np.float32)) \
            if native.available() else None
        if raw is not None:
            from .blockq import BLOCK_Q4_0

            return raw.reshape(x.shape[0], -1).view(BLOCK_Q4_0).reshape(
                x.shape[0], x.shape[1] // 32)
    return QUANT_FNS[t].quantize_row(x)


def dequantize(blocks: np.ndarray, t: GGMLType, qk_k: int = 256) -> np.ndarray:
    if qk_k == 64 and t in (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                            GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_K):
        return _fns_64(t)[1](blocks)
    return QUANT_FNS[t].dequantize_row(blocks)


def quantize_bytes(x: np.ndarray, t: GGMLType, qk_k: int = 256) -> bytes:
    """Quantize and serialize to the exact ggml on-disk byte layout."""
    return quantize(x, t, qk_k).tobytes()


def dequantize_bytes(raw: bytes | np.ndarray, t: GGMLType, shape,
                     qk_k: int = 256) -> np.ndarray:
    """Parse ggml block bytes into float32 of the given element shape."""
    from .types import type_traits

    tr = type_traits(t, qk_k)
    if t == GGMLType.F32:
        return np.frombuffer(raw, dtype="<f4").reshape(shape).astype(F32)
    if t == GGMLType.F16:
        return np.frombuffer(raw, dtype="<f2").reshape(shape).astype(F32)
    buf = np.frombuffer(raw, dtype=tr.block_dtype)
    n = int(np.prod(shape))
    assert buf.shape[0] * tr.block_size == n
    return dequantize(buf, t, qk_k).reshape(shape)
