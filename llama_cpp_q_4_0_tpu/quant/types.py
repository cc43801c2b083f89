"""Quantization type system: ggml tensor types and block layouts.

Mirrors the type enums and block structs of the reference
(ggml.h:242-280 ``enum ggml_type``, ggml.c:870-915 block structs,
k_quants.h:26-118 super-block structs) but re-expressed as numpy structured
dtypes for file IO plus *planar* SoA layouts for TPU compute (see pack.py).

QK_K is the reference's compile-time super-block size (k_quants.h:10-16):
256 in the default build, 64 under ``-DGGML_QKK_64``.  Here both variants
are first-class — ``type_traits(t, qk_k)`` / ``row_size_bytes(..., qk_k)``
select the block layout, and file readers auto-detect which variant wrote
a file (formats/ggjt.py) since the container itself carries no marker.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import numpy as np

QK4_0 = 32
QK4_1 = 32
QK5_0 = 32
QK5_1 = 32
QK8_0 = 32
QK8_1 = 32
QK_K = 256
K_SCALE_SIZE = 12


class GGMLType(enum.IntEnum):
    """Tensor data types; values match ggml.h:242-265 for file compat."""

    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    # 4, 5 were Q4_2/Q4_3 — removed upstream, kept reserved
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14
    Q8_K = 15
    I8 = 16
    I16 = 17
    I32 = 18


# --- block struct dtypes (byte-compatible with the C structs, little endian) ---

BLOCK_Q4_0 = np.dtype([("d", "<f2"), ("qs", "u1", (QK4_0 // 2,))])
BLOCK_Q4_1 = np.dtype([("d", "<f2"), ("m", "<f2"), ("qs", "u1", (QK4_1 // 2,))])
BLOCK_Q5_0 = np.dtype([("d", "<f2"), ("qh", "u1", (4,)), ("qs", "u1", (QK5_0 // 2,))])
BLOCK_Q5_1 = np.dtype(
    [("d", "<f2"), ("m", "<f2"), ("qh", "u1", (4,)), ("qs", "u1", (QK5_1 // 2,))]
)
BLOCK_Q8_0 = np.dtype([("d", "<f2"), ("qs", "i1", (QK8_0,))])
BLOCK_Q8_1 = np.dtype([("d", "<f4"), ("s", "<f4"), ("qs", "i1", (QK8_1,))])

BLOCK_Q2_K = np.dtype(
    [("scales", "u1", (QK_K // 16,)), ("qs", "u1", (QK_K // 4,)), ("d", "<f2"), ("dmin", "<f2")]
)
BLOCK_Q3_K = np.dtype(
    [("hmask", "u1", (QK_K // 8,)), ("qs", "u1", (QK_K // 4,)), ("scales", "u1", (12,)), ("d", "<f2")]
)
BLOCK_Q4_K = np.dtype(
    [("d", "<f2"), ("dmin", "<f2"), ("scales", "u1", (K_SCALE_SIZE,)), ("qs", "u1", (QK_K // 2,))]
)
BLOCK_Q5_K = np.dtype(
    [
        ("d", "<f2"),
        ("dmin", "<f2"),
        ("scales", "u1", (K_SCALE_SIZE,)),
        ("qh", "u1", (QK_K // 8,)),
        ("qs", "u1", (QK_K // 2,)),
    ]
)
BLOCK_Q6_K = np.dtype(
    [("ql", "u1", (QK_K // 2,)), ("qh", "u1", (QK_K // 4,)), ("scales", "i1", (QK_K // 16,)), ("d", "<f2")]
)
BLOCK_Q8_K = np.dtype(
    [("d", "<f4"), ("qs", "i1", (QK_K,)), ("bsums", "<i2", (QK_K // 16,))]
)

# --- GGML_QKK_64 build-variant super-block structs (k_quants.h #ifdef arms).
# q3/q4/q5_K change layout, not just size: 2-byte 4-bit scales (q3), two fp16
# scales + 4-bit codes (q4), symmetric int8 scales with no mins (q5).
BLOCK_Q2_K64 = np.dtype(
    [("scales", "u1", (4,)), ("qs", "u1", (16,)), ("d", "<f2"), ("dmin", "<f2")]
)
BLOCK_Q3_K64 = np.dtype(
    [("hmask", "u1", (8,)), ("qs", "u1", (16,)), ("scales", "u1", (2,)), ("d", "<f2")]
)
BLOCK_Q4_K64 = np.dtype(
    [("d", "<f2", (2,)), ("scales", "u1", (2,)), ("qs", "u1", (32,))]
)
BLOCK_Q5_K64 = np.dtype(
    [("d", "<f2"), ("scales", "i1", (4,)), ("qh", "u1", (8,)), ("qs", "u1", (32,))]
)
BLOCK_Q6_K64 = np.dtype(
    [("ql", "u1", (32,)), ("qh", "u1", (16,)), ("scales", "i1", (4,)), ("d", "<f2")]
)
BLOCK_Q8_K64 = np.dtype(
    [("d", "<f4"), ("qs", "i1", (64,)), ("bsums", "<i2", (4,))]
)


@dataclass(frozen=True)
class TypeTraits:
    """Per-type metadata (ggml.c GGML_BLCK_SIZE/GGML_TYPE_SIZE tables)."""

    name: str
    block_size: int  # elements per block
    type_size: int  # bytes per block
    block_dtype: np.dtype | None
    is_quantized: bool


TYPE_TRAITS: dict[GGMLType, TypeTraits] = {
    GGMLType.F32: TypeTraits("f32", 1, 4, None, False),
    GGMLType.F16: TypeTraits("f16", 1, 2, None, False),
    GGMLType.Q4_0: TypeTraits("q4_0", QK4_0, BLOCK_Q4_0.itemsize, BLOCK_Q4_0, True),
    GGMLType.Q4_1: TypeTraits("q4_1", QK4_1, BLOCK_Q4_1.itemsize, BLOCK_Q4_1, True),
    GGMLType.Q5_0: TypeTraits("q5_0", QK5_0, BLOCK_Q5_0.itemsize, BLOCK_Q5_0, True),
    GGMLType.Q5_1: TypeTraits("q5_1", QK5_1, BLOCK_Q5_1.itemsize, BLOCK_Q5_1, True),
    GGMLType.Q8_0: TypeTraits("q8_0", QK8_0, BLOCK_Q8_0.itemsize, BLOCK_Q8_0, True),
    GGMLType.Q8_1: TypeTraits("q8_1", QK8_1, BLOCK_Q8_1.itemsize, BLOCK_Q8_1, True),
    GGMLType.Q2_K: TypeTraits("q2_K", QK_K, BLOCK_Q2_K.itemsize, BLOCK_Q2_K, True),
    GGMLType.Q3_K: TypeTraits("q3_K", QK_K, BLOCK_Q3_K.itemsize, BLOCK_Q3_K, True),
    GGMLType.Q4_K: TypeTraits("q4_K", QK_K, BLOCK_Q4_K.itemsize, BLOCK_Q4_K, True),
    GGMLType.Q5_K: TypeTraits("q5_K", QK_K, BLOCK_Q5_K.itemsize, BLOCK_Q5_K, True),
    GGMLType.Q6_K: TypeTraits("q6_K", QK_K, BLOCK_Q6_K.itemsize, BLOCK_Q6_K, True),
    GGMLType.Q8_K: TypeTraits("q8_K", QK_K, BLOCK_Q8_K.itemsize, BLOCK_Q8_K, True),
    GGMLType.I8: TypeTraits("i8", 1, 1, None, False),
    GGMLType.I16: TypeTraits("i16", 1, 2, None, False),
    GGMLType.I32: TypeTraits("i32", 1, 4, None, False),
}

# sanity: byte sizes must match the C static_asserts (ggml.c / k_quants.h)
assert BLOCK_Q4_0.itemsize == 18
assert BLOCK_Q4_1.itemsize == 20
assert BLOCK_Q5_0.itemsize == 22
assert BLOCK_Q5_1.itemsize == 24
assert BLOCK_Q8_0.itemsize == 34
assert BLOCK_Q8_1.itemsize == 40
assert BLOCK_Q2_K.itemsize == 84
assert BLOCK_Q3_K.itemsize == 110
assert BLOCK_Q4_K.itemsize == 144
assert BLOCK_Q5_K.itemsize == 176
assert BLOCK_Q6_K.itemsize == 210
assert BLOCK_Q8_K.itemsize == 292


# QKK_64 trait table: k-quant rows swap to 64-element super-blocks, every
# other type is identical to the default build
TYPE_TRAITS_64: dict[GGMLType, TypeTraits] = dict(TYPE_TRAITS)
TYPE_TRAITS_64.update({
    GGMLType.Q2_K: TypeTraits("q2_K", 64, BLOCK_Q2_K64.itemsize, BLOCK_Q2_K64, True),
    GGMLType.Q3_K: TypeTraits("q3_K", 64, BLOCK_Q3_K64.itemsize, BLOCK_Q3_K64, True),
    GGMLType.Q4_K: TypeTraits("q4_K", 64, BLOCK_Q4_K64.itemsize, BLOCK_Q4_K64, True),
    GGMLType.Q5_K: TypeTraits("q5_K", 64, BLOCK_Q5_K64.itemsize, BLOCK_Q5_K64, True),
    GGMLType.Q6_K: TypeTraits("q6_K", 64, BLOCK_Q6_K64.itemsize, BLOCK_Q6_K64, True),
    GGMLType.Q8_K: TypeTraits("q8_K", 64, BLOCK_Q8_K64.itemsize, BLOCK_Q8_K64, True),
})


def type_traits(t: GGMLType, qk_k: int = 256) -> TypeTraits:
    """Per-type metadata under the given super-block build variant."""
    assert qk_k in (256, 64), qk_k
    return (TYPE_TRAITS if qk_k == 256 else TYPE_TRAITS_64)[t]


def is_quantized(t: GGMLType) -> bool:
    return TYPE_TRAITS[t].is_quantized


def row_size_bytes(t: GGMLType, n_elements: int, qk_k: int = 256) -> int:
    tr = type_traits(t, qk_k)
    if n_elements % tr.block_size != 0:
        raise ValueError(
            f"{tr.name}: {n_elements} elements not divisible by block size "
            f"{tr.block_size} (QK_K={qk_k})")
    return n_elements // tr.block_size * tr.type_size


class LlamaFType(enum.IntEnum):
    """Model file types (llama.h:107-128 ``enum llama_ftype``)."""

    ALL_F32 = 0
    MOSTLY_F16 = 1
    MOSTLY_Q4_0 = 2
    MOSTLY_Q4_1 = 3
    MOSTLY_Q4_1_SOME_F16 = 4
    MOSTLY_Q8_0 = 7
    MOSTLY_Q5_0 = 8
    MOSTLY_Q5_1 = 9
    MOSTLY_Q2_K = 10
    MOSTLY_Q3_K_S = 11
    MOSTLY_Q3_K_M = 12
    MOSTLY_Q3_K_L = 13
    MOSTLY_Q4_K_S = 14
    MOSTLY_Q4_K_M = 15
    MOSTLY_Q5_K_S = 16
    MOSTLY_Q5_K_M = 17
    MOSTLY_Q6_K = 18


FTYPE_BASE_TYPE: dict[LlamaFType, GGMLType] = {
    LlamaFType.ALL_F32: GGMLType.F32,
    LlamaFType.MOSTLY_F16: GGMLType.F16,
    LlamaFType.MOSTLY_Q4_0: GGMLType.Q4_0,
    LlamaFType.MOSTLY_Q4_1: GGMLType.Q4_1,
    LlamaFType.MOSTLY_Q4_1_SOME_F16: GGMLType.Q4_1,
    LlamaFType.MOSTLY_Q8_0: GGMLType.Q8_0,
    LlamaFType.MOSTLY_Q5_0: GGMLType.Q5_0,
    LlamaFType.MOSTLY_Q5_1: GGMLType.Q5_1,
    LlamaFType.MOSTLY_Q2_K: GGMLType.Q2_K,
    LlamaFType.MOSTLY_Q3_K_S: GGMLType.Q3_K,
    LlamaFType.MOSTLY_Q3_K_M: GGMLType.Q3_K,
    LlamaFType.MOSTLY_Q3_K_L: GGMLType.Q3_K,
    LlamaFType.MOSTLY_Q4_K_S: GGMLType.Q4_K,
    LlamaFType.MOSTLY_Q4_K_M: GGMLType.Q4_K,
    LlamaFType.MOSTLY_Q5_K_S: GGMLType.Q5_K,
    LlamaFType.MOSTLY_Q5_K_M: GGMLType.Q5_K,
    LlamaFType.MOSTLY_Q6_K: GGMLType.Q6_K,
}
