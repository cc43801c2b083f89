"""Planar (SoA) repacking of ggml blocks for TPU HBM.

The reference interleaves scales and quants in C structs (AoS) because CPU
SIMD reads whole blocks (ggml.c:870-915).  MXU/VPU want *planar* arrays, so
at load time every format is decoded into one unified schema:

    levels : int8  [N, K]          signed quant levels
    gscale : f32   [N, K/gsize]    per-group scale (super-block d folded in)
    gbias  : f32   [N, K/gsize]    per-group additive bias (min formats), or None

so that  W[n, k] = levels[n, k] * gscale[n, k//gsize] + gbias[n, k//gsize].

This single indirection is the TPU analogue of the quantize_fns vtable
(ggml.c:1618): one fused dequant-matmul kernel (ops/pallas/qmm.py) serves
every format and every model family.  The decode hot path reads
8 + 32/gsize*32 bits per weight; the packed-nibble fast path (levels4) halves
that for 4-bit formats.

Scale products (d*sc etc.) are computed in float32 exactly as the reference
dequantizers do, so planar dequantization is bit-identical to
``dequantize_row_*`` in float32.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import blockq, kquants
from .types import GGMLType, TYPE_TRAITS, QK_K

F32 = np.float32


@dataclass
class PlanarQuant:
    """Device-layout quantized 2-D weight [N, K] (N = out rows, K = reduce)."""

    qtype: GGMLType
    shape: tuple[int, int]
    gsize: int
    levels: np.ndarray  # int8 [N, K]
    gscale: np.ndarray  # f32 [N, K//gsize]
    gbias: np.ndarray | None = None  # f32 [N, K//gsize]

    def dequantize(self) -> np.ndarray:
        n, k = self.shape
        w = self.levels.astype(F32).reshape(n, k // self.gsize, self.gsize)
        w = w * self.gscale[:, :, None]
        if self.gbias is not None:
            w = w + self.gbias[:, :, None]
        return w.reshape(n, k)


def _nib_lohi(qs: np.ndarray) -> np.ndarray:
    """ggml 32-block nibble order: byte j holds elements (j, j+16)."""
    lo = (qs & 0x0F).astype(np.int8)
    hi = (qs >> 4).astype(np.int8)
    return np.concatenate([lo, hi], axis=-1)


def _plan_q4_0(b):
    q = _nib_lohi(b["qs"]) - 8
    return q, blockq.f16_to_f32(b["d"]), None, 32


def _plan_q4_1(b):
    q = _nib_lohi(b["qs"])
    return q, blockq.f16_to_f32(b["d"]), blockq.f16_to_f32(b["m"]), 32


def _plan_q5_0(b):
    bits = blockq._qh_bits(b["qh"])
    q = _nib_lohi(b["qs"]) + (bits << 4).astype(np.int8) - 16
    return q, blockq.f16_to_f32(b["d"]), None, 32


def _plan_q5_1(b):
    bits = blockq._qh_bits(b["qh"])
    q = _nib_lohi(b["qs"]) + (bits << 4).astype(np.int8)
    return q, blockq.f16_to_f32(b["d"]), blockq.f16_to_f32(b["m"]), 32


def _plan_q8_0(b):
    return b["qs"].copy(), blockq.f16_to_f32(b["d"]), None, 32


def _plan_q2_K(b):
    L = kquants._unpack2(b["qs"]).astype(np.int8)
    sc = (b["scales"] & 0xF).astype(F32)
    mn = (b["scales"] >> 4).astype(F32)
    d = blockq.f16_to_f32(b["d"])[:, None]
    dmin = blockq.f16_to_f32(b["dmin"])[:, None]
    return L, d * sc, -(dmin * mn), 16


def _plan_q3_K(b):
    nb = b.shape[0]
    L = kquants._unpack2(b["qs"])
    bits = np.zeros((nb, QK_K), dtype=np.int32)
    for bit in range(8):
        bits[:, bit * 32 : (bit + 1) * 32] = (b["hmask"] >> bit) & 1
    q = (L - np.where(bits == 1, 0, 4)).astype(np.int8)
    sc = kquants._q3_unpack_scales(b["scales"]).astype(F32)
    d = blockq.f16_to_f32(b["d"])[:, None]
    return q, d * sc, None, 16


def _plan_q4_K(b):
    L = kquants._unpack_nibble_pairs(b["qs"]).astype(np.int8)
    sc, mn = kquants.unpack_scale_min_k4(b["scales"])
    d = blockq.f16_to_f32(b["d"])[:, None]
    dmin = blockq.f16_to_f32(b["dmin"])[:, None]
    return L, d * sc.astype(F32), -(dmin * mn.astype(F32)), 32


def _plan_q5_K(b):
    nb = b.shape[0]
    L = np.zeros((nb, QK_K), dtype=np.int8)
    for seg in range(4):
        byte = b["qs"][:, seg * 32 : (seg + 1) * 32]
        hi1 = ((b["qh"] >> (2 * seg)) & 1).astype(np.int8)
        hi2 = ((b["qh"] >> (2 * seg + 1)) & 1).astype(np.int8)
        L[:, seg * 64 : seg * 64 + 32] = (byte & 0xF).astype(np.int8) + 16 * hi1
        L[:, seg * 64 + 32 : seg * 64 + 64] = (byte >> 4).astype(np.int8) + 16 * hi2
    sc, mn = kquants.unpack_scale_min_k4(b["scales"])
    d = blockq.f16_to_f32(b["d"])[:, None]
    dmin = blockq.f16_to_f32(b["dmin"])[:, None]
    return L, d * sc.astype(F32), -(dmin * mn.astype(F32)), 32


def _plan_q6_K(b):
    nb = b.shape[0]
    q = np.zeros((nb, QK_K), dtype=np.int8)
    for half in range(2):
        o = half * 128
        ql = b["ql"][:, half * 64 : half * 64 + 64]
        qh = b["qh"][:, half * 32 : half * 32 + 32]
        q[:, o : o + 32] = (((ql[:, :32] & 0xF) | (((qh >> 0) & 3) << 4)).astype(np.int16) - 32).astype(np.int8)
        q[:, o + 32 : o + 64] = (((ql[:, 32:] & 0xF) | (((qh >> 2) & 3) << 4)).astype(np.int16) - 32).astype(np.int8)
        q[:, o + 64 : o + 96] = (((ql[:, :32] >> 4) | (((qh >> 4) & 3) << 4)).astype(np.int16) - 32).astype(np.int8)
        q[:, o + 96 : o + 128] = (((ql[:, 32:] >> 4) | (((qh >> 6) & 3) << 4)).astype(np.int16) - 32).astype(np.int8)
    d = blockq.f16_to_f32(b["d"])[:, None]
    return q, d * b["scales"].astype(F32), None, 16


_PLANNERS = {
    GGMLType.Q4_0: _plan_q4_0,
    GGMLType.Q4_1: _plan_q4_1,
    GGMLType.Q5_0: _plan_q5_0,
    GGMLType.Q5_1: _plan_q5_1,
    GGMLType.Q8_0: _plan_q8_0,
    GGMLType.Q2_K: _plan_q2_K,
    GGMLType.Q3_K: _plan_q3_K,
    GGMLType.Q4_K: _plan_q4_K,
    GGMLType.Q5_K: _plan_q5_K,
    GGMLType.Q6_K: _plan_q6_K,
}


# --- GGML_QKK_64 planners: same unified schema, 64-element super-blocks ---

def _plan_q2_K64(b):
    from . import kquants64

    L = kquants64._unpack2_64(b["qs"]).astype(np.int8)
    sc = (b["scales"] & 0xF).astype(F32)
    mn = (b["scales"] >> 4).astype(F32)
    d = blockq.f16_to_f32(b["d"])[:, None]
    dmin = blockq.f16_to_f32(b["dmin"])[:, None]
    return L, d * sc, -(dmin * mn), 16


def _plan_q3_K64(b):
    from . import kquants64

    nb = b.shape[0]
    L = kquants64._unpack2_64(b["qs"])
    bits = np.zeros((nb, 64), dtype=np.int32)
    for bit in range(8):
        bits[:, bit * 8 : (bit + 1) * 8] = (b["hmask"] >> bit) & 1
    q = (L - np.where(bits == 1, 0, 4)).astype(np.int8)
    s_lo = (b["scales"][:, [0, 0, 1, 1]] >> np.array([0, 4, 0, 4])) & 0xF
    sc = (s_lo.astype(np.int32) - 8).astype(F32)
    d = blockq.f16_to_f32(b["d"])[:, None]
    return q, d * sc, None, 16


def _plan_q4_K64(b):
    q = b["qs"]
    L = np.concatenate([(q & 0xF), (q >> 4)], axis=-1).astype(np.int8)
    sd = (b["scales"] & 0xF).astype(F32)
    sm = (b["scales"] >> 4).astype(F32)
    dall = blockq.f16_to_f32(b["d"][:, 0])[:, None]
    mall = blockq.f16_to_f32(b["d"][:, 1])[:, None]
    return L, dall * sd, -(mall * sm), 32


def _plan_q5_K64(b):
    nb = b.shape[0]
    L = np.zeros((nb, 64), dtype=np.int8)
    ql = b["qs"].astype(np.int32)
    for is_ in range(4):
        sl = slice(is_ * 8, (is_ + 1) * 8)
        hb1 = ((b["qh"] >> is_) & 1).astype(np.int32)
        hb2 = ((b["qh"] >> (4 + is_)) & 1).astype(np.int32)
        L[:, is_ * 8 : (is_ + 1) * 8] = (
            (ql[:, sl] & 0xF) - np.where(hb1 == 1, 0, 16)).astype(np.int8)
        L[:, 32 + is_ * 8 : 32 + (is_ + 1) * 8] = (
            (ql[:, sl] >> 4) - np.where(hb2 == 1, 0, 16)).astype(np.int8)
    d = blockq.f16_to_f32(b["d"])[:, None]
    return L, d * b["scales"].astype(F32), None, 16


def _plan_q6_K64(b):
    from . import kquants64

    nb = b.shape[0]
    q = kquants64._q6_levels_64(b, nb).astype(np.int8)
    d = blockq.f16_to_f32(b["d"])[:, None]
    return q, d * b["scales"].astype(F32), None, 16


_PLANNERS_64 = {
    GGMLType.Q2_K: _plan_q2_K64,
    GGMLType.Q3_K: _plan_q3_K64,
    GGMLType.Q4_K: _plan_q4_K64,
    GGMLType.Q5_K: _plan_q5_K64,
    GGMLType.Q6_K: _plan_q6_K64,
}


def pack_planar(blocks: np.ndarray, qtype: GGMLType, shape: tuple[int, int],
                qk_k: int = 256) -> PlanarQuant:
    """Blocks of a [N, K] row-major weight -> planar device layout."""
    from .types import type_traits

    n, k = shape
    tr = type_traits(qtype, qk_k)
    flat = blocks.reshape(-1)
    nblocks_per_row = k // tr.block_size
    assert flat.shape[0] == n * nblocks_per_row
    planner = (_PLANNERS_64[qtype] if qk_k == 64 and qtype in _PLANNERS_64
               else _PLANNERS[qtype])
    levels, gscale_b, gbias_b, gsize = planner(flat)
    levels = levels.reshape(n, k)
    per_block = tr.block_size // gsize
    gscale = np.ascontiguousarray(gscale_b.reshape(n, nblocks_per_row * per_block), dtype=F32)
    gbias = None
    if gbias_b is not None:
        gbias = np.ascontiguousarray(gbias_b.reshape(n, nblocks_per_row * per_block), dtype=F32)
    return PlanarQuant(qtype, (n, k), gsize, np.ascontiguousarray(levels), gscale, gbias)


def quantize_planar(w: np.ndarray, qtype: GGMLType, qk_k: int = 256) -> PlanarQuant:
    """float32 [N, K] weight -> blocks -> planar (convenience for tests/convert)."""
    from .registry import quantize

    n, k = w.shape
    return pack_planar(quantize(w, qtype, qk_k), qtype, (n, k), qk_k)
