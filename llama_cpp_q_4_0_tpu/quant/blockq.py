"""32-element block-quant formats: q4_0, q4_1, q5_0, q5_1, q8_0, q8_1.

Vectorized numpy implementations that reproduce the reference scalar
semantics exactly (ggml.c:918-1599 ``quantize_row_*_reference`` /
``dequantize_row_*``), including fp16 scale rounding, C-cast truncation, and
``roundf`` half-away-from-zero.  These run at model-conversion / activation-
quantization time; the TPU inference hot path consumes the *planar* repack of
these blocks (pack.py) inside Pallas kernels (ops/pallas/).

All quantize functions take float32 arrays of shape (..., k) with k a
multiple of 32 and return a structured array of shape (..., k//32) with the
byte-exact block dtype from types.py; dequantize is the inverse.
"""

from __future__ import annotations

import numpy as np

from .types import (
    BLOCK_Q4_0,
    BLOCK_Q4_1,
    BLOCK_Q5_0,
    BLOCK_Q5_1,
    BLOCK_Q8_0,
    BLOCK_Q8_1,
    QK8_0,
)

F32 = np.float32


def f16(x: np.ndarray) -> np.ndarray:
    """fp32 -> fp16 with IEEE round-to-nearest-even (== GGML_FP32_TO_FP16)."""
    return np.asarray(x, dtype=np.float32).astype(np.float16)


def f16_to_f32(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.float16).astype(np.float32)


def roundf(v: np.ndarray) -> np.ndarray:
    """C roundf: round half away from zero (used by q8_0/q8_1 quantizers)."""
    v = np.asarray(v, dtype=np.float32)
    return np.sign(v) * np.floor(np.abs(v) + F32(0.5))


def _blocks(x: np.ndarray, qk: int) -> tuple[np.ndarray, tuple[int, ...]]:
    x = np.ascontiguousarray(x, dtype=np.float32)
    assert x.shape[-1] % qk == 0, f"row length {x.shape[-1]} not a multiple of {qk}"
    lead = x.shape[:-1]
    return x.reshape(-1, qk), lead


def _signed_absmax(xb: np.ndarray) -> np.ndarray:
    """Per-block signed value of largest magnitude (first occurrence wins,

    matching the strict ``amax < fabsf(v)`` update in ggml.c:928-933)."""
    idx = np.argmax(np.abs(xb), axis=-1)
    return xb[np.arange(xb.shape[0]), idx]


def _safe_inv(d: np.ndarray) -> np.ndarray:
    """``id = d ? 1.0f/d : 0.0f`` in float32."""
    with np.errstate(divide="ignore"):
        return np.where(d != 0, F32(1.0) / d.astype(F32), F32(0.0)).astype(F32)


def _unblock(y: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """Reshape flat (nb, qk) samples back to blocks' leading shape + row dim."""
    if blocks.ndim == 1:
        return y.reshape(-1)
    return y.reshape(*blocks.shape[:-1], -1)


# --------------------------------------------------------------------------
# q4_0: x = d * (q - 8), d = signed_absmax / -8   (ggml.c:918-953)
# --------------------------------------------------------------------------

def quantize_q4_0(x: np.ndarray) -> np.ndarray:
    xb, lead = _blocks(x, 32)
    mx = _signed_absmax(xb)
    d = (mx / F32(-8.0)).astype(F32)
    id = _safe_inv(d)
    # MIN(15, (int8_t)(x*id + 8.5f)): the argument is >= ~0.5, so the C cast
    # truncation-toward-zero is a floor.
    q = np.minimum(15, np.floor(xb * id[:, None] + F32(8.5)).astype(np.int32))
    q = q.astype(np.uint8)
    out = np.empty(xb.shape[0], dtype=BLOCK_Q4_0)
    out["d"] = f16(d)
    out["qs"] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(*lead, -1)


def dequantize_q4_0(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    d = f16_to_f32(b["d"])[:, None]
    qs = b["qs"]
    lo = (qs & 0x0F).astype(np.int32) - 8
    hi = (qs >> 4).astype(np.int32) - 8
    y = np.concatenate([lo, hi], axis=-1).astype(F32) * d
    return _unblock(y, blocks)


# --------------------------------------------------------------------------
# q4_1: x = d * q + m, d = (max-min)/15            (ggml.c:962-998)
# --------------------------------------------------------------------------

def quantize_q4_1(x: np.ndarray) -> np.ndarray:
    xb, lead = _blocks(x, 32)
    mn = xb.min(axis=-1).astype(F32)
    mx = xb.max(axis=-1).astype(F32)
    d = ((mx - mn) / F32(15.0)).astype(F32)
    id = _safe_inv(d)
    q = np.minimum(
        15, np.floor((xb - mn[:, None]) * id[:, None] + F32(0.5)).astype(np.int32)
    ).astype(np.uint8)
    out = np.empty(xb.shape[0], dtype=BLOCK_Q4_1)
    out["d"] = f16(d)
    out["m"] = f16(mn)
    out["qs"] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(*lead, -1)


def dequantize_q4_1(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    d = f16_to_f32(b["d"])[:, None]
    m = f16_to_f32(b["m"])[:, None]
    qs = b["qs"]
    lo = (qs & 0x0F).astype(F32)
    hi = (qs >> 4).astype(F32)
    y = np.concatenate([lo, hi], axis=-1) * d + m
    return _unblock(y, blocks)


# --------------------------------------------------------------------------
# q5_0: x = d * (q - 16), 5th bits packed in qh    (ggml.c:1000-1046)
# --------------------------------------------------------------------------

def quantize_q5_0(x: np.ndarray) -> np.ndarray:
    xb, lead = _blocks(x, 32)
    mx = _signed_absmax(xb)
    d = (mx / F32(-16.0)).astype(F32)
    id = _safe_inv(d)
    q = np.minimum(31, np.floor(xb * id[:, None] + F32(16.5)).astype(np.int32)).astype(
        np.uint8
    )
    lo, hi = q[:, :16], q[:, 16:]
    out = np.empty(xb.shape[0], dtype=BLOCK_Q5_0)
    out["d"] = f16(d)
    out["qs"] = (lo & 0x0F) | ((hi & 0x0F) << 4)
    shifts = np.arange(16, dtype=np.uint32)
    qh = (((lo >> 4).astype(np.uint32) << shifts).sum(axis=-1, dtype=np.uint32)
          | ((hi >> 4).astype(np.uint32) << (shifts + 16)).sum(axis=-1, dtype=np.uint32))
    out["qh"] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    return out.reshape(*lead, -1)


def _qh_bits(qh_bytes: np.ndarray) -> np.ndarray:
    """(nb, 4) uint8 -> (nb, 32) int32 of individual bits."""
    qh = np.ascontiguousarray(qh_bytes).view("<u4").reshape(-1)
    shifts = np.arange(32, dtype=np.uint32)
    return ((qh[:, None] >> shifts) & 1).astype(np.int32)


def dequantize_q5_0(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    d = f16_to_f32(b["d"])[:, None]
    bits = _qh_bits(b["qh"])
    qs = b["qs"]
    lo = (qs & 0x0F).astype(np.int32) | (bits[:, :16] << 4)
    hi = (qs >> 4).astype(np.int32) | (bits[:, 16:] << 4)
    y = (np.concatenate([lo, hi], axis=-1) - 16).astype(F32) * d
    return _unblock(y, blocks)


# --------------------------------------------------------------------------
# q5_1: x = d * q + m                              (ggml.c:1048-1095)
# --------------------------------------------------------------------------

def quantize_q5_1(x: np.ndarray) -> np.ndarray:
    xb, lead = _blocks(x, 32)
    mn = xb.min(axis=-1).astype(F32)
    mx = xb.max(axis=-1).astype(F32)
    d = ((mx - mn) / F32(31.0)).astype(F32)
    id = _safe_inv(d)
    q = np.floor((xb - mn[:, None]) * id[:, None] + F32(0.5)).astype(np.int32).astype(
        np.uint8
    )
    lo, hi = q[:, :16], q[:, 16:]
    out = np.empty(xb.shape[0], dtype=BLOCK_Q5_1)
    out["d"] = f16(d)
    out["m"] = f16(mn)
    out["qs"] = (lo & 0x0F) | ((hi & 0x0F) << 4)
    shifts = np.arange(16, dtype=np.uint32)
    qh = (((lo >> 4).astype(np.uint32) << shifts).sum(axis=-1, dtype=np.uint32)
          | ((hi >> 4).astype(np.uint32) << (shifts + 16)).sum(axis=-1, dtype=np.uint32))
    out["qh"] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    return out.reshape(*lead, -1)


def dequantize_q5_1(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    d = f16_to_f32(b["d"])[:, None]
    m = f16_to_f32(b["m"])[:, None]
    bits = _qh_bits(b["qh"])
    qs = b["qs"]
    lo = (qs & 0x0F).astype(np.int32) | (bits[:, :16] << 4)
    hi = (qs >> 4).astype(np.int32) | (bits[:, 16:] << 4)
    y = np.concatenate([lo, hi], axis=-1).astype(F32) * d + m
    return _unblock(y, blocks)


# --------------------------------------------------------------------------
# q8_0: x = d * q, q in [-127,127] via roundf      (ggml.c:1097-1126)
# --------------------------------------------------------------------------

def quantize_q8_0(x: np.ndarray) -> np.ndarray:
    xb, lead = _blocks(x, 32)
    amax = np.abs(xb).max(axis=-1).astype(F32)
    d = (amax / F32(127.0)).astype(F32)
    id = _safe_inv(d)
    q = roundf(xb * id[:, None]).astype(np.int8)
    out = np.empty(xb.shape[0], dtype=BLOCK_Q8_0)
    out["d"] = f16(d)
    out["qs"] = q
    return out.reshape(*lead, -1)


def dequantize_q8_0(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    y = b["qs"].astype(F32) * f16_to_f32(b["d"])[:, None]
    return _unblock(y, blocks)


# --------------------------------------------------------------------------
# q8_1: like q8_0 but f32 scale + precomputed s = d*sum(q)  (ggml.c:1282-1316)
# --------------------------------------------------------------------------

def quantize_q8_1(x: np.ndarray) -> np.ndarray:
    xb, lead = _blocks(x, 32)
    amax = np.abs(xb).max(axis=-1).astype(F32)
    d = (amax / F32(127.0)).astype(F32)
    id = _safe_inv(d)
    q = roundf(xb * id[:, None]).astype(np.int8)
    out = np.empty(xb.shape[0], dtype=BLOCK_Q8_1)
    out["d"] = d
    out["qs"] = q
    out["s"] = (q.sum(axis=-1, dtype=np.int32).astype(F32) * d).astype(F32)
    return out.reshape(*lead, -1)


def dequantize_q8_1(blocks: np.ndarray) -> np.ndarray:
    b = blocks.reshape(-1)
    y = b["qs"].astype(F32) * b["d"].astype(F32)[:, None]
    return _unblock(y, blocks)


# --------------------------------------------------------------------------
# dot products against q8 activations (the decode inner loop semantics,
# ggml.c:2339-3608 scalar paths) — used for tests and as the numerics spec
# for the Pallas kernels.
# --------------------------------------------------------------------------

def _int_nibbles(blocks: np.ndarray, offset: int) -> np.ndarray:
    qs = blocks["qs"]
    lo = (qs & 0x0F).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    return np.concatenate([lo, hi], axis=-1) - offset


def vec_dot_q4_0_q8_0(xb: np.ndarray, yb: np.ndarray) -> float:
    qx = _int_nibbles(xb, 8)
    sumi = (qx * yb["qs"].astype(np.int32)).sum(axis=-1)
    terms = sumi.astype(F32) * f16_to_f32(xb["d"]) * f16_to_f32(yb["d"])
    return float(_seqsum_f32(terms))


def vec_dot_q4_1_q8_1(xb: np.ndarray, yb: np.ndarray) -> float:
    qx = _int_nibbles(xb, 0)
    sumi = (qx * yb["qs"].astype(np.int32)).sum(axis=-1)
    terms = (f16_to_f32(xb["d"]) * yb["d"]) * sumi.astype(F32) + f16_to_f32(
        xb["m"]
    ) * yb["s"]
    return float(_seqsum_f32(terms))


def _q5_ints(xb: np.ndarray, offset: int) -> np.ndarray:
    bits = _qh_bits(xb["qh"])
    qs = xb["qs"]
    lo = (qs & 0x0F).astype(np.int32) | (bits[:, :16] << 4)
    hi = (qs >> 4).astype(np.int32) | (bits[:, 16:] << 4)
    return np.concatenate([lo, hi], axis=-1) - offset


def vec_dot_q5_0_q8_0(xb: np.ndarray, yb: np.ndarray) -> float:
    qx = _q5_ints(xb, 16)
    sumi = (qx * yb["qs"].astype(np.int32)).sum(axis=-1)
    terms = (f16_to_f32(xb["d"]) * f16_to_f32(yb["d"])) * sumi.astype(F32)
    return float(_seqsum_f32(terms))


def vec_dot_q5_1_q8_1(xb: np.ndarray, yb: np.ndarray) -> float:
    qx = _q5_ints(xb, 0)
    sumi = (qx * yb["qs"].astype(np.int32)).sum(axis=-1)
    terms = (f16_to_f32(xb["d"]) * yb["d"]) * sumi.astype(F32) + f16_to_f32(
        xb["m"]
    ) * yb["s"]
    return float(_seqsum_f32(terms))


def vec_dot_q8_0_q8_0(xb: np.ndarray, yb: np.ndarray) -> float:
    sumi = (xb["qs"].astype(np.int32) * yb["qs"].astype(np.int32)).sum(axis=-1)
    terms = sumi.astype(F32) * f16_to_f32(xb["d"]) * f16_to_f32(yb["d"])
    return float(_seqsum_f32(terms))


def _seqsum_f32(terms: np.ndarray) -> np.float32:
    """Sequential float32 accumulation, matching the C per-block loop order."""
    acc = F32(0.0)
    for t in terms.astype(F32):
        acc = F32(acc + t)
    return acc
