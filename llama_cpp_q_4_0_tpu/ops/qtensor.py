"""QTensor: a quantized 2-D weight as a JAX pytree in planar layout.

The device-side twin of quant.pack.PlanarQuant, stored *transposed*
(K-major) so the fused Pallas matmul's quant groups broadcast along TPU
sublanes (see ops/pallas/qmm.py).  All model families keep their weights as
QTensors and share one matmul hot path, mirroring how every reference
architecture funnels into ggml_compute_forward_mul_mat_q_f32
(ggml.c:11226).

Sub-5-bit formats (q4_0/q4_1/q2_K/q3_K/q4_K) pack two levels per byte in
*split-half* layout: byte[r, n] holds level k=r in the low nibble and
k=r+K/2 in the high nibble (biased by pack_zero so both nibbles are
unsigned).  Split-half, not adjacent-pair, because the kernel then unpacks
with two cheap masks and zero cross-lane shuffles — each nibble plane is
already a contiguous K-panel.  This is the TPU answer to ggml's interleaved
block_q4_0 bytes (ggml.c:870-875): decode is HBM-bandwidth-bound, and 4-bit
packing halves the bytes per token.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.pack import PlanarQuant, quantize_planar
from ..quant.types import GGMLType


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["levels_t", "gscale_t", "gbias_t"],
    meta_fields=["gsize", "qtype", "shape", "pack_zero"],
)
@dataclass
class QTensor:
    """Logical weight W [N, K] (ggml row-major: N out rows, K reduce dim).

    Unpacked: levels_t int8 [K, N];  W[n, k] = levels_t[k, n] *
    gscale_t[k//gsize, n] (+ gbias_t[k//gsize, n]).

    Packed (pack_zero is not None): levels_t uint8 [K2P, N] where
    K2P = K/2 rounded up to 256 (zero-padded rows);
    level(k) = (byte[k, n] & 0xF) - pack_zero          for k <  K/2
             = (byte[k - K/2, n] >> 4) - pack_zero     for k >= K/2
    and gscale_t/gbias_t become [2, K2P/gsize, N] (plane 0 = low-nibble
    panel's group scales, plane 1 = high; pad rows are zero so padded
    columns contribute nothing).  The 256 alignment keeps every Pallas
    scale tile sublane-aligned for any K (e.g. llama's 11008 FFN dim).
    """

    levels_t: jax.Array  # int8 [K, N] | uint8 [K2P, N] when packed
    gscale_t: jax.Array  # f32 [K//gsize, N] | [2, K2P//gsize, N] packed
    gbias_t: jax.Array | None  # f32, same shape rule as gscale_t
    gsize: int
    qtype: GGMLType
    shape: tuple[int, int]  # (N, K)
    pack_zero: int | None = None  # nibble bias; None = unpacked int8

    @property
    def n_out(self) -> int:
        return self.shape[0]

    @property
    def n_in(self) -> int:
        return self.shape[1]

    @property
    def packed(self) -> bool:
        return self.pack_zero is not None

    @staticmethod
    def from_planar(p: PlanarQuant, device=None, pack: bool = True) -> "QTensor":
        put = partial(jax.device_put, device=device) if device else jnp.asarray
        lv = np.ascontiguousarray(p.levels.T)  # [K, N] int8
        gs = np.ascontiguousarray(p.gscale.T)  # [K/gsize, N] f32
        gb = np.ascontiguousarray(p.gbias.T) if p.gbias is not None else None
        k, n = lv.shape
        pack_zero = None
        # each half-panel must hold whole quant groups so per-plane scale
        # tiles align in the kernel
        if pack and k % 2 == 0 and (k // 2) % p.gsize == 0:
            lo, hi = int(lv.min()), int(lv.max())
            if hi - lo <= 15:
                pack_zero = -lo
                k2 = k // 2
                k2p = -(-k2 // 256) * 256
                packed = np.zeros((k2p, n), np.uint8)
                packed[:k2] = (((lv[k2:].astype(np.int16) + pack_zero) << 4)
                               | (lv[:k2].astype(np.int16) + pack_zero))
                g2, g2p = k2 // p.gsize, k2p // p.gsize
                sc = np.zeros((2, g2p, n), np.float32)
                sc[0, :g2] = gs[:g2]
                sc[1, :g2] = gs[g2:]
                lv, gs = packed, sc
                if gb is not None:
                    bi = np.zeros((2, g2p, n), np.float32)
                    bi[0, :g2] = gb[:g2]
                    bi[1, :g2] = gb[g2:]
                    gb = bi
        # note: fp16/bf16 scale storage was measured on v5e and won <2% —
        # decode stays f32 for bit-exactness with the reference quantizers
        return QTensor(
            levels_t=put(lv),
            gscale_t=put(gs),
            gbias_t=put(gb) if gb is not None else None,
            gsize=p.gsize,
            qtype=p.qtype,
            shape=p.shape,
            pack_zero=pack_zero,
        )

    @staticmethod
    def quantize(w: np.ndarray, qtype: GGMLType, pack: bool = True) -> "QTensor":
        return QTensor.from_planar(
            quantize_planar(np.asarray(w, np.float32), qtype), pack=pack
        )

    def repack_row_shards(self, tp: int) -> "QTensor":
        """Re-pack for ROW-parallel sharding over `tp` chips: each chip's
        contiguous K-slice is split-half packed independently, and the
        per-shard planes are stacked so NamedSharding P('tp') on the leading
        axis hands every chip a self-contained packed layout.

        Result: levels uint8 [tp*K2P_l, N] (shard-major), scales
        [tp*2, K2P_l/gsize, N]; `shape` records the LOCAL logical
        (N, K/tp), so inside shard_map the tensor needs no fixup."""
        lv = np.asarray(self.levels_full())  # [K, N] int8
        gs = np.asarray(self.gscale_full())
        gb = None if self.gbias_t is None else np.asarray(self.gbias_full())
        k, n = lv.shape
        assert k % tp == 0, (k, tp)
        kl = k // tp
        assert kl % 2 == 0 and (kl // 2) % self.gsize == 0, (kl, self.gsize)
        lo, hi = int(lv.min()), int(lv.max())
        assert hi - lo <= 15, "levels exceed 4 bits; cannot pack"
        zero = -lo
        k2 = kl // 2
        k2p = -(-k2 // 256) * 256
        g2, g2p = k2 // self.gsize, k2p // self.gsize
        gl = kl // self.gsize
        levels = np.zeros((tp * k2p, n), np.uint8)
        scales = np.zeros((tp * 2, g2p, n), np.float32)
        bias = None if gb is None else np.zeros((tp * 2, g2p, n), np.float32)
        for s in range(tp):
            sl = lv[s * kl : (s + 1) * kl]
            levels[s * k2p : s * k2p + k2] = (
                ((sl[k2:].astype(np.int16) + zero) << 4)
                | (sl[:k2].astype(np.int16) + zero)).astype(np.uint8)
            sg = gs[s * gl : (s + 1) * gl]
            scales[2 * s, :g2] = sg[:g2]
            scales[2 * s + 1, :g2] = sg[g2:]
            if gb is not None:
                sb = gb[s * gl : (s + 1) * gl]
                bias[2 * s, :g2] = sb[:g2]
                bias[2 * s + 1, :g2] = sb[g2:]
        return QTensor(
            levels_t=jnp.asarray(levels), gscale_t=jnp.asarray(scales),
            gbias_t=None if bias is None else jnp.asarray(bias),
            gsize=self.gsize, qtype=self.qtype, shape=(n, kl),
            pack_zero=zero,
        )

    def unpack(self) -> "QTensor":
        """Return the unpacked-int8 twin (host op).  Needed for row-parallel
        sharding: the split-half nibble pairing (k with k+K/2) makes a
        contiguous slice of packed rows correspond to a *discontiguous* set
        of reduce-dim indices, so packed tensors only shard column-wise."""
        if not self.packed:
            return self
        return QTensor(
            levels_t=jnp.asarray(np.asarray(self.levels_full())),
            gscale_t=jnp.asarray(np.asarray(self.gscale_full())),
            gbias_t=(jnp.asarray(np.asarray(self.gbias_full()))
                     if self.gbias_t is not None else None),
            gsize=self.gsize, qtype=self.qtype, shape=self.shape,
            pack_zero=None,
        )

    def fold_zero(self) -> "QTensor":
        """Fold the symmetric pack zero-point into an affine group bias:
        w = d*(nib - z) == d*nib + (-z*d), with -z*d exact (power-of-two
        multiple of d).  The hot kernel then unpacks with mask/shift only —
        the two per-byte VPU subtracts disappear (the dequant VPU chain is
        the decode/prefill bottleneck beyond HBM, NOTES r2 12a) — and the
        bias term rides the existing xg group-sum seed dot.  Every consumer
        (kernels, XLA fallback, rows()) already honors pack_zero=0 + gbias."""
        if not self.packed or not self.pack_zero or self.gbias_t is not None:
            return self
        gb = (self.gscale_t.astype(jnp.float32)
              * jnp.float32(-self.pack_zero)).astype(self.gscale_t.dtype)
        return QTensor(levels_t=self.levels_t, gscale_t=self.gscale_t,
                       gbias_t=gb, gsize=self.gsize, qtype=self.qtype,
                       shape=self.shape, pack_zero=0)

    def scales_f16(self) -> "QTensor":
        """Store the group scale (and bias) planes as fp16 — half the
        plane bytes in the decode weight stream.

        EXACT, not a precision trade: ggml block formats store d/m as
        fp16 in the file (ggml.c block_q4_0.d), so every gscale value
        round-trips f32→f16→f32 bit-identically, and the Pallas kernels
        decode fp16 scale tiles back to the *same* f32 in-kernel
        (_scales_f32 integer bit decode); the XLA fallback / rows()
        promote f16→f32 exactly.  The folded gbias = -pack_zero*d is an
        exponent shift of an fp16 value — exact in fp16 for any real
        weight scale (overflow needs amax > 4k).

        Motivation (2026-08-20): after zero-fold, 7B q4_0 decode streams
        5.05 GB/token at ~565 GB/s effective — bandwidth-bound, and the
        two f32 plane families are 1.68 GB of it.  fp16 planes cut the
        stream to 4.21 GB (−17%).  An earlier-round measurement ("won
        <2%") predates the fold, when decode was VPU-bound at ~404 GB/s
        — the regime changed."""
        if self.gscale_t.dtype == jnp.float16:
            return self
        gs = self.gscale_t.astype(jnp.float16)
        gb = (self.gbias_t.astype(jnp.float16)
              if self.gbias_t is not None else None)
        return QTensor(levels_t=self.levels_t, gscale_t=gs, gbias_t=gb,
                       gsize=self.gsize, qtype=self.qtype,
                       shape=self.shape, pack_zero=self.pack_zero)

    def levels_full(self) -> jax.Array:
        """Unpacked int8 levels [K, N] (device op; packed -> unpack)."""
        if not self.packed:
            return self.levels_t
        k2 = self.shape[1] // 2
        p = self.levels_t.astype(jnp.int32)
        lo = (p & 0xF) - self.pack_zero
        hi = ((p >> 4) & 0xF) - self.pack_zero
        return jnp.concatenate([lo[:k2], hi[:k2]], axis=0).astype(jnp.int8)

    def gscale_full(self) -> jax.Array:
        """Group scales in logical [K/gsize, N] order."""
        if not self.packed:
            return self.gscale_t
        g2 = (self.shape[1] // 2) // self.gsize
        return jnp.concatenate([self.gscale_t[0, :g2], self.gscale_t[1, :g2]], axis=0)

    def gbias_full(self) -> jax.Array | None:
        if self.gbias_t is None or not self.packed:
            return self.gbias_t
        g2 = (self.shape[1] // 2) // self.gsize
        return jnp.concatenate([self.gbias_t[0, :g2], self.gbias_t[1, :g2]], axis=0)

    def dequantize_t(self, dtype=jnp.float32) -> jax.Array:
        """Dequantize to W^T [K, N] (the matmul-ready orientation)."""
        n, k = self.shape
        g = k // self.gsize
        w = self.levels_full().astype(jnp.float32).reshape(g, self.gsize, n)
        w = w * self.gscale_full()[:, None, :]
        gb = self.gbias_full()
        if gb is not None:
            w = w + gb[:, None, :]
        return w.reshape(k, n).astype(dtype)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Dequantize to the logical W [N, K]."""
        return self.dequantize_t(dtype).T

    def rows(self, idx: jax.Array, dtype=jnp.float32) -> jax.Array:
        """Gather + dequantize logical rows (ggml_get_rows for embeddings)."""
        k = self.shape[1]
        if self.packed:
            k2 = k // 2
            p = jnp.take(self.levels_t, idx, axis=1).astype(jnp.int32)
            lo = (p & 0xF) - self.pack_zero
            hi = ((p >> 4) & 0xF) - self.pack_zero
            lv = jnp.concatenate([lo[:k2], hi[:k2]], axis=0).astype(jnp.float32)
            gs = jnp.take(self.gscale_full(), idx, axis=1)
        else:
            lv = jnp.take(self.levels_t, idx, axis=1).astype(jnp.float32)
            gs = jnp.take(self.gscale_t, idx, axis=1)
        g = k // self.gsize
        w = lv.reshape(g, self.gsize, *lv.shape[1:]) * gs[:, None, ...]
        gb = self.gbias_full()
        if gb is not None:
            w = w + jnp.take(gb, idx, axis=1)[:, None, ...]
        w = w.reshape(k, *lv.shape[1:])
        return jnp.moveaxis(w, 0, -1).astype(dtype)  # [..., K]


# Formats whose group scales are the file's raw fp16 d (and bias m) —
# f32→fp16 storage is bit-exact for these.  EXCLUDED: k-quants (effective
# gscale = d × 6-bit integer subscale, a product that can need more
# mantissa than fp16 carries) and q8_1 (its d/s are f32 in the file,
# ggml.c block_q8_1).
_F16_EXACT_QTYPES = frozenset(
    (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
     GGMLType.Q8_0))


def cast_scales_bf16(params):
    """Map scale/bias planes to BFLOAT16 — same −17% decode bytes as the
    fp16 planes, but the in-kernel decode is a native bf16→f32 convert
    (~1 VPU op/scale) instead of _scales_f32's ~10-op integer f16
    bit-decode, which is what sank the fp16 experiment (r4: ~5-10% WORSE
    despite fewer bytes; the 3x VPU lesson).

    NOT exact: ggml stores d as fp16 (11-bit significand); bf16 keeps 8,
    so each group scale moves by <= 2^-9 relative (~0.2%) — an order
    below q4_0's own per-element quantization error.  Env-gated
    experiment (ab-decode 'kf-bf16s' variant); parity gates must not
    apply it."""
    def cast(t):
        if not isinstance(t, QTensor) or t.gscale_t.dtype != jnp.float32:
            return t
        import dataclasses

        return dataclasses.replace(
            t, gscale_t=t.gscale_t.astype(jnp.bfloat16),
            gbias_t=(None if t.gbias_t is None
                     else t.gbias_t.astype(jnp.bfloat16)))

    return jax.tree_util.tree_map(
        cast, params, is_leaf=lambda t: isinstance(t, QTensor))


def cast_scales_f16(params):
    """Map QTensor.scales_f16 over a parameter pytree for the formats
    where it is exact (see _F16_EXACT_QTYPES) — halves the scale/bias
    plane bytes in the bandwidth-bound decode weight stream."""
    return jax.tree_util.tree_map(
        lambda t: (t.scales_f16()
                   if isinstance(t, QTensor) and t.qtype in _F16_EXACT_QTYPES
                   else t),
        params, is_leaf=lambda t: isinstance(t, QTensor))


def maybe_cast_scales_f16(params):
    """Env-gated fp16 scale-plane storage (QMM_F16_SCALES=1 opts in).
    Numerically exact for the gated formats — the kernels decode fp16
    scale tiles to the identical f32 — so unlike zero-fold this can
    coexist with parity gates; kept opt-in until chip-measured."""
    import os

    if os.environ.get("QMM_F16_SCALES") != "1":
        return params
    return cast_scales_f16(params)


def fold_zero_points(params):
    """Map QTensor.fold_zero over a parameter pytree: symmetric packed
    formats (q4_0) trade two per-byte VPU subtracts for the tiny xg bias
    dot.  Numerics shift by <=1 bf16 ulp per weight (bf16(nib*d) rounds
    differently than bf16((nib-8)*d)); parity gates that require the exact
    reference chain must not apply it."""
    return jax.tree_util.tree_map(
        lambda t: t.fold_zero() if isinstance(t, QTensor) else t,
        params, is_leaf=lambda t: isinstance(t, QTensor))


def maybe_fold_zero_points(params):
    """Params-level zero-fold, now OPT-IN ONLY (QMM_ZERO_FOLD=1).

    History: the folded view (gbias planes, split decode/prefill views)
    was the TPU default for round 4 (−4.8% decode vs plain).  Round 5's
    in-kernel fold (q_matmul's kfold path, ops/pallas/qmm.py) reaches the
    same mask/shift-only unpack WITHOUT materializing gbias planes — it
    matched or beat the folded view at every ab-decode combo (10.15/
    10.18/10.99 vs 10.19/10.35/11.64 ms, interleaved medians 2026-08-20)
    while saving 0.79 GiB of HBM and the split-view machinery, so the
    params-level fold is no longer applied by default anywhere.
    QMM_ZERO_FOLD=1 restores it explicitly (tests, A/B harnesses)."""
    import os

    if os.environ.get("QMM_ZERO_FOLD") == "1":
        return fold_zero_points(params)
    return params
