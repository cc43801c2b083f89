"""QTensor: a quantized 2-D weight as a JAX pytree in planar layout.

The device-side twin of quant.pack.PlanarQuant, stored *transposed*
(K-major) so the fused Pallas matmul's quant groups broadcast along TPU
sublanes (see ops/pallas/qmm.py).  All model families keep their weights as
QTensors and share one matmul hot path, mirroring how every reference
architecture funnels into ggml_compute_forward_mul_mat_q_f32
(ggml.c:11226).
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
    meta_fields=["gsize", "qtype", "shape"],
)
@dataclass
class QTensor:
    """Logical weight W [N, K] (ggml row-major: N out rows, K reduce dim),

    stored transposed: W[n, k] = levels_t[k, n] * gscale_t[k//gsize, n]
                                 (+ gbias_t[k//gsize, n])."""

    levels_t: jax.Array  # int8 [K, N]
    gscale_t: jax.Array  # f32 [K//gsize, N]
    gbias_t: jax.Array | None  # f32 [K//gsize, N] or None
    gsize: int
    qtype: GGMLType
    shape: tuple[int, int]  # (N, K)

    @property
    def n_out(self) -> int:
        return self.shape[0]

    @property
    def n_in(self) -> int:
        return self.shape[1]

    @staticmethod
    def from_planar(p: PlanarQuant, device=None) -> "QTensor":
        put = partial(jax.device_put, device=device) if device else jnp.asarray
        return QTensor(
            levels_t=put(np.ascontiguousarray(p.levels.T)),
            gscale_t=put(np.ascontiguousarray(p.gscale.T)),
            gbias_t=put(np.ascontiguousarray(p.gbias.T)) if p.gbias is not None else None,
            gsize=p.gsize,
            qtype=p.qtype,
            shape=p.shape,
        )

    @staticmethod
    def quantize(w: np.ndarray, qtype: GGMLType) -> "QTensor":
        return QTensor.from_planar(quantize_planar(np.asarray(w, np.float32), qtype))

    def dequantize_t(self, dtype=jnp.float32) -> jax.Array:
        """Dequantize to W^T [K, N] (the matmul-ready orientation)."""
        n, k = self.shape
        g = k // self.gsize
        w = self.levels_t.astype(jnp.float32).reshape(g, self.gsize, n)
        w = w * self.gscale_t[:, None, :]
        if self.gbias_t is not None:
            w = w + self.gbias_t[:, None, :]
        return w.reshape(k, n).astype(dtype)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Dequantize to the logical W [N, K]."""
        return self.dequantize_t(dtype).T

    def rows(self, idx: jax.Array, dtype=jnp.float32) -> jax.Array:
        """Gather + dequantize logical rows (ggml_get_rows for embeddings)."""
        lv = jnp.take(self.levels_t, idx, axis=1).astype(jnp.float32)  # [K, ...]
        gs = jnp.take(self.gscale_t, idx, axis=1)
        k = self.shape[1]
        g = k // self.gsize
        w = lv.reshape(g, self.gsize, *lv.shape[1:]) * gs[:, None, ...]
        if self.gbias_t is not None:
            gb = jnp.take(self.gbias_t, idx, axis=1)
            w = w + gb[:, None, ...]
        w = w.reshape(k, *lv.shape[1:])
        return jnp.moveaxis(w, 0, -1).astype(dtype)  # [..., K]
