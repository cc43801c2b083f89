"""LowRankPatched: a weight with an unmerged LoRA delta.

The reference merges LoRA into the base weights (w += (α/r)·BA,
llama.cpp:2716-2991) and must requantize quantized targets — it even warns
about the quality hit (llama.cpp:2915).  On TPU the better design is to
keep the quantized base bit-exact and apply the low-rank delta at matmul
time:

    y = q_matmul(x, base) + ((x @ Aᵀ) @ Bᵀ) · (α/r)

two skinny extra matmuls (rank r ≪ K), zero requantization error, and
adapters can be added/removed/swapped without touching the base weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["base", "a", "b"],
    meta_fields=["scale"],
)
@dataclass
class LowRankPatched:
    """base: QTensor or dense [N, K]; a: [r, K]; b: [N, r]; y += (xAᵀ)Bᵀ·s."""

    base: object
    a: jax.Array
    b: jax.Array
    scale: float

    @property
    def shape(self):
        return self.base.shape

    def delta(self) -> jax.Array:
        """Materialized [N, K] delta (for tests / merge)."""
        return (self.b.astype(jnp.float32)
                @ self.a.astype(jnp.float32)) * self.scale


def lowrank_apply(x2: jax.Array, w: LowRankPatched) -> jax.Array:
    """The low-rank correction term for x2 [B, K] -> [B, N] f32."""
    xa = jnp.dot(x2.astype(jnp.float32), w.a.astype(jnp.float32).T,
                 preferred_element_type=jnp.float32)
    return jnp.dot(xa, w.b.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32) * w.scale


def patch(base, a: np.ndarray, b: np.ndarray, scale: float) -> LowRankPatched:
    return LowRankPatched(base=base, a=jnp.asarray(a, jnp.float32),
                          b=jnp.asarray(b, jnp.float32), scale=float(scale))
