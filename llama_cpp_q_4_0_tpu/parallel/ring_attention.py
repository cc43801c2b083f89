"""Ring attention over the sequence-parallel mesh axis.

The reference caps context at a preallocated n_ctx on one device and
handles overflow by recomputation (context swap, main.cpp:366-389).
SURVEY.md §2.3/§7 calls for a designed-fresh sequence-scaling story:
shard the token axis over the `sp` mesh axis, keep each shard's KV local,
and rotate KV blocks around the ring with `ppermute` while accumulating
attention in the streaming-softmax (flash) form — context length then
scales with the number of chips, and every hop rides ICI.

Communication: sp-1 ppermute hops of one KV block each; compute overlaps
the next hop because the loop body issues the permute before consuming the
current block's scores.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.4.35
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

NEG_INF = -1e30


import functools


@functools.lru_cache(maxsize=8)
def ring_prefill_fn(mesh: Mesh, axis: str = "sp"):
    """models.transformer.forward `attention_fn` adapter: full-prompt
    prefill attention rides the sp ring (one ppermute hop per KV block)
    instead of the cache-window einsum.  Valid for n_past == 0 whole-
    sequence calls only (forward's attention_fn contract).  lru-cached at
    MODULE level so jits treating the returned fn as a static argument
    see one stable object per mesh (a per-call cache would return a fresh
    fn each time and force a retrace per prefill)."""

    def fn(q, k, v, scale):
        return ring_self_attention(q, k, v, mesh, scale=scale,
                                   axis=axis).astype(jnp.float32)

    return fn


def _block_attend(q, k, v, q_pos, k_pos, scale):
    """One KV block's contribution in streaming-softmax form.

    q [B, Tq, H, D]; k/v [B, Tk, H, D]; positions are global token indices.
    Returns (m, l, o): block max [B, H, Tq], exp-sum, weighted V sum."""
    b, tq, h, d = q.shape
    g = k.shape[2]
    rep = h // g
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if rep == 1:
        s = jnp.einsum("bthd,bshd->bhts", qf, kf) * scale
    else:
        # MQA/GQA: contract grouped q heads against the single stored KV
        # head — broadcast inside the einsum, no repeated [B,Tk,H,D] cache
        qg = qf.reshape(b, tq, g, rep, d)
        s = jnp.einsum("btgrd,bsgd->bgrts", qg, kf).reshape(
            b, h, tq, kf.shape[1]) * scale
    causal = q_pos[:, None] >= k_pos[None, :]  # [Tq, Tk]
    s = jnp.where(causal[None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)  # [B, H, Tq]
    p = jnp.exp(s - m[..., None])
    # fully-masked rows: exp(NEG_INF - NEG_INF) = 1 would pollute l
    p = jnp.where(causal[None, None], p, 0.0)
    l = jnp.sum(p, axis=-1)
    if rep == 1:
        o = jnp.einsum("bhts,bshd->bthd", p, vf)
    else:
        pg = p.reshape(b, g, rep, tq, -1)
        o = jnp.einsum("bgrts,bsgd->btgrd", pg, vf).reshape(b, tq, h, d)
    return m, l, o


def _merge(m1, l1, o1, m2, l2, o2):
    """Combine two streaming-softmax partials (flash-attention merge)."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    l = l1 * a1 + l2 * a2
    o = o1 * a1.transpose(0, 2, 1)[..., None] + o2 * a2.transpose(0, 2, 1)[..., None]
    return m, l, o


def ring_self_attention(
    q: jax.Array,  # [B, T, H, D] sharded P(None, "sp") on T
    k: jax.Array,  # [B, T, H_kv, D] same sharding
    v: jax.Array,
    mesh: Mesh,
    *,
    scale: float | None = None,
    axis: str = "sp",
) -> jax.Array:
    """Causal self-attention with T sharded over the ring; output sharded
    the same way.  Numerically matches ops.layers.attention on the gathered
    sequence."""
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    sp = mesh.shape[axis]
    b, t_local_x_sp, h, d = q.shape
    spec = P(None, axis, None, None)

    def body(q, k, v):
        idx = jax.lax.axis_index(axis)
        tl = q.shape[1]
        q_pos = idx * tl + jnp.arange(tl)

        def step(carry, i):
            kv, m, l, o = carry
            kb, vb = kv
            # the block we hold at step i came from shard (idx - i) mod sp
            src = (idx - i) % sp
            k_pos = src * tl + jnp.arange(tl)
            # rotate while we compute: shard s sends its block to s+1
            perm = [(s, (s + 1) % sp) for s in range(sp)]
            kb_next = jax.lax.ppermute(kb, axis, perm)
            vb_next = jax.lax.ppermute(vb, axis, perm)
            mb, lb, ob = _block_attend(q, kb, vb, q_pos, k_pos, scale)
            m, l, o = _merge(m, l, o, mb, lb, ob)
            return ((kb_next, vb_next), m, l, o), ()

        m0 = jnp.full((b, h, tl), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, tl), jnp.float32)
        o0 = jnp.zeros((b, tl, h, d), jnp.float32)
        (_, m, l, o), _ = jax.lax.scan(
            step, ((k, v), m0, l0, o0), jnp.arange(sp))
        l = jnp.maximum(l, 1e-30)
        return o / l.transpose(0, 2, 1)[..., None]

    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec, spec, spec), out_specs=spec,
                   check_vma=False)
    return fn(q, k, v)
