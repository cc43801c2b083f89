"""MQA/GQA broadcast must happen INSIDE the attention einsum.

The reference materializes the single K/V head to n_head copies with
ggml_repeat (falcon.cpp:1225-1227, its own comment: "cheap hack").  Our
attention contracts grouped query heads against the stored KV head
directly — these tests gate (a) numerical equality with an explicit
repeat, and (b) that the lowered HLO contains no [B, S, n_head, D]
intermediate (the materialized cache)."""

import re

import jax
import jax.numpy as jnp
import numpy as np

from llama_cpp_q_4_0_tpu.ops.layers import attention


def _inputs(b=2, t=3, s=32, n_head=8, n_kv=1, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, n_head, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, n_kv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, n_kv, d)), jnp.float32)
    n_past = 5
    pos = jnp.broadcast_to(n_past + jnp.arange(t), (b, t)).astype(jnp.int32)
    mask = (jnp.arange(s) < n_past + t)[None, :] & jnp.ones((b, 1), bool)
    return q, k, v, pos, mask, 1.0 / np.sqrt(d)


def test_grouped_mqa_matches_explicit_repeat():
    for n_kv in (1, 2, 4):
        q, k, v, pos, mask, scale = _inputs(n_kv=n_kv, seed=n_kv)
        got = attention(q, k, v, pos, mask, scale)
        rep = q.shape[2] // n_kv
        want = attention(q, jnp.repeat(k, rep, axis=2),
                         jnp.repeat(v, rep, axis=2), pos, mask, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_mqa_hlo_has_no_materialized_repeat():
    """No [B, S, n_head, D] f32 tensor may appear anywhere in the lowered
    attention HLO when n_kv < n_head (b=2, s=32, h=8, d=16 here — the
    repeated cache would be tensor<2x32x8x16xf32>)."""
    q, k, v, pos, mask, scale = _inputs(b=2, s=32, n_head=8, n_kv=1, d=16)
    txt = jax.jit(attention, static_argnames=("scale",)).lower(
        q, k, v, pos, mask, scale).as_text()
    assert not re.search(r"tensor<2x32x8x16xf32>", txt), \
        "materialized repeated KV cache found in HLO"
    # sanity: the single-head cache type must be present
    assert re.search(r"tensor<2x32x1x16xf32>", txt)


def test_gqa_grouping_maps_heads_correctly():
    """Query head h must attend kv head h // rep (the repeat-layout
    correspondence).  Build K/V whose heads are wildly different so a
    grouping mistake changes the output."""
    b, t, s, n_head, n_kv, d = 1, 2, 16, 4, 2, 8
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, t, n_head, d)), jnp.float32)
    k = np.zeros((b, s, n_kv, d), np.float32)
    v = np.zeros((b, s, n_kv, d), np.float32)
    k[:, :, 0] = rng.standard_normal((b, s, d))
    k[:, :, 1] = 100.0 + rng.standard_normal((b, s, d))
    v[:, :, 0] = 1.0
    v[:, :, 1] = -1.0
    pos = jnp.broadcast_to(jnp.arange(t) + 4, (b, t)).astype(jnp.int32)
    mask = (jnp.arange(s) < 6)[None, :] & jnp.ones((b, 1), bool)
    out = np.asarray(attention(q, jnp.asarray(k), jnp.asarray(v), pos, mask,
                               1.0 / np.sqrt(d)))
    # V is constant per kv head, so outputs are exactly +-1 per query head
    np.testing.assert_allclose(out[:, :, :2], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[:, :, 2:], -1.0, atol=1e-5)
