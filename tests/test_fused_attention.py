"""Fused Pallas decode attention (interpret mode) == einsum attention.

The kernel streams KV tiles with an online softmax; these gates pin its
semantics to ops.layers.attention exactly: causal masking by absolute
position, kv_mask gating, and QuantKV scale folding (K scales on scores,
V scales on probabilities)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_q_4_0_tpu.ops.kvcache import QuantKV, quantize_kv
from llama_cpp_q_4_0_tpu.ops.layers import attention
from llama_cpp_q_4_0_tpu.ops.pallas.attention import mha_decode


@pytest.fixture(autouse=True)
def _exact_einsum_reference(monkeypatch):
    """Pin the einsum reference to the exact f32 chain: the fused kernel
    computes f32 internally from the stored values, and the r5
    storage-dtype MXU default (ATTN_MXU) would add bf16-input rounding to
    the REFERENCE side of these 2e-5 comparisons."""
    monkeypatch.setenv("ATTN_MXU", "0")


def _case(b=2, t=1, s=512, h=8, d=128, n_past=100, seed=0, quant=False, g=None):
    g = g or h  # n_kv heads: g < h exercises the MQA/GQA grouped branch
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, g, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, g, d)), jnp.float32)
    pos = jnp.broadcast_to(n_past + jnp.arange(t), (b, t)).astype(jnp.int32)
    mask = (jnp.arange(s) < n_past + t)[None, :] & jnp.ones((b, 1), bool)
    scale = 1.0 / np.sqrt(d)
    if quant:
        kq, ksc = quantize_kv(k)
        vq, vsc = quantize_kv(v)
        kc, vc = QuantKV(kq, ksc), QuantKV(vq, vsc)
        return q, kc, vc, (kq, ksc, vq, vsc), pos, mask, scale
    return q, k, v, (k, None, v, None), pos, mask, scale


@pytest.mark.parametrize("t", [1, 4])
@pytest.mark.parametrize("quant", [False, True], ids=["f32", "q8kv"])
def test_fused_matches_einsum(t, quant):
    q, kc, vc, raw, pos, mask, scale = _case(t=t, quant=quant, seed=t)
    kd, ks, vd, vs = raw
    want = np.asarray(attention(q, kc, vc, pos, mask, scale))
    got = np.asarray(
        mha_decode(q, kd, ks, vd, vs, pos, mask, scale,
                   block_s=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("t", [1, 5, 16])
@pytest.mark.parametrize("g", [1, 2], ids=["mqa", "gqa"])
@pytest.mark.parametrize("quant", [False, True], ids=["f32", "q8kv"])
def test_fused_grouped_heads(t, g, quant):
    """MQA (g=1, falcon.cpp:1194-1227) and GQA (1<g<h) decode/verify shapes:
    the kernel's grouped MXU contraction must equal the grouped einsum of
    ops.layers.attention, with K/V streamed at n_kv width."""
    q, kc, vc, raw, pos, mask, scale = _case(
        t=t, h=8, g=g, quant=quant, seed=10 * t + g)
    kd, ks, vd, vs = raw
    assert kd.shape[2] == g
    want = np.asarray(attention(q, kc, vc, pos, mask, scale))
    got = np.asarray(
        mha_decode(q, kd, ks, vd, vs, pos, mask, scale,
                   block_s=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_verify_t16():
    """Speculative-verify shape: t=16 queries over one shared cache."""
    q, kc, vc, raw, pos, mask, scale = _case(t=16, seed=77)
    kd, ks, vd, vs = raw
    want = np.asarray(attention(q, kc, vc, pos, mask, scale))
    got = np.asarray(mha_decode(q, kd, ks, vd, vs, pos, mask, scale,
                                block_s=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_per_row_positions():
    """Continuous batching: each row at its own n_past; masks differ per
    row."""
    b, t, s, h, d = 3, 1, 256, 4, 128
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    n_past = np.array([7, 200, 0], np.int32)
    pos = jnp.asarray(n_past[:, None] + np.arange(t), jnp.int32)
    mask = jnp.asarray(np.arange(s)[None, :] < (n_past[:, None] + t))
    scale = 1.0 / np.sqrt(d)
    want = np.asarray(attention(q, k, v, pos, mask, scale))
    got = np.asarray(mha_decode(q, k, None, v, None, pos, mask, scale,
                                block_s=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_windowed_mask():
    """O(1) KV-shift leaves non-prefix masks (a hole after the swap); the
    kernel must honor arbitrary kv_mask patterns, not assume a prefix."""
    b, t, s, h, d = 1, 1, 256, 4, 128
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    keep = np.zeros((b, s), bool)
    keep[:, :16] = True          # retained prefix
    keep[:, 120:201] = True      # shifted window
    pos = jnp.full((b, t), 200, jnp.int32)
    mask = jnp.asarray(keep)
    scale = 1.0 / np.sqrt(d)
    want = np.asarray(attention(q, k, v, pos, mask, scale))
    got = np.asarray(mha_decode(q, k, None, v, None, pos, mask, scale,
                                block_s=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_bf16_cache():
    q, _, _, _, pos, mask, scale = _case(seed=2)
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.standard_normal((2, 512, 8, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 512, 8, 128)), jnp.bfloat16)
    want = np.asarray(attention(q, k, v, pos, mask, scale))
    got = np.asarray(mha_decode(q, k, None, v, None, pos, mask, scale,
                                block_s=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
