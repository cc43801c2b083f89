"""Scaled-int8 KV cache (QuantKV): round-trip fidelity, forward accuracy vs
f32 cache, decode stability, session save/load, KV shift, and the batch
engine path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models import transformer
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.models.transformer import QuantKV, quantize_kv
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams
from llama_cpp_q_4_0_tpu.runtime.session import (
    get_state,
    set_state,
    shift_kv_cache,
)

GREEDY = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                        repeat_last_n=0)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("qkv") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    return cfg, load_transformer(gf, cfg)


def test_quantize_kv_roundtrip_error():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(0, 3.0, (2, 5, 4, 32)).astype(np.float32))
    q, s = quantize_kv(v)
    deq = q.astype(jnp.float32) * s[..., None]
    # amax/127 scaling: error bounded by scale/2 = amax/254 per vector
    amax = np.abs(np.asarray(v)).max(axis=-1, keepdims=True)
    assert np.all(np.abs(np.asarray(deq - v)) <= amax / 254 + 1e-7)


def test_quantize_kv_zero_vector_safe():
    q, s = quantize_kv(jnp.zeros((1, 2, 3, 8)))
    assert np.all(np.asarray(q) == 0) and np.all(np.asarray(s) == 1.0)


def test_forward_logits_close_to_f32_cache(model):
    cfg, params = model
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(3, 250, (1, 16)), jnp.int32)

    ck, cv = transformer.init_cache(cfg, 1, 64, dtype=jnp.float32)
    ref, _, _ = transformer.forward(cfg, params, toks, jnp.int32(0), ck, cv)
    qk, qv = transformer.init_cache(cfg, 1, 64, dtype=jnp.int8)
    assert isinstance(qk[0], QuantKV)
    got, qk, qv = transformer.forward(cfg, params, toks, jnp.int32(0), qk, qv)
    err = np.abs(np.asarray(got - ref)).max()
    spread = np.asarray(ref).max() - np.asarray(ref).min()
    assert err < 0.02 * spread, (err, spread)


def test_greedy_decode_matches_f32_cache(model):
    """On a tiny model the int8 cache should not flip any greedy token."""
    cfg, params = model
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 250, 8).tolist()

    def run(dtype):
        ctx = Context(cfg, params, cache_dtype=dtype)
        return list(generate(ctx, prompt, GenerateParams(
            n_predict=16, sampling=GREEDY, ignore_eos=True), eos_token=-1))

    assert run(jnp.int8) == run(jnp.float32)


def test_session_state_roundtrip_q8(model):
    cfg, params = model
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 250, 8).tolist()
    ctx = Context(cfg, params, cache_dtype=jnp.int8)
    ctx.eval(np.asarray([prompt], np.int32))
    st = get_state(ctx)

    ctx2 = Context(cfg, params, cache_dtype=jnp.int8)
    set_state(ctx2, st)
    assert ctx2.n_past == ctx.n_past
    # identical continuation after restore (lossless snapshot)
    l1 = ctx.eval(np.asarray([[42]], np.int32))
    l2 = ctx2.eval(np.asarray([[42]], np.int32))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_session_state_cross_dtype(model):
    """A q8 state blob restores into a float-cache context (dequantized)."""
    cfg, params = model
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, 250, 8).tolist()
    ctx = Context(cfg, params, cache_dtype=jnp.int8)
    ctx.eval(np.asarray([prompt], np.int32))
    st = get_state(ctx)

    ctx_f = Context(cfg, params, cache_dtype=jnp.float32)
    set_state(ctx_f, st)
    # restored f32 cache holds the exact dequantized values; the only
    # divergence is that ctx re-quantizes the NEW token's K/V and ctx_f
    # doesn't — so logits agree to quantization error, not exactly
    l1 = ctx.eval(np.asarray([[42]], np.int32))
    l2 = ctx_f.eval(np.asarray([[42]], np.int32))
    err = np.abs(np.asarray(l1 - l2)).max()
    spread = np.asarray(l1).max() - np.asarray(l1).min()
    assert err < 0.02 * spread, (err, spread)


def test_shift_kv_q8(model):
    """Layer-0 q8 cache after a shift matches a from-scratch eval of the
    surviving tokens to quantization error (the layer-0-exactness gate of
    test_session.test_kv_shift_layer0_exact, plus one requantization on the
    moved K rows).  Deeper layers keep stale hidden states by design —
    llama_shift_kv_cache semantics (llama.cpp:3016-3042)."""
    cfg, params = model
    rng = np.random.default_rng(5)
    toks = rng.integers(3, 250, 12).tolist()
    n_keep, n_discard = 2, 4
    survive = toks[:n_keep] + toks[n_keep + n_discard:]

    ctx = Context(cfg, params, cache_dtype=jnp.int8)
    ctx.eval(np.asarray([toks], np.int32))
    shift_kv_cache(ctx, n_keep, n_discard)
    assert ctx.n_past == len(survive)

    ref = Context(cfg, params, cache_dtype=jnp.int8)
    ref.eval(np.asarray([survive], np.int32))
    n = len(survive)

    def deq(c):
        return (np.asarray(c.data, np.float32)
                * np.asarray(c.scale)[..., None])

    for got_c, ref_c in ((ctx.cache_k[0], ref.cache_k[0]),
                         (ctx.cache_v[0], ref.cache_v[0])):
        got, want = deq(got_c)[:, :n], deq(ref_c)[:, :n]
        amax = np.abs(want).max(axis=-1, keepdims=True)
        # two roundings' worth of per-vector tolerance
        assert np.all(np.abs(got - want) <= 2 * amax / 127 + 1e-6)

    out = ctx.eval(np.asarray([[99]], np.int32))
    assert np.isfinite(out).all()


def test_batch_engine_q8(model):
    from llama_cpp_q_4_0_tpu.runtime.batch_engine import BatchEngine, Request

    cfg, params = model
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64,
                      cache_dtype=jnp.int8)
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt_tokens=[5 + i, 9, 23],
                                   n_predict=6, sampling=GREEDY, seed=1))
                for i in range(3)]
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    for o in outs:
        assert 0 < len(o) <= 6
    # engine greedy == single-session greedy with the same q8 cache
    ctx = Context(cfg, params, cache_dtype=jnp.int8, n_ctx=64)
    want = list(generate(ctx, [5, 9, 23], GenerateParams(
        n_predict=6, sampling=GREEDY), eos_token=-1))[:len(outs[0])]
    assert outs[0] == want


def test_perplexity_ondevice_q8(model):
    """On-device ppl honors the context's q8 cache and stays close to the
    f32-cache ppl on the tiny fixture."""
    from llama_cpp_q_4_0_tpu.runtime.perplexity import perplexity_ondevice

    cfg, params = model
    rng = np.random.default_rng(7)
    toks = rng.integers(3, 250, 3 * 32).tolist()

    r_f = perplexity_ondevice(Context(cfg, params, cache_dtype=jnp.float32),
                              toks, n_ctx=32)
    r_q = perplexity_ondevice(Context(cfg, params, cache_dtype=jnp.int8),
                              toks, n_ctx=32)
    assert abs(r_q.ppl - r_f.ppl) / r_f.ppl < 0.02, (r_q.ppl, r_f.ppl)


def test_q8_cache_with_mqa(tmp_path):
    """QuantKV through the MQA repeat path (Falcon-style n_kv_head=1)."""
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_falcon_like_ggjt

    path = str(tmp_path / "falcon.bin")
    make_falcon_like_ggjt(path, "falcon", n_vocab=256, n_embd=64, n_head=4,
                          n_layer=2)
    gf = read_ggjt(path, "falcon")
    cfg = config_from_ggjt(gf, n_ctx=64)
    params = load_transformer(gf, cfg)
    assert cfg.kv_heads == 1

    rng = np.random.default_rng(9)
    toks = jnp.asarray(rng.integers(3, 250, (1, 12)), jnp.int32)
    ck, cv = transformer.init_cache(cfg, 1, 64, dtype=jnp.float32)
    ref, _, _ = transformer.forward(cfg, params, toks, jnp.int32(0), ck, cv)
    qk, qv = transformer.init_cache(cfg, 1, 64, dtype=jnp.int8)
    got, _, _ = transformer.forward(cfg, params, toks, jnp.int32(0), qk, qv)
    err = np.abs(np.asarray(got - ref)).max()
    spread = np.asarray(ref).max() - np.asarray(ref).min()
    assert err < 0.02 * spread, (err, spread)


def test_ondevice_spec_with_q8_cache(model):
    """Device speculative decoding over a QuantKV cache: exact greedy
    parity with the plain q8-cache decode loop."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
    from llama_cpp_q_4_0_tpu.runtime.device_spec import generate_ondevice_spec
    from llama_cpp_q_4_0_tpu.runtime.speculative import SpecParams

    cfg, params = model
    rng = np.random.default_rng(61)
    prompt = rng.integers(3, 250, 10).tolist()

    ctx_ref = Context(cfg, params, cache_dtype=jnp.int8)
    want = list(generate(ctx_ref, prompt, GenerateParams(
        n_predict=16, sampling=GREEDY, ignore_eos=True), eos_token=-1))

    ctx = Context(cfg, params, cache_dtype=jnp.int8)
    got = generate_ondevice_spec(
        ctx, prompt, 16, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=4), n_steps=3, ignore_eos=True)
    assert got == want, (want, got)
