"""State/session/KV-shift coverage (save-load-state example + llama.cpp
state API + llama_shift_kv_cache semantics, SURVEY.md §5)."""

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.session import (
    get_state, load_session, save_session, session_prefix_match, set_state,
    shift_kv_cache, state_from_bytes, state_to_bytes,
)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    path = str(tmp_path_factory.mktemp("m") / "tiny.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    params = load_transformer(gf, cfg)
    return cfg, params


def _ctx(model, **kw):
    import jax.numpy as jnp

    cfg, params = model
    return Context(cfg, params, n_ctx=64, cache_dtype=jnp.float32, **kw)


def test_state_blob_roundtrip(model):
    ctx = _ctx(model)
    toks = np.asarray([[3, 5, 7, 11, 13]], np.int32)
    ref_logits = ctx.eval(toks)
    blob = state_to_bytes(get_state(ctx))

    ctx2 = _ctx(model)
    set_state(ctx2, state_from_bytes(blob))
    assert ctx2.n_past == ctx.n_past
    np.testing.assert_array_equal(ctx2.logits, ref_logits)

    # decoding continues identically from the restored state
    nxt = np.asarray([[17]], np.int32)
    a = ctx.eval(nxt)
    b = ctx2.eval(nxt)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_session_file_roundtrip(tmp_path, model):
    ctx = _ctx(model)
    tokens = [1, 3, 5, 7]
    ctx.eval(np.asarray([tokens], np.int32))
    rng = np.random.default_rng(7)
    rng.integers(0, 100)  # advance
    save_session(str(tmp_path / "s.bin"), ctx, tokens, rng=rng)

    ctx2 = _ctx(model)
    rng2 = np.random.default_rng(0)
    loaded = load_session(str(tmp_path / "s.bin"), ctx2, rng=rng2)
    assert loaded == tokens
    assert ctx2.n_past == ctx.n_past
    assert rng2.bit_generator.state == rng.bit_generator.state


def test_session_bad_magic(tmp_path, model):
    import zipfile, json

    p = str(tmp_path / "bad.bin")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("meta.json", json.dumps({"magic": "nope", "version": 1}))
    with pytest.raises(ValueError, match="magic"):
        load_session(p, _ctx(model))


def test_prefix_match():
    assert session_prefix_match([1, 2, 3], [1, 2, 4]) == 2
    assert session_prefix_match([], [1]) == 0
    assert session_prefix_match([1, 2], [1, 2, 3]) == 2


def test_kv_shift_layer0_exact(model):
    """After a shift, layer-0 cache slots (which depend only on the input
    tokens, not on dropped context) must exactly equal a from-scratch eval of
    the surviving tokens — proving the relocation + K re-rotation is exact.
    Deeper layers legitimately keep stale hidden states, the same semantics
    as the reference's llama_shift_kv_cache (llama.cpp:3016-3042)."""
    cfg, params = model
    toks = [3, 5, 7, 11, 13, 17]
    n_keep, n_discard = 2, 2
    survive = toks[:n_keep] + toks[n_keep + n_discard:]

    ctx = _ctx(model)
    ctx.eval(np.asarray([toks], np.int32))
    shift_kv_cache(ctx, n_keep, n_discard)
    assert ctx.n_past == len(survive)

    ref = _ctx(model)
    ref.eval(np.asarray([survive], np.int32))
    n = len(survive)
    np.testing.assert_allclose(
        np.asarray(ctx.cache_k[0])[:, :n], np.asarray(ref.cache_k[0])[:, :n],
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ctx.cache_v[0])[:, :n], np.asarray(ref.cache_v[0])[:, :n],
        rtol=1e-5, atol=1e-5)

    # decoding continues cleanly from the shifted state
    out = ctx.eval(np.asarray([[19]], np.int32))
    assert np.isfinite(out).all()


def test_rwkv_state_roundtrip(tmp_path):
    """Recurrent-state branch of the session API (rwkv.h:140-153)."""
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_rwkv_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_rwkv
    from llama_cpp_q_4_0_tpu.runtime.context import RwkvContext

    path = str(tmp_path / "r.bin")
    make_rwkv_ggjt(path, n_vocab=128, n_embd=32, n_layer=1)
    gf = read_ggjt(path, "rwkv")
    cfg = config_from_ggjt(gf, n_ctx=64)
    ctx = RwkvContext(cfg, load_rwkv(gf, cfg))
    ctx.eval(np.asarray([[5, 9, 11]], np.int32))
    blob = state_to_bytes(get_state(ctx))

    ctx2 = RwkvContext(cfg, ctx.params)
    set_state(ctx2, state_from_bytes(blob))
    assert ctx2.n_past == 3
    a = ctx.eval(np.asarray([[7]], np.int32))
    b = ctx2.eval(np.asarray([[7]], np.int32))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_malformed_ggjt_errors(tmp_path):
    """Corrupt files must raise ValueError, not crash (reader hardening)."""
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt as rg

    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic|GGML"):
        rg(str(bad), "llama")

    # right magic, absurd header
    import struct

    bad.write_bytes(struct.pack("<II", 0x67676A74, 3) + b"\xff" * 64)
    with pytest.raises(ValueError):
        rg(str(bad), "llama")
