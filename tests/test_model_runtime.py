"""End-to-end runtime tests on tiny random GGJT models (all four archs)."""

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import (
    make_falcon_like_ggjt,
    make_gptneox_ggjt,
    make_llama_ggjt,
)
from llama_cpp_q_4_0_tpu.formats.ggjt import detect_arch, read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams


def _build(tmp_path, arch):
    path = str(tmp_path / f"{arch}.ggjt")
    if arch == "llama":
        make_llama_ggjt(path)
    elif arch == "gptneox":
        make_gptneox_ggjt(path)
    else:
        make_falcon_like_ggjt(path, arch)
    return path


@pytest.mark.parametrize("arch", ["llama", "gptneox", "falcon", "bonsai"])
def test_load_and_greedy_decode(tmp_path, arch):
    path = _build(tmp_path, arch)
    # falcon/bonsai files are byte-identical in structure: sniffing yields falcon
    assert detect_arch(path) == ("falcon" if arch == "bonsai" else arch)
    gf = read_ggjt(path, arch)
    cfg = config_from_ggjt(gf, n_ctx=128)
    params = load_transformer(gf, cfg)
    ctx = Context(cfg, params, n_ctx=128)

    prompt = [1, 5, 10, 42]
    gp = GenerateParams(n_predict=8, sampling=SamplingParams(temp=0.0),
                        ignore_eos=True)
    toks1 = list(generate(ctx, prompt, gp))
    assert len(toks1) == 8
    assert all(0 <= t < cfg.n_vocab for t in toks1)

    # determinism across a fresh context
    ctx2 = Context(cfg, params, n_ctx=128)
    toks2 = list(generate(ctx2, prompt, gp))
    assert toks1 == toks2


def test_prefill_equals_incremental(tmp_path):
    """Evaluating a prompt in one shot must equal token-by-token decode —
    the KV-cache correctness gate."""
    path = _build(tmp_path, "llama")
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    params = load_transformer(gf, cfg)

    prompt = [1, 7, 19, 3, 25, 4, 9]
    ctx_a = Context(cfg, params, n_ctx=64)
    la = ctx_a.eval(np.asarray([prompt], np.int32), logits_all=True)

    import jax.numpy as jnp

    ctx_b = Context(cfg, params, n_ctx=64, cache_dtype=jnp.float32)
    outs = []
    for t in prompt:
        outs.append(ctx_b.eval(np.asarray([[t]], np.int32))[0, -1])
    lb = np.stack(outs)
    np.testing.assert_allclose(la[0], lb, atol=2e-2, rtol=2e-2)


def test_context_swap_infinite_text(tmp_path):
    path = _build(tmp_path, "llama")
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=32)
    params = load_transformer(gf, cfg)
    ctx = Context(cfg, params, n_ctx=32)
    gp = GenerateParams(n_predict=48, n_keep=2, ignore_eos=True,
                        sampling=SamplingParams(temp=0.0))
    toks = list(generate(ctx, [1, 5, 9], gp))
    assert len(toks) == 48  # ran past n_ctx via swap


def test_fused_projections_match_unfused(tmp_path):
    """Load-time QKV/gate-up fusion must be a pure no-op numerically."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    path = str(tmp_path / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    fused = load_transformer(gf, cfg, fuse=True)
    plain = load_transformer(gf, cfg, fuse=False)
    assert fused.blocks[0].wqkv is not None and fused.blocks[0].wq is None
    assert fused.blocks[0].w_gateup is not None

    toks = np.asarray([[3, 9, 27, 6]], np.int32)
    a = Context(cfg, fused, n_ctx=64, cache_dtype=jnp.float32).eval(toks)
    b = Context(cfg, plain, n_ctx=64, cache_dtype=jnp.float32).eval(toks)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
