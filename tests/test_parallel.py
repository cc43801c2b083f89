"""Multi-chip sharding tests on the virtual 8-device CPU mesh — the
distributed coverage the reference lacks entirely (SURVEY.md §4: "no
distributed tests"), run the TPU way per SURVEY.md §2.3."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.models import transformer
from llama_cpp_q_4_0_tpu.models.config import ModelConfig
from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor
from llama_cpp_q_4_0_tpu.parallel import (
    make_mesh, shard_cache, shard_tokens, shard_transformer,
)
from llama_cpp_q_4_0_tpu.quant.types import GGMLType
from llama_cpp_q_4_0_tpu.models.transformer import Block, TransformerParams


def tiny_q_model(seed=0, n_vocab=256, e=128, n_head=4, n_layer=2, f=256):
    import dataclasses

    cfg = ModelConfig.llama(n_vocab=n_vocab, n_embd=e, n_mult=32,
                            n_head=n_head, n_layer=n_layer, n_rot=e // n_head,
                            n_ctx=64)
    cfg = dataclasses.replace(cfg, n_ff=f)
    rng = np.random.default_rng(seed)
    q = lambda n, k: QTensor.quantize(
        rng.standard_normal((n, k), dtype=np.float32) * 0.05, GGMLType.Q4_0)
    blocks = tuple(
        Block(attn_norm_w=jnp.ones((e,)), wq=q(e, e), wk=q(e, e), wv=q(e, e),
              wo=q(e, e), ffn_norm_w=jnp.ones((e,)),
              w_gate=q(f, e), w_up=q(f, e), w_down=q(e, f))
        for _ in range(n_layer))
    params = TransformerParams(tok_embeddings=q(n_vocab, e), blocks=blocks,
                               out_norm_w=jnp.ones((e,)), out_norm_b=None,
                               output=q(n_vocab, e))
    return cfg, params


@pytest.fixture(scope="module")
def model():
    return tiny_q_model()


def _forward(cfg, params, tokens, batch):
    ck, cv = transformer.init_cache(cfg, batch, 64)
    logits, _, _ = transformer.forward(cfg, params, tokens, jnp.int32(0),
                                       ck, cv, last_only=False)
    return np.asarray(logits)


def test_tp_sharded_forward_matches_single_device(model):
    """Megatron col/row sharding must be numerically identical to 1 chip."""
    cfg, params = model
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 255, (2, 16)),
                         jnp.int32)
    ref = _forward(cfg, params, tokens, 2)

    mesh = make_mesh(dp=2, sp=1, tp=4)
    with mesh:
        sp_params = shard_transformer(params, mesh)
        stok = shard_tokens(tokens, mesh)
        out = _forward(cfg, sp_params, stok, 2)
    np.testing.assert_allclose(ref, out, rtol=2e-4, atol=2e-4)


def test_sequence_parallel_prefill(model):
    cfg, params = model
    tokens = jnp.asarray(np.random.default_rng(2).integers(0, 255, (2, 16)),
                         jnp.int32)
    ref = _forward(cfg, params, tokens, 2)
    mesh = make_mesh(dp=2, sp=2, tp=2)
    with mesh:
        sp_params = shard_transformer(params, mesh)
        stok = shard_tokens(tokens, mesh, sequence_parallel=True)
        out = _forward(cfg, sp_params, stok, 2)
    np.testing.assert_allclose(ref, out, rtol=2e-4, atol=2e-4)


def test_sharded_decode_with_cache(model):
    """Decode: prefill then 3 single-token steps, sharded == unsharded."""
    cfg, params = model
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, 255, (2, 8)), jnp.int32)
    steps = [jnp.asarray(rng.integers(0, 255, (2, 1)), jnp.int32)
             for _ in range(3)]

    def run(params, prompt, steps, cfg):
        ck, cv = transformer.init_cache(cfg, 2, 64)
        logits, ck, cv = transformer.forward(cfg, params, prompt,
                                             jnp.int32(0), ck, cv,
                                             last_only=True)
        n_past = 8
        outs = [np.asarray(logits)]
        for s in steps:
            logits, ck, cv = transformer.forward(cfg, params, s,
                                                 jnp.int32(n_past), ck, cv,
                                                 last_only=True)
            outs.append(np.asarray(logits))
            n_past += 1
        return outs

    ref = run(params, prompt, steps, cfg)
    mesh = make_mesh(dp=2, sp=1, tp=4)
    with mesh:
        sp = shard_transformer(params, mesh)
        outs = run(sp, shard_tokens(prompt, mesh),
                   [shard_tokens(s, mesh) for s in steps], cfg)
    for r, o in zip(ref, outs):
        np.testing.assert_allclose(r, o, rtol=2e-4, atol=2e-4)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    logits, ck, cv = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(logits)).all()
    g.dryrun_multichip(8)
