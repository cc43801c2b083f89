"""GPipe-style pipeline parallelism (parallel/pipeline.py) vs the
single-device stacked forward: loss and gradients must match."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from llama_cpp_q_4_0_tpu.models.config import ModelConfig
from llama_cpp_q_4_0_tpu.parallel.pipeline import pp_loss
from llama_cpp_q_4_0_tpu.training import init_transformer
from llama_cpp_q_4_0_tpu.training.stacked import stack_params, stacked_lm_loss


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.llama(n_vocab=64, n_embd=32, n_mult=16, n_head=2,
                            n_layer=4, n_rot=16, n_ctx=16)
    params = stack_params(init_transformer(cfg, jax.random.key(0)))
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 64, (4, 2, 16)), jnp.int32)  # [M,mb,T]
    tgts = jnp.asarray(np.roll(np.asarray(toks), -1, axis=2))
    return cfg, params, toks, tgts


def _pp_mesh(pp):
    return Mesh(np.asarray(jax.devices()[:pp]), ("pp",))


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_loss_matches_stacked(setup, pp):
    cfg, params, toks, tgts = setup
    ref = stacked_lm_loss(cfg, params,
                          toks.reshape(-1, toks.shape[2]),
                          tgts.reshape(-1, tgts.shape[2]))
    got = pp_loss(cfg, params, toks, tgts, _pp_mesh(pp))
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5, atol=2e-5)


def test_pp_grads_match(setup):
    cfg, params, toks, tgts = setup
    mesh = _pp_mesh(2)
    g_pp = jax.grad(lambda p: pp_loss(cfg, p, toks, tgts, mesh))(params)
    g_ref = jax.grad(lambda p: stacked_lm_loss(
        cfg, p, toks.reshape(-1, 16), tgts.reshape(-1, 16)))(params)
    # matmuls run in bf16 (cfg.compute_dtype): reordering the reduction
    # shifts grads by O(1e-3) relative — structural errors would be O(1)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=3e-4)
