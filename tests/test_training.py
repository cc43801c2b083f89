"""Training-stack tests: autodiff + optimizers + checkpoints.

Covers what the reference gates with test-grad0 / test-opt /
train-text-from-scratch (SURVEY.md §4) — here jax.grad replaces the
hand-written VJPs, so the test asserts end-to-end: loss decreases under both
optimizers, gradients are finite, resume from checkpoint is exact."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.models.config import ModelConfig
from llama_cpp_q_4_0_tpu.training import (
    OptParams, cross_entropy_loss, init_transformer, load_checkpoint,
    init_opt_state, make_optimizer, make_train_step, save_checkpoint,
)
from llama_cpp_q_4_0_tpu.training.train import lm_loss


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.llama(n_vocab=64, n_embd=32, n_mult=16, n_head=2,
                            n_layer=2, n_rot=16, n_ctx=16)
    params = init_transformer(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 64, (4, 16)), jnp.int32)
    targets = jnp.roll(tokens, -1, axis=1)
    return cfg, params, tokens, targets


@pytest.mark.parametrize("kind", ["adam", "lbfgs"])
def test_loss_decreases(setup, kind):
    cfg, params, tokens, targets = setup
    params = jax.tree.map(jnp.copy, params)  # fixture survives donation
    tx = make_optimizer(OptParams(kind=kind, lr=1e-2))
    opt_state = init_opt_state(tx, params)
    step = make_train_step(cfg, tx, donate=(kind == "adam"))
    l0 = None
    p = params
    for i in range(4 if kind == "lbfgs" else 10):  # lbfgs iters are slow on 1 cpu
        p, opt_state, loss = step(p, opt_state, tokens, targets)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0, (kind, l0, float(loss))
    assert np.isfinite(float(loss))


def test_grad_finite_and_nonzero(setup):
    cfg, params, tokens, targets = setup
    grads = jax.grad(lambda p: lm_loss(cfg, p, tokens, targets))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, params, tokens, targets = setup
    params = jax.tree.map(jnp.copy, params)
    tx = make_optimizer(OptParams(kind="adam", lr=1e-2))
    opt_state = init_opt_state(tx, params)
    step = make_train_step(cfg, tx)
    p, opt_state, _ = step(params, opt_state, tokens, targets)

    path = os.path.join(tmp_path, "ckpt.bin")
    save_checkpoint(path, cfg, p, opt_state, step=1)

    params_like = init_transformer(cfg, jax.random.key(1))
    opt_like = init_opt_state(tx, params_like)
    cfg2, p2, opt2, st = load_checkpoint(path, params_like, opt_like)
    assert cfg2 == cfg and st == 1

    # resume both, next step must be bit-identical
    a = step(p, opt_state, tokens, targets)
    b = step(jax.tree.map(jnp.asarray, p2), jax.tree.map(jnp.asarray, opt2),
             tokens, targets)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[[2.0, 0.0, -1.0], [0.5, 0.5, 0.5]]])
    targets = jnp.asarray([[0, 2]], jnp.int32)
    got = float(cross_entropy_loss(logits, targets))
    p = jax.nn.log_softmax(logits, axis=-1)
    want = float(-(p[0, 0, 0] + p[0, 1, 2]) / 2)
    assert abs(got - want) < 1e-6


def test_stacked_forward_matches_loop(setup):
    """Scan-over-layers forward == per-layer python loop forward."""
    from llama_cpp_q_4_0_tpu.models.transformer import init_cache
    from llama_cpp_q_4_0_tpu.models import transformer
    from llama_cpp_q_4_0_tpu.training.stacked import (
        stack_params, stacked_forward, unstack_params,
    )

    cfg, params, tokens, targets = setup
    ck, cv = init_cache(cfg, tokens.shape[0], tokens.shape[1],
                        dtype=jnp.float32)
    ref, _, _ = transformer.forward(cfg, params, tokens, jnp.int32(0),
                                    ck, cv, last_only=False)
    sp = stack_params(params)
    for remat in (False, True):
        got = stacked_forward(cfg, sp, tokens, remat=remat)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
    # unstack round-trips exactly
    back = unstack_params(sp, cfg.n_layer)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stacked_train_step_loss_decreases(setup):
    from llama_cpp_q_4_0_tpu.training import OptParams, init_opt_state, make_optimizer
    from llama_cpp_q_4_0_tpu.training.stacked import (
        make_stacked_train_step, stack_params,
    )

    cfg, params, tokens, targets = setup
    sp = stack_params(jax.tree.map(jnp.copy, params))
    tx = make_optimizer(OptParams(kind="adam", lr=1e-2))
    opt = init_opt_state(tx, sp)
    step = make_stacked_train_step(cfg, tx, remat=True)
    l0 = None
    for _ in range(6):
        sp, opt, loss = step(sp, opt, tokens, targets)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0
