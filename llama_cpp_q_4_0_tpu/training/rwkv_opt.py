"""RWKV online training — rwkv_opt parity (rwkv.h:163-166, rwkv.cpp:1767-1840).

The reference's fork-exclusive feature: after observing that `actual` should
follow the current state instead of the model's prediction, run a few L-BFGS
iterations on the single-token squared-error (or cross-entropy) loss and
report the error before/after.  Here jax.grad + optax.lbfgs replace
ggml_build_backward + ggml_opt; the recurrent state is the fixed input and
advances with the updated weights afterwards, like the reference's final
graph compute."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models import rwkv as rwkv_mod
from ..models.config import ModelConfig
from ..ops.qtensor import QTensor
from .train import squared_error_loss


def _loss_fn(cfg: ModelConfig, params, token, state, target_onehot,
             kind: str):
    logits, new_state = rwkv_mod.forward(
        cfg, params, token, state, last_only=True
    )
    if kind == "squared_error":
        # per-element squared error; reference reads errors[actual]
        # (rwkv.cpp:1812) but optimizes the full vector sum
        loss = squared_error_loss(logits[0, -1], target_onehot)
    elif kind == "cross_entropy":  # rwkv_cross_entropy_loss (rwkv.cpp:1389)
        logp = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
        loss = -jnp.sum(logp * target_onehot)
    else:
        raise ValueError(kind)
    err_at_target = jnp.sum(
        ((logits[0, -1] - target_onehot) ** 2) * target_onehot
    )
    return loss, (err_at_target, new_state)


def rwkv_opt(ctx, token: int, actual: int, *, n_iter: int = 16,
             loss: str = "squared_error") -> tuple[float, float]:
    """One online-training step on (state, token) -> actual.

    Mutates ctx.params (optimized) and ctx.state (advanced one token with
    the updated weights).  Returns (error_before, error_after): the squared
    error of the target logit, matching state.error_before/_after
    (rwkv.cpp:1812-1836)."""
    cfg, params, state = ctx.cfg, ctx.params, ctx.state
    if any(isinstance(leaf, QTensor)
           for leaf in jax.tree.leaves(params,
                                       is_leaf=lambda x: isinstance(x, QTensor))):
        raise ValueError("rwkv_opt needs dense (f32/f16) weights — "
                         "quantized levels have no gradient")

    tok = jnp.asarray([[token]], jnp.int32)
    target = jnp.zeros((cfg.n_vocab,), jnp.float32).at[actual].set(1.0)
    tx = optax.with_extra_args_support(optax.lbfgs())
    loss_of = partial(_loss_fn, cfg, token=tok, state=state,
                      target_onehot=target, kind=loss)

    @jax.jit
    def run(params):
        opt_state = tx.init(params)
        (l0, (err0, _)), _ = jax.value_and_grad(loss_of, has_aux=True)(params)

        def body(carry, _):
            p, s = carry
            (l, (e, _)), g = jax.value_and_grad(loss_of, has_aux=True)(p)
            updates, s = tx.update(
                g, s, p, value=l, grad=g,
                value_fn=lambda q: loss_of(q)[0],
            )
            return (optax.apply_updates(p, updates), s), e

        (p_new, _), _ = jax.lax.scan(body, (params, opt_state), None,
                                     length=n_iter)
        l1, (err1, new_state) = loss_of(p_new)
        return p_new, new_state, err0, err1

    p_new, new_state, err0, err1 = run(params)
    ctx.params = p_new
    ctx.state = new_state
    ctx.n_past += 1
    return float(err0), float(err1)
