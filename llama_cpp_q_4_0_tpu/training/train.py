"""Training step: loss + autodiff + optimizers, sharded over the mesh.

TPU-native replacement for the reference's training stack:
  - ggml_build_backward hand-written per-op VJPs (ggml.c:15954-16989)
      -> jax.grad through the same forward the inference path uses
  - ggml_opt Adam / L-BFGS with line search (ggml.c:18352-19153,
    ggml.h:1316-1474) -> optax.adamw / optax.lbfgs(zoom linesearch)
  - ggml_cross_entropy_loss (ggml.c) -> cross_entropy_loss below
  - pthread row-sharding -> pjit over a (dp, sp, tp) Mesh: batch on dp,
    tokens on sp, Megatron col/row weight sharding on tp (parallel/shard.py);
    XLA emits psum/all-gather over ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models import transformer
from ..models.config import ModelConfig
from ..models.transformer import TransformerParams, init_cache


@dataclass(frozen=True)
class OptParams:
    """ggml_opt_params analogue (ggml.h:1354-1419), trimmed to what the
    trainer exposes (train-text-from-scratch.cpp --adam/--lbfgs flags)."""

    kind: str = "adam"  # adam | lbfgs
    lr: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    grad_clip: float = 0.0  # gclip (ggml.h:1392); 0 = off
    lbfgs_m: int = 6  # history size (ggml.h:1403)


def make_optimizer(op: OptParams) -> optax.GradientTransformation:
    if op.kind == "adam":
        tx = optax.adamw(op.lr, b1=op.beta1, b2=op.beta2, eps=op.eps,
                         weight_decay=op.weight_decay)
    elif op.kind == "lbfgs":
        tx = optax.lbfgs(memory_size=op.lbfgs_m)
    else:
        raise ValueError(op.kind)
    if op.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(op.grad_clip), tx)
    # uniform update() signature: L-BFGS needs (value, grad, value_fn) for its
    # zoom line search; Adam ignores them
    return optax.with_extra_args_support(tx)


def init_opt_state(tx: optax.GradientTransformation, params):
    """tx.init, then copy every state leaf into its own buffer: L-BFGS state
    aliases the params it was initialized with (and aliases some of its own
    fields to one another), which breaks the train step's buffer donation
    (double-donation of one buffer)."""
    return jax.tree.map(jnp.copy, tx.init(params))


def cross_entropy_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean token NLL (ggml_cross_entropy_loss; train loop target one-hots,
    train-text-from-scratch.cpp get_example_targets)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def squared_error_loss(logits: jax.Array, targets_onehot: jax.Array) -> jax.Array:
    """rwkv_opt's squared-error option (rwkv.cpp:1384-1401)."""
    d = logits.astype(jnp.float32) - targets_onehot.astype(jnp.float32)
    return jnp.sum(d * d)


def lm_loss(cfg: ModelConfig, params: TransformerParams, tokens: jax.Array,
            targets: jax.Array) -> jax.Array:
    """Full-sequence causal LM loss. tokens/targets: [B, T] int32."""
    b, t = tokens.shape
    cache_k, cache_v = init_cache(cfg, b, t, dtype=jnp.float32)
    logits, _, _ = transformer.forward(
        cfg, params, tokens, jnp.int32(0), cache_k, cache_v, last_only=False
    )
    return cross_entropy_loss(logits, targets)


def make_train_step(
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    loss_fn: Callable | None = None,
    donate: bool = True,
) -> Callable:
    """Returns jitted step(params, opt_state, tokens, targets) ->
    (params, opt_state, loss).  Shardings flow from the arguments (put the
    params on the mesh with parallel.shard.shard_transformer first); XLA
    partitions forward, backward and the update identically.

    donate=False is required for L-BFGS: its opt_state stores a copy of the
    params, which XLA aliases to the params output buffer, so donating both
    on the next call double-donates one buffer."""
    loss_fn = loss_fn or partial(lm_loss, cfg)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, tokens, targets)
        )(params)
        updates, opt_state = tx.update(
            grads, opt_state, params,
            value=loss, grad=grads,
            value_fn=lambda p: loss_fn(p, tokens, targets),
        )
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step

