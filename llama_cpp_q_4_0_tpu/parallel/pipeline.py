"""Pipeline parallelism: GPipe-style layer stages over a `pp` mesh axis.

The reference's only 'pipeline' is CPU<->GPU layer offload
(llama.cpp:1054-1084, SURVEY.md §2.3) — a heterogeneous 2-stage trick, not
true PP.  Here the stacked layer params (training/stacked.py) are split
into S contiguous stages, microbatches flow through the ring via ppermute,
and the loss accumulates on the last stage.  The whole schedule is
differentiable (ppermute transposes to the reverse permute), so one
jax.grad gives pipeline-parallel training.

Schedule: M microbatches over S stages, M + S - 1 ticks, every stage
computing every tick (bubbles compute zeros — SPMD keeps one program).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.4.35
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.config import ModelConfig
from ..models.transformer import TransformerParams, _embed, _mm, _norm
from ..training.stacked import layer_apply
from ..training.train import cross_entropy_loss


def stage_specs(params: TransformerParams) -> TransformerParams:
    """Layer-stacked params: the [L] leading axis shards over pp; embedding
    and head replicated (they live on the first/last stage logically but
    SPMD keeps them everywhere — tiny next to the layer stack)."""
    (blk,) = params.blocks
    blk_specs = jax.tree.map(lambda x: P("pp"), blk)
    rep = lambda x: None if x is None else P()
    return TransformerParams(
        tok_embeddings=rep(params.tok_embeddings), blocks=(blk_specs,),
        out_norm_w=rep(params.out_norm_w), out_norm_b=rep(params.out_norm_b),
        output=rep(params.output),
    )


def pp_loss(
    cfg: ModelConfig,
    params: TransformerParams,  # stacked (training/stacked.stack_params)
    tokens: jax.Array,   # [M, mb, T] microbatched
    targets: jax.Array,  # [M, mb, T]
    mesh: Mesh,
) -> jax.Array:
    """Mean LM loss across microbatches, computed through the pipeline.

    NOTE: wrap in jax.jit (and jax.grad) at the call site and reuse — the
    shard_map closure here is rebuilt per call."""
    pp = mesh.shape["pp"]
    m, mb, t = tokens.shape
    specs = stage_specs(params)

    def body(params, tokens, targets):
        stage = jax.lax.axis_index("pp")
        (blk_stage,) = params.blocks  # [L/pp, ...] local layers

        def local_layers(x):
            def scan_body(h, blk):
                return layer_apply(cfg, blk, h), None

            h, _ = jax.lax.scan(scan_body, x, blk_stage)
            return h

        def tick(carry, i):
            x_prev, loss_sum, n_loss = carry
            # stage 0 injects microbatch i (zeros past the end)
            mb_idx = jnp.clip(i, 0, m - 1)
            toks_i = jax.lax.dynamic_index_in_dim(tokens, mb_idx, 0,
                                                  keepdims=False)
            injected = _embed(params, toks_i)
            x_in = jnp.where(stage == 0, injected, x_prev)
            y = local_layers(x_in)
            # last stage: head + loss for microbatch i - (pp - 1)
            out_idx = i - (pp - 1)
            tgt = jax.lax.dynamic_index_in_dim(
                targets, jnp.clip(out_idx, 0, m - 1), 0, keepdims=False)
            h = _norm(cfg, y, params.out_norm_w, params.out_norm_b)
            logits = _mm(h, params.output, cfg=cfg)
            l_i = cross_entropy_loss(logits, tgt)
            take = (stage == pp - 1) & (out_idx >= 0) & (out_idx < m)
            loss_sum = loss_sum + jnp.where(take, l_i, 0.0)
            n_loss = n_loss + jnp.where(take, 1, 0)
            # rotate activations: stage s -> s+1
            perm = [(s, (s + 1) % pp) for s in range(pp)]
            x_next = jax.lax.ppermute(y, "pp", perm)
            return (x_next, loss_sum, n_loss), ()

        x0 = jnp.zeros((mb, t, cfg.n_embd), jnp.float32)
        (xf, loss_sum, n_loss), _ = jax.lax.scan(
            tick, (x0, jnp.float32(0.0), jnp.int32(0)),
            jnp.arange(m + pp - 1))
        # share the last stage's mean loss with everyone
        total = jax.lax.psum(loss_sum, "pp")
        count = jax.lax.psum(n_loss, "pp")
        return total / count.astype(jnp.float32)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(params, tokens, targets)
