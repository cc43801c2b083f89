"""Inference context: params + KV cache + jitted eval (the llama_context).

Mirrors the lifecycle of llama_new_context_with_model / llama_eval
(llama.cpp:2574, 3370): holds the model params, preallocated KV buffers and
n_past, and jit-compiles one forward per (batch, n_tokens-bucket) — the XLA
answer to ggml's build-graph-every-call.  Prompt lengths are padded up to
the next bucket so a handful of compilations serve any prompt.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models import transformer
from ..models.transformer import TransformerParams, init_cache

PREFILL_BUCKETS = (1, 8, 32, 64, 128, 256, 512, 1024, 2048)


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return ((n + 2047) // 2048) * 2048


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "last_only", "kv_window", "slice_last",
                     "attention_fn"),
    donate_argnames=("cache_k", "cache_v"),
)
def _eval_step(cfg, params, tokens, n_past, cache_k, cache_v, last_only,
               kv_window=None, last_index=None, slice_last=False,
               attention_fn=None):
    return transformer.forward(
        cfg, params, tokens, n_past, cache_k, cache_v, last_only=last_only,
        kv_window=kv_window,
        last_index=last_index if slice_last else None,
        attention_fn=attention_fn,
    )


@dataclass
class Timings:
    """llama_print_timings counters (llama.cpp:3501-3517)."""

    t_load_ms: float = 0.0
    t_sample_ms: float = 0.0
    n_sample: int = 0
    t_prompt_ms: float = 0.0
    n_prompt: int = 0
    t_eval_ms: float = 0.0
    n_eval: int = 0

    def report(self) -> str:
        lines = [f"load time = {self.t_load_ms:10.2f} ms"]
        if self.n_sample:
            lines.append(
                f"sample time = {self.t_sample_ms:10.2f} ms / {self.n_sample} runs "
                f"({self.t_sample_ms / max(1, self.n_sample):8.2f} ms per token)"
            )
        if self.n_prompt:
            lines.append(
                f"prompt eval time = {self.t_prompt_ms:10.2f} ms / {self.n_prompt} tokens "
                f"({self.t_prompt_ms / max(1, self.n_prompt):8.2f} ms per token)"
            )
        if self.n_eval:
            lines.append(
                f"eval time = {self.t_eval_ms:10.2f} ms / {self.n_eval} runs "
                f"({self.t_eval_ms / max(1, self.n_eval):8.2f} ms per token)"
            )
        return "\n".join(lines)


class Context:
    """One generation session over a loaded model."""

    def __init__(self, cfg: ModelConfig, params: TransformerParams, *,
                 batch: int = 1, n_ctx: int | None = None,
                 cache_dtype=jnp.bfloat16, mesh=None):
        """mesh (jax.sharding.Mesh with dp/sp/tp axes, see parallel.make_mesh)
        turns this into a multi-chip session: params shard per
        parallel/shard.py (tp Megatron split), the KV cache shards its
        context axis over sp — context length scales with chips instead of
        being capped by one device's HBM (the reference's fixed n_ctx,
        llama.cpp:733-776) — and whole-prompt prefills ride ring attention
        (one ppermute hop per KV block over the sp axis,
        parallel/ring_attention.py).  Decode steps stay GSPMD: XLA
        partitions the cache-window attention over sp and inserts the
        softmax collectives on ICI."""
        self.cfg = cfg
        self.mesh = mesh
        self._sp = (mesh.shape.get("sp", 1) if mesh is not None else 1)
        import os

        # default on TPU since r4: fold symmetric pack zero-points into
        # group biases (mask/shift-only unpack in the hot kernel; measured
        # −2.5..4.8% decode, ab-decode 2026-08-20) — but ONLY for
        # decode-shaped calls: the folded gbias stream REGRESSES
        # compute-bound prefill +6.8% (decomp-prefill 62.7 vs 58.8 ms), so
        # eval() routes bucketed t > 32 through the RAW view.  The two
        # views share levels/scales buffers (fold_zero only adds gbias
        # planes, ~0.85 GB resident for 7B).  QMM_ZERO_FOLD=0 opts out;
        # CPU stays unfolded for oracle exactness; mesh paths keep raw
        # (no shard rule for the added gbias planes).
        if mesh is None:
            from ..ops.qtensor import (maybe_cast_scales_f16,
                                       maybe_fold_zero_points)

            # cast BEFORE fold so both views share the f16 planes and the
            # folded gbias inherits the compact dtype (exact either way)
            params = maybe_cast_scales_f16(params)
            self._params_prefill = params
            params = maybe_fold_zero_points(params)
        if mesh is not None:
            from ..parallel.shard import replicate, shard_transformer

            params = (shard_transformer(params, mesh)
                      if mesh.shape.get("tp", 1) > 1
                      else replicate(params, mesh))
            self._params_prefill = params  # sharded: one (raw) view
        self.params = params
        self.n_ctx = n_ctx or cfg.n_ctx
        self.batch = batch
        self.cache_k, self.cache_v = init_cache(cfg, batch, self.n_ctx, cache_dtype)
        if mesh is not None:
            from ..parallel.shard import shard_cache

            self.cache_k, self.cache_v = shard_cache(
                self.cache_k, self.cache_v, cfg, mesh)
        self.n_past = 0
        self.timings = Timings()
        self._logits = None  # last logits [B, T, V] (np)

    def reset(self):
        self.cache_k = jax.tree.map(jnp.zeros_like, self.cache_k)
        self.cache_v = jax.tree.map(jnp.zeros_like, self.cache_v)
        self.n_past = 0

    def eval(self, tokens, *, logits_all: bool = False) -> np.ndarray:
        """Evaluate tokens (list or [B, T] array) after the current n_past.

        Returns logits: [B, T, V] if logits_all else [B, 1, V] (last token).
        The llama_eval analogue (llama.cpp:3370 -> 1217)."""
        tokens = np.atleast_2d(np.asarray(tokens, dtype=np.int32))
        b, t = tokens.shape
        assert b == self.batch, (b, self.batch)
        assert self.n_past + t <= self.n_ctx, "context overflow"
        bt = _bucket(t)
        padded = np.zeros((b, bt), dtype=np.int32)
        padded[:, :t] = tokens
        t0 = time.perf_counter()
        slice_last = not logits_all and bt != t
        # whole-prompt prefill on an sp mesh: attention rides the ring
        # (sp-1 ppermute hops) instead of the cache-window einsum
        attn_fn = None
        if self._sp > 1 and self.n_past == 0 and t > 1 and bt % self._sp == 0:
            from ..parallel.ring_attention import ring_prefill_fn

            attn_fn = ring_prefill_fn(self.mesh)
        elif self.n_past == 0 and t > 1:
            from ..ops.layers import flash_prefill_fn, use_flash_prefill

            if use_flash_prefill(bt, self.cfg.head_dim):
                attn_fn = flash_prefill_fn()
        # decode-shaped calls use the folded view, big-t calls the raw one
        # (see __init__: fold wins at T<=8, loses at T=512)
        p = self.params if bt <= 32 else self._params_prefill
        logits, self.cache_k, self.cache_v = _eval_step(
            self.cfg, p, jnp.asarray(padded),
            jnp.int32(self.n_past), self.cache_k, self.cache_v,
            False if logits_all or bt != t else True,
            min(_bucket(self.n_past + t), self.n_ctx),
            jnp.int32(t - 1), slice_last, attention_fn=attn_fn,
        )
        logits = np.asarray(logits[:, :t] if logits.shape[1] > 1 else logits)
        dt = (time.perf_counter() - t0) * 1e3
        if t > 1:
            self.timings.t_prompt_ms += dt
            self.timings.n_prompt += t
        else:
            self.timings.t_eval_ms += dt
            self.timings.n_eval += 1
        # tokens written into the cache beyond t are masked out by kv_mask on
        # later steps only if n_past advances by t, which it does:
        self.n_past += t
        self._logits = logits
        return logits

    @property
    def logits(self) -> np.ndarray:
        return self._logits

    def eval_embd(self, embeddings: np.ndarray,
                  *, logits_all: bool = False) -> np.ndarray:
        """Evaluate raw input embeddings [B, T, n_embd] (llama_eval_embd,
        llama.h:239-244; the embd-input multimodal entry point).  No bucket
        padding: callers control T exactly."""
        emb = jnp.asarray(np.asarray(embeddings, np.float32))
        b, t, e = emb.shape
        assert b == self.batch and e == self.cfg.n_embd
        assert self.n_past + t <= self.n_ctx, "context overflow"
        logits, self.cache_k, self.cache_v = _eval_step(
            self.cfg, self.params if t <= 32 else self._params_prefill,
            emb, jnp.int32(self.n_past),
            self.cache_k, self.cache_v, not logits_all,
            min(_bucket(self.n_past + t), self.n_ctx),
        )
        self.n_past += t
        self._logits = np.asarray(logits)
        return self._logits

    def embed(self, tokens) -> np.ndarray:
        """Evaluate tokens and return the final-norm hidden state of the last
        token [B, n_embd] (llama_get_embeddings, llama.h:335)."""
        tokens = np.atleast_2d(np.asarray(tokens, dtype=np.int32))
        b, t = tokens.shape
        assert b == self.batch and self.n_past + t <= self.n_ctx
        bt = _bucket(t)
        padded = np.zeros((b, bt), dtype=np.int32)
        padded[:, :t] = tokens
        logits, emb, self.cache_k, self.cache_v = _embed_step(
            self.cfg, self.params if bt <= 32 else self._params_prefill,
            jnp.asarray(padded),
            jnp.int32(self.n_past), self.cache_k, self.cache_v,
        )
        self.n_past += t
        self._logits = np.asarray(logits[:, :t])
        return np.asarray(emb[:, t - 1])


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("cache_k", "cache_v")
)
def _embed_step(cfg, params, tokens, n_past, cache_k, cache_v):
    return transformer.forward(
        cfg, params, tokens, n_past, cache_k, cache_v, with_embedding=True
    )


@functools.partial(jax.jit, static_argnames=("cfg", "last_only"), donate_argnames=("state",))
def _rwkv_eval_step(cfg, params, tokens, state, valid, last_only):
    from ..models import rwkv as rwkv_mod

    return rwkv_mod.forward(cfg, params, tokens, state, valid=valid,
                            last_only=last_only)


class RwkvContext:
    """Recurrent-session analogue of Context (rwkv_context, rwkv.cpp).

    The recurrent state replaces the KV cache; there is no context-length
    limit, so n_ctx/n_past exist only for interface parity with Context."""

    def __init__(self, cfg: ModelConfig, params, *, batch: int = 1,
                 n_ctx: int | None = None):
        from ..models import rwkv as rwkv_mod
        from ..ops.qtensor import (maybe_cast_scales_f16,
                                   maybe_fold_zero_points)

        self.cfg = cfg
        # r4 TPU default: folded for decode-shaped steps, raw view for
        # big-t prompt scans (same decode-win/prefill-regression trade as
        # Context — the RWKV prompt pass is the parallel WKV scan over the
        # same qmm weights)
        params = maybe_cast_scales_f16(params)
        self._params_prefill = params
        self.params = maybe_fold_zero_points(params)
        self.batch = batch
        self.n_ctx = n_ctx or 1 << 30
        self.state = rwkv_mod.init_state(cfg, batch)
        self.n_past = 0
        self.timings = Timings()
        self._logits = None

    def reset(self):
        from ..models import rwkv as rwkv_mod

        self.state = rwkv_mod.init_state(self.cfg, self.batch)
        self.n_past = 0

    def eval(self, tokens, *, logits_all: bool = False) -> np.ndarray:
        tokens = np.atleast_2d(np.asarray(tokens, dtype=np.int32))
        b, t = tokens.shape
        assert b == self.batch
        t0 = time.perf_counter()
        # bucket-pad like the transformer path: padded steps carry the
        # recurrent state through untouched (rwkv.forward `valid`)
        bt = _bucket(t)
        padded = np.zeros((b, bt), dtype=np.int32)
        padded[:, :t] = tokens
        valid = np.zeros((b, bt), dtype=bool)
        valid[:, :t] = True
        logits, self.state = _rwkv_eval_step(
            self.cfg, self.params if bt <= 32 else self._params_prefill,
            jnp.asarray(padded), self.state,
            jnp.asarray(valid), False if logits_all or bt != t else True,
        )
        logits = np.asarray(logits)
        if logits.shape[1] > 1:
            logits = logits[:, :t] if logits_all else logits[:, t - 1 : t]
        dt = (time.perf_counter() - t0) * 1e3
        if t > 1:
            self.timings.t_prompt_ms += dt
            self.timings.n_prompt += t
        else:
            self.timings.t_eval_ms += dt
            self.timings.n_eval += 1
        self.n_past += t
        self._logits = logits
        return logits

    @property
    def logits(self):
        return self._logits

    def get_state(self) -> dict:
        """rwkv.h:140-153 state accessor (for session save/load)."""
        return {k: np.asarray(v) for k, v in self.state.items()}

    def set_state(self, st: dict):
        self.state = {k: jnp.asarray(v) for k, v in st.items()}
