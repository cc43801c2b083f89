"""wikitext-2 perplexity — the quality parity gate.

Port of examples/perplexity/perplexity.cpp:28-119: tokenize the whole text
(BOS swapped into the first slot of each chunk), evaluate n_ctx-token chunks
in n_batch pieces with logits_all, and accumulate NLL over the second half
of each window; ppl = exp(sum nll / count)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .context import Context
from .tokenizer import TOKEN_BOS, Tokenizer


@dataclass
class PerplexityResult:
    ppl: float
    nll: float
    count: int
    chunk_ppls: list


def perplexity(
    ctx: Context,
    tokens: list[int] | np.ndarray,
    *,
    n_ctx: int = 512,
    n_batch: int = 512,
    progress=None,
) -> PerplexityResult:
    tokens = np.asarray(tokens, dtype=np.int32)
    n_chunk = len(tokens) // n_ctx
    nll = 0.0
    count = 0
    chunk_ppls = []
    for i in range(n_chunk):
        start = i * n_ctx
        chunk = tokens[start : start + n_ctx].copy()
        chunk[0] = TOKEN_BOS  # BOS for the first batch of each chunk
        ctx.reset()
        logits = []
        for j in range(0, n_ctx, n_batch):
            piece = chunk[j : j + n_batch]
            logits.append(
                ctx.eval(piece[None, :], logits_all=True)[0].astype(np.float64)
            )
        logits = np.concatenate(logits, axis=0)  # [n_ctx, V]
        lo = min(512, n_ctx // 2)
        sel = logits[lo : n_ctx - 1]
        m = sel.max(axis=-1, keepdims=True)
        lse = m[:, 0] + np.log(np.exp(sel - m).sum(axis=-1))
        targets = tokens[start + lo + 1 : start + n_ctx]
        tok_logit = sel[np.arange(sel.shape[0]), targets]
        nll += float((lse - tok_logit).sum())
        count += sel.shape[0]
        chunk_ppls.append(float(np.exp(nll / count)))
        if progress:
            progress(f"[{i + 1}]{chunk_ppls[-1]:.4f},")
    return PerplexityResult(float(np.exp(nll / max(1, count))), nll, count, chunk_ppls)


def _lazy_jit_chunk_nll():
    """Module-level jit (built on first use so jax imports stay lazy) —
    defining it inside perplexity_ondevice would recompile on every call."""
    global _chunk_nll
    import functools

    import jax
    import jax.numpy as jnp

    from ..models import transformer

    @functools.partial(jax.jit, static_argnames=("cfg", "lo", "n_ctx"),
                       donate_argnames=("cache_k", "cache_v"))
    def _chunk_nll_impl(cfg, params, chunk, cache_k, cache_v, lo, n_ctx):
        logits, ck, cv = transformer.forward(
            cfg, params, chunk[None, :], jnp.int32(0), cache_k, cache_v,
            last_only=False, kv_window=n_ctx)
        sel = logits[0, lo : n_ctx - 1].astype(jnp.float32)
        tgt = chunk[lo + 1 : n_ctx]
        lse = jax.scipy.special.logsumexp(sel, axis=-1)
        tok_logit = jnp.take_along_axis(sel, tgt[:, None], axis=1)[:, 0]
        return jnp.sum(lse - tok_logit), ck, cv

    _chunk_nll = _chunk_nll_impl
    return _chunk_nll


def _chunk_nll(*args, **kw):  # replaced by the jitted impl on first call
    return _lazy_jit_chunk_nll()(*args, **kw)


def perplexity_ondevice(
    ctx: Context,
    tokens: list[int] | np.ndarray,
    *,
    n_ctx: int = 512,
    n_batch: int = 512,
    progress=None,
) -> PerplexityResult:
    """Same windowing as perplexity(), but the NLL reduces ON DEVICE — per
    chunk only two scalars cross the host link instead of [n_ctx, V] logits
    (65 MB/chunk at 7B).  f32 logsumexp instead of the host path's f64; the
    difference is ~1e-5 in ppl."""
    import jax.numpy as jnp

    from ..models import transformer

    cfg = ctx.cfg
    tokens = np.asarray(tokens, dtype=np.int32)
    n_chunk = len(tokens) // n_ctx
    lo = min(512, n_ctx // 2)
    nll, count, chunk_ppls = 0.0, 0, []
    # honor the context's KV dtype (--cache-type) so q8/f8 quality is
    # measurable through the ppl gate
    from ..ops.kvcache import QuantKV

    cdt = (jnp.int8 if isinstance(ctx.cache_k[0], QuantKV)
           else ctx.cache_k[0].dtype)
    cache_k, cache_v = transformer.init_cache(cfg, 1, n_ctx, dtype=cdt)
    for i in range(n_chunk):
        chunk = tokens[i * n_ctx : (i + 1) * n_ctx].copy()
        chunk[0] = TOKEN_BOS
        s, cache_k, cache_v = _chunk_nll(cfg, ctx.params, jnp.asarray(chunk),
                                         cache_k, cache_v, lo, n_ctx)
        nll += float(s)
        count += n_ctx - 1 - lo
        chunk_ppls.append(float(np.exp(nll / count)))
        if progress:
            progress(f"[{i + 1}]{chunk_ppls[-1]:.4f},")
    return PerplexityResult(float(np.exp(nll / max(1, count))), nll, count,
                            chunk_ppls)


def perplexity_file(ctx: Context, tokenizer: Tokenizer, path: str,
                    on_device: bool = False, **kw):
    with open(path, "rb") as f:
        text = f.read()
    toks = tokenizer.tokenize(text, bos=True)
    if on_device:
        return perplexity_ondevice(ctx, toks, **kw)
    return perplexity(ctx, toks, **kw)
