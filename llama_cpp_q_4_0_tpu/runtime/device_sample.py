"""On-device multi-token decode: sampling inside the jit, K tokens per
host round-trip.

The reference samples on the host every token (main.cpp:440-560) — fine
when the device is a local GPU, but a host<->device round-trip per token
caps serving throughput (measured on this environment's TPU tunnel: ~30 ms
per round-trip vs 10 ms of device work).  This path keeps the whole
decode-sample-feedback loop in one lax.scan on device and transfers only
the sampled ids every `chunk` tokens.

Supports the distribution-affecting core of the sampler chain (temperature,
top-k, greedy); the full host chain (penalties, tfs/typical, mirostat)
remains runtime/sampling.py — use it when those knobs matter more than
throughput."""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models import transformer
from ..models.config import ModelConfig


@dataclass(frozen=True)
class DeviceSampling:
    temp: float = 0.8
    top_k: int = 40  # 0 = off; temp <= 0 = greedy
    top_p: float = 1.0  # nucleus over the top-k candidates (1.0 = off)


def _top_p_mask(vals: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filter over DESCENDING-sorted logits [..., K]: keep the
    smallest prefix whose probability mass reaches top_p (always >= 1
    token) — llama_sample_top_p semantics (llama.cpp:1875-1905)."""
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # token i stays if the mass BEFORE it is < top_p
    keep = (cum - probs) < top_p
    return jnp.where(keep, vals, -jnp.inf)


def _sample_logits(logits, key, ds: DeviceSampling):
    if ds.temp <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if ds.top_k <= 0 and ds.top_p >= 1.0:
        return jax.random.categorical(key, logits / ds.temp, axis=-1).astype(jnp.int32)
    # top-p without top-k uses a 256-candidate support (the tail beyond is
    # negligible mass for any realistic top_p)
    k = ds.top_k if ds.top_k > 0 else min(logits.shape[-1], 256)
    vals, idx = jax.lax.top_k(logits, k)  # sorted descending
    if ds.top_p < 1.0:
        vals = _top_p_mask(vals, ds.top_p)
    choice = jax.random.categorical(key, vals / ds.temp, axis=-1)
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "ds", "kv_window"),
    donate_argnames=("cache_k", "cache_v"),
)
def decode_chunk(cfg: ModelConfig, params, tok, n_past, cache_k, cache_v,
                 key, *, n_steps: int, ds: DeviceSampling,
                 kv_window: int | None = None):
    """From last token [B] and caches, generate n_steps tokens on device.

    Returns (tokens [B, n_steps], new_k, new_v, key)."""

    def body(carry, _):
        tok, ck, cv, n_past, key = carry
        logits, ck, cv = transformer.forward(
            cfg, params, tok[:, None], n_past, ck, cv,
            last_only=True, kv_window=kv_window,
        )
        key, sub = jax.random.split(key)
        nxt = _sample_logits(logits[:, -1], sub, ds)
        return (nxt, ck, cv, n_past + 1, key), nxt

    (tok, cache_k, cache_v, n_past, key), toks = jax.lax.scan(
        body, (tok, cache_k, cache_v, n_past, key), None, length=n_steps)
    return toks.T, cache_k, cache_v, key


def generate_ondevice(ctx, prompt_tokens: list[int], n_predict: int, *,
                      sampling: DeviceSampling | None = None, seed: int = 0,
                      chunk: int = 16, eos_token: int = 2) -> list[int]:
    """Prefill on the Context, then decode in device-resident chunks.

    EOS is detected between chunks (up to chunk-1 wasted steps — the price
    of amortizing the host round-trip)."""
    ds = sampling or DeviceSampling()
    logits = ctx.eval(np.asarray([prompt_tokens], np.int32))
    key = jax.random.key(seed)
    key, sub = jax.random.split(key)
    first = int(_sample_logits(jnp.asarray(logits[:, -1]), sub, ds)[0])
    out = [first]
    if first == eos_token:
        return []
    tok = jnp.asarray([first], jnp.int32)
    while len(out) < n_predict and ctx.n_past + chunk < ctx.n_ctx:
        # always run a FULL chunk (truncate at the end): a partial n_steps
        # is a fresh compile, which costs far more than the wasted steps
        n = chunk
        window = min(_bucket(ctx.n_past + n + 1), ctx.n_ctx)
        toks, ctx.cache_k, ctx.cache_v, key = decode_chunk(
            ctx.cfg, ctx.params, tok, jnp.int32(ctx.n_past),
            ctx.cache_k, ctx.cache_v, key, n_steps=n, ds=ds,
            kv_window=window,
        )
        ctx.n_past += n
        ids = np.asarray(toks)[0].tolist()
        for t in ids:
            if t == eos_token:
                return out
            out.append(t)
        tok = jnp.asarray([ids[-1]], jnp.int32)
    return out[:n_predict]


def _bucket(n: int) -> int:
    from .context import PREFILL_BUCKETS

    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return ((n + 2047) // 2048) * 2048
