"""On-device multi-token decode: sampling inside the jit, K tokens per
host round-trip.

The reference samples on the host every token (main.cpp:440-560) — fine
when the device is a local GPU, but a host<->device round-trip per token
caps serving throughput (measured on this environment's TPU tunnel: ~30 ms
per round-trip vs 10 ms of device work).  This path keeps the whole
decode-sample-feedback loop in one lax.scan on device and transfers only
the sampled ids every `chunk` tokens.

Supports the full distribution-affecting chain on device: temperature /
top-k / top-p / tail-free / typical / greedy, repetition-frequency-
presence penalties (over a carried recent-token window) and mirostat
v1/v2 (carried mu) — all with exact llama.cpp:1804-2090 semantics.  The host
chain (runtime/sampling.py) remains for per-request mirostat/logit-bias
inside batched per-row ticks (single-stream device loops support the
ENTIRE chain)."""

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
    tfs_z: float = 1.0  # tail-free sampling (1.0 = off)
    typical_p: float = 1.0  # locally-typical sampling (1.0 = off)
    # repetition penalties over the last repeat_last_n tokens, identical
    # semantics to the host chain (llama.cpp:1804-1860); greedy+penalties
    # is deterministic, so parity with the host loop is exact
    repeat_penalty: float = 1.0
    repeat_last_n: int = 64
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    # mirostat (llama.cpp:2009-2090): adaptive surprise-target truncation
    # with carried mu state.  Supported by the chunked decode loops
    # (decode_chunk / engine chunked ticks); the speculative verifiers
    # use the stateless chain above.
    mirostat: int = 0  # 0 = off, 1 = mirostat v1, 2 = mirostat v2
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    # static ((token_id, bias), ...) applied before penalties (host order,
    # main.cpp:440s); bias=-inf bans a token — how --ignore-eos works
    logit_bias: tuple = ()

    @property
    def penalized(self) -> bool:
        return (self.repeat_penalty != 1.0 or self.frequency_penalty != 0.0
                or self.presence_penalty != 0.0)


def _apply_logit_bias(logits: jax.Array, ds: DeviceSampling) -> jax.Array:
    """logits [..., V] + static sparse bias (llama_sample_logit_bias)."""
    if not ds.logit_bias:
        return logits
    ids = jnp.asarray([i for i, _ in ds.logit_bias], jnp.int32)
    vals = jnp.asarray([v for _, v in ds.logit_bias], jnp.float32)
    return logits.at[..., ids].add(vals)


def _apply_penalties(logits: jax.Array, recent: jax.Array,
                     ds: DeviceSampling) -> jax.Array:
    """logits [B, V], recent [B, N] token ids (pad slots hold V, dropped).

    llama_sample_repetition_penalty (divide positive / multiply negative
    logits of seen tokens) + frequency/presence penalties
    (llama.cpp:1804-1860), fully on device."""
    b, v = logits.shape
    counts = jnp.zeros((b, v), jnp.float32).at[
        jnp.arange(b)[:, None], recent].add(1.0, mode="drop")
    present = counts > 0
    if ds.repeat_penalty != 1.0:
        scaled = jnp.where(logits > 0, logits / ds.repeat_penalty,
                           logits * ds.repeat_penalty)
        logits = jnp.where(present, scaled, logits)
    return (logits - counts * ds.frequency_penalty
            - present * ds.presence_penalty)


def _recent_push(recent: jax.Array, tok: jax.Array) -> jax.Array:
    """Shift the [B, N] recent-token window left and append tok [B]."""
    return jnp.concatenate([recent[:, 1:], tok[:, None]], axis=1)


def make_recent(last_tokens_rows, n: int, n_vocab: int) -> jnp.ndarray:
    """Host-side: build the [B, N] recent window (pad = n_vocab)."""
    b = len(last_tokens_rows)
    out = np.full((b, n), n_vocab, np.int32)
    for i, lt in enumerate(last_tokens_rows):
        tail = lt[-n:]
        if tail:
            out[i, -len(tail):] = tail
    return jnp.asarray(out)


def first_sample(logits_row, history, ds: DeviceSampling, key,
                 n_vocab: int) -> int:
    """Sample the first post-prefill token with the same penalty window
    the device loop will use (host loops penalize every sample)."""
    l = _apply_logit_bias(jnp.asarray(logits_row)[None, :], ds)
    if ds.penalized:
        rec = make_recent([history], ds.repeat_last_n, n_vocab)
        l = _apply_penalties(l, rec, ds)
    return int(_sample_logits(l[0], key, ds))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["temp", "top_k", "top_p", "tfs_z", "typical_p",
                 "repeat_penalty", "repeat_last_n", "frequency_penalty",
                 "presence_penalty", "seed", "mirostat", "mirostat_tau",
                 "mirostat_eta", "bias_ids", "bias_vals"],
    meta_fields=[],
)
@dataclass
class SamplingVec:
    """PER-ROW sampling parameters for batched device ticks: each slot of
    a continuous-batching engine keeps its own request's temp/top-k/top-p/
    tfs/typical/penalties/mirostat/logit-bias (the scalar DeviceSampling
    applies one setting engine-wide).  All fields [B]; neutral values
    (temp<=0 greedy, top_k 0, p/z 1.0, penalties 1.0/0.0, mirostat 0)
    switch a knob off per row.  The optional fields stay None (statically
    absent — zero compiled cost) unless some row uses them:
    mirostat* [B] with carried per-row mu, and bias_ids/bias_vals
    [B, NB] dense-padded per-row logit bias (pad id = _BIAS_PAD drops)."""

    temp: jax.Array
    top_k: jax.Array
    top_p: jax.Array
    tfs_z: jax.Array
    typical_p: jax.Array
    repeat_penalty: jax.Array
    repeat_last_n: jax.Array
    frequency_penalty: jax.Array
    presence_penalty: jax.Array
    seed: jax.Array  # [B] int32; >=0 makes the row's stream REPRODUCIBLE
    mirostat: jax.Array | None = None  # [B] int32 (0 off / 1 v1 / 2 v2)
    mirostat_tau: jax.Array | None = None  # [B] f32
    mirostat_eta: jax.Array | None = None  # [B] f32
    bias_ids: jax.Array | None = None  # [B, NB] int32 (pad = _BIAS_PAD)
    bias_vals: jax.Array | None = None  # [B, NB] f32


_BIAS_PAD = 1 << 30  # out-of-vocab id: scatter mode='drop' discards it


def make_sampling_vec(rows, seeds=None) -> SamplingVec:
    """Host: build a SamplingVec from per-row SamplingParams (None rows
    get neutral greedy settings).  seeds[i] >= 0 gives row i a sampling
    stream that depends only on (seed, absolute position) — reproducible
    regardless of which other requests share its ticks.  Rows with
    mirostat or logit_bias populate the optional per-row fields (bias
    width buckets to powers of two to bound recompiles)."""
    def col(get, default, dtype=np.float32):
        return jnp.asarray([get(r) if r is not None else default
                            for r in rows], dtype)

    if seeds is None:
        seeds = [-1] * len(rows)
    mirostat = None
    mirostat_tau = None
    mirostat_eta = None
    if any(r is not None and r.mirostat for r in rows):
        mirostat = col(lambda r: r.mirostat, 0, np.int32)
        mirostat_tau = col(lambda r: r.mirostat_tau, 5.0)
        mirostat_eta = col(lambda r: r.mirostat_eta, 0.1)
    bias_ids = bias_vals = None
    widest = max((len(r.logit_bias) for r in rows
                  if r is not None and r.logit_bias), default=0)
    if widest:
        nb = 1 << (widest - 1).bit_length()  # bucket to power of two
        ids = np.full((len(rows), nb), _BIAS_PAD, np.int32)
        vals = np.zeros((len(rows), nb), np.float32)
        for i, r in enumerate(rows):
            if r is not None and r.logit_bias:
                for j, (tid, bv) in enumerate(sorted(r.logit_bias.items())):
                    ids[i, j] = tid
                    vals[i, j] = bv
        bias_ids, bias_vals = jnp.asarray(ids), jnp.asarray(vals)
    return SamplingVec(
        seed=jnp.asarray([s if s is not None else -1 for s in seeds],
                         jnp.int32),
        temp=col(lambda r: r.temp, -1.0),
        top_k=col(lambda r: r.top_k, 0, np.int32),
        top_p=col(lambda r: r.top_p, 1.0),
        tfs_z=col(lambda r: r.tfs_z, 1.0),
        typical_p=col(lambda r: r.typical_p, 1.0),
        repeat_penalty=col(lambda r: r.repeat_penalty, 1.0),
        repeat_last_n=col(lambda r: r.repeat_last_n, 0, np.int32),
        frequency_penalty=col(lambda r: r.frequency_penalty, 0.0),
        presence_penalty=col(lambda r: r.presence_penalty, 0.0),
        mirostat=mirostat, mirostat_tau=mirostat_tau,
        mirostat_eta=mirostat_eta,
        bias_ids=bias_ids, bias_vals=bias_vals,
    )


_VEC_SUPPORT = 256  # top-k support for the per-row path (top_k clamped)
VEC_WINDOW = 128  # recent-token buffer length for per-row penalties


def _apply_penalties_vec(logits: jax.Array, recent: jax.Array,
                         sv: SamplingVec) -> jax.Array:
    """Per-row penalty application; each row's window is the newest
    repeat_last_n[row] entries of `recent` (pad index V drops)."""
    b, v = logits.shape
    n = recent.shape[1]
    valid = jnp.arange(n)[None, :] >= (n - sv.repeat_last_n[:, None])
    idx = jnp.where(valid, recent, v)
    counts = jnp.zeros((b, v), jnp.float32).at[
        jnp.arange(b)[:, None], idx].add(1.0, mode="drop")
    present = counts > 0
    rp = sv.repeat_penalty[:, None]
    scaled = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(present, scaled, logits)
    return (logits - counts * sv.frequency_penalty[:, None]
            - present * sv.presence_penalty[:, None])


def sample_logits_vec(logits: jax.Array, key, sv: SamplingVec,
                      recent: jax.Array, position=None, mu=None):
    """Per-row sampling chain over a 256-candidate support, exact host
    semantics per knob (bias -> penalties -> top_k -> tfs -> typical ->
    top_p -> temp; greedy rows take the penalized argmax; mirostat rows
    replace the truncation filters with the adaptive-surprise cut, exactly
    like the host chain's separate mirostat branch, llama.cpp:2009-2090).
    logits [B, V] -> [B] int32, or (tok, mu') when `mu` [B] is passed
    (required when sv.mirostat is set; carried across ticks per row).

    position [B] (with sv.seed >= 0): rows draw from a key folded from
    (seed, absolute position) instead of the shared stream — each
    request's sampled text is reproducible no matter which other requests
    shared its ticks."""
    if sv.bias_ids is not None:
        b = logits.shape[0]
        logits = logits.at[jnp.arange(b)[:, None], sv.bias_ids].add(
            sv.bias_vals, mode="drop")
    logits = _apply_penalties_vec(logits, recent, sv)
    k = min(logits.shape[-1], _VEC_SUPPORT)
    vals0, idx = jax.lax.top_k(logits, k)  # sorted desc, pre-filter
    tk = jnp.where((sv.top_k <= 0) | (sv.top_k > k), k, sv.top_k)
    vals = jnp.where(jnp.arange(k)[None, :] < tk[:, None], vals0, -jnp.inf)
    vals = _tfs_mask(vals, sv.tfs_z[:, None], n_valid=tk)
    vals = _typical_mask(vals, sv.typical_p[:, None])
    vals = _top_p_mask(vals, sv.top_p[:, None])
    denom = jnp.where(sv.temp > 0, sv.temp, 1.0)[:, None]
    final = vals / denom
    if sv.mirostat is not None:
        assert mu is not None, "mirostat rows need the carried mu state"
        scaled = vals0 / denom  # mirostat skips the truncation filters
        m2 = _mirostat2_mask_vec(scaled, mu)
        m1 = _mirostat1_mask_vec(scaled, mu, logits.shape[-1])
        final = jnp.where((sv.mirostat == 2)[:, None], m2,
                          jnp.where((sv.mirostat == 1)[:, None], m1, final))
    if position is not None:
        seeded = jax.vmap(
            lambda s, p: jax.random.fold_in(jax.random.fold_in(
                jax.random.key(0), s.astype(jnp.uint32)), p.astype(jnp.uint32))
        )(jnp.maximum(sv.seed, 0), position)
        shared = jax.random.split(key, final.shape[0])
        keys = jnp.where((sv.seed >= 0)[:, None],
                         jax.random.key_data(seeded),
                         jax.random.key_data(shared))
        choice = jax.vmap(
            lambda kd, v: jax.random.categorical(
                jax.random.wrap_key_data(kd), v)
        )(keys, final)
    else:
        choice = jax.random.categorical(key, final, axis=-1)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    greedy = jnp.argmax(logits, axis=-1)
    tok = jnp.where(sv.temp > 0, sampled, greedy).astype(jnp.int32)
    if mu is None:
        return tok
    if sv.mirostat is not None:
        logp2 = jax.nn.log_softmax(final, axis=-1)
        observed = -jnp.take_along_axis(
            logp2, choice[:, None], axis=-1)[:, 0] / jnp.log(2.0)
        mu2 = mu - sv.mirostat_eta * (observed - sv.mirostat_tau)
        mu = jnp.where((sv.mirostat > 0) & (sv.temp > 0), mu2, mu)
    return tok, mu


def _mirostat2_mask_vec(scaled: jax.Array, mu: jax.Array) -> jax.Array:
    """Per-row mirostat-v2 truncation over temp-scaled sorted logits
    [B, K]: drop candidates with surprise > mu[row], always keep the top
    one (llama_sample_token_mirostat_v2, llama.cpp:2065-2090)."""
    logp = jax.nn.log_softmax(scaled, axis=-1)
    surprise = -logp / jnp.log(2.0)
    keep = (surprise <= mu[:, None]) | (jnp.arange(scaled.shape[-1]) == 0)
    return jnp.where(keep, scaled, -jnp.inf)


def _mirostat1_mask_vec(scaled: jax.Array, mu: jax.Array,
                        n_vocab: int) -> jax.Array:
    """Per-row mirostat-v1 truncation (llama_sample_token_mirostat,
    llama.cpp:2009-2063): Zipf exponent s_hat from the top m=100
    probabilities, k from the surprise target, keep the first k."""
    k_sup = scaled.shape[-1]
    p = jax.nn.softmax(scaled, axis=-1)
    n = min(100 - 1, k_sup - 1)
    i = jnp.arange(n, dtype=jnp.float32)
    t_i = jnp.log((i + 2.0) / (i + 1.0))
    b_i = jnp.log(p[:, :n] / jnp.maximum(p[:, 1:n + 1], 1e-38))
    s_hat = jnp.sum(t_i * b_i, axis=-1) / jnp.sum(t_i * t_i)
    eps_hat = s_hat - 1.0
    kk = ((eps_hat * jnp.exp2(mu))
          / (1.0 - jnp.float32(n_vocab) ** (-eps_hat))) ** (1.0 / s_hat)
    kk = jnp.clip(jnp.nan_to_num(kk, nan=1.0, posinf=k_sup),
                  1, k_sup).astype(jnp.int32)
    return jnp.where(jnp.arange(k_sup)[None, :] < kk[:, None], scaled,
                     -jnp.inf)


def _tfs_mask(vals: jax.Array, z, n_valid=None) -> jax.Array:
    """Tail-free filter over DESCENDING-sorted logits [..., K]: normalized
    |second derivative| of the sorted probability curve, cumsum'd; drop
    the tail where it exceeds z (llama_sample_tail_free,
    llama.cpp:1907-1959; min_keep=1).

    n_valid [B] (per-row path): the candidate list is only the first
    n_valid entries (rest -inf from a prior top-k cut); derivative entries
    at the truncation boundary are excluded, matching the host computing
    over the REDUCED list."""
    kk = vals.shape[-1]
    if kk <= 2:
        return vals
    probs = jax.nn.softmax(vals, axis=-1)
    first = probs[..., :-1] - probs[..., 1:]
    second = jnp.abs(first[..., :-1] - first[..., 1:])  # [..., K-2]
    if n_valid is not None:
        second = jnp.where(
            jnp.arange(kk - 2)[None, :] < (n_valid - 2)[:, None],
            second, 0.0)
    second = second / jnp.maximum(
        jnp.sum(second, axis=-1, keepdims=True), 1e-20)
    cum = jnp.cumsum(second, axis=-1)
    hits = (cum > z) & (jnp.arange(kk - 2) >= 1)
    last = jnp.where(jnp.any(hits, axis=-1),
                     jnp.argmax(hits, axis=-1), kk)  # keep i < last
    keep = jnp.arange(kk) < last[..., None]
    return jnp.where(keep, vals, -jnp.inf)


def _typical_mask(vals: jax.Array, p: float) -> jax.Array:
    """Locally-typical filter [..., K]: keep the lowest-|surprise - H|
    candidates until their mass exceeds p (llama_sample_typical,
    llama.cpp:1961-2007; min_keep=1).  -inf entries (filtered upstream)
    carry infinite shift and are never re-admitted."""
    kk = vals.shape[-1]
    probs = jax.nn.softmax(vals, axis=-1)
    logp = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-38)), -jnp.inf)
    ent = -jnp.sum(jnp.where(probs > 0, probs * logp, 0.0), axis=-1,
                   keepdims=True)
    shifted = jnp.where(probs > 0, jnp.abs(-logp - ent), jnp.inf)
    order = jnp.argsort(shifted, axis=-1, stable=True)
    cum = jnp.cumsum(jnp.take_along_axis(probs, order, axis=-1), axis=-1)
    hits = cum > p
    last = jnp.where(jnp.any(hits, axis=-1),
                     jnp.argmax(hits, axis=-1) + 1, kk)
    inv = jnp.argsort(order, axis=-1)  # rank of each candidate
    keep = inv < last[..., None]
    return jnp.where(keep, vals, -jnp.inf)


def _top_p_mask(vals: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filter over DESCENDING-sorted logits [..., K]: keep the
    smallest prefix whose probability mass reaches top_p (always >= 1
    token) — llama_sample_top_p semantics (llama.cpp:1875-1905)."""
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # token i stays if the mass BEFORE it is < top_p
    keep = (cum - probs) < top_p
    return jnp.where(keep, vals, -jnp.inf)


def _mirostat2_sample(logits, key, ds: DeviceSampling, mu):
    """One mirostat-v2 step over a 256-candidate support: truncate
    candidates with surprise > mu (always keeping the top one), sample,
    then mu -= eta * (observed_surprise - tau).  logits [B, V], mu [B];
    returns (tok [B], mu' [B]).  Temperature is applied first, matching
    the host chain order."""
    k = min(logits.shape[-1], 256)
    vals, idx = jax.lax.top_k(logits / jnp.maximum(ds.temp, 1e-6), k)
    logp = jax.nn.log_softmax(vals, axis=-1)
    surprise = -logp / jnp.log(2.0)
    keep = (surprise <= mu[:, None]) | (jnp.arange(k) == 0)
    vals_m = jnp.where(keep, vals, -jnp.inf)
    choice = jax.random.categorical(key, vals_m, axis=-1)
    tok = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    logp2 = jax.nn.log_softmax(vals_m, axis=-1)
    observed = -jnp.take_along_axis(logp2, choice[:, None], axis=-1)[:, 0] \
        / jnp.log(2.0)
    mu = mu - ds.mirostat_eta * (observed - ds.mirostat_tau)
    return tok.astype(jnp.int32), mu


def _mirostat1_sample(logits, key, ds: DeviceSampling, mu):
    """Mirostat v1 (llama_sample_token_mirostat, llama.cpp:2009-2063):
    estimate the Zipf exponent s_hat from the top m=100 probabilities,
    derive the truncation k from the surprise target, sample, update mu.
    logits [B, V], mu [B] -> (tok [B], mu' [B])."""
    v = logits.shape[-1]
    k_sup = min(v, 256)
    vals, idx = jax.lax.top_k(logits / jnp.maximum(ds.temp, 1e-6), k_sup)
    p = jax.nn.softmax(vals, axis=-1)
    n = min(100 - 1, k_sup - 1)
    i = jnp.arange(n, dtype=jnp.float32)
    t_i = jnp.log((i + 2.0) / (i + 1.0))
    b_i = jnp.log(p[:, :n] / p[:, 1:n + 1])
    s_hat = jnp.sum(t_i * b_i, axis=-1) / jnp.sum(t_i * t_i)
    eps_hat = s_hat - 1.0
    kk = ((eps_hat * jnp.exp2(mu))
          / (1.0 - jnp.float32(v) ** (-eps_hat))) ** (1.0 / s_hat)
    kk = jnp.clip(jnp.nan_to_num(kk, nan=1.0, posinf=k_sup),
                  1, k_sup).astype(jnp.int32)
    vals_m = jnp.where(jnp.arange(k_sup)[None, :] < kk[:, None], vals,
                       -jnp.inf)
    choice = jax.random.categorical(key, vals_m, axis=-1)
    tok = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    logp2 = jax.nn.log_softmax(vals_m, axis=-1)
    observed = -jnp.take_along_axis(logp2, choice[:, None], axis=-1)[:, 0] \
        / jnp.log(2.0)
    mu = mu - ds.mirostat_eta * (observed - ds.mirostat_tau)
    return tok.astype(jnp.int32), mu


def _sample_logits(logits, key, ds: DeviceSampling):
    if ds.temp <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    filtered = ds.top_p < 1.0 or ds.tfs_z < 1.0 or ds.typical_p < 1.0
    if ds.top_k <= 0 and not filtered:
        return jax.random.categorical(key, logits / ds.temp, axis=-1).astype(jnp.int32)
    # filters without top-k use a 256-candidate support (the tail beyond
    # is negligible mass for any realistic p/z)
    k = ds.top_k if ds.top_k > 0 else min(logits.shape[-1], 256)
    vals, idx = jax.lax.top_k(logits, k)  # sorted descending
    # host chain order: top_k -> tfs -> typical -> top_p -> temp
    if ds.tfs_z < 1.0:
        vals = _tfs_mask(vals, ds.tfs_z)
    if ds.typical_p < 1.0:
        vals = _typical_mask(vals, ds.typical_p)
    if ds.top_p < 1.0:
        vals = _top_p_mask(vals, ds.top_p)
    choice = jax.random.categorical(key, vals / ds.temp, axis=-1)
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "ds", "kv_window", "forward_fn"),
    donate_argnames=("cache_k", "cache_v"),
)
@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "ds", "kv_window", "forward_fn"),
    donate_argnames=("cache_k", "cache_v"),
)
def decode_chunk(cfg: ModelConfig, params, tok, n_past, cache_k, cache_v,
                 key, *, n_steps: int, ds: DeviceSampling,
                 kv_window: int | None = None, recent=None, mu=None,
                 sv: SamplingVec | None = None, forward_fn=None):
    """From last token [B] and caches, generate n_steps tokens on device.

    JITTED with DONATED caches (like spec_chunk): un-donated, each tick's
    scan produced fresh cache buffers while the caller still held the old
    ones — at the 16x2048 q8 flagship that transiently oversubscribed HBM
    (2 x 9.7 GiB caches + 4.2 GiB weights > 15.75) and long-context ticks
    ran ~2.5x slower than the same steps issued with donation
    (engine-steady decomp, 2026-08-20).  Callers MUST rebind their cache
    references from the return value (all three call sites do).

    recent [B, N] (required when ds.penalized): sliding window of the
    last tokens INCLUDING tok, maintained in the scan carry so penalties
    see within-chunk samples exactly like the host loop.

    mu [B] (mirostat 2): carried adaptive state; pass the previous
    return value (init 2*tau).

    forward_fn (static): alternative forward with transformer.forward's
    contract — e.g. parallel.tp.spec_forward(mesh) routes decode through
    the explicit shard_map tensor-parallel path.

    Returns (tokens [B, n_steps], new_k, new_v, key, recent, mu)."""
    if (ds.penalized or sv is not None) and recent is None:
        raise ValueError("ds has penalties: pass `recent` (make_recent)")
    fwd = forward_fn or transformer.forward

    def body(carry, _):
        tok, ck, cv, n_past, key, rec, mu = carry
        logits, ck, cv = fwd(
            cfg, params, tok[:, None], n_past, ck, cv,
            last_only=True, kv_window=kv_window,
        )
        row = _apply_logit_bias(logits[:, -1], ds)
        key, sub = jax.random.split(key)
        if sv is not None:
            # per-row sampling chain (bias/penalties/mirostat handled
            # inside); the key for seeded rows folds (seed, abs position)
            if sv.mirostat is not None:
                nxt, mu = sample_logits_vec(row, sub, sv, rec,
                                            position=n_past + 1, mu=mu)
            else:
                nxt = sample_logits_vec(row, sub, sv, rec,
                                        position=n_past + 1)
            rec = _recent_push(rec, nxt)
        else:
            if ds.penalized:
                row = _apply_penalties(row, rec, ds)
            if ds.mirostat == 2 and ds.temp > 0:
                nxt, mu = _mirostat2_sample(row, sub, ds, mu)
            elif ds.mirostat == 1 and ds.temp > 0:
                nxt, mu = _mirostat1_sample(row, sub, ds, mu)
            else:
                nxt = _sample_logits(row, sub, ds)
            if ds.penalized:
                rec = _recent_push(rec, nxt)
        return (nxt, ck, cv, n_past + 1, key, rec, mu), nxt

    if recent is None:
        recent = jnp.zeros((tok.shape[0], 1), jnp.int32)  # unused
    if mu is None:
        mu = jnp.full((tok.shape[0],), 2.0 * ds.mirostat_tau, jnp.float32)
    (tok, cache_k, cache_v, n_past, key, recent, mu), toks = jax.lax.scan(
        body, (tok, cache_k, cache_v, n_past, key, recent, mu), None,
        length=n_steps)
    return toks.T, cache_k, cache_v, key, recent, mu


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
    first = first_sample(logits[0, -1], list(prompt_tokens), ds, sub,
                         ctx.cfg.n_vocab)
    out = [first]
    if first == eos_token:
        return []
    tok = jnp.asarray([first], jnp.int32)
    recent = (make_recent([list(prompt_tokens) + [first]],
                          ds.repeat_last_n, ctx.cfg.n_vocab)
              if ds.penalized else jnp.zeros((1, 1), jnp.int32))
    mu = jnp.full((1,), 2.0 * ds.mirostat_tau, jnp.float32)
    while len(out) < n_predict and ctx.n_past + chunk < ctx.n_ctx:
        # always run a FULL chunk (truncate at the end): a partial n_steps
        # is a fresh compile, which costs far more than the wasted steps
        n = chunk
        window = min(_bucket(ctx.n_past + n + 1), ctx.n_ctx)
        toks, ctx.cache_k, ctx.cache_v, key, recent, mu = decode_chunk(
            ctx.cfg, ctx.params, tok, jnp.int32(ctx.n_past),
            ctx.cache_k, ctx.cache_v, key, n_steps=n, ds=ds,
            kv_window=window, recent=recent, mu=mu,
        )
        ctx.n_past += n
        ids = np.asarray(toks)[0].tolist()
        for j, t in enumerate(ids):
            if t == eos_token:
                # rewind past the post-EOS garbage the full chunk wrote, so
                # callers continuing from ctx (session save, chat reuse)
                # decode against clean history ending at the last emitted
                # token's cache slot
                ctx.n_past -= n - j - 1
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
