"""RWKV v4 recurrent runtime — no attention, no KV cache.

TPU re-design of arch/rwkv/rwkv.cpp: the reference builds a single-token
ggml graph once and replays it per token, copying output state to input
state (rwkv.cpp:1403-1706).  Here the layer step is a pure function of
(state, token-embedding); prefill runs the whole prompt through one
``lax.scan`` over tokens (jit-compiled once), decode is the same scan with
T=1 — the XLA equivalent of the build-once graph.

Per-layer recurrent state (5 vectors of n_embd, rwkv.cpp:914-944):
  ff_prev   — channel-mix x_{t-1}
  attn_prev — time-mix x_{t-1}
  num, den  — WKV numerator/denominator accumulators
  maxv      — running max for the numerically-stable WKV (init -1e30)

time_decay in the model file is already -exp(decay)
(convert-rwkv-to-ggml.py:93-95).  Hidden state is halved every
rescale_every layers (rwkv.cpp:1629-1634); the converter pre-divides FFN
output weights to compensate.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import QTensor, q_matmul
from ..ops.layers import layer_norm
from .config import ModelConfig


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "ln1_g", "ln1_b", "ln2_g", "ln2_b",
        "att_time_mix_k", "att_time_mix_v", "att_time_mix_r",
        "att_time_first", "att_time_decay",
        "att_key", "att_value", "att_receptance", "att_output",
        "ff_time_mix_k", "ff_time_mix_r",
        "ff_key", "ff_receptance", "ff_value",
    ],
    meta_fields=[],
)
@dataclass
class RwkvLayer:
    ln1_g: object = None
    ln1_b: object = None
    ln2_g: object = None
    ln2_b: object = None
    att_time_mix_k: object = None
    att_time_mix_v: object = None
    att_time_mix_r: object = None
    att_time_first: object = None
    att_time_decay: object = None
    att_key: object = None
    att_value: object = None
    att_receptance: object = None
    att_output: object = None
    ff_time_mix_k: object = None
    ff_time_mix_r: object = None
    ff_key: object = None
    ff_receptance: object = None
    ff_value: object = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["wte", "ln_pre_g", "ln_pre_b", "layers", "ln_out_g", "ln_out_b", "head"],
    meta_fields=[],
)
@dataclass
class RwkvParams:
    wte: object
    ln_pre_g: object
    ln_pre_b: object
    layers: tuple
    ln_out_g: object
    ln_out_b: object
    head: object


def init_state(cfg: ModelConfig, batch: int = 1):
    """5 x [L, B, E] recurrent state (rwkv.cpp:935-945)."""
    def z():
        # fresh buffer per field: donation forbids aliased state arrays
        return jnp.zeros((cfg.n_layer, batch, cfg.n_embd), jnp.float32)

    return {
        "ff_prev": z(),
        "attn_prev": z(),
        "num": z(),
        "den": z(),
        "maxv": jnp.full((cfg.n_layer, batch, cfg.n_embd), -1e30, jnp.float32),
    }


def _mm(x, w):
    return q_matmul(x, w)


def _layer_step(cfg: ModelConfig, lay: RwkvLayer, st: dict, x):
    """One layer, one token. x: [B, E]; st: dict of [B, E]. Returns (x, st)."""
    # --- time mixing (rwkv.cpp:1469-1564) ---
    cur = attn_cur = layer_norm(x, lay.ln1_g, lay.ln1_b, cfg.norm_eps)
    xp = st["attn_prev"]
    x_r = cur * lay.att_time_mix_r + xp * (1.0 - lay.att_time_mix_r)
    x_k = cur * lay.att_time_mix_k + xp * (1.0 - lay.att_time_mix_k)
    x_v = cur * lay.att_time_mix_v + xp * (1.0 - lay.att_time_mix_v)
    r = jax.nn.sigmoid(_mm(x_r, lay.att_receptance))
    k = _mm(x_k, lay.att_key)
    v = _mm(x_v, lay.att_value)

    num, den, maxv = st["num"], st["den"], st["maxv"]
    # stable WKV with running max
    ktf = lay.att_time_first + k
    p = jnp.maximum(maxv, ktf)
    e1 = jnp.exp(maxv - p)
    e2 = jnp.exp(ktf - p)
    wkv = (e1 * num + e2 * v) / (e1 * den + e2)

    msd = maxv + lay.att_time_decay  # time_decay is already -exp(decay)
    new_p = jnp.maximum(msd, k)
    e1 = jnp.exp(msd - new_p)
    e2 = jnp.exp(k - new_p)
    new_num = e1 * num + e2 * v
    new_den = e1 * den + e2
    x = x + _mm(r * wkv, lay.att_output)

    # --- channel mixing (rwkv.cpp:1578-1612) ---
    cur = layer_norm(x, lay.ln2_g, lay.ln2_b, cfg.norm_eps)
    fp = st["ff_prev"]
    x_r = cur * lay.ff_time_mix_r + fp * (1.0 - lay.ff_time_mix_r)
    x_k = cur * lay.ff_time_mix_k + fp * (1.0 - lay.ff_time_mix_k)
    r = jax.nn.sigmoid(_mm(x_r, lay.ff_receptance))
    kk = jnp.square(jax.nn.relu(_mm(x_k, lay.ff_key)))
    x = x + r * _mm(kk, lay.ff_value)

    new_st = {
        "ff_prev": cur,  # ln2(x) of this step (rwkv.cpp:1594 "state[5*i+0]")
        "attn_prev": attn_cur,  # ln1(x) of this step (rwkv.cpp:1487)
        "num": new_num,
        "den": new_den,
        "maxv": new_p,
    }
    return x, new_st


def _shift1(seq: jax.Array, init: jax.Array) -> jax.Array:
    """[B, T, E] -> previous-step values: [init, seq[0], ..., seq[T-2]]."""
    return jnp.concatenate([init[:, None], seq[:, :-1]], axis=1)


def _linrec_scan(alpha, beta):
    """Parallel linear recurrence y_t = alpha_t * y_{t-1} + beta_t over axis 1.

    Returns the composed prefix maps (A_t, B_t) with y_t = A_t * y_0 + B_t —
    the associative-scan form of the reference's per-token WKV accumulator
    update (rwkv.cpp:1516-1559), log2(T) passes instead of T steps."""
    def combine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a1 * a2, a2 * b1 + b2

    return jax.lax.associative_scan(combine, (alpha, beta), axis=1)


def _layer_parallel(cfg: ModelConfig, lay: RwkvLayer, st: dict, x, valid,
                    all_states: bool = False):
    """One layer, ALL tokens at once. x: [B, T, E]; st: dict of [B, E].

    TPU-first alternative to scanning ``_layer_step`` over tokens: the seven
    per-token matmuls batch into [B*T, E] MXU GEMMs (weights stream from HBM
    once per layer instead of once per token) and the only true sequential
    dependency — the stable-WKV accumulator (rwkv.cpp:1500-1559) — runs as
    two associative scans: the running max is a (max, +) tropical-affine
    composition, then num/den are elementwise linear recurrences in the
    shifted exponentials.  Per-position values match the sequential step up
    to reassociation of the scan (the combine re-brackets the same sums).

    ``valid`` must be a trailing-padding prefix mask (the only shape
    RwkvContext produces): padded steps contribute identity maps to the
    scans, so the final carried state is the last valid token's state.
    Returns (x_out [B, T, E], new_st); x_out at padded positions is garbage
    (as in the sequential path, whose padded outputs are also unused)."""
    b, t, e = x.shape
    cur = layer_norm(x, lay.ln1_g, lay.ln1_b, cfg.norm_eps)  # [B, T, E]
    xp = _shift1(cur, st["attn_prev"])
    x_r = cur * lay.att_time_mix_r + xp * (1.0 - lay.att_time_mix_r)
    x_k = cur * lay.att_time_mix_k + xp * (1.0 - lay.att_time_mix_k)
    x_v = cur * lay.att_time_mix_v + xp * (1.0 - lay.att_time_mix_v)
    r = jax.nn.sigmoid(_mm(x_r, lay.att_receptance))
    k = _mm(x_k, lay.att_key)
    v = _mm(x_v, lay.att_value)

    w = lay.att_time_decay  # [E], already -exp(decay)
    keep = None if valid is None else ~valid[:, :, None]  # pad positions
    # --- running-max trajectory: m_t = max(m_{t-1} + w, k_t) ---
    # composition of f(m) = max(m + a, b): (a1,b1)∘(a2,b2) =
    # (a1+a2, max(b1+a2, b2)); padded steps are the identity (0, -inf)
    a_el = jnp.broadcast_to(w, (b, t, e))
    b_el = k
    if keep is not None:
        a_el = jnp.where(keep, 0.0, a_el)
        b_el = jnp.where(keep, -jnp.inf, b_el)

    def mcomb(l, r_):
        a1, b1 = l
        a2, b2 = r_
        return a1 + a2, jnp.maximum(b1 + a2, b2)

    am, bm = jax.lax.associative_scan(mcomb, (a_el, b_el), axis=1)
    m0 = st["maxv"]
    m_full = jnp.maximum(m0[:, None] + am, bm)  # [B, T, E]
    m_prev = _shift1(m_full, m0)

    # --- num/den linear recurrences in the max-shifted frame ---
    alpha = jnp.exp(m_prev + w - m_full)
    beta_s = jnp.exp(k - m_full)
    if keep is not None:
        alpha = jnp.where(keep, 1.0, alpha)
        beta_s = jnp.where(keep, 0.0, beta_s)
    a2 = jnp.concatenate([alpha, alpha], axis=-1)
    b2 = jnp.concatenate([beta_s * v, beta_s], axis=-1)
    aa, bb = _linrec_scan(a2, b2)
    y0 = jnp.concatenate([st["num"], st["den"]], axis=-1)
    y_full = aa * y0[:, None] + bb
    y_prev = _shift1(y_full, y0)
    n_prev, d_prev = y_prev[..., :e], y_prev[..., e:]

    # --- per-position WKV output from the PRE-update state ---
    ktf = lay.att_time_first + k
    p = jnp.maximum(m_prev, ktf)
    e1 = jnp.exp(m_prev - p)
    e2 = jnp.exp(ktf - p)
    wkv = (e1 * n_prev + e2 * v) / (e1 * d_prev + e2)
    x = x + _mm(r * wkv, lay.att_output)

    # --- channel mixing, batched ---
    ln2 = layer_norm(x, lay.ln2_g, lay.ln2_b, cfg.norm_eps)
    fp = _shift1(ln2, st["ff_prev"])
    x_r = ln2 * lay.ff_time_mix_r + fp * (1.0 - lay.ff_time_mix_r)
    x_k = ln2 * lay.ff_time_mix_k + fp * (1.0 - lay.ff_time_mix_k)
    r = jax.nn.sigmoid(_mm(x_r, lay.ff_receptance))
    kk = jnp.square(jax.nn.relu(_mm(x_k, lay.ff_key)))
    x = x + r * _mm(kk, lay.ff_value)

    if all_states:
        # per-position states (speculative decoding gathers the state at
        # the accepted-prefix index): state AFTER consuming position t
        new_st = {
            "ff_prev": ln2,
            "attn_prev": cur,
            "num": y_full[..., :e],
            "den": y_full[..., e:],
            "maxv": m_full,
        }
        return x, new_st

    # carried state = last VALID position (scans already hold num/den/max
    # through padded steps; cur/ln2 need an explicit gather)
    if valid is None:
        last = jnp.full((b,), t - 1, jnp.int32)
        any_valid = jnp.ones((b, 1), bool)
    else:
        last = jnp.maximum(valid.sum(axis=1).astype(jnp.int32) - 1, 0)
        any_valid = valid.any(axis=1)[:, None]
    gi = last[:, None, None]

    def _at_last(seq, init):
        g = jnp.take_along_axis(seq, jnp.broadcast_to(gi, (b, 1, e)),
                                axis=1)[:, 0]
        return jnp.where(any_valid, g, init)

    new_st = {
        "ff_prev": _at_last(ln2, st["ff_prev"]),
        "attn_prev": _at_last(cur, st["attn_prev"]),
        "num": y_full[:, -1, :e],
        "den": y_full[:, -1, e:],
        "maxv": m_full[:, -1],
    }
    return x, new_st


def _token_step(cfg: ModelConfig, params: RwkvParams, state: dict, emb):
    """All layers for one token. emb: [B, E] embedded+pre-normed input."""
    x = emb
    new_state = {k: [] for k in state}
    for i, lay in enumerate(params.layers):
        st_i = {k: state[k][i] for k in state}
        x, st_o = _layer_step(cfg, lay, st_i, x)
        for k in state:
            new_state[k].append(st_o[k])
        if cfg.rescale_every > 0 and (i + 1) % cfg.rescale_every == 0:
            x = x * 0.5
    out_state = {k: jnp.stack(v) for k, v in new_state.items()}
    return x, out_state


def forward(
    cfg: ModelConfig,
    params: RwkvParams,
    tokens: jax.Array,  # [B, T] int32
    state: dict,  # 5 x [L, B, E]
    *,
    last_only: bool = False,
    valid: jax.Array | None = None,  # [B, T] bool: padded steps hold state
    parallel: bool | None = None,
    all_states: bool = False,
):
    """Scan the prompt through the recurrence.

    `valid` lets callers pad prompts to bucketed lengths without corrupting
    the recurrent state (a padded step passes the carry through untouched) —
    the recurrence's answer to the transformer path's bucket padding, so a
    handful of compilations serve any prompt length.  It must be a prefix
    (trailing-padding) mask when the parallel path is taken.

    `parallel` selects the associative-scan prefill (`_layer_parallel`):
    one weight stream per layer instead of per token — the RWKV prefill
    answer to the transformer path's batched prompt eval.  Default (None)
    auto-enables it for T >= 8 (every RwkvContext prompt bucket).

    `all_states` (parallel path only, no `valid`) returns the state at
    EVERY position — dict of [L, B, T, E] — so speculative decoding can
    gather the accepted-prefix state (runtime/device_spec.rwkv_spec_chunk).

    Returns (logits [B, T|1, V] f32, new_state)."""
    b, t = tokens.shape
    if all_states:
        assert valid is None and t > 1
        parallel = True
    if parallel is None:
        parallel = t >= 8
    if isinstance(params.wte, QTensor):
        emb = params.wte.rows(tokens)
    else:
        emb = jnp.take(params.wte, tokens, axis=0).astype(jnp.float32)
    emb = layer_norm(emb, params.ln_pre_g, params.ln_pre_b, cfg.norm_eps)

    if parallel and t > 1:
        x = emb  # [B, T, E]
        new_state = {k: [] for k in state}
        for i, lay in enumerate(params.layers):
            st_i = {k: state[k][i] for k in state}
            x, st_o = _layer_parallel(cfg, lay, st_i, x, valid, all_states)
            for k in state:
                new_state[k].append(st_o[k])
            if cfg.rescale_every > 0 and (i + 1) % cfg.rescale_every == 0:
                x = x * 0.5
        state = {k: jnp.stack(v) for k, v in new_state.items()}
        if last_only:
            if valid is None:
                x = x[:, -1:, :]
            else:
                # per-row last VALID position (padded outputs are garbage)
                last = jnp.maximum(valid.sum(axis=1).astype(jnp.int32) - 1, 0)
                x = jnp.take_along_axis(
                    x, jnp.broadcast_to(last[:, None, None], (b, 1, x.shape[-1])),
                    axis=1)
        x = layer_norm(x, params.ln_out_g, params.ln_out_b, cfg.norm_eps)
        return q_matmul(x, params.head), state

    def scan_fn(st, ev):  # ev: ([B, E], [B] bool | None)
        e_t, v_t = ev
        x, st_new = _token_step(cfg, params, st, e_t)
        if v_t is not None:
            keep = v_t[None, :, None]  # [1, B, 1] over [L, B, E]
            st_new = jax.tree.map(
                lambda new, old: jnp.where(keep, new, old), st_new, st)
        return st_new, x

    vs = None if valid is None else valid.swapaxes(0, 1)
    state, xs = jax.lax.scan(scan_fn, state, (emb.swapaxes(0, 1), vs))
    xs = xs.swapaxes(0, 1)  # [B, T, E]
    if last_only:
        xs = xs[:, -1:, :]
    xs = layer_norm(xs, params.ln_out_g, params.ln_out_b, cfg.norm_eps)
    logits = q_matmul(xs, params.head)
    return logits, state
