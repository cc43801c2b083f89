"""Device-resident speculative decoding: draft, verify, accept — all on TPU.

runtime/speculative.py runs the draft/verify loop from the host, paying one
host<->device round-trip per verify step (~30-45 ms on a tunneled device —
3-4x the 7B forward itself).  This module moves the WHOLE loop into a
lax.scan: the token history lives in a device buffer, prompt-lookup
drafting is a vectorized n-gram match over that buffer, verification
samples every position of one T=k+1 forward, and acceptance/rollback is
masked arithmetic.  The host sees only the sampled ids every `n_steps`
verify rounds.

Effective cost per emitted token = (one T=k+1 forward) / (1 + accepted):
decode is weight-bandwidth-bound, so the T=8 verify streams the same 4-bit
weights as a T=1 decode.  On repetitive text this multiplies decode
throughput; on adversarially novel text it degrades to one token per
forward — never below the plain on-device loop minus the (tiny) lookup
cost.

Exactness: drafts are point masses, so "sample every position, accept the
matching prefix, the first mismatch IS the residual sample" is the exact
leapfrog rule (see runtime/speculative.py).  Greedy output is
token-for-token identical to the plain decode loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import transformer
from ..models.config import ModelConfig
from .context import Context, _bucket
from .device_sample import (
    VEC_WINDOW,
    DeviceSampling,
    SamplingVec,
    _apply_logit_bias,
    _apply_penalties,
    _recent_push,
    _sample_logits,
    first_sample,
    make_recent,
    sample_logits_vec,
)
from .speculative import SpecParams, SpecStats
from .tokenizer import TOKEN_EOS


def generate_ondevice_spec_draft(
    ctx: Context,
    draft_ctx: Context,
    prompt_tokens: list[int],
    n_predict: int,
    *,
    sampling: DeviceSampling | None = None,
    n_draft: int = 7,
    n_steps: int = 8,
    seed: int = 0,
    eos_token: int = TOKEN_EOS,
    ignore_eos: bool = False,
    stats: SpecStats | None = None,
) -> list[int]:
    """Draft-model speculation with the whole loop on device: prefill both
    models, then `n_steps` (draft k+1 greedy small-model steps -> one
    target T=k+1 verify) rounds per host round-trip.  Models must share a
    vocabulary; outputs are exact for greedy, unbiased for sampling."""
    ds = sampling or DeviceSampling(temp=-1.0)
    k = n_draft
    stats = stats if stats is not None else SpecStats()

    logits = ctx.eval(np.asarray([prompt_tokens], np.int32))
    draft_ctx.eval(np.asarray([prompt_tokens], np.int32))
    assert ctx.n_past == draft_ctx.n_past
    key = jax.random.key(seed)
    key, sub = jax.random.split(key)
    first = first_sample(logits[0, -1], list(prompt_tokens), ds, sub,
                         ctx.cfg.n_vocab)
    if first == eos_token and not ignore_eos:
        return []
    out = [first]
    stats.n_tokens += 1

    cap = min(ctx.n_ctx, draft_ctx.n_ctx)
    tok = jnp.asarray([first], jnp.int32)
    n_past = jnp.asarray([ctx.n_past], jnp.int32)
    done = jnp.zeros((1,), bool)
    recent = (make_recent([prompt_tokens + [first]], ds.repeat_last_n,
                          ctx.cfg.n_vocab)
              if ds.penalized else jnp.zeros((1, 1), jnp.int32))

    while len(out) < n_predict:
        start = int(np.asarray(n_past)[0]) + 1
        if start + k + 1 > cap:
            break
        window = min(_bucket(start - 1 + n_steps * (k + 1) + 1), cap)
        (tok, n_past, ctx.cache_k, ctx.cache_v, draft_ctx.cache_k,
         draft_ctx.cache_v, key, done, recent, emit_toks, emit_ns) = \
            draft_spec_chunk(
                ctx.cfg, ctx.params, draft_ctx.cfg, draft_ctx.params,
                tok, n_past, ctx.cache_k, ctx.cache_v,
                draft_ctx.cache_k, draft_ctx.cache_v, key, done, recent,
                k=k, n_steps=n_steps, ds=ds, kv_window=window,
                eos=eos_token, ignore_eos=ignore_eos,
            )
        toks_h = np.asarray(emit_toks)[:, 0]
        ns_h = np.asarray(emit_ns)[:, 0]
        ctx.n_past = draft_ctx.n_past = int(np.asarray(n_past)[0])
        for s in range(len(ns_h)):
            n = int(ns_h[s])
            stats.n_verify += 1
            stats.n_drafted += k
            stats.n_accepted += max(0, n - 1)
            stats.n_tokens += n
            out.extend(toks_h[s, :n].tolist())
        if bool(np.asarray(done)[0]):
            break
    return out[:n_predict]


def _verify_sample(logits, toks, sub, ds: DeviceSampling, rec, sv=None,
                   base_pos=None):
    """Sample every verify position of logits [B, k+1, V].  With
    penalties (or per-row sv), position j's recent window is `rec` pushed
    with the drafts before it — identical to the host loop's sequential
    window updates on the accepted prefix (discarded positions don't
    matter)."""
    logits = _apply_logit_bias(logits, ds)
    if sv is None and not ds.penalized:
        return _sample_logits(logits, sub, ds)
    kp1 = logits.shape[1]
    subs = jax.random.split(sub, kp1)
    ids = []
    for j in range(kp1):
        if sv is not None:
            pos = None if base_pos is None else base_pos + 1 + j
            ids.append(sample_logits_vec(logits[:, j], subs[j], sv, rec,
                                         position=pos))
        else:
            pen = _apply_penalties(logits[:, j], rec, ds)
            ids.append(_sample_logits(pen, subs[j], ds))
        if j < kp1 - 1:
            rec = _recent_push(rec, toks[:, j + 1])
    return jnp.stack(ids, axis=1)


def _lookup_drafts(buf, m, *, k: int, max_ngram: int, min_ngram: int):
    """Vectorized prompt-lookup over one history row.

    buf: [H] int32 token history, valid prefix length m (traced scalar).
    Returns [k] drafted tokens: the continuation of the most recent earlier
    occurrence of the longest suffix n-gram, extrapolated periodically when
    the match runs into the tail (same semantics as
    speculative.PromptLookupDrafter).  All-zeros when nothing matches
    (those drafts simply get rejected)."""
    H = buf.shape[0]
    pos = jnp.arange(H, dtype=jnp.int32)
    best_j = jnp.int32(-1)
    best_n = jnp.int32(1)
    # ascending n: a longer-suffix match overwrites a shorter one
    for n in range(min_ngram, max_ngram + 1):
        suffix = jax.lax.dynamic_slice(buf, (m - n,), (n,))  # clamped if m<n
        idx = pos[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
        win = buf[jnp.minimum(idx, H - 1)]  # [H, n]
        match = jnp.all(win == suffix[None, :], axis=1)
        match &= pos <= m - n - 1  # continuation must exist
        match &= m > n  # suffix must exist
        j = jnp.max(jnp.where(match, pos, -1))
        best_j = jnp.where(j >= 0, j, best_j)
        best_n = jnp.where(j >= 0, jnp.int32(n), best_n)
    base = best_j + best_n
    p_len = jnp.maximum(m - base, 1)  # >=1 by the pos mask
    t = jnp.arange(k, dtype=jnp.int32)
    src = base + t % p_len  # periodic tail extrapolation
    drafts = buf[jnp.clip(src, 0, H - 1)]
    return jnp.where(best_j >= 0, drafts, jnp.zeros_like(drafts))


def _default_forward(cfg, params, toks, n_past, ck, cv, *, last_only,
                     kv_window):
    return transformer.forward(cfg, params, toks, n_past, ck, cv,
                               last_only=last_only, kv_window=kv_window)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k", "n_steps", "ds", "kv_window", "max_ngram",
                     "min_ngram", "eos", "ignore_eos", "forward_fn"),
    donate_argnames=("hist", "cache_k", "cache_v"),
)
def spec_chunk(cfg: ModelConfig, params, hist, n_hist, cache_k, cache_v,
               key, done, sv: SamplingVec | None = None, *, k: int,
               n_steps: int, ds: DeviceSampling, kv_window: int,
               max_ngram: int, min_ngram: int, eos: int,
               ignore_eos: bool, forward_fn=None):
    """Run n_steps draft-verify rounds on device.

    hist: [B, H] token history (prompt + generated, last token NOT yet in
    the KV cache); n_hist: [B] valid lengths; done: [B] frozen rows.
    forward_fn (static): alternative forward with transformer.forward's
    contract — e.g. parallel.tp.spec_forward(mesh) runs the verify through
    the explicit shard_map tensor-parallel path.
    Returns (hist, n_hist, cache_k, cache_v, key, done, eosed,
             emit_toks [n_steps, B, k+1], emit_ns [n_steps, B]) — eosed
    distinguishes an EOS freeze from a context-capacity freeze (the host
    may context-swap and continue after the latter)."""
    B, H = hist.shape
    rows = jnp.arange(B)
    tpos = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    eosed0 = jnp.zeros((B,), bool)
    fwd = forward_fn or _default_forward

    def body(carry, _):
        hist, m, ck, cv, key, done, eosed = carry
        last = hist[rows, m - 1]
        drafts = jax.vmap(
            functools.partial(_lookup_drafts, k=k, max_ngram=max_ngram,
                              min_ngram=min_ngram)
        )(hist, m)  # [B, k]
        toks = jnp.concatenate([last[:, None], drafts], axis=1)  # [B, k+1]
        logits, ck, cv = fwd(
            cfg, params, toks, m - 1, ck, cv,
            last_only=False, kv_window=kv_window,
        )
        key, sub = jax.random.split(key)
        rec = None
        if ds.penalized or sv is not None:
            # recent window = newest tokens of hist (incl. `last`)
            win = VEC_WINDOW if sv is not None else ds.repeat_last_n
            offs = jnp.arange(win, dtype=jnp.int32) - win
            idx = m[:, None] + offs[None, :]
            rec = jnp.where(idx >= 0,
                            hist[rows[:, None], jnp.clip(idx, 0, H - 1)],
                            jnp.int32(cfg.n_vocab))
        ids = _verify_sample(logits, toks, sub, ds, rec, sv,
                             base_pos=m - 1)  # [B, k+1]
        acc = jnp.cumprod((ids[:, :k] == drafts).astype(jnp.int32), axis=1)
        a = jnp.sum(acc, axis=1)  # [B] accepted drafts, 0..k
        bonus = ids[rows, a]
        drafts_ext = jnp.concatenate(
            [drafts, jnp.zeros((B, 1), drafts.dtype)], axis=1)
        emit = jnp.where(tpos < a[:, None], drafts_ext,
                         jnp.where(tpos == a[:, None], bonus[:, None], 0))
        if ignore_eos:
            emit_n = a + 1
        else:
            hit = (emit == eos) & (tpos <= a[:, None])
            emit_n = jnp.where(jnp.any(hit, axis=1),
                               jnp.argmax(hit, axis=1).astype(jnp.int32),
                               a + 1)
            eosed = eosed | (jnp.any(hit, axis=1) & ~carry[5])
            done = done | jnp.any(hit, axis=1)
        emit_n = jnp.where(carry[5], 0, emit_n)  # frozen rows emit nothing
        # write emitted tokens at the history frontier; done rows write
        # out-of-range (dropped) so a clamped write can't corrupt history
        widx = jnp.where(carry[5], H, m)[:, None] + tpos
        hist = hist.at[rows[:, None], widx].set(emit, mode="drop")
        m = m + emit_n
        done = done | (m + k + 1 > H)  # no room for another verify
        return (hist, m, ck, cv, key, done, eosed), (emit, emit_n)

    (hist, n_hist, cache_k, cache_v, key, done, eosed), \
        (emit_toks, emit_ns) = jax.lax.scan(
            body, (hist, n_hist, cache_k, cache_v, key, done, eosed0),
            None, length=n_steps)
    return (hist, n_hist, cache_k, cache_v, key, done, eosed,
            emit_toks, emit_ns)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k", "n_steps", "ds", "max_ngram", "min_ngram",
                     "eos", "ignore_eos"),
    donate_argnames=("hist", "state"),
)
def rwkv_spec_chunk(cfg: ModelConfig, params, hist, n_hist, state, key,
                    done, sv: SamplingVec | None = None, *, k: int,
                    n_steps: int, ds: DeviceSampling,
                    max_ngram: int, min_ngram: int, eos: int,
                    ignore_eos: bool):
    """spec_chunk for the RWKV recurrence (no KV cache — recurrent state).

    Made viable by the parallel prefill (models/rwkv.py _layer_parallel):
    the T=k+1 verify forward streams each layer's weights ONCE, so a round
    costs one weight pass for up to k+1 tokens — the same bandwidth
    amortization the transformer verify gets from its KV cache (this
    overturns NOTES-NEXT-ROUND #14, which analyzed the sequential scan).
    Rollback is a gather: the verify runs with all_states=True and the
    accepted-prefix index selects the state, replacing the transformer
    path's kv-mask frontier arithmetic.

    state: dict of [L, B, E]; other operands as spec_chunk."""
    from ..models import rwkv as rwkv_mod

    B, H = hist.shape
    rows = jnp.arange(B)
    tpos = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    eosed0 = jnp.zeros((B,), bool)

    def body(carry, _):
        hist, m, st, key, done, eosed = carry
        last = hist[rows, m - 1]
        drafts = jax.vmap(
            functools.partial(_lookup_drafts, k=k, max_ngram=max_ngram,
                              min_ngram=min_ngram)
        )(hist, m)  # [B, k]
        toks = jnp.concatenate([last[:, None], drafts], axis=1)  # [B, k+1]
        logits, st_all = rwkv_mod.forward(cfg, params, toks, st,
                                          all_states=True)
        key, sub = jax.random.split(key)
        rec = None
        if ds.penalized or sv is not None:
            win = VEC_WINDOW if sv is not None else ds.repeat_last_n
            offs = jnp.arange(win, dtype=jnp.int32) - win
            idx = m[:, None] + offs[None, :]
            rec = jnp.where(idx >= 0,
                            hist[rows[:, None], jnp.clip(idx, 0, H - 1)],
                            jnp.int32(cfg.n_vocab))
        ids = _verify_sample(logits, toks, sub, ds, rec, sv,
                             base_pos=m - 1)  # [B, k+1]
        acc = jnp.cumprod((ids[:, :k] == drafts).astype(jnp.int32), axis=1)
        a = jnp.sum(acc, axis=1)  # [B] accepted drafts, 0..k
        bonus = ids[rows, a]
        drafts_ext = jnp.concatenate(
            [drafts, jnp.zeros((B, 1), drafts.dtype)], axis=1)
        emit = jnp.where(tpos < a[:, None], drafts_ext,
                         jnp.where(tpos == a[:, None], bonus[:, None], 0))
        if ignore_eos:
            emit_n = a + 1
            new_done = done
        else:
            hit = (emit == eos) & (tpos <= a[:, None])
            emit_n = jnp.where(jnp.any(hit, axis=1),
                               jnp.argmax(hit, axis=1).astype(jnp.int32),
                               a + 1)
            eosed = eosed | (jnp.any(hit, axis=1) & ~done)
            new_done = done | jnp.any(hit, axis=1)
        # next-round state covers exactly the EMITTED history — position
        # index emit_n-1 (== a without EOS; an EOS truncation must not
        # leave post-EOS draft tokens in the recurrent state).  Rows that
        # emit nothing (frozen, or EOS at position 0) keep their state.
        adv = (~done) & (emit_n > 0)
        gi = jnp.broadcast_to(
            jnp.maximum(emit_n - 1, 0)[None, :, None, None],
            (cfg.n_layer, B, 1, cfg.n_embd))
        st_new = jax.tree.map(
            lambda s_all, s_old: jnp.where(
                adv[None, :, None],
                jnp.take_along_axis(s_all, gi, axis=2)[:, :, 0], s_old),
            st_all, st)
        emit_n = jnp.where(done, 0, emit_n)  # frozen rows emit nothing
        widx = jnp.where(done, H, m)[:, None] + tpos
        hist = hist.at[rows[:, None], widx].set(emit, mode="drop")
        m = m + emit_n
        new_done = new_done | (m + k + 1 > H)  # no room for another verify
        return (hist, m, st_new, key, new_done, eosed), (emit, emit_n)

    (hist, n_hist, state, key, done, eosed), (emit_toks, emit_ns) = \
        jax.lax.scan(body, (hist, n_hist, state, key, done, eosed0),
                     None, length=n_steps)
    return hist, n_hist, state, key, done, eosed, emit_toks, emit_ns


def generate_ondevice_spec_rwkv(
    ctx,  # RwkvContext
    prompt_tokens: list[int],
    n_predict: int,
    *,
    sampling: DeviceSampling | None = None,
    spec: SpecParams | None = None,
    n_steps: int = 8,
    seed: int = 0,
    eos_token: int = TOKEN_EOS,
    ignore_eos: bool = False,
    stats: SpecStats | None = None,
) -> list[int]:
    """generate_ondevice_spec for RwkvContext — parallel prefill, then
    device-resident draft-verify rounds over the recurrent state."""
    ds = sampling or DeviceSampling(temp=-1.0)
    sp = spec or SpecParams()
    k = sp.n_draft
    stats = stats if stats is not None else SpecStats()

    logits = ctx.eval(np.asarray([prompt_tokens], np.int32))
    key = jax.random.key(seed)
    key, sub = jax.random.split(key)
    first = first_sample(logits[0, -1], list(prompt_tokens), ds, sub,
                         ctx.cfg.n_vocab)
    if first == eos_token and not ignore_eos:
        return []
    out = [first]
    stats.n_tokens += 1

    n0 = len(prompt_tokens) + 1
    # recurrence has no context limit — size the history to fit the run
    H = _bucket(min(n0 + n_predict + n_steps * (k + 1) + 2, ctx.n_ctx))
    hist_np = np.zeros((1, H), np.int32)
    hist_np[0, :n0] = list(prompt_tokens) + [first]
    hist = jnp.asarray(hist_np)
    n_hist = jnp.asarray([n0], jnp.int32)
    done = jnp.zeros((1,), bool)

    while len(out) < n_predict:
        start = int(np.asarray(n_hist)[0])
        if start + k + 1 > H:
            break
        (hist, n_hist, ctx.state, key, done, eosed, emit_toks, emit_ns) = \
            rwkv_spec_chunk(
                ctx.cfg, ctx.params, hist, n_hist, ctx.state, key, done,
                k=k, n_steps=n_steps, ds=ds,
                max_ngram=sp.max_ngram, min_ngram=sp.min_ngram,
                eos=eos_token, ignore_eos=ignore_eos,
            )
        toks_h = np.asarray(emit_toks)[:, 0]  # [n_steps, k+1]
        ns_h = np.asarray(emit_ns)[:, 0]  # [n_steps]
        ctx.n_past = int(np.asarray(n_hist)[0]) - 1
        for s in range(len(ns_h)):
            n = int(ns_h[s])
            stats.n_verify += 1
            stats.n_drafted += k
            stats.n_accepted += max(0, n - 1)
            stats.n_tokens += n
            out.extend(toks_h[s, :n].tolist())
        if bool(np.asarray(eosed)[0]):
            break
        if bool(np.asarray(done)[0]):
            break
    return out[:n_predict]


@functools.partial(
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "k", "n_steps", "ds", "kv_window",
                     "eos", "ignore_eos"),
    donate_argnames=("ck_t", "cv_t", "ck_d", "cv_d"),
)
def draft_spec_chunk(cfg_t: ModelConfig, params_t, cfg_d: ModelConfig,
                     params_d, tok, n_past, ck_t, cv_t, ck_d, cv_d,
                     key, done, recent, *, k: int, n_steps: int,
                     ds: DeviceSampling, kv_window: int, eos: int,
                     ignore_eos: bool):
    """Draft-MODEL speculation, fully on device: each round runs k+1
    greedy draft-model steps (inner scan) then ONE T=k+1 target verify.

    Both models' caches live in the scan carry and share ONE frontier
    n_past — each inserts `tok` at the same absolute position, and
    rollback is the shared masked-KV trick (un-accepted slots re-written
    next round).  The k+1st draft step exists so every PROPOSED token is
    resident in the draft cache on full acceptance (see
    speculative.DraftModelDrafter).

    tok/n_past/done: [B]; recent: [B, N] penalty window incl. tok (any
    [B, 1] dummy when ds has no penalties).  Returns updated state plus
    emit_toks [n_steps, B, k+1] / emit_ns [n_steps, B]."""
    B = tok.shape[0]
    rows = jnp.arange(B)
    tpos = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    greedy = DeviceSampling(temp=-1.0)
    cap = min(ck_t[0].shape[1], ck_d[0].shape[1])

    def round_body(carry, _):
        tok, n_p, ck_t, cv_t, ck_d, cv_d, key, done, rec = carry
        pre_done = done

        def draft_step(c, _):
            dtok, ck, cv, np_ = c
            logits, ck, cv = transformer.forward(
                cfg_d, params_d, dtok[:, None], np_, ck, cv,
                last_only=True, kv_window=kv_window)
            nxt = _sample_logits(logits[:, -1], key, greedy)
            return (nxt, ck, cv, np_ + 1), nxt

        (_, ck_d, cv_d, _), drafts_all = jax.lax.scan(
            draft_step, (tok, ck_d, cv_d, n_p), None, length=k + 1)
        drafts = drafts_all[:k].T  # [B, k]

        toks = jnp.concatenate([tok[:, None], drafts], axis=1)
        logits, ck_t, cv_t = transformer.forward(
            cfg_t, params_t, toks, n_p, ck_t, cv_t,
            last_only=False, kv_window=kv_window)
        key, sub = jax.random.split(key)
        ids = _verify_sample(logits, toks, sub, ds, rec)
        acc = jnp.cumprod((ids[:, :k] == drafts).astype(jnp.int32), axis=1)
        a = jnp.sum(acc, axis=1)
        bonus = ids[rows, a]
        drafts_ext = jnp.concatenate(
            [drafts, jnp.zeros((B, 1), drafts.dtype)], axis=1)
        emit = jnp.where(tpos < a[:, None], drafts_ext,
                         jnp.where(tpos == a[:, None], bonus[:, None], 0))
        if ignore_eos:
            emit_n = a + 1
        else:
            hit = (emit == eos) & (tpos <= a[:, None])
            emit_n = jnp.where(jnp.any(hit, axis=1),
                               jnp.argmax(hit, axis=1).astype(jnp.int32),
                               a + 1)
            done = done | jnp.any(hit, axis=1)
        emit_n = jnp.where(pre_done, 0, emit_n)
        if ds.penalized:
            # push the round's ACCEPTED tokens into the penalty window
            for j in range(k + 1):
                ok = (jnp.int32(j) < emit_n)[:, None]
                rec = jnp.where(ok, _recent_push(rec, emit[:, j]), rec)
        # next input `tok` (bonus) goes to slot n_p + a + 1 for BOTH models
        n_p = n_p + jnp.where(pre_done, 0, a + 1)
        done = done | (n_p + k + 2 > cap)  # out of cache capacity
        tok = jnp.where(pre_done, tok, bonus)
        return (tok, n_p, ck_t, cv_t, ck_d, cv_d, key, done, rec), \
            (emit, emit_n)

    (tok, n_past, ck_t, cv_t, ck_d, cv_d, key, done, recent), \
        (emit_toks, emit_ns) = jax.lax.scan(
            round_body,
            (tok, n_past, ck_t, cv_t, ck_d, cv_d, key, done, recent),
            None, length=n_steps)
    return (tok, n_past, ck_t, cv_t, ck_d, cv_d, key, done, recent,
            emit_toks, emit_ns)


def generate_ondevice_spec(
    ctx: Context,
    prompt_tokens: list[int],
    n_predict: int,
    *,
    sampling: DeviceSampling | None = None,
    spec: SpecParams | None = None,
    n_steps: int = 8,
    seed: int = 0,
    eos_token: int = TOKEN_EOS,
    ignore_eos: bool = False,
    stats: SpecStats | None = None,
    n_keep: int | None = None,
) -> list[int]:
    """Prefill on the Context, then decode with device-resident
    draft-verify rounds, `n_steps` rounds per host round-trip.

    n_keep (not None) enables the infinite-text context swap at context
    end (keep n_keep prompt tokens, re-feed the newest half of the rest —
    main.cpp:366-389); None stops at the context boundary."""
    ds = sampling or DeviceSampling(temp=-1.0)
    sp = spec or SpecParams()
    k = sp.n_draft
    stats = stats if stats is not None else SpecStats()

    logits = ctx.eval(np.asarray([prompt_tokens], np.int32))
    key = jax.random.key(seed)
    key, sub = jax.random.split(key)
    first = first_sample(logits[0, -1], list(prompt_tokens), ds, sub,
                         ctx.cfg.n_vocab)
    if first == eos_token and not ignore_eos:
        return []
    out = [first]
    stats.n_tokens += 1

    H = ctx.n_ctx
    hist_np = np.zeros((1, H), np.int32)
    n0 = len(prompt_tokens) + 1
    hist_np[0, :n0] = list(prompt_tokens) + [first]
    hist = jnp.asarray(hist_np)
    n_hist = jnp.asarray([n0], jnp.int32)
    done = jnp.zeros((1,), bool)

    while len(out) < n_predict:
        start = int(np.asarray(n_hist)[0])
        if start + k + 1 > H:
            if n_keep is None:
                break
            # context swap (main.cpp:366-389): keep n_keep prompt tokens,
            # re-feed the newest half of everything after them
            keep = len(prompt_tokens) if n_keep < 0 else n_keep
            all_toks = list(prompt_tokens) + out
            n_left = start - keep
            refeed = list(prompt_tokens[:keep]) + all_toks[-(n_left // 2):]
            ctx.reset()
            ctx.eval(np.asarray([refeed[:-1]], np.int32))
            hist_np = np.zeros((1, H), np.int32)
            hist_np[0, : len(refeed)] = refeed
            hist = jnp.asarray(hist_np)
            n_hist = jnp.asarray([len(refeed)], jnp.int32)
            done = jnp.zeros((1,), bool)
            start = len(refeed)
        window = min(_bucket(start - 1 + n_steps * (k + 1) + 1), H)
        (hist, n_hist, ctx.cache_k, ctx.cache_v, key, done, eosed,
         emit_toks, emit_ns) = spec_chunk(
            ctx.cfg, ctx.params, hist, n_hist, ctx.cache_k, ctx.cache_v,
            key, done, k=k, n_steps=n_steps, ds=ds, kv_window=window,
            max_ngram=sp.max_ngram, min_ngram=sp.min_ngram,
            eos=eos_token, ignore_eos=ignore_eos,
        )
        toks_h = np.asarray(emit_toks)[:, 0]  # [n_steps, k+1]
        ns_h = np.asarray(emit_ns)[:, 0]  # [n_steps]
        ctx.n_past = int(np.asarray(n_hist)[0]) - 1
        for s in range(len(ns_h)):
            n = int(ns_h[s])
            stats.n_verify += 1
            stats.n_drafted += k
            stats.n_accepted += max(0, n - 1)
            stats.n_tokens += n
            out.extend(toks_h[s, :n].tolist())
        if bool(np.asarray(eosed)[0]):
            break
        if bool(np.asarray(done)[0]) and n_keep is None:
            break  # context end without swap enabled
    return out[:n_predict]
