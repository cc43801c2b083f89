"""Speculative decoding: draft k tokens cheaply, verify in ONE forward.

Beyond-reference capability (the reference decodes strictly one token per
eval, main.cpp:414-431).  Decode is weight-bandwidth-bound: a T=8 forward
streams the same 4-bit weights as a T=1 forward, so verifying 7 drafts
costs roughly one decode step.  Every accepted draft is a token we did not
pay a full weight pass for.

Two draft sources:

- ``PromptLookupDrafter`` — n-gram continuation lookup in the token history
  (prompt-lookup decoding): free, host-side, no extra model.  Strong on
  input-grounded tasks (summarization, code edits, RAG) where output
  re-uses input spans.
- ``DraftModelDrafter`` — a small model of the same tokenizer family drafts
  greedily via one on-device chunked decode (runtime/device_sample.py), and
  is kept in sync with the target by the same cache-rollback trick.

Acceptance is exact, not approximate.  Draft distributions here are point
masses, so the leapfrog acceptance rule ("accept with prob p_target(d),
else resample from the residual") reduces to: sample from the target at
every position, accept the prefix where samples == drafts, and the sample
at the first mismatch IS the correct residual sample.  Greedy decoding is
therefore token-for-token identical to non-speculative decoding, and
temperature sampling is unbiased.

Rollback is free under this framework's masked-KV design: cache slot i is
visible only when i < n_past + t (transformer.forward kv_mask), so
un-accepted slots are simply re-written by the next verify step.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models import transformer
from ..models.config import ModelConfig
from .context import Context, _bucket
from .device_sample import (
    DeviceSampling, _apply_logit_bias, _apply_penalties, _recent_push,
    _sample_logits, decode_chunk, first_sample, make_recent,
)
from .tokenizer import TOKEN_EOS


@dataclass(frozen=True)
class SpecParams:
    n_draft: int = 7     # drafts per verify (verify width = n_draft + 1)
    max_ngram: int = 3   # prompt-lookup: longest suffix n-gram to match
    min_ngram: int = 1


# --------------------------------------------------------------- drafters


class PromptLookupDrafter:
    """Draft the continuation of the most recent earlier occurrence of the
    current suffix n-gram (prompt-lookup decoding; no draft model)."""

    def __init__(self, spec: SpecParams | None = None):
        self.spec = spec or SpecParams()

    def prefill(self, tokens: list[int]) -> None:
        pass

    def draft(self, history: list[int], k: int) -> list[int]:
        h = history
        n_h = len(h)
        for n in range(min(self.spec.max_ngram, n_h - 1),
                       self.spec.min_ngram - 1, -1):
            suffix = h[-n:]
            # most recent earlier occurrence wins (local context repeats
            # are likelier continuations than distant ones)
            for j in range(n_h - n - 1, -1, -1):
                if h[j:j + n] == suffix:
                    cont = h[j + n:j + n + k]
                    if cont and len(cont) < k:
                        # match ran into the history tail: the sequence is
                        # looping with period len(cont) — extrapolate the
                        # cycle (mis-guesses are ~free, the verify forward
                        # is already paid for)
                        cont = (cont * (k // len(cont) + 1))[:k]
                    if cont:
                        return cont
                    break
        return []

    def commit(self, n_accepted: int, bonus: int) -> None:
        pass


class DraftModelDrafter:
    """A small same-vocab model drafts greedily; its KV cache tracks the
    target's accepted history via the shared n_past-rollback trick."""

    def __init__(self, ctx: Context):
        self.ctx = ctx
        # tokens after the draft cache's frontier, last = next input
        self._pending: list[int] = []
        self._did_draft = False
        self._draft_base = 0

    def prefill(self, tokens: list[int]) -> None:
        self.ctx.reset()
        if len(tokens) > 1:
            self.ctx.eval(np.asarray([tokens[:-1]], np.int32))
        self._pending = [tokens[-1]]
        self._did_draft = False

    def draft(self, history: list[int], k: int) -> list[int]:
        ctx = self.ctx
        self._did_draft = False
        if ctx.n_past + len(self._pending) + k + 2 >= ctx.n_ctx:
            return []
        if len(self._pending) > 1:
            # catch up tokens skipped during a no-draft round
            ctx.eval(np.asarray([self._pending[:-1]], np.int32))
            self._pending = self._pending[-1:]
        last = self._pending[-1]
        # k+1 scan steps so every PROPOSED draft is resident in the draft
        # cache: steps feed [last, d_1..d_k] into slots n_past..n_past+k,
        # sampling d_1..d_{k+1}; we propose d_1..d_k and discard d_{k+1}.
        # (With only k steps, full acceptance would leave d_k's slot
        # unwritten yet visible under the rolled-forward n_past.)
        window = min(_bucket(ctx.n_past + k + 2), ctx.n_ctx)
        toks, ctx.cache_k, ctx.cache_v, _, _, _ = decode_chunk(
            ctx.cfg, ctx.params,
            jnp.asarray([last], jnp.int32), jnp.int32(ctx.n_past),
            ctx.cache_k, ctx.cache_v, jax.random.key(0),
            n_steps=k + 1, ds=DeviceSampling(temp=-1.0), kv_window=window,
        )
        self._draft_base = ctx.n_past  # position of `last`
        self._did_draft = True
        ctx.n_past += k + 1
        return np.asarray(toks)[0, :k].tolist()

    def commit(self, n_accepted: int, bonus: int) -> None:
        if not self._did_draft:
            # cache frontier unchanged; the round's bonus token joins the
            # catch-up queue as the next input
            self._pending.append(bonus)
            return
        # accepted prefix occupies slots base..base+n_accepted; the bonus
        # token becomes the next input at slot base+n_accepted+1
        self.ctx.n_past = self._draft_base + n_accepted + 1
        self._pending = [bonus]
        self._did_draft = False


# ----------------------------------------------------------- verify step


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "ds", "kv_window"),
    donate_argnames=("cache_k", "cache_v"),
)
def _verify(cfg: ModelConfig, params, tokens, n_past, cache_k, cache_v,
            key, recent=None, *, ds: DeviceSampling, kv_window: int):
    """Forward [B, T] = [last_token, d_1..d_{T-1}]; sample at every
    position on device; return ids [B, T] (the only D2H transfer).

    With penalties, position j's recent window is `recent` (which already
    includes the round's last token) pushed with the drafts before j —
    identical to the plain decode loop's sequential window updates on the
    accepted prefix (samples at discarded positions don't matter)."""
    logits, cache_k, cache_v = transformer.forward(
        cfg, params, tokens, n_past, cache_k, cache_v,
        last_only=False, kv_window=kv_window,
    )
    logits = _apply_logit_bias(logits, ds)
    key, sub = jax.random.split(key)
    if not ds.penalized:
        ids = _sample_logits(logits, sub, ds)
    else:
        kp1 = logits.shape[1]
        subs = jax.random.split(sub, kp1)
        cols = []
        for j in range(kp1):
            pen = _apply_penalties(logits[:, j], recent, ds)
            cols.append(_sample_logits(pen, subs[j], ds))
            if j < kp1 - 1:
                recent = _recent_push(recent, tokens[:, j + 1])
        ids = jnp.stack(cols, axis=1)
    return ids, cache_k, cache_v, key


# ------------------------------------------------------------ host loop


@dataclass
class SpecStats:
    n_verify: int = 0     # verify forwards run
    n_drafted: int = 0    # draft tokens proposed
    n_accepted: int = 0   # draft tokens accepted
    n_tokens: int = 0     # tokens emitted (accepted + bonus samples)

    @property
    def acceptance(self) -> float:
        return self.n_accepted / max(1, self.n_drafted)

    @property
    def tokens_per_step(self) -> float:
        return self.n_tokens / max(1, self.n_verify)


def generate_speculative(
    ctx: Context,
    prompt_tokens: list[int],
    n_predict: int,
    *,
    sampling: DeviceSampling | None = None,
    spec: SpecParams | None = None,
    drafter=None,
    seed: int = 0,
    eos_token: int = TOKEN_EOS,
    ignore_eos: bool = False,
    stats: SpecStats | None = None,
) -> list[int]:
    """Prefill, then decode with draft-and-verify steps.

    Greedy (sampling.temp <= 0) output is token-for-token identical to
    runtime/generate.py's loop; temperature sampling is unbiased."""
    ds = sampling or DeviceSampling(temp=-1.0)
    sp = spec or SpecParams()
    drafter = drafter or PromptLookupDrafter(sp)
    stats = stats if stats is not None else SpecStats()

    logits = ctx.eval(np.asarray([prompt_tokens], np.int32))
    key = jax.random.key(seed)
    key, sub = jax.random.split(key)
    last = first_sample(logits[0, -1], list(prompt_tokens), ds, sub,
                        ctx.cfg.n_vocab)
    out: list[int] = []
    if last == eos_token and not ignore_eos:
        return out
    out.append(last)
    stats.n_tokens += 1
    history = list(prompt_tokens) + [last]
    drafter.prefill(history)

    while len(out) < n_predict:
        room = ctx.n_ctx - ctx.n_past - 2
        if room <= 0:
            break
        k = min(sp.n_draft, room, n_predict - len(out))
        drafts = drafter.draft(history, k) if k > 0 else []
        t_real = 1 + len(drafts)
        bt = min(_bucket(t_real), ctx.n_ctx - ctx.n_past)
        drafts = drafts[: bt - 1]
        t_real = 1 + len(drafts)
        toks = np.zeros((1, bt), np.int32)
        toks[0, 0] = last
        toks[0, 1:t_real] = drafts
        p = ctx.n_past
        window = min(_bucket(p + bt), ctx.n_ctx)
        recent = (make_recent([history], ds.repeat_last_n, ctx.cfg.n_vocab)
                  if ds.penalized else None)
        ids, ctx.cache_k, ctx.cache_v, key = _verify(
            ctx.cfg, ctx.params, jnp.asarray(toks), jnp.int32(p),
            ctx.cache_k, ctx.cache_v, key, recent, ds=ds, kv_window=window,
        )
        row = np.asarray(ids)[0]
        a = 0
        while a < len(drafts) and int(row[a]) == drafts[a]:
            a += 1
        bonus = int(row[a])
        stats.n_verify += 1
        stats.n_drafted += len(drafts)
        stats.n_accepted += a
        drafter.commit(a, bonus)
        ctx.n_past = p + a + 1

        done = False
        for tok in drafts[:a] + [bonus]:
            if tok == eos_token and not ignore_eos:
                done = True
                break
            out.append(tok)
            history.append(tok)
            stats.n_tokens += 1
            if len(out) >= n_predict:
                done = True
                break
        if done:
            break
        last = out[-1]
    return out[:n_predict]
