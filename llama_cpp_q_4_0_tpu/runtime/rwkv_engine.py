"""Continuous-batching engine for the RWKV recurrence.

The transformer BatchEngine's slots are KV-cache rows; here a slot is one
row of the recurrent state (dict of [L, B, E]) plus one row of the token
history buffer.  Serving amortizes the same way — decode streams the
weights once per tick regardless of occupancy — and every tick is a
speculative draft-verify round (runtime/device_spec.rwkv_spec_chunk): the
parallel verify forward is the only batched multi-token step the
recurrence admits, and with prompt-lookup hits it emits several tokens per
weight pass.  On novel text it degrades to one token per round, i.e. a
plain batched decode.

Admissions batch all free slots into ONE ragged parallel-prefill forward
(trailing-padding valid masks), then scatter the per-row states into the
engine state.  Ticks pipeline two-in-flight exactly like the transformer
engine: chunk inputs are fully device-resident, so the D2H of tick t
overlaps tick t+1's execution (the tunnel round-trip otherwise serializes
every tick).

Public surface mirrors BatchEngine (submit/start/stop/stats + Request),
so cli/server.py --parallel serves RWKV models transparently.
"""

from __future__ import annotations

import functools
import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..models import rwkv as rwkv_mod
from ..models.config import ModelConfig
from .batch_engine import Request, _bucket, _Slot, dataclasses_replace_rln
from .sampling import Sampler
from .speculative import SpecParams
from .tokenizer import TOKEN_EOS


@functools.partial(jax.jit, donate_argnames=("state", "hist", "n_hist",
                                             "done"))
def _scatter_rows(state, hist, n_hist, done, idxs, new_state, new_hist,
                  new_n):
    """Write admitted rows (one batched prefill's outputs) into the engine
    arrays.  idxs [n_new]; new_state leaves [L, n_new, E]."""
    state = {k: state[k].at[:, idxs].set(new_state[k]) for k in state}
    hist = hist.at[idxs].set(new_hist)
    n_hist = n_hist.at[idxs].set(new_n)
    done = done.at[idxs].set(False)
    return state, hist, n_hist, done


@functools.partial(jax.jit, static_argnames=("cfg", "last_only"))
def _prefill_step(cfg, params, tokens, state, valid, last_only):
    return rwkv_mod.forward(cfg, params, tokens, state, valid=valid,
                            last_only=last_only)


class RwkvBatchEngine:
    """Multi-request RWKV serving over speculative device ticks."""

    def __init__(self, cfg: ModelConfig, params, *, n_slots: int = 8,
                 n_ctx: int = 2048, chunk: int = 8, spec_draft: int = 5,
                 spec: SpecParams | None = None,
                 device_sampling=None, per_request_sampling: bool = True,
                 seed: int = 0, pipeline_depth: int = 2):
        from .device_sample import DeviceSampling
        from ..ops.qtensor import (maybe_cast_scales_f16,
                                   maybe_fold_zero_points)

        self.cfg = cfg
        # r4 TPU default: folded view for decode/verify ticks, raw view
        # for the batched prompt prefill (fold regresses big-t scans;
        # see Context.__init__)
        params = maybe_cast_scales_f16(params)
        self.params_prefill = params
        self.params = maybe_fold_zero_points(params)
        self.n_slots = n_slots
        self.n_ctx = n_ctx  # history-buffer capacity (lookup window)
        self.chunk = chunk  # verify rounds per tick
        self.spec = spec or SpecParams(n_draft=spec_draft)
        self.device_sampling = device_sampling or DeviceSampling(temp=-1.0)
        self.per_request_sampling = per_request_sampling
        self.pipeline_depth = pipeline_depth
        self.slots = [_Slot(i) for i in range(n_slots)]
        self._state = rwkv_mod.init_state(cfg, n_slots)
        self._hist = jnp.zeros((n_slots, n_ctx), jnp.int32)
        self._n_hist = jnp.zeros((n_slots,), jnp.int32)
        self._done = jnp.ones((n_slots,), bool)
        self._key = jax.random.key(seed)
        self._inbox: "queue.Queue[Request | None]" = queue.Queue()
        self._pending: list[Request] = []
        self._inflight: list[dict] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None  # tick-thread death cause
        self._req_ids = iter(range(1, 1 << 62))
        self.n_ticks = 0
        self.n_tokens_out = 0
        self.n_requests_done = 0
        self.n_spec_rounds = 0
        self.n_spec_drafted = 0
        self.n_spec_accepted = 0

    # -- public surface (mirrors BatchEngine) --

    def submit(self, req: Request) -> Request:
        if self._error is not None:
            raise RuntimeError(
                "engine thread died; restart the engine") from self._error
        if (self.per_request_sampling and req.sampling is not None
                and req.sampling.mirostat):
            # RWKV serving is speculative-verify only; mirostat's carried
            # mu has no well-defined stream under acceptance-based verify
            # (the transformer engine routes such batches to chunked ticks
            # instead — RWKV has no chunked tick to fall back to)
            raise ValueError(
                "mirostat sampling is not supported by the speculative "
                "RWKV engine; use a single-stream context instead")
        req.id = next(self._req_ids)
        self._inbox.put(req)
        if self._error is not None and self._thread is not None \
                and not self._thread.is_alive():
            # raced a dying thread past its inbox drain: close it ourselves
            req.out.put(None)
        return req

    def start(self):
        self._error = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._inbox.put(None)
        if self._thread:
            self._thread.join()

    def stats(self) -> dict:
        acc = (self.n_spec_accepted / self.n_spec_drafted
               if self.n_spec_drafted else 0.0)
        return {
            "arch": "rwkv",
            "n_slots": self.n_slots,
            "active": self.n_active,
            "queued": len(self._pending),
            "n_ticks": self.n_ticks,
            "n_tokens_out": self.n_tokens_out,
            "n_requests_done": self.n_requests_done,
            "spec_rounds": self.n_spec_rounds,
            "spec_acceptance": acc,
        }

    @property
    def n_active(self) -> int:
        return sum(1 for s in self.slots if s.active)

    # -- engine internals --

    def _drain_inbox(self, block: bool):
        try:
            while True:
                r = self._inbox.get(block=block, timeout=0.05 if block
                                    else None)
                block = False
                if r is None:
                    return
                self._pending.append(r)
        except queue.Empty:
            pass

    def _admit(self):
        """Batch every (free slot, pending request) pair into one ragged
        parallel-prefill forward, then scatter the rows in."""
        batch = []
        for s in self.slots:
            if not self._pending:
                break
            if s.free:
                batch.append((s, self._pending.pop(0)))
        if not batch:
            return
        # bind requests to slots BEFORE the prefill forward so the _run
        # finally can close them if the compile/dispatch fails (see
        # BatchEngine._admit — the 2026-08-20 engine-bench hang)
        for slot, req in batch:
            slot.req = req
        prompts = [r.prompt_tokens for _, r in batch]
        t_pad = _bucket(max(len(p) for p in prompts))
        toks = np.zeros((len(batch), t_pad), np.int32)
        valid = np.zeros((len(batch), t_pad), bool)
        for i, p in enumerate(prompts):
            toks[i, : len(p)] = p
            valid[i, : len(p)] = True
        logits, st = _prefill_step(
            self.cfg, self.params_prefill, jnp.asarray(toks),
            rwkv_mod.init_state(self.cfg, len(batch)), jnp.asarray(valid),
            True)
        logits = np.asarray(logits)  # [n_new, 1, V] at last valid position

        rows, idxs, hist_rows, ns = [], [], [], []
        for i, (slot, req) in enumerate(batch):
            if req.cancelled:
                req.out.put(None)
                slot.req = None  # unbind the early slot binding
                continue
            slot.req = req
            slot.sampler = Sampler(req.sampling, self.cfg.n_vocab, req.seed)
            slot.last_tokens = list(prompts[i])
            slot.produced = 0
            slot.n_past = len(prompts[i])
            self._emit_one(slot, logits[i, -1])
            if slot.req is None:
                continue  # finished on the first token
            row = np.zeros((self.n_ctx,), np.int32)
            n0 = len(slot.last_tokens)
            row[:n0] = slot.last_tokens
            rows.append(i)
            idxs.append(slot.idx)
            hist_rows.append(row)
            ns.append(n0)
        if not idxs:
            return
        sub = {k: st[k][:, jnp.asarray(rows)] for k in st}
        self._state, self._hist, self._n_hist, self._done = _scatter_rows(
            self._state, self._hist, self._n_hist, self._done,
            jnp.asarray(idxs), sub, jnp.asarray(np.stack(hist_rows)),
            jnp.asarray(ns, jnp.int32))

    def _emit_one(self, slot: _Slot, row_logits: np.ndarray):
        """Host-sample one token (admission's first token) and apply finish
        conditions — same semantics as BatchEngine._emit."""
        req = slot.req
        tok = slot.sampler.sample(row_logits, slot.last_tokens)
        done = False
        if tok == TOKEN_EOS:
            done = True
        else:
            slot.last_tokens.append(tok)
            slot.produced += 1
            self.n_tokens_out += 1
            req.out.put(tok)
            if req.stop_sequences and any(
                tuple(slot.last_tokens[-len(ss):]) == ss
                for ss in req.stop_sequences if ss
            ):
                done = True
        if slot.produced >= req.n_predict:
            done = True
        if done:
            req.out.put(None)
            self.n_requests_done += 1
            slot.req = None
            slot.sampler = None

    def _make_sv(self):
        from .device_sample import VEC_WINDOW, make_sampling_vec

        sv = make_sampling_vec(
            [s.req.sampling if s.active else None for s in self.slots],
            seeds=[s.req.seed if s.active else -1 for s in self.slots])
        return dataclasses_replace_rln(sv, VEC_WINDOW)

    def _issue(self):
        from .device_spec import rwkv_spec_chunk

        sv = self._make_sv() if self.per_request_sampling else None
        (self._hist, self._n_hist, self._state, self._key, self._done,
         _eosed, emit_toks, emit_ns) = rwkv_spec_chunk(
            self.cfg, self.params, self._hist, self._n_hist, self._state,
            self._key, self._done, sv,
            k=self.spec.n_draft, n_steps=self.chunk,
            ds=self.device_sampling, max_ngram=self.spec.max_ngram,
            min_ngram=self.spec.min_ngram, eos=TOKEN_EOS, ignore_eos=False,
        )
        self.n_ticks += 1
        self._inflight.append({
            "emit_toks": emit_toks, "emit_ns": emit_ns,
            "n_hist": self._n_hist, "done": self._done,
            "snap": [(s.idx, s.req) for s in self.slots if s.active],
        })

    def _harvest_one(self):
        t = self._inflight.pop(0)
        toks_h = np.asarray(t["emit_toks"])  # [n_steps, B, k+1]
        ns_h = np.asarray(t["emit_ns"])  # [n_steps, B]
        n_hist_h = np.asarray(t["n_hist"])
        done_h = np.asarray(t["done"])
        snap = dict(t["snap"])
        freeze = []
        for s in self.slots:
            req = snap.get(s.idx)
            if req is None or s.req is not req:
                continue  # freed at an earlier harvest (stale tick)
            finished = False
            emit = []  # ONE queue put per (request, tick): Request.tokens
            for step in range(ns_h.shape[0]):
                self.n_spec_rounds += 1
                self.n_spec_drafted += self.spec.n_draft
                self.n_spec_accepted += max(0, int(ns_h[step, s.idx]) - 1)
                for tok in toks_h[step, s.idx,
                                  : int(ns_h[step, s.idx])].tolist():
                    s.last_tokens.append(tok)
                    s.produced += 1
                    self.n_tokens_out += 1
                    emit.append(tok)
                    if req.stop_sequences and any(
                        tuple(s.last_tokens[-len(ss):]) == ss
                        for ss in req.stop_sequences if ss
                    ):
                        finished = True
                        break
                    if s.produced >= req.n_predict:
                        finished = True
                        break
                if finished:
                    break
            if emit:
                req.out.put(emit)
            s.n_past = int(n_hist_h[s.idx]) - 1
            if not finished and done_h[s.idx]:
                finished = True  # device froze the row (EOS / history end)
            if finished:
                req.out.put(None)
                self.n_requests_done += 1
                s.req = None
                s.sampler = None
                freeze.append(s.idx)
        if freeze:
            self._done = self._done.at[jnp.asarray(freeze)].set(True)

    def _flush_inflight(self):
        while self._inflight:
            self._harvest_one()

    def _reap_cancelled(self):
        freeze = []
        for s in self.slots:
            if s.req is not None and s.req.cancelled:
                s.req.out.put(None)
                s.req = None
                s.sampler = None
                freeze.append(s.idx)
        if freeze:
            self._done = self._done.at[jnp.asarray(freeze)].set(True)

    def _run(self):
        try:
            self._run_loop()
        except BaseException as e:  # pragma: no cover - device failures
            self._error = e
            raise
        finally:
            # close slots, pending, AND the not-yet-drained inbox so no
            # consumer blocks forever on a dead tick thread
            self._inflight.clear()
            for s in self.slots:
                if s.req is not None:
                    s.req.out.put(None)
                    s.req = None
            for r in self._pending:
                r.out.put(None)
            self._pending.clear()
            try:
                while True:
                    r = self._inbox.get_nowait()
                    if r is not None:
                        r.out.put(None)
            except queue.Empty:
                pass

    def _run_loop(self):
        while not self._stop.is_set():
            self._drain_inbox(block=(self.n_active == 0 and not self._pending
                                     and not self._inflight))
            if self._stop.is_set():
                break
            if self._pending and any(s.free for s in self.slots):
                # admission scatters rows: retire stale-row ticks first so
                # a freed row can't be re-admitted under an in-flight tick
                self._flush_inflight()
                self._admit()
            self._reap_cancelled()
            if any(s.active for s in self.slots):
                self._issue()
                if len(self._inflight) >= self.pipeline_depth:
                    self._harvest_one()
            elif self._inflight:
                self._flush_inflight()
        self._flush_inflight()
