"""Continuous-batching inference engine — multi-request serving.

The reference's server is strictly single-session (llama_server_context,
server.cpp:40-200): one request at a time, others queue behind an HTTP
lock.  This engine is the TPU-native upgrade called for in SURVEY.md §7.7:
N slots share one batched decode step (one [N, 1] forward per tick,
per-slot n_past vector), new requests are admitted into free slots
mid-flight (slot-wise prefill touching only that row's KV rows), finished
slots free immediately.  Throughput scales with occupancy because decode is
weight-bandwidth-bound: the weights stream once per tick regardless of how
many slots are active.
"""

from __future__ import annotations

import functools
import itertools
import os
import queue
import sys
import threading
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models import transformer
from ..models.config import ModelConfig
from ..models.transformer import TransformerParams, init_cache
from .sampling import Sampler, SamplingParams
from .tokenizer import TOKEN_EOS


@dataclass
class Request:
    prompt_tokens: list[int]
    n_predict: int = 128
    sampling: SamplingParams = field(default_factory=SamplingParams)
    seed: int = -1
    stop_sequences: tuple[tuple[int, ...], ...] = ()
    # filled by the engine:
    id: int = -1
    out: "queue.Queue[int | None]" = field(default_factory=queue.Queue)
    cancelled: bool = False

    def cancel(self) -> None:
        """Ask the engine to stop this request (client disconnect); the
        slot frees at the next tick boundary."""
        self.cancelled = True

    def tokens(self):
        """Iterate generated ids until completion (blocking).

        SINGLE-CONSUMER: the stream ends with one terminal sentinel, so
        call this once per request — a second iteration after the first
        completed blocks forever on the empty queue.  The engine enqueues
        a LIST per tick (one queue wakeup instead of `chunk`: per-token
        puts cost ~6.7 ms each in consumer-thread GIL wakeups at 16
        busy clients — engine-steady trace 2026-08-20)."""
        while True:
            t = self.out.get()
            if t is None:
                return
            if isinstance(t, list):
                yield from t
            else:
                yield t


class _Slot:
    def __init__(self, idx: int):
        self.idx = idx
        self.req: Request | None = None
        self.sampler: Sampler | None = None
        self.last_tokens: list[int] = []
        self.produced = 0
        self.n_past = 0
        self.ready = True  # False while a chunked prefill is in flight
        self.mu_fresh = False  # reset device mirostat mu at next window

    @property
    def free(self) -> bool:
        return self.req is None

    @property
    def active(self) -> bool:
        return self.req is not None and self.ready


def dataclasses_replace_rln(sv, window: int):
    """Clamp per-row repeat_last_n to the recent-buffer length."""
    import dataclasses

    return dataclasses.replace(
        sv, repeat_last_n=jnp.minimum(sv.repeat_last_n, window))


def estimate_engine_hbm(params, cfg, n_slots: int, n_ctx: int,
                        cache_dtype) -> tuple[int, int]:
    """(weight_bytes, kv_bytes) for a single-device engine.  The KV term
    mirrors init_cache's layout (kv_cache_init sizing,
    /root/reference/llama.cpp:733-776): 2 x [slots, ctx, kv_heads, hd] per
    layer, plus the [slots, ctx, kv_heads] f32 scale planes for int8."""
    weights = sum(a.size * a.dtype.itemsize
                  for a in jax.tree_util.tree_leaves(params)
                  if hasattr(a, "dtype"))
    per = n_slots * n_ctx * cfg.kv_heads * cfg.n_layer
    itemsize = jnp.dtype(cache_dtype).itemsize
    kv = 2 * per * cfg.head_dim * itemsize
    if itemsize == 1:
        kv += 2 * per * 4  # QuantKV per-token-head f32 scales
    return weights, kv


# ENGINE_TRACE=1: per-tick issue/harvest timing on stdout (perf diagnosis)
_TRACE = os.environ.get("ENGINE_TRACE") == "1"

# fraction of HBM the engine may plan to (the rest covers activations,
# prefill gather temps — measured ~20x256MB on a 16x2048 bf16 prefill_multi
# compile — and XLA scratch); exceeding it OOM-wedges mid-serving instead
# of failing fast here.  0.85 of a 15.75 GiB v5e = 13.4 GiB: admits the
# 7B q4_0 16x2048 q8-KV flagship config (4.2 + 8.9 GiB), refuses the
# 17.2 GiB bf16 cache that OOM'd it
_HBM_PLAN_FRACTION = 0.85


def _bucket(n: int) -> int:
    from .context import PREFILL_BUCKETS

    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return ((n + 2047) // 2048) * 2048


@functools.lru_cache(maxsize=8)
def _engine_fns(forward_fn):
    """The four engine forwards (decode / slot prefill / batched prefill /
    prefix prefill) over any forward with transformer.forward's contract.
    The defaults are `_engine_fns(transformer.forward)` (module-level jits:
    one compile per cfg/bucket serves every engine instance); custom
    forwards — e.g. parallel.tp.spec_forward(mesh) for explicit shard_map
    tensor parallelism — get their own lru-cached set.

    attention_fn (static, n_past == 0 admissions only — e.g. the TPU
    flash or sp-ring prefill kernel) is forwarded only when set, so
    custom forward_fns that don't take the kwarg stay compatible."""

    def fwd(*args, attention_fn=None, **kw):
        if attention_fn is not None:
            kw["attention_fn"] = attention_fn
        return forward_fn(*args, **kw)

    @functools.partial(jax.jit, static_argnames=("cfg", "kv_window"),
                       donate_argnames=("cache_k", "cache_v"))
    def decode(cfg, params, tokens, n_past_v, cache_k, cache_v, kv_window):
        return fwd(cfg, params, tokens, n_past_v, cache_k, cache_v,
                   last_only=True, kv_window=kv_window)

    @functools.partial(jax.jit,
                       static_argnames=("cfg", "kv_window", "attention_fn"),
                       donate_argnames=("cache_k", "cache_v"))
    def prefill(cfg, params, tokens, slot, n_real, cache_k, cache_v,
                kv_window, n_past=0, attention_fn=None):
        """[1, T_pad] prefill against one slot's KV rows; returns the
        logits of the last *real* token.  n_past > 0 continues after a
        cached prefix already resident in the slot's rows."""
        take_row = lambda c: jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=0)
        row_k = jax.tree.map(take_row, cache_k)
        row_v = jax.tree.map(take_row, cache_v)
        logits, row_k, row_v = fwd(
            cfg, params, tokens, jnp.int32(n_past), row_k, row_v,
            last_only=False, kv_window=kv_window, attention_fn=attention_fn,
        )
        logits = jax.lax.dynamic_slice_in_dim(logits, n_real - 1, 1, axis=1)
        put_row = lambda c, r: jax.lax.dynamic_update_slice_in_dim(
            c, r.astype(c.dtype), slot, 0)
        new_k = jax.tree.map(put_row, cache_k, row_k)
        new_v = jax.tree.map(put_row, cache_v, row_v)
        return logits, new_k, new_v

    @functools.partial(jax.jit,
                       static_argnames=("cfg", "kv_window", "attention_fn"),
                       donate_argnames=("cache_k", "cache_v"))
    def prefill_multi(cfg, params, tokens, slots, n_reals, cache_k, cache_v,
                      kv_window, attention_fn=None):
        """Batched admission: [M, T_pad] prompts prefill M slots in ONE
        forward (the per-slot loop costs a full weight stream each).  Rows
        padded with slot index >= n_slots scatter with mode='drop'.
        Returns per-row last-real-token logits [M, V] + updated caches.

        The gathered row caches are SLICED to kv_window columns: a fresh
        admission only touches slots' first kv_window positions, and the
        full-S gather materialized a second whole cache in HLO temps —
        the 16x2048 bf16 OOM of the r2 hardware run (256 MB select_n
        fusions x n_layer, hw-validate r2 log)."""
        take_rows = lambda c: jax.lax.slice_in_dim(
            jnp.take(c, jnp.clip(slots, 0, c.shape[0] - 1), axis=0),
            0, kv_window, axis=1)
        row_k = jax.tree.map(take_rows, cache_k)
        row_v = jax.tree.map(take_rows, cache_v)
        logits, row_k, row_v = fwd(
            cfg, params, tokens, jnp.int32(0), row_k, row_v,
            last_only=False, kv_window=kv_window, attention_fn=attention_fn,
        )
        logits = jnp.take_along_axis(
            logits, (n_reals - 1)[:, None, None], axis=1)[:, 0]
        put_rows = lambda c, r: c.at[slots, :kv_window].set(
            r.astype(c.dtype), mode="drop")
        new_k = jax.tree.map(put_rows, cache_k, row_k)
        new_v = jax.tree.map(put_rows, cache_v, row_v)
        return logits, new_k, new_v

    @functools.partial(jax.jit,
                       static_argnames=("cfg", "kv_window", "attention_fn"),
                       donate_argnames=("cache_k", "cache_v"))
    def prefix(cfg, params, tokens, cache_k, cache_v, kv_window,
               attention_fn=None):
        """Prefill a standalone [1, S] row cache with a shared prefix."""
        _, cache_k, cache_v = fwd(
            cfg, params, tokens, jnp.int32(0), cache_k, cache_v,
            last_only=True, kv_window=kv_window, attention_fn=attention_fn,
        )
        return None, cache_k, cache_v

    @functools.partial(jax.jit,
                       static_argnames=("cfg", "kv_window", "attention_fn"),
                       donate_argnames=("row_k", "row_v"))
    def lane(cfg, params, tokens, n_reals, row_k, row_v, kv_window,
             n_past=0, attention_fn=None):
        """Batched chunked-prefill lane: one [K, T_pad] chunk advances K
        detached row caches in LOCKSTEP (scalar n_past — the cohort
        shares a chunk count, so only the final pieces' lengths differ
        and causal masking keeps each row's padding out of its own
        attention).  Returns each row's last-real-token logits [K, V]
        (device-side pick: transferring full [K, T, V] logits through
        the tunnel costs ~65 MB per chunk)."""
        logits, row_k, row_v = fwd(
            cfg, params, tokens, jnp.int32(n_past), row_k, row_v,
            last_only=False, kv_window=kv_window, attention_fn=attention_fn,
        )
        logits = jnp.take_along_axis(
            logits, (n_reals - 1)[:, None, None], axis=1)[:, 0]
        return logits, row_k, row_v

    return decode, prefill, prefill_multi, prefix, lane


(_engine_decode, _engine_prefill,
 _engine_prefill_multi, _prefix_prefill, _engine_lane) = \
    _engine_fns(transformer.forward)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_rows(cache_k, cache_v, row_k, row_v, slot):
    """Scatter [1, S] row caches into one slot of the big caches IN PLACE
    (buffer donation).  The previous host-side tree.map of
    dynamic_update_slice ran outside jit, where XLA cannot reuse the input
    buffers — a full second cache materialized (2x 8.86 GiB at the 16x2048
    q8 flagship) and RESOURCE_EXHAUSTED'd the chunked-prefill completion
    (engine-long-q8-fused, 2026-08-20)."""
    put = lambda c, r: jax.lax.dynamic_update_slice_in_dim(
        c, r.astype(c.dtype), slot, 0)
    return (jax.tree.map(put, cache_k, row_k),
            jax.tree.map(put, cache_v, row_v))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_rows_multi(cache_k, cache_v, row_k, row_v, slots):
    """Scatter [K, S] lane row caches into K slots IN PLACE (see
    _scatter_rows; slots are distinct by construction)."""
    put = lambda c, r: c.at[slots].set(r.astype(c.dtype), mode="drop",
                                       unique_indices=True)
    return (jax.tree.map(put, cache_k, row_k),
            jax.tree.map(put, cache_v, row_v))


def _prefill_attn_fn(cfg, t_pad: int, mesh=None):
    """n_past == 0 admission attention: the sp-ring kernel on a
    sequence-parallel mesh (docs/serving.md), else the TPU flash prefill
    kernel when eligible, else the default cache-window einsum."""
    if mesh is not None and mesh.shape.get("sp", 1) > 1 \
            and t_pad % mesh.shape["sp"] == 0:
        from ..parallel.ring_attention import ring_prefill_fn

        return ring_prefill_fn(mesh)
    from ..ops.layers import flash_prefill_fn, use_flash_prefill

    return flash_prefill_fn() if use_flash_prefill(t_pad, cfg.head_dim) \
        else None


class BatchEngine:
    """One engine thread owns the device state; callers submit() Requests
    and read their token queues."""

    def __init__(self, cfg: ModelConfig, params: TransformerParams, *,
                 n_slots: int = 4, n_ctx: int | None = None,
                 cache_dtype="auto", chunk: int = 1,
                 device_sampling=None, pipeline_depth: int = 2,
                 spec_draft: int = 0, spec_max_active: int | None = None,
                 per_request_sampling: bool = False,
                 forward_fn=None, tp_mesh=None, mesh=None,
                 hbm_limit_bytes: int | None = None):
        """chunk > 1 enables throughput mode: `chunk` tokens per engine tick
        are decoded and sampled ON DEVICE (runtime/device_sample.py) with
        one host round-trip per chunk — engine-wide uniform sampling
        (device_sampling: DeviceSampling) replaces per-request sampler
        chains, and finished slots waste at most chunk-1 steps.  Only the
        FIRST token of each request (sampled at admission) uses the
        request's own host sampling params.

        spec_draft > 0 enables SPECULATIVE continuous batching: every tick
        runs `chunk` device-resident draft-verify rounds for all slots at
        once (runtime/device_spec.py spec_chunk), emitting 1..spec_draft+1
        tokens per slot per round.  Same uniform-sampling tradeoff as
        chunked mode; exact for greedy.  Aggregate throughput multiplies
        by the per-slot acceptance rate on repetitive workloads.

        Speculation pays while STREAMING dominates the tick.  At short
        contexts that means weight streaming: high occupancy amortizes
        the weights and the k+1-wide verify just multiplies compute
        (measured crossover ~8 slots at 512 ctx on v5e) — so
        spec_max_active defaults to 8 there.  At long contexts the
        per-slot KV WINDOW dominates, and a verify pass amortizes KV
        reads across k+1 tokens per slot too: at 16x2048 q8 w~1900
        speculation WINS at full occupancy (570 vs 354 tok/s end-to-end,
        0.99 acceptance, 2026-08-20; 606 vs 300 at 8 slots), so the
        default lifts to n_slots when n_ctx >= 1024.  Pass
        spec_max_active explicitly to pin either policy.  When
        n_active > spec_max_active the engine auto-falls back to plain
        chunked ticks, resyncing the device-side history when occupancy
        drops again.

        tp_mesh routes EVERY engine forward (decode, prefill, chunked and
        speculative ticks) through the explicit shard_map tensor-parallel
        path (parallel/tp.py): params are repacked/placed per shard and the
        KV cache is head-sharded over the mesh.  forward_fn alternatively
        injects any forward with transformer.forward's contract.

        mesh (GSPMD): params shard per parallel/shard.py and the KV cache
        shards per cache_spec — on an sp mesh the context axis spreads over
        chips, so serving context length scales with the mesh instead of
        one device's HBM; XLA partitions the decode attention and inserts
        the softmax collectives over ICI."""
        self.mesh = mesh
        if mesh is None and tp_mesh is None:
            from ..ops.qtensor import maybe_cast_scales_f16

            params = maybe_cast_scales_f16(params)
        self.params_prefill = params  # raw view for big-t prefill calls
        if mesh is None and tp_mesh is None:
            # default on TPU since r4 (same split as Context): the folded
            # view serves decode/verify ticks (−2.5..4.8%, ab-decode
            # 2026-08-20) while prefill admissions keep the RAW view — the
            # gbias stream regresses compute-bound prefill +6.8%
            # (decomp-prefill).  Views share levels/scales buffers.
            # QMM_ZERO_FOLD=0 opts out.  Sharded paths keep raw params:
            # no shard rule covers the added gbias planes.
            from ..ops.qtensor import maybe_fold_zero_points

            params = maybe_fold_zero_points(params)
        if mesh is not None:
            from ..parallel.shard import replicate, shard_transformer

            assert tp_mesh is None, "pass mesh (GSPMD) OR tp_mesh (explicit)"
            params = (shard_transformer(params, mesh)
                      if mesh.shape.get("tp", 1) > 1
                      else replicate(params, mesh))
        if tp_mesh is not None:
            from ..parallel.tp import prepare_tp_params, spec_forward

            assert forward_fn is None, "pass tp_mesh OR forward_fn"
            params = prepare_tp_params(params, tp_mesh, cfg)
            forward_fn = spec_forward(tp_mesh)
        self.forward_fn = forward_fn
        self._custom = (_engine_fns(forward_fn)
                        if forward_fn is not None else None)
        self.cfg = cfg
        self.params = params
        if mesh is not None or tp_mesh is not None:
            self.params_prefill = params  # sharded: one (raw) view
        self.n_slots = n_slots
        self.n_ctx = n_ctx or cfg.n_ctx
        self.chunk = chunk
        self.spec_draft = spec_draft
        if spec_max_active is None:  # context-aware default (see above)
            spec_max_active = n_slots if self.n_ctx >= 1024 else 8
        self.spec_max_active = spec_max_active
        # per-row device sampling: each slot honors ITS request's
        # temp/top-k/top-p/tfs/typical/penalties inside device ticks
        # (mirostat/logit-bias still engine-wide via device_sampling)
        self.per_request_sampling = per_request_sampling
        self._mode = None  # "spec" | "chunked" | None (adaptive switch)
        if chunk > 1 or spec_draft > 0:
            from .device_sample import DeviceSampling

            self.device_sampling = device_sampling or DeviceSampling()
            self._key = jax.random.key(0)
        if spec_draft > 0:
            from .speculative import SpecParams

            self.spec = SpecParams(n_draft=spec_draft)
            self._hist = jnp.zeros((n_slots, self.n_ctx), jnp.int32)
            self._n_hist = jnp.zeros((n_slots,), jnp.int32)
            self._done = jnp.ones((n_slots,), bool)  # frozen until admitted
        # fail fast on configurations that cannot fit: a mid-serving OOM
        # kills the tick thread (and, on the tunnel, wedges the device).
        # Mesh-sharded engines skip the check — capacity scales with chips.
        if mesh is None and tp_mesh is None:
            limit = hbm_limit_bytes
            if limit is None:
                try:
                    if jax.default_backend() == "tpu":
                        stats = jax.devices()[0].memory_stats() or {}
                        limit = stats.get("bytes_limit")
                except Exception:  # pragma: no cover - stats unavailable
                    limit = None
            if cache_dtype == "auto":
                # bf16 when it fits the plan budget, scaled-int8 when only
                # that does (e.g. the 7B 16x2048 flagship: 17.2 GiB bf16 KV
                # vs 15.75 GiB v5e HBM, but 4.3 GiB as q8) — an explicit
                # dtype instead gets the hard refusal below
                cache_dtype = jnp.bfloat16
                if limit:
                    weights, kv = estimate_engine_hbm(
                        params, cfg, n_slots, self.n_ctx, jnp.bfloat16)
                    if weights + kv > int(limit * _HBM_PLAN_FRACTION):
                        cache_dtype = jnp.int8
                        print(
                            f"engine: bf16 KV ({kv / 2**30:.2f} GiB for "
                            f"{n_slots} slots x {self.n_ctx} ctx) exceeds "
                            f"the HBM plan budget — auto-selecting the "
                            f"scaled-int8 cache (pass cache_dtype= or "
                            f"--cache-type to override)", file=sys.stderr)
            if limit:
                weights, kv = estimate_engine_hbm(
                    params, cfg, n_slots, self.n_ctx, cache_dtype)
                budget = int(limit * _HBM_PLAN_FRACTION)
                if (weights + kv > int(limit * 0.80)
                        and self.params is not self.params_prefill):
                    # tight fit: drop the zero-folded decode view (its
                    # gbias planes are ~weights/6 extra HBM).  The fold's
                    # ~3% tick win is noise at configs this large — KV
                    # streaming dominates — and the reclaimed space covers
                    # the prefill/XLA temps that RESOURCE_EXHAUSTED'd the
                    # 16x2048 q8 flagship on 2026-08-20.
                    self.params = params = self.params_prefill
                    weights, kv = estimate_engine_hbm(
                        params, cfg, n_slots, self.n_ctx, cache_dtype)
                    print(
                        f"engine: plan within 20% of HBM — serving ticks "
                        f"from the raw (unfolded) weight view "
                        f"({(weights + kv) / 2**30:.2f} GiB planned)",
                        file=sys.stderr)
                if weights + kv > budget:
                    raise ValueError(
                        f"engine config does not fit HBM: weights "
                        f"{weights / 2**30:.2f} GiB + KV cache "
                        f"{kv / 2**30:.2f} GiB ({n_slots} slots x "
                        f"{self.n_ctx} ctx, {jnp.dtype(cache_dtype).name}) "
                        f"> {budget / 2**30:.2f} GiB plan budget "
                        f"({_HBM_PLAN_FRACTION:.0%} of "
                        f"{limit / 2**30:.2f} GiB). Use cache_dtype=jnp.int8 "
                        f"(--cache-type q8), fewer slots, or a smaller "
                        f"n_ctx.")
        if cache_dtype == "auto":
            cache_dtype = jnp.bfloat16  # mesh-sharded: capacity scales
        self.cache_dtype = jnp.dtype(cache_dtype)
        self.cache_k, self.cache_v = init_cache(cfg, n_slots, self.n_ctx,
                                                cache_dtype)
        if tp_mesh is not None or mesh is not None:
            from ..parallel.shard import shard_cache

            self.cache_k, self.cache_v = shard_cache(
                self.cache_k, self.cache_v, cfg, tp_mesh or mesh)
        self.slots = [_Slot(i) for i in range(n_slots)]
        # async pipeline (chunk > 1): ticks issued ahead of their harvest,
        # with the sample->input feedback chained on device
        self.pipeline_depth = max(1, pipeline_depth)
        self._recent = None  # device penalty window, chained across ticks
        self._sv = None  # per-request SamplingVec (per_request_sampling)
        self._mu = None  # device mirostat-v2 state, chained across ticks
        self._prefix = None  # (tokens, row_k, row_v) from register_prefix
        self.prefill_chunk = 512  # chunked-prefill granularity (tokens)
        # chunked-lane COHORT width: up to this many long prompts advance
        # together in one [K, chunk] forward (K * chunk <= MAX_PALLAS_ROWS
        # — preflight-checkable).  Serialized width-1 admissions made the
        # 16x2048 flagship admission span ~64 interleaved ticks, long
        # enough that early slots finished before the last admission
        # (engine-steady trace, 2026-08-20).  Custom (TP) forwards keep
        # width 1 — their prefill path owns slot routing internally.
        self.lane_width = (1 if self._custom
                           else int(os.environ.get("LANE_WIDTH", "4")))
        # each lane row cache transiently costs one slot's KV on top of
        # weights + main KV.  Empirical capacity rule (2026-08-20):
        # int8-KV cohorts are chip-proven at width 4 on the 16x2048
        # flagship (13.7 + 2.4 GiB lane rows of 15.75), but bf16 cohorts
        # OOM'd at width 2 even with ~1.9 GiB of modeled slack (a
        # bf16-specific transient the HBM model does not capture) while
        # width 1 runs cleanly — so multi-row cohorts are int8-only,
        # clamped to the measured-free HBM; wide-dtype caches keep the
        # serialized width-1 lane (LANE_WIDTH env overrides either way).
        if (self.lane_width > 1 and mesh is None and tp_mesh is None
                and not os.environ.get("LANE_WIDTH")):
            on_tpu = False
            try:
                on_tpu = jax.default_backend() == "tpu"
            except Exception:  # pragma: no cover
                pass
            if jnp.dtype(self.cache_dtype).itemsize > 1:
                if on_tpu:  # HBM capacity rule; CPU tests keep cohorts
                    self.lane_width = 1
            else:
                limit = hbm_limit_bytes
                if limit is None:
                    try:
                        if jax.default_backend() == "tpu":
                            limit = (jax.devices()[0].memory_stats()
                                     or {}).get("bytes_limit")
                    except Exception:  # pragma: no cover
                        limit = None
                if limit:
                    w_b, kv_b = estimate_engine_hbm(
                        params, cfg, n_slots, self.n_ctx, self.cache_dtype)
                    row_b = max(1, kv_b // n_slots)
                    free = limit - w_b - kv_b - (512 << 20)
                    self.lane_width = max(1, min(self.lane_width,
                                                 int(free // row_b)))
        self._prefill_state: dict | None = None
        self._inflight: list[dict] = []
        self._sched_n_past = [0] * n_slots
        self._ids = itertools.count()
        # observability counters (engine.stats() / server /stats)
        self.n_ticks = 0
        self.n_tokens_out = 0
        self.n_requests_done = 0
        self.n_spec_rounds = 0
        self.n_spec_accepted = 0
        self.n_spec_drafted = 0
        self._inbox: queue.Queue[Request | None] = queue.Queue()
        self._pending: list[Request] = []
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._error: BaseException | None = None  # tick-thread death cause

    def _jit_decode(self, params, tokens, n_past_v, cache_k, cache_v, *,
                    kv_window):
        fn = self._custom[0] if self._custom else _engine_decode
        return fn(self.cfg, params, tokens, n_past_v,
                  cache_k, cache_v, kv_window=kv_window)

    def _jit_prefill(self, params, tokens, slot, n_real, cache_k, cache_v,
                     *, kv_window, n_past=0, attention_fn=None):
        if self._custom:  # custom forwards own their attention internally
            return self._custom[1](self.cfg, params, tokens, slot, n_real,
                                   cache_k, cache_v, kv_window=kv_window,
                                   n_past=n_past)
        return _engine_prefill(self.cfg, params, tokens, slot, n_real,
                               cache_k, cache_v, kv_window=kv_window,
                               n_past=n_past, attention_fn=attention_fn)

    def _jit_lane(self, params, tokens, n_reals, row_k, row_v, *,
                  kv_window, n_past=0, attention_fn=None):
        return _engine_lane(self.cfg, params, tokens, n_reals, row_k,
                            row_v, kv_window=kv_window, n_past=n_past,
                            attention_fn=attention_fn)

    def _admit_attn_fn(self, pad: int):
        """attention_fn for n_past == 0 admissions on the DEFAULT forward
        (custom forward_fns own their attention internally)."""
        if self._custom:
            return None
        return _prefill_attn_fn(self.cfg, pad, self.mesh)

    # -------------------------------------------------------------- public

    def register_prefix(self, tokens: list[int]) -> None:
        """Prefill a shared prompt prefix ONCE (e.g. a system prompt);
        later requests starting with it copy the cached KV rows instead of
        re-running the prefill forward (vLLM-style prefix caching — the
        serving analogue of main's --prompt-cache, main.cpp:157-230).
        Costs one extra [1, S] row cache of device memory."""
        tokens = list(tokens)
        assert 0 < len(tokens) < self.n_ctx - 2
        from ..ops.kvcache import QuantKV

        cdt = (jnp.int8 if isinstance(self.cache_k[0], QuantKV)
               else self.cache_k[0].dtype)
        row_k, row_v = init_cache(self.cfg, 1, self.n_ctx, cdt)
        pad = min(_bucket(len(tokens)), self.n_ctx)
        toks = np.zeros((1, pad), np.int32)
        toks[0, : len(tokens)] = tokens
        fn = self._custom[3] if self._custom else _prefix_prefill
        _, row_k, row_v = fn(
            self.cfg, self.params_prefill, jnp.asarray(toks), row_k, row_v,
            kv_window=pad, attention_fn=self._admit_attn_fn(pad))
        self._prefix = (tokens, row_k, row_v)

    def submit(self, req: Request) -> Request:
        if self._error is not None:
            raise RuntimeError(
                "engine thread died; restart the engine") from self._error
        req.id = next(self._ids)
        self._inbox.put(req)
        if self._error is not None and self._thread is not None \
                and not self._thread.is_alive():
            # raced a dying thread past its inbox drain: close it ourselves
            req.out.put(None)
        return req

    def start(self):
        assert self._thread is None
        self._error = None
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._inbox.put(None)
        if self._thread:
            self._thread.join()
            self._thread = None

    def stats(self) -> dict:
        """Aggregate serving counters (tokens emitted, ticks, speculative
        acceptance, occupancy) — the observability surface the reference's
        stderr logs never had."""
        return {
            "n_active": self.n_active,
            "n_pending": len(self._pending),
            "cache_dtype": self.cache_dtype.name,
            "n_ticks": self.n_ticks,
            "n_tokens_out": self.n_tokens_out,
            "n_requests_done": self.n_requests_done,
            "mode": self._mode or ("chunked" if self.chunk > 1 else "host"),
            "spec_rounds": self.n_spec_rounds,
            "spec_drafted": self.n_spec_drafted,
            "spec_accepted": self.n_spec_accepted,
            "spec_acceptance": (self.n_spec_accepted
                                / max(1, self.n_spec_drafted)),
        }

    @property
    def n_active(self) -> int:
        return sum(not s.free for s in self.slots)

    # -------------------------------------------------------------- engine

    def _drain_inbox(self, block: bool):
        try:
            while True:
                r = (self._inbox.get(timeout=0.2) if block
                     else self._inbox.get_nowait())
                if r is None:
                    return
                self._pending.append(r)
                block = False
        except queue.Empty:
            pass

    def _admit(self):
        free = [s for s in self.slots if s.free]
        batch = []
        while self._pending and len(batch) < len(free):
            # while the chunked lane is busy a long prompt can only
            # defer — leave it (and everything behind it: FIFO) in
            # _pending instead of pop/bind/unbind churn every tick
            # (ADVICE r4 #5)
            if (self._prefill_state is not None and self._prefix is None
                    and len(self._pending[0].prompt_tokens[:self.n_ctx - 1]
                            or [1]) > self.prefill_chunk):
                break
            batch.append((free[len(batch)], self._pending.pop(0)))
        if not batch:
            return
        # bind each request to its slot BEFORE any admission forward: a
        # compile failure inside the admission call unwinds past this frame
        # and the _run finally can only close requests it can see — batch
        # entries were in neither _pending nor a slot, so their clients
        # blocked forever (the 45-min engine-bench hang, 2026-08-20)
        for slot, req in batch:
            slot.req = req
        if self._prefix is not None:
            plen = len(self._prefix[0])
            rest = []
            for slot, req in batch:
                p = req.prompt_tokens
                if len(p) > plen and p[:plen] == self._prefix[0]:
                    self._admit_one(slot, req)  # cached-prefix fast path
                else:
                    rest.append((slot, req))
            batch = rest
        if not batch:
            return
        # Admission routing (the boundary, pinned by
        # test_long_prompt_admissions_serialize_through_chunked_lane and
        # test_short_burst_admits_batched):
        #   LONG prompts (> prefill_chunk, no cached prefix) ALWAYS take the
        #   per-slot path — chunked lane when free, DEFERRED when busy.  The
        #   direct [1, ~n_ctx] prefill's XLA temps on top of weights+KV
        #   OOM'd HBM at the 16x2048 q8 flagship (2026-08-20), and a batched
        #   admission of the same burst both flattens past the kernel's row
        #   budget (b=32768 ground a 45-min remote compile) and carries the
        #   same untested temp footprint.  The chunked lane's [1, chunk]
        #   steps are the only long-prompt shape with a bounded HBM plan.
        #   SHORT prompts (<= prefill_chunk) batch into one [M_pad, T_pad]
        #   forward when the flattened matrix fits MAX_PALLAS_ROWS; above
        #   the cap they fall back per-slot (direct prefill — short prompts
        #   have small temps).
        from ..ops.qmatmul import MAX_PALLAS_ROWS

        short = [(s, r) for s, r in batch
                 if len(r.prompt_tokens[: self.n_ctx - 1] or [1])
                 <= self.prefill_chunk or self._prefix is not None]
        rest = batch
        if len(short) > 1:
            pad = min(max(_bucket(len(req.prompt_tokens[:self.n_ctx - 1])
                                  or 1) for _, req in short), self.n_ctx)
            mp = 1
            while mp < len(short):
                mp *= 2
            if mp * pad <= MAX_PALLAS_ROWS:
                self._admit_batched(short)
                short_ids = {id(r) for _, r in short}
                rest = [(s, r) for s, r in batch if id(r) not in short_ids]
        deferred = []
        lane: list = []  # chunked-lane cohort (same chunk count, FIFO)
        lane_chunks = 0
        for slot, req in rest:
            prompt = req.prompt_tokens[: self.n_ctx - 1] or [1]
            if len(prompt) > self.prefill_chunk and self._prefix is None:
                if self._prefill_state is None and (
                        not lane
                        or (-(-len(prompt) // self.prefill_chunk)
                            == lane_chunks
                            and len(lane) < self.lane_width)):
                    lane.append((slot, req, prompt))
                    lane_chunks = -(-len(prompt) // self.prefill_chunk)
                    continue
                slot.req = None  # lane busy / cohort mismatch: re-queue
                deferred.append(req)
                continue
            if not self._admit_one(slot, req):
                deferred.append(req)
        if lane:
            self._start_prefill(lane)
        self._pending[0:0] = deferred  # FIFO order preserved

    def _start_prefill(self, entries):
        """Begin a CHUNKED prefill cohort — 1..lane_width long prompts
        sharing a chunk count — into a detached [K, S] row cache so
        decode ticks for other slots keep flowing (vLLM-style chunked
        prefill); the rows scatter into their slots atomically at
        completion.  entries: [(slot, req, prompt), ...].  Width-1
        serialized admissions made the 16x2048 flagship admission span
        ~64 interleaved ticks (engine-steady trace, 2026-08-20)."""
        from ..ops.kvcache import QuantKV

        cdt = (jnp.int8 if isinstance(self.cache_k[0], QuantKV)
               else self.cache_k[0].dtype)
        row_k, row_v = init_cache(self.cfg, len(entries), self.n_ctx, cdt)
        for slot, req, _ in entries:
            slot.req = req
            slot.ready = False
        self._prefill_state = {"entries": list(entries), "pos": 0,
                               "row_k": row_k, "row_v": row_v}

    def _continue_prefill(self):
        """Advance the in-flight chunked-prefill cohort by one LOCKSTEP
        [K, pad] chunk (scalar n_past; same chunk count per cohort, so
        only final-piece lengths differ and each row's causal mask keeps
        its padding out of its own attention)."""
        st = self._prefill_state
        entries = st["entries"]
        if all(req.cancelled for _, req, _ in entries):
            for slot, req, _ in entries:
                req.out.put(None)
                slot.req = None
                slot.ready = True
            self._prefill_state = None
            return
        pos = st["pos"]
        k = len(entries)
        pieces = [p[pos: pos + self.prefill_chunk] for _, _, p in entries]
        pad = min(_bucket(max(len(pc) for pc in pieces)), self.n_ctx - pos)
        toks = np.zeros((k, pad), np.int32)
        n_reals = np.ones((k,), np.int32)
        for i, pc in enumerate(pieces):
            toks[i, : len(pc)] = pc
            n_reals[i] = len(pc)
        attn = self._admit_attn_fn(pad) if pos == 0 else None
        if self._custom:
            # custom (TP) forwards keep the chunk-count-proven single-row
            # path (lane_width == 1): their prefill wrapper owns row
            # gather/scatter and attention internally
            logits, st["row_k"], st["row_v"] = self._jit_prefill(
                self.params_prefill, jnp.asarray(toks), jnp.int32(0),
                jnp.int32(int(n_reals[0])), st["row_k"], st["row_v"],
                kv_window=min(_bucket(pos + pad), self.n_ctx),
                n_past=jnp.int32(pos),
            )
        else:
            logits, st["row_k"], st["row_v"] = self._jit_lane(
                self.params_prefill, jnp.asarray(toks),
                jnp.asarray(n_reals), st["row_k"], st["row_v"],
                kv_window=min(_bucket(pos + pad), self.n_ctx),
                n_past=jnp.int32(pos),
                attention_fn=attn,
            )
        st["pos"] = pos + self.prefill_chunk
        if st["pos"] >= max(len(p) for _, _, p in entries):
            # hard-sync BEFORE unbinding the slots: a device OOM surfaces
            # at this transfer, and with slot.req already None the request
            # was bound nowhere — _run's finally could not close it and
            # the client blocked until the bench timeout (engine-long-q8-
            # fused, 2026-08-20)
            rows_logits = np.asarray(logits).reshape(k, -1)  # [K, V]
            self._flush_inflight()  # scatter + activation change tick state
            self.cache_k, self.cache_v = _scatter_rows_multi(
                self.cache_k, self.cache_v, st["row_k"], st["row_v"],
                jnp.asarray([s.idx for s, _, _ in entries], jnp.int32))
            self._prefill_state = None
            for i, (slot, req, prompt) in enumerate(entries):
                slot.req = None  # _activate re-sets it
                slot.ready = True
                if req.cancelled:
                    req.out.put(None)
                    continue
                self._activate(slot, req, prompt, rows_logits[i])
                self._sched_n_past[slot.idx] = slot.n_past

    def _admit_one(self, slot, req) -> bool:
        """Admit one request; returns False if it was DEFERRED because the
        chunked-prefill lane is busy (caller re-queues it in order)."""
        prompt = req.prompt_tokens[: self.n_ctx - 1] or [1]
        if len(prompt) > self.prefill_chunk and self._prefix is None:
            if self._prefill_state is None:
                self._start_prefill([(slot, req, prompt)])
                return True
            # chunked lane busy: DEFER instead of falling through to a
            # direct [1, ~n_ctx] prefill — at the 16x2048 q8 flagship the
            # direct prefill's XLA temps on top of weights+KV OOM'd HBM
            # (engine-long-q8 RESOURCE_EXHAUSTED, 2026-08-20).  The loop
            # retries once the lane frees; ticks keep flowing meanwhile
            # (that is chunked prefill's whole point).
            slot.req = None
            return False
        pre = self._prefix
        if (pre is not None and len(prompt) > len(pre[0])
                and prompt[: len(pre[0])] == pre[0]):
            # copy the cached prefix rows, then prefill only the remainder
            # (in-place scatter: see _scatter_rows; prefix rows are NOT
            # donated — they serve every later matching request)
            ptoks, row_k, row_v = pre
            self.cache_k, self.cache_v = _scatter_rows(
                self.cache_k, self.cache_v, row_k, row_v,
                jnp.int32(slot.idx))
            rem = prompt[len(ptoks):]
            pad = min(_bucket(len(rem)), self.n_ctx - len(ptoks))
            toks = np.zeros((1, pad), np.int32)
            toks[0, : len(rem)] = rem
            logits, self.cache_k, self.cache_v = self._jit_prefill(
                self.params_prefill, jnp.asarray(toks), jnp.int32(slot.idx),
                jnp.int32(len(rem)), self.cache_k, self.cache_v,
                kv_window=min(_bucket(len(ptoks) + pad), self.n_ctx),
                n_past=jnp.int32(len(ptoks)),
            )
        else:
            pad = min(_bucket(len(prompt)), self.n_ctx)
            toks = np.zeros((1, pad), np.int32)
            toks[0, : len(prompt)] = prompt
            logits, self.cache_k, self.cache_v = self._jit_prefill(
                self.params_prefill, jnp.asarray(toks), jnp.int32(slot.idx),
                jnp.int32(len(prompt)), self.cache_k, self.cache_v,
                kv_window=pad,
                attention_fn=self._admit_attn_fn(pad),
            )
        self._activate(slot, req, prompt, np.asarray(logits)[0, -1])
        return True

    def _admit_batched(self, batch):
        """All waiting requests prefill in one [M_pad, T_pad] forward; M is
        bucketed to powers of two with dropped dummy rows so a handful of
        compiles serve any burst."""
        prompts = [req.prompt_tokens[: self.n_ctx - 1] or [1]
                   for _, req in batch]
        pad = min(max(_bucket(len(p)) for p in prompts), self.n_ctx)
        m = len(batch)
        mp = 1
        while mp < m:
            mp *= 2
        toks = np.zeros((mp, pad), np.int32)
        slots = np.full((mp,), self.n_slots, np.int32)  # default: dropped
        n_reals = np.ones((mp,), np.int32)
        for i, ((slot, _), p) in enumerate(zip(batch, prompts)):
            toks[i, : len(p)] = p
            slots[i] = slot.idx
            n_reals[i] = len(p)
        fn = self._custom[2] if self._custom else _engine_prefill_multi
        logits, self.cache_k, self.cache_v = fn(
            self.cfg, self.params_prefill, jnp.asarray(toks),
            jnp.asarray(slots),
            jnp.asarray(n_reals), self.cache_k, self.cache_v,
            kv_window=pad, attention_fn=self._admit_attn_fn(pad),
        )
        logits = np.asarray(logits)
        for i, ((slot, req), p) in enumerate(zip(batch, prompts)):
            self._activate(slot, req, p, logits[i])

    def _activate(self, slot, req, prompt, row_logits):
        slot.req = req
        slot.sampler = Sampler(req.sampling, self.cfg.n_vocab, req.seed)
        slot.last_tokens = list(prompt)
        slot.produced = 0
        slot.n_past = len(prompt)
        slot.mu_fresh = True  # per-request mirostat starts at mu = 2*tau
        self._emit(slot, row_logits)
        if self.spec_draft > 0 and slot.req is not None:
            # seed the device-side history row for draft lookups
            row = np.zeros((self.n_ctx,), np.int32)
            row[: len(slot.last_tokens)] = slot.last_tokens
            self._hist = self._hist.at[slot.idx].set(jnp.asarray(row))
            self._n_hist = self._n_hist.at[slot.idx].set(
                len(slot.last_tokens))
            self._done = self._done.at[slot.idx].set(False)

    def _reap_cancelled(self) -> None:
        for s in self.slots:
            if s.req is not None and s.req.cancelled:
                s.req.out.put(None)
                s.req = None
                s.sampler = None
                if self.spec_draft > 0:
                    self._done = self._done.at[s.idx].set(True)

    def _emit(self, slot: _Slot, row_logits: np.ndarray):
        """Sample one token for the slot; handle finish conditions."""
        req = slot.req
        if req.cancelled:
            req.out.put(None)
            slot.req = None
            slot.sampler = None
            return
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
        if (slot.produced >= req.n_predict
                or slot.n_past + 1 >= self.n_ctx):
            done = True
        if done:
            req.out.put(None)
            self.n_requests_done += 1
            slot.req = None
            slot.sampler = None

    def _issue_chunked(self):
        """Issue one chunked decode tick WITHOUT waiting for its output.

        The first tick of a window feeds host-known last tokens; subsequent
        ticks feed the previous tick's device-resident last column — the
        sample-to-input feedback never leaves the device, so the D2H
        transfer of tick t overlaps the execution of tick t+1 (the tunnel
        round-trip, ~3-4x the 7B forward, otherwise serializes every
        tick)."""
        from .device_sample import decode_chunk

        if self._inflight:
            tok_dev = self._inflight[-1]["out"][:, -1]
        else:
            toks = np.zeros((self.n_slots,), np.int32)
            for s in self.slots:
                if s.active:
                    toks[s.idx] = s.last_tokens[-1]
            tok_dev = jnp.asarray(toks)
            # host state is authoritative at pipeline start: rebuild the
            # penalty window (chained on device between ticks otherwise)
            from .device_sample import VEC_WINDOW, make_recent

            if self.per_request_sampling:
                self._sv = self._make_sv()
                self._recent = make_recent(
                    [s.last_tokens if s.active else []
                     for s in self.slots], VEC_WINDOW, self.cfg.n_vocab)
                if self._sv.mirostat is not None:
                    # per-row mu: persists on device across windows, reset
                    # to 2*tau for slots admitted since the last window
                    mu_h = (np.array(self._mu)  # writable host copy
                            if self._mu is not None else np.full(
                                (self.n_slots,), 10.0, np.float32))
                    for s in self.slots:
                        if s.mu_fresh:
                            # the admission-time host sample already moved
                            # mu off 2*tau — continue from the host chain
                            mu_h[s.idx] = (s.sampler.mirostat_mu
                                           if s.sampler is not None else 10.0)
                            s.mu_fresh = False
                    self._mu = jnp.asarray(mu_h, jnp.float32)
            else:
                self._recent = (
                    make_recent([s.last_tokens if s.active else []
                                 for s in self.slots],
                                self.device_sampling.repeat_last_n,
                                self.cfg.n_vocab)
                    if self.device_sampling.penalized
                    else jnp.zeros((self.n_slots, 1), jnp.int32))
            if self._mu is None:
                self._mu = jnp.full(
                    (self.n_slots,),
                    2.0 * self.device_sampling.mirostat_tau, jnp.float32)
        n_past = np.array(self._sched_n_past, np.int32)
        window = min(_bucket(int(n_past.max()) + self.chunk + 1), self.n_ctx)
        out, self.cache_k, self.cache_v, self._key, self._recent, \
            self._mu = decode_chunk(
                self.cfg, self.params, tok_dev, jnp.asarray(n_past),
                self.cache_k, self.cache_v, self._key,
                n_steps=self.chunk, ds=self.device_sampling,
                kv_window=window, recent=self._recent, mu=self._mu,
                sv=self._sv if self.per_request_sampling else None,
                forward_fn=self.forward_fn,
            )
        snap = [(s.idx, s.req) for s in self.slots if s.active]
        self.n_ticks += 1
        self._inflight.append({"out": out, "snap": snap})
        for i, _ in snap:
            self._sched_n_past[i] += self.chunk
        if _TRACE:
            import time as _t

            print(f"ENGINE_TRACE issue tick={self.n_ticks} "
                  f"window={window} active={len(snap)} "
                  f"t={_t.perf_counter():.3f}", flush=True)

    def _harvest_one(self):
        """Block on the oldest in-flight tick and emit its tokens.  Slots
        that finished at an earlier harvest are skipped (their later ticks
        decoded throwaway tokens — the price of the pipeline)."""
        t = self._inflight.pop(0)
        if t.get("kind") == "spec":
            self._harvest_spec(t)
            return
        if _TRACE:
            import time as _t

            _h0 = _t.perf_counter()
        out = np.asarray(t["out"])  # [N, chunk] — the only sync point
        if _TRACE:
            print(f"ENGINE_TRACE harvest sync={_t.perf_counter() - _h0:.3f}s "
                  f"t={_t.perf_counter():.3f}", flush=True)
        for idx, req in t["snap"]:
            s = self.slots[idx]
            if s.req is not req or req is None:
                continue
            done = False
            emit = []  # ONE queue put per (request, tick): see tokens()
            for j in range(self.chunk):
                tok = int(out[idx, j])
                s.n_past += 1
                if tok == TOKEN_EOS:
                    done = True
                    break
                s.last_tokens.append(tok)
                s.produced += 1
                self.n_tokens_out += 1
                emit.append(tok)
                if req.stop_sequences and any(
                    tuple(s.last_tokens[-len(ss):]) == ss
                    for ss in req.stop_sequences if ss
                ):
                    done = True
                    break
                if (s.produced >= req.n_predict
                        or s.n_past + self.chunk + 1 >= self.n_ctx):
                    done = True
                    break
            if emit:
                req.out.put(emit)
            if done:
                req.out.put(None)
                self.n_requests_done += 1
                s.req = None
                s.sampler = None

    def _flush_inflight(self):
        while self._inflight:
            self._harvest_one()
        for s in self.slots:
            self._sched_n_past[s.idx] = s.n_past

    def _resync_spec_state(self):
        """Rebuild the device-side history from host slot state after a
        stretch of plain chunked ticks (which do not maintain it)."""
        hist = np.zeros((self.n_slots, self.n_ctx), np.int32)
        n_hist = np.zeros((self.n_slots,), np.int32)
        done = np.ones((self.n_slots,), bool)
        for s in self.slots:
            if not s.active:
                continue
            lt = s.last_tokens
            assert len(lt) == s.n_past + 1 <= self.n_ctx, (len(lt), s.n_past)
            hist[s.idx, : len(lt)] = lt
            n_hist[s.idx] = len(lt)
            done[s.idx] = False
        self._hist = jnp.asarray(hist)
        self._n_hist = jnp.asarray(n_hist)
        self._done = jnp.asarray(done)

    def _make_sv(self):
        from .device_sample import VEC_WINDOW, make_sampling_vec

        sv = make_sampling_vec(
            [s.req.sampling if s.active else None for s in self.slots],
            seeds=[s.req.seed if s.active else -1 for s in self.slots])
        return dataclasses_replace_rln(sv, VEC_WINDOW)

    def _mirostat_active(self) -> bool:
        """Any active slot sampling with mirostat (per-request mode)."""
        return self.per_request_sampling and any(
            s.active and s.req.sampling is not None
            and s.req.sampling.mirostat for s in self.slots)

    def _issue_spec(self):
        """Issue one speculative tick without waiting: the whole state
        (history, caches, done) is device-resident, so consecutive ticks
        chain with no host involvement and the D2H of tick t overlaps
        tick t+1's execution.  Host-side finish conditions lag one tick
        (their slots' extra tokens are discarded at harvest)."""
        from .device_spec import spec_chunk

        k = self.spec_draft
        start = max(len(s.last_tokens) for s in self.slots if s.active)
        # in-flight ticks may each have advanced the frontier by up to
        # chunk*(k+1): widen the window bound accordingly
        start += len(self._inflight) * self.chunk * (k + 1)
        window = min(_bucket(start - 1 + self.chunk * (k + 1) + 1),
                     self.n_ctx)
        sv = self._make_sv() if self.per_request_sampling else None
        (self._hist, self._n_hist, self.cache_k, self.cache_v, self._key,
         self._done, _eosed, emit_toks, emit_ns) = spec_chunk(
            self.cfg, self.params, self._hist, self._n_hist,
            self.cache_k, self.cache_v, self._key, self._done, sv,
            k=k, n_steps=self.chunk, ds=self.device_sampling,
            kv_window=window, max_ngram=self.spec.max_ngram,
            min_ngram=self.spec.min_ngram, eos=TOKEN_EOS, ignore_eos=False,
            forward_fn=self.forward_fn,
        )
        self.n_ticks += 1
        self._inflight.append({
            "kind": "spec",
            "emit_toks": emit_toks, "emit_ns": emit_ns,
            "n_hist": self._n_hist, "done": self._done,
            "snap": [(s.idx, s.req) for s in self.slots if s.active],
        })

    def _harvest_spec(self, t):
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
            emit = []  # ONE queue put per (request, tick): see tokens()
            for step in range(ns_h.shape[0]):
                self.n_spec_rounds += 1
                self.n_spec_drafted += self.spec_draft
                self.n_spec_accepted += max(
                    0, int(ns_h[step, s.idx]) - 1)
                for tok in toks_h[step, s.idx, : int(ns_h[step, s.idx])].tolist():
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
                finished = True  # device froze the row (EOS / context end)
            if finished:
                req.out.put(None)
                self.n_requests_done += 1
                s.req = None
                s.sampler = None
                freeze.append(s.idx)
        if freeze:
            self._done = self._done.at[jnp.asarray(freeze)].set(True)

    def _tick(self):
        """One batched decode step over all active slots."""
        self.n_ticks += 1
        toks = np.zeros((self.n_slots, 1), np.int32)
        n_past = np.zeros(self.n_slots, np.int32)
        for s in self.slots:
            if s.active:
                toks[s.idx, 0] = s.last_tokens[-1]
                n_past[s.idx] = s.n_past
        window = min(_bucket(int(n_past.max()) + 1), self.n_ctx)
        logits, self.cache_k, self.cache_v = self._jit_decode(
            self.params, jnp.asarray(toks), jnp.asarray(n_past),
            self.cache_k, self.cache_v, kv_window=window,
        )
        logits = np.asarray(logits)
        for s in self.slots:
            if not s.active:
                continue
            s.n_past += 1
            self._emit(s, logits[s.idx, -1])

    def _run(self):
        try:
            self._run_loop()
        except BaseException as e:  # pragma: no cover - device failures
            self._error = e
            raise
        finally:
            # never leave clients blocked on their queues — close every
            # open request even if the engine thread died on an exception:
            # slots, pending, AND the not-yet-drained inbox (a compile OOM
            # during warmup admission dies before ever draining it)
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
                # admission prefill mutates caches: drain the pipeline first
                self._flush_inflight()
                self._admit()
                self._flush_inflight()  # resync _sched after admission
            self._reap_cancelled()
            if self._prefill_state is not None:
                # one chunk per loop iteration; ticks interleave below
                # (the chunk builds a DETACHED row cache — no flush needed
                # until the final scatter)
                self._continue_prefill()
            if any(s.active for s in self.slots):
                # mirostat is stateful-per-token: acceptance-based verify
                # has no well-defined mu stream, so mirostat batches ride
                # chunked ticks (still fully on device)
                use_spec = (self.spec_draft > 0
                            and self.n_active <= self.spec_max_active
                            and not self._mirostat_active())
                if use_spec:
                    if self._mode != "spec":
                        self._flush_inflight()
                        self._resync_spec_state()
                        self._mode = "spec"
                    self._issue_spec()
                    if len(self._inflight) >= self.pipeline_depth:
                        self._harvest_one()
                elif self.chunk > 1 or self.spec_draft > 0:
                    if self._mode != "chunked":
                        for s in self.slots:
                            self._sched_n_past[s.idx] = s.n_past
                        self._mode = "chunked"
                    # two-in-flight: issue ahead, harvest one tick behind
                    self._issue_chunked()
                    if len(self._inflight) >= self.pipeline_depth:
                        self._harvest_one()
                else:
                    self._tick()
            elif self._inflight:
                self._flush_inflight()
        self._flush_inflight()
        for s in self.slots:  # fail any open requests on shutdown
            if s.req is not None:
                s.req.out.put(None)
                s.req = None
        for r in self._pending:
            r.out.put(None)
        self._pending.clear()
