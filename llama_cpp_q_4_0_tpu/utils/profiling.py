"""Tracing/profiling — the GGML_PERF + graph-dump story (SURVEY.md §5).

The reference accumulates per-node perf counters in the executor
(ggml_graph_compute_perf_stats_node, ggml.c:17066) and prints them with
ggml_graph_print (ggml.c:18120) / renders graphviz (ggml_graph_dump_dot,
ggml.c:18212).  XLA-native equivalents:

  - dump_graph: the staged jaxpr (op-level graph) and the compiled HLO's
    cost analysis (FLOPs / bytes accessed / peak memory) for a decode step
  - trace: context manager around jax.profiler for a device trace viewable
    in TensorBoard/XProf (per-kernel timeline = per-node perf counters)
  - op_histogram: jaxpr primitive counts, the quick ggml_graph_print view
"""

from __future__ import annotations

import contextlib
from collections import Counter

import jax
import jax.numpy as jnp


def _decode_closure(ctx, n_tokens: int = 1):
    from ..models import transformer

    cfg = ctx.cfg
    tokens = jnp.zeros((ctx.batch, n_tokens), jnp.int32)

    def step(params, tokens, n_past, cache_k, cache_v):
        return transformer.forward(cfg, params, tokens, n_past,
                                   cache_k, cache_v, last_only=True)

    args = (ctx.params, tokens, jnp.int32(0), ctx.cache_k, ctx.cache_v)
    return step, args


def dump_graph(ctx, n_tokens: int = 1, *, compiled_stats: bool = True) -> str:
    """Text dump of the decode step: jaxpr + op histogram + HLO cost
    analysis (ggml_graph_print analogue)."""
    step, args = _decode_closure(ctx, n_tokens)
    jaxpr = jax.make_jaxpr(step)(*args)
    hist = op_histogram_from_jaxpr(jaxpr)
    lines = [f"=== decode step graph (n_tokens={n_tokens}) ==="]
    lines.append(f"{sum(hist.values())} equations, {len(hist)} distinct primitives:")
    for op, cnt in hist.most_common():
        lines.append(f"  {op:32s} x {cnt}")
    if compiled_stats:
        try:
            compiled = jax.jit(step).lower(*args).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0] if cost else {}
            if cost:
                lines.append("HLO cost analysis:")
                for key in ("flops", "bytes accessed", "utilization operand 0 {}"):
                    if key in cost:
                        lines.append(f"  {key}: {cost[key]:.3e}")
                mem = compiled.memory_analysis()
                if mem is not None:
                    for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                                 "output_size_in_bytes"):
                        v = getattr(mem, attr, None)
                        if v is not None:
                            lines.append(f"  {attr}: {v}")
        except Exception as e:  # pragma: no cover - backend specific
            lines.append(f"(cost analysis unavailable: {e})")
    return "\n".join(lines)


def op_histogram_from_jaxpr(jaxpr) -> Counter:
    hist: Counter = Counter()

    def walk(jx):
        for eqn in jx.eqns:
            hist[eqn.primitive.name] += 1
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
    walk(jaxpr.jaxpr)
    return hist


def op_histogram(ctx, n_tokens: int = 1) -> Counter:
    step, args = _decode_closure(ctx, n_tokens)
    return op_histogram_from_jaxpr(jax.make_jaxpr(step)(*args))


def dump_hlo(ctx, n_tokens: int = 1, optimized: bool = False) -> str:
    """StableHLO / optimized-HLO text (ggml_graph_dump_dot analogue — feed
    to external visualizers)."""
    step, args = _decode_closure(ctx, n_tokens)
    lowered = jax.jit(step).lower(*args)
    if optimized:
        return lowered.compile().as_text()
    return lowered.as_text()


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler (the GGML_PERF per-node timeline);
    view with TensorBoard's profile plugin / XProf.  NOTE: hangs on the
    axon-tunnel TPU platform (NOTES r1 #12) — works on CPU/standard TPU
    (gated by test_aux.py::test_profiler_trace_cpu)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jit(fn, args, *, iters: int = 20, warmup: int = 1) -> float:
    """Wall-clock ms per call with a HARD device sync (np.asarray of one
    output leaf).  On the axon platform block_until_ready returns early —
    only a device->host transfer is a real sync — so every timing in
    bench/scripts must use this pattern (the GGML_PERF node-timer
    analogue at whole-jit granularity).  fn must not donate its args
    (it is called repeatedly with the same ones)."""
    import time

    import numpy as np

    def sync(out):
        leaves = jax.tree_util.tree_leaves(out)
        np.asarray(leaves[0])

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3
