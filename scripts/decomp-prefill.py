"""Prefill-512 cost decomposition, single process, interleaved medians.

VERDICT r3 #7: prefill-512 is ~60 ms ≈ 59% MFU; the MXU floor for the 7B
qmm work at T=512 is ~35 ms (6.9 TFLOP / 197 TFLOP/s), so ~25 ms is
somewhere else.  Decomposes at the model level (profiler unusable through
the tunnel):

  1. full prefill t=512 (flash on)        — the number being explained
  2. qmm-only weight sweep t=512          — all QTensors hit once with a
                                            [512, K] activation: the qmm
                                            compute+stream cost alone
  3. flash-attention-only stack t=512     — 32 layers of the flash kernel
  4. full prefill, unfolded control       — QMM_ZERO_FOLD=0 (the r3 gate
                                            docstring recorded a fold
                                            prefill REGRESSION 57.9→62.1;
                                            settle it with medians)
  5. full prefill + QMM_FMA               — in-kernel fold (no gbias
                                            stream: the fold regression,
                                            if real, should vanish)

Env knobs: REPS (5), STEPS (4 dispatches per timed sample, one hard sync).
"""
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llama_cpp_q_4_0_tpu.utils.compile_cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

import bench
from llama_cpp_q_4_0_tpu.models import transformer
from llama_cpp_q_4_0_tpu.ops import layers
from llama_cpp_q_4_0_tpu.ops.qmatmul import q_matmul
from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor, fold_zero_points

REPS = int(os.environ.get("REPS", "5"))
STEPS = int(os.environ.get("STEPS", "4"))
T = 512


def make_prefill(cfg, params):
    attn_fn = (layers.flash_prefill_fn()
               if layers.use_flash_prefill(T, cfg.head_dim) else None)

    @functools.partial(jax.jit, donate_argnames=("ck", "cv"))
    def prefill(p, toks, ck, cv):
        return transformer.forward(cfg, p, toks, jnp.int32(0), ck, cv,
                                   last_only=True, kv_window=T,
                                   attention_fn=attn_fn)

    toks = jnp.zeros((1, T), jnp.int32) + 5
    state = {"c": transformer.init_cache(cfg, 1, T)}

    def run():
        ck, cv = state["c"]
        logits, k, v = prefill(params, toks, ck, cv)
        state["c"] = (k, v)
        return logits

    return run


def make_qmm_sweep(params):
    ws = tuple(w for w in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, QTensor))
        if isinstance(w, QTensor) and w is not params.tok_embeddings)

    @jax.jit
    def sweep(ws, xs):
        acc = jnp.zeros((T,), jnp.float32)
        for w in ws:
            y = q_matmul(xs[w.shape[1]] + acc[:, None] * 0.0, w)
            acc = acc + y[:, :1].sum(axis=1)
        return acc

    xs = {k: jnp.ones((T, k), jnp.float32) * 0.01
          for k in {w.shape[1] for w in ws}}
    return lambda: sweep(ws, xs)


def make_flash_stack(cfg, n_layer=32):
    h, d = cfg.n_head, cfg.head_dim
    fn = layers.flash_prefill_fn()

    @jax.jit
    def stack(q, k, v):
        out = q
        for _ in range(n_layer):
            out = fn(out, k, v, 0.088)
        return out

    q = jnp.ones((1, T, h, d), jnp.float32) * 0.1
    k = jnp.ones((1, T, h, d), jnp.float32) * 0.1
    v = jnp.ones((1, T, h, d), jnp.float32) * 0.1
    return lambda: stack(q, k, v)


def main():
    os.environ["QMM_ZERO_FOLD"] = "0"  # fold explicitly per-case
    cfg, params = bench.build_llama()
    jax.block_until_ready(params)
    folded = fold_zero_points(params)

    cases = {}
    def add(name, fn):
        np.asarray(fn())
        print(f"compiled {name}", flush=True)
        cases[name] = fn

    add("prefill zerofold", make_prefill(cfg, folded))
    add("prefill plain", make_prefill(cfg, params))
    os.environ["QMM_FMA"] = "1"
    add("prefill fma", make_prefill(cfg, params))  # traced under QMM_FMA
    del os.environ["QMM_FMA"]
    add("qmm-sweep plain", make_qmm_sweep(params))
    add("flash-stack", make_flash_stack(cfg))

    times = {k: [] for k in cases}
    for rep in range(REPS):
        for name, fn in cases.items():
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = fn()
            np.asarray(out)
            times[name].append((time.perf_counter() - t0) / STEPS * 1e3)

    for name, ts in times.items():
        ms = statistics.median(ts)
        extra = ""
        if name.startswith("prefill"):
            extra = (f"  ({T / ms * 1e3:.0f} tok/s, "
                     f"{100 * 2 * 6.74e9 * T / (ms * 1e-3) / 197e12:.0f}% MFU)")
        print(f"RESULT pdecomp {name:18s}: median {ms:6.2f} ms  "
              f"min {min(ts):6.2f}  all {[round(x, 2) for x in ts]}{extra}",
              flush=True)


if __name__ == "__main__":
    main()
