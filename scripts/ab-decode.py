"""Single-process A/B: zero-fold unpack vs default, interleaved repeats.

Round 3 left a 3.5x contradiction between two instruments measuring the
SAME flag: bench.py said QMM_ZERO_FOLD=1 decodes at 9.321 ms/tok (-5%)
while tune-q8x's subprocess said T=1 32.58 ms (+185%) fifteen minutes
later (hw-validate.log:39 vs :47).  Both were single samples in separate
processes through a noisy tunnel.  This harness removes every confound:

- ONE process, both parameter sets resident (they share levels/scales
  buffers — fold only adds the gbias planes, ~0.85 GB).
- Both variants' forwards compiled up front, then timing runs INTERLEAVED
  (variant A rep 1, variant B rep 1, A rep 2, ...) so tunnel drift hits
  both equally.
- Median of N=5 reps of 20 steps each, per (variant, T, kv_window) combo.

Prints one RESULT line per combo; the zero-fold promote/rule-out decision
(VERDICT r3 #2) cites these medians.
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
from llama_cpp_q_4_0_tpu.ops.qtensor import (cast_scales_bf16,
                                             cast_scales_f16,
                                             fold_zero_points)

REPS = int(os.environ.get("REPS", "5"))
STEPS = int(os.environ.get("STEPS", "20"))


def _make_step(cfg):
    # fresh jit per variant: the dispatch reads trace-time env flags
    # (QMM_FMA), and a shared jit cache would reuse another variant's trace
    @functools.partial(jax.jit,
                       static_argnames=("t", "w"),
                       donate_argnames=("ck", "cv"))
    def step(p, toks, n_past, ck, cv, t, w):
        return transformer.forward(cfg, p, toks, n_past, ck, cv,
                                   last_only=True, kv_window=w)

    return step


def main():
    # the harness folds explicitly; since the r4 promote, build_llama folds
    # by default on TPU — force the raw build so "plain" stays plain
    os.environ["QMM_ZERO_FOLD"] = "0"
    cfg, params = bench.build_llama()
    jax.block_until_ready(params)
    # (name, params, trace-time env).  fma was ruled out 2026-08-20
    # (10.67/10.91/11.76 vs zerofold 10.12/10.43/11.51); the f16s variants
    # store the scale/bias planes fp16 (exact decode, −17% folded weight
    # bytes — the bandwidth-bound regime's next lever).
    variants = [("plain", params, {}),
                ("zerofold", fold_zero_points(params), {}),
                # r5: zero-fold with the bias computed IN-KERNEL from the
                # streamed scale tiles — raw params, NO gbias planes
                # (−17% decode bytes vs zerofold, same mask/shift unpack)
                ("kfold", params, {"QMM_KFOLD": "1"}),
                # r5 late: kfold + BF16 scale planes (−0.54 GB/token, and
                # unlike f16 the decode is a native convert, not the
                # integer bit-decode that sank the f16 experiment).
                # ~0.2%-per-scale accuracy trade — promote only with the
                # accuracy probe alongside.
                ("kf-bf16s", cast_scales_bf16(params), {"QMM_KFOLD": "1"}),
                ("zf-f16s", fold_zero_points(cast_scales_f16(params)), {}),
                ("plain-f16s", cast_scales_f16(params), {})]

    # combos: bench.py-style decode (T=1 w=256), tune-q8x-style (T=1 w=512),
    # and the speculative-verify shape (T=8 w=512)
    combos = [(1, 256), (1, 512), (8, 512)]

    steps, state = {}, {}
    for name, p, env in variants:
        os.environ.update(env)
        step = _make_step(cfg)
        for t, w in combos:
            ck, cv = transformer.init_cache(cfg, 1, w)
            toks = jnp.zeros((1, t), jnp.int32) + 5
            logits, ck, cv = step(p, toks, jnp.int32(100), ck, cv, t=t, w=w)
            np.asarray(logits)  # hard sync: compile + warm (env captured)
            state[(name, t, w)] = (ck, cv)
            print(f"compiled {name} T={t} w={w}", flush=True)
        steps[name] = step
        for k in env:
            os.environ.pop(k, None)

    times = {k: [] for k in state}
    for rep in range(REPS):
        for name, p, _env in variants:
            step = steps[name]
            for t, w in combos:
                ck, cv = state[(name, t, w)]
                toks = jnp.zeros((1, t), jnp.int32) + 5
                t0 = time.perf_counter()
                for _ in range(STEPS):
                    logits, ck, cv = step(p, toks, jnp.int32(100), ck, cv,
                                          t=t, w=w)
                np.asarray(logits)
                times[(name, t, w)].append(
                    (time.perf_counter() - t0) / STEPS * 1e3)
                state[(name, t, w)] = (ck, cv)

    for (name, t, w), ts in sorted(times.items(), key=lambda kv: (kv[0][1:],
                                                                  kv[0][0])):
        print(f"RESULT ab {name:9s} T={t} w={w}: median "
              f"{statistics.median(ts):6.2f} ms  min {min(ts):6.2f}  "
              f"all {[round(x, 2) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
