"""Steady-state engine decode rate at REAL context windows (VERDICT r4 #6).

Every engine number through round 4 decoded at n_past <= 80, where the
2048-token attention window, the q8-KV scale elementwise, and FUSED_ATTN's
value proposition are not exercised.  This bench pins the regime the
reference actually serves at (context-swap decode, examples/main/main.cpp:
366-389): each slot is prefilled to PROMPT_LEN ≈ n_ctx - N_PREDICT, then
decodes N_PREDICT tokens with n_past sweeping ~1800 -> 2040.

Admissions are EXCLUDED from the steady rate: per-request first-token
timestamps mark the end of the (serialized, chunked-lane) prefill phase;
the steady window is [last first-token, end], counting only tokens that
arrive inside it.  One RESULT line per occupancy in OCCUPANCIES.

Env knobs: N_CTX (2048), PROMPT_LEN (n_ctx-208), N_PREDICT (192),
CACHE (q8), CHUNK (8), OCCUPANCIES (4,8,16).  FUSED_ATTN/QMM_* ride the
environment as usual.
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TINY"):  # CPU-testable: never touch the TPU tunnel
    jax.config.update("jax_platforms", "cpu")

from llama_cpp_q_4_0_tpu.utils.compile_cache import enable as _enable_cache
_enable_cache()

import jax.numpy as jnp
import numpy as np

import bench
from llama_cpp_q_4_0_tpu.runtime.batch_engine import BatchEngine, Request
from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams

N_CTX = int(os.environ.get("N_CTX", "2048"))
# n_predict must outlast the SERIALIZED admission span of the largest
# occupancy or the steady window is empty (see run_occupancy)
N_PREDICT = int(os.environ.get("N_PREDICT", "448"))
PROMPT_LEN = int(os.environ.get("PROMPT_LEN", str(N_CTX - N_PREDICT - 16)))
CACHE = os.environ.get("CACHE", "q8")
CHUNK = int(os.environ.get("CHUNK", "8"))
SPEC_DRAFT = int(os.environ.get("SPEC_DRAFT", "0"))
# repeat: periodic per-slot prompts so prompt-lookup speculation has
# n-gram structure (random tokens can only measure spec overhead)
PROMPT_KIND = os.environ.get(
    "PROMPT_KIND", "repeat" if SPEC_DRAFT else "random")
OCCUPANCIES = [int(x) for x in
               os.environ.get("OCCUPANCIES", "4,8,16").split(",")]


def run_occupancy(eng, prompts, occ):
    greedy = SamplingParams(temp=-1.0)
    reqs = [eng.submit(Request(p, n_predict=N_PREDICT, sampling=greedy))
            for p in prompts[:occ]]
    events: list[float] = []
    firsts, lasts = [], []
    threads = []
    lock = threading.Lock()

    def worker(r):
        first = None
        local = []
        for _ in r.tokens():
            t = time.perf_counter()
            if first is None:
                first = t
            local.append(t)
        with lock:
            firsts.append(first)
            lasts.append(local[-1] if local else None)
            events.extend(local)

    for r in reqs:
        th = threading.Thread(target=worker, args=(r,))
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    done = [f for f in firsts if f is not None]
    ends = [x for x in lasts if x is not None]
    if len(done) < occ or len(ends) < occ:
        return None
    # the steady window is [last first-token, FIRST finish]: admissions
    # serialize through the chunked lane, so with a short n_predict early
    # slots finish BEFORE the last admission and the post-admission tail
    # has 1-2 active slots — the original [last-first, end] window
    # measured that tail, not steady state (caught via ENGINE_TRACE
    # active counts, 2026-08-20)
    t_lo, t_hi = max(done), min(ends)
    steady = [t for t in events if t_lo < t <= t_hi]
    if t_hi <= t_lo or len(steady) < occ * 2:
        return None  # no full-occupancy overlap: raise N_PREDICT
    return len(steady) / (t_hi - t_lo)


def main():
    if len(OCCUPANCIES) > 1:
        # ONE OCCUPANCY PER SUBPROCESS: three engines built sequentially
        # in one process OOM'd HBM at occ=16 (r5 queue 17:40 — the prior
        # engines' caches/executables are not reliably freed before the
        # next init); the persistent XLA cache keeps re-runs cheap
        import subprocess

        for occ in OCCUPANCIES:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, OCCUPANCIES=str(occ)),
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
        return
    if os.environ.get("TINY"):  # CPU-testable configuration
        cfg, params = bench.build_llama(n_layer=2, n_embd=256, n_head=4,
                                        n_ff=512, n_vocab=512, n_ctx=N_CTX)
    else:
        cfg, params = bench.build_llama()
    rng = np.random.default_rng(0)
    cache_dtype = jnp.int8 if CACHE == "q8" else jnp.bfloat16
    flags = {k: os.environ.get(k) for k in
             ("FUSED_ATTN", "FUSED_MAX_T", "QMM_Q8X", "QMM_ZERO_FOLD")
             if os.environ.get(k)}
    if SPEC_DRAFT:
        flags["spec"] = str(SPEC_DRAFT)
    for occ in OCCUPANCIES:
        eng = BatchEngine(
            cfg, params, n_slots=occ, n_ctx=N_CTX, chunk=CHUNK,
            cache_dtype=cache_dtype, spec_draft=SPEC_DRAFT,
            device_sampling=DeviceSampling(temp=-1.0),
        )
        if PROMPT_KIND == "repeat":
            prompts = []
            for i in range(occ):
                period = 6 + (i % 5)
                pat = rng.integers(5, cfg.n_vocab - 5, period).tolist()
                prompts.append((pat * (PROMPT_LEN // period + 1))
                               [:PROMPT_LEN])
        else:
            prompts = [rng.integers(5, cfg.n_vocab - 5,
                                    PROMPT_LEN).tolist()
                       for _ in range(occ)]
        eng.start()
        try:
            # warm pass compiles every tick/prefill shape, then measure
            warm = run_occupancy(eng, prompts, occ)
            rate = run_occupancy(eng, prompts, occ)
        finally:
            eng.stop()
        if rate is None:
            print(f"RESULT steady occ={occ} cache={CACHE} "
                  f"w~{PROMPT_LEN}-{PROMPT_LEN + N_PREDICT} flags={flags}: "
                  f"FAILED (warm={warm})", flush=True)
            continue
        print(f"RESULT steady occ={occ} cache={CACHE} "
              f"w~{PROMPT_LEN}-{PROMPT_LEN + N_PREDICT} flags={flags}: "
              f"{rate:.0f} tok/s steady "
              f"({occ / rate * 1e3:.1f} ms/tick)", flush=True)


if __name__ == "__main__":
    main()
