"""Continuous-batching engine throughput bench on the real chip.

Synthetic LLaMA-7B q4_0 (bench.build_llama — decode is weight-bandwidth
bound, so synthetic weights time identically to a checkpoint).  All slots
submitted up front, greedy on-device sampling, end-to-end wall clock from
start to last token.

Env knobs: SLOTS (16), CHUNK (8), N_PREDICT (64), PROMPT_LEN (16),
CACHE (bf16|q8), SPEC_DRAFT (0 = plain chunked), N_CTX (512 — 16 slots
x 2048 ctx bf16 is a 17 GB KV cache, past the 15.75 GB v5e HBM).
Combine with FUSED_ATTN=1 / QMM_Q8X=1 to time the experimental kernels.

Prints one RESULT line: tok/s end-to-end and ms/tick.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llama_cpp_q_4_0_tpu.utils.compile_cache import enable as _enable_cache
_enable_cache()

import jax.numpy as jnp
import numpy as np

import bench
from llama_cpp_q_4_0_tpu.runtime.batch_engine import BatchEngine, Request
from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams

SLOTS = int(os.environ.get("SLOTS", "16"))
CHUNK = int(os.environ.get("CHUNK", "8"))
N_PREDICT = int(os.environ.get("N_PREDICT", "64"))
PROMPT_LEN = int(os.environ.get("PROMPT_LEN", "16"))
CACHE = os.environ.get("CACHE", "bf16")
SPEC_DRAFT = int(os.environ.get("SPEC_DRAFT", "0"))
SPEC_MAX_ACTIVE = (int(os.environ["SPEC_MAX_ACTIVE"])
                   if os.environ.get("SPEC_MAX_ACTIVE") else None)
N_CTX = int(os.environ.get("N_CTX", "512"))
# PROMPT_KIND=repeat: periodic prompts (per-slot period/phase) so
# prompt-lookup speculation has real n-gram structure to draft from —
# random-token prompts measure pure spec overhead (acceptance ~0) and
# can only ever show speculation losing
PROMPT_KIND = os.environ.get("PROMPT_KIND", "random")


def main():
    cfg, params = bench.build_llama()
    rng = np.random.default_rng(0)
    cache_dtype = jnp.int8 if CACHE == "q8" else jnp.bfloat16
    eng = BatchEngine(
        cfg, params, n_slots=SLOTS, n_ctx=N_CTX, chunk=CHUNK,
        cache_dtype=cache_dtype, spec_draft=SPEC_DRAFT,
        spec_max_active=SPEC_MAX_ACTIVE,
        device_sampling=DeviceSampling(temp=-1.0),
    )
    greedy = SamplingParams(temp=-1.0)
    if PROMPT_KIND == "repeat":
        prompts = []
        for i in range(SLOTS):
            period = 6 + (i % 5)
            pat = rng.integers(5, cfg.n_vocab - 5, period).tolist()
            prompts.append((pat * (PROMPT_LEN // period + 1))[:PROMPT_LEN])
    elif PROMPT_KIND == "mixed":
        # multi-tenant trace: lengths spread 32..PROMPT_LEN — exercises
        # every admission lane (short batched, cohort, mismatch deferral)
        lens = rng.integers(32, max(33, PROMPT_LEN), SLOTS)
        prompts = [rng.integers(5, cfg.n_vocab - 5, int(n)).tolist()
                   for n in lens]
    else:
        prompts = [rng.integers(5, cfg.n_vocab - 5, PROMPT_LEN).tolist()
                   for _ in range(SLOTS)]

    eng.start()
    try:
        # warmup round compiles every tick shape the measured run will hit:
        # same N_PREDICT so every kv_window bucket (32/64/128/...) the
        # decode crosses is compiled BEFORE the clock starts (a single
        # mid-measurement on-chip compile costs ~10 s through the tunnel
        # and dominated the 2026-08-19 queue numbers)
        warm = [eng.submit(Request(p, n_predict=N_PREDICT, sampling=greedy))
                for p in prompts]
        for r in warm:
            list(r.tokens())

        t0 = time.perf_counter()
        reqs = [eng.submit(Request(p, n_predict=N_PREDICT, sampling=greedy))
                for p in prompts]
        total = sum(len(list(r.tokens())) for r in reqs)
        dt = time.perf_counter() - t0
    finally:
        eng.stop()

    flags = {k: os.environ.get(k) for k in
             ("FUSED_ATTN", "QMM_Q8X", "FLASH_PREFILL") if os.environ.get(k)}
    extra = ""
    if SPEC_DRAFT:
        st = eng.stats()
        extra = (f" accept={st['spec_acceptance']:.2f}"
                 f" rounds={st['spec_rounds']}")
    print(f"RESULT engine slots={SLOTS} chunk={CHUNK} cache={CACHE} "
          f"spec={SPEC_DRAFT} kind={PROMPT_KIND} flags={flags}: "
          f"{total} tok in {dt:.2f}s = {total / dt:.0f} tok/s{extra}",
          flush=True)


if __name__ == "__main__":
    main()
