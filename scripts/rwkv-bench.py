"""RWKV hardware bench: parallel-vs-sequential prefill and engine tok/s.

Synthetic RWKV-4 1.5B-class model (n_embd 2048, n_layer 24) with q4_0
QTensors built directly on device (same rationale as bench.py: the
recurrence is weight-bandwidth-bound, synthetic weights time like real
ones).  Measures:
  1. single-token decode ms/tok (sequential scan)
  2. T=256 prefill: parallel (associative-scan WKV) vs sequential
  3. RwkvBatchEngine multi-slot end-to-end tok/s

Env knobs: N_EMBD (2048), N_LAYER (24), SLOTS (8), N_PREDICT (48),
PREFILL_T (256).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llama_cpp_q_4_0_tpu.utils.compile_cache import enable as _enable_cache
_enable_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

import bench
from llama_cpp_q_4_0_tpu.models import rwkv
from llama_cpp_q_4_0_tpu.models.config import ModelConfig
from llama_cpp_q_4_0_tpu.models.rwkv import RwkvLayer, RwkvParams

N_EMBD = int(os.environ.get("N_EMBD", "2048"))
N_LAYER = int(os.environ.get("N_LAYER", "24"))
N_VOCAB = 50304  # real RWKV vocab is 50277; rounded to the 128-lane multiple
                 # so the head rides the Pallas kernel (synthetic weights)
SLOTS = int(os.environ.get("SLOTS", "8"))
N_PREDICT = int(os.environ.get("N_PREDICT", "48"))
PREFILL_T = int(os.environ.get("PREFILL_T", "256"))


def build_rwkv():
    cfg = ModelConfig.rwkv(N_VOCAB, N_EMBD, N_LAYER)
    keys = jax.random.split(jax.random.key(0), 16 * N_LAYER + 4)
    ki = iter(range(len(keys)))
    q = lambda n, k: bench.synth_qtensor(keys[next(ki)], n, k)
    e = N_EMBD

    def vec(scale=0.5, fill=None):
        if fill is not None:
            return jnp.full((e,), fill, jnp.float32)
        return jax.random.uniform(keys[next(ki)], (e,),
                                  jnp.float32, 0.1, 0.9) * scale

    layers = tuple(
        RwkvLayer(
            ln1_g=jnp.ones((e,)), ln1_b=jnp.zeros((e,)),
            ln2_g=jnp.ones((e,)), ln2_b=jnp.zeros((e,)),
            att_time_mix_k=vec(), att_time_mix_v=vec(), att_time_mix_r=vec(),
            att_time_first=vec(0.3), att_time_decay=vec(fill=-1.2),
            att_key=q(e, e), att_value=q(e, e), att_receptance=q(e, e),
            att_output=q(e, e),
            ff_time_mix_k=vec(), ff_time_mix_r=vec(),
            ff_key=q(4 * e, e), ff_receptance=q(e, e), ff_value=q(e, 4 * e),
        )
        for _ in range(N_LAYER)
    )
    params = RwkvParams(
        wte=jax.random.normal(keys[-2], (N_VOCAB, e), jnp.bfloat16) * 0.1,
        ln_pre_g=jnp.ones((e,)), ln_pre_b=jnp.zeros((e,)),
        layers=layers,
        ln_out_g=jnp.ones((e,)), ln_out_b=jnp.zeros((e,)),
        head=q(N_VOCAB, e),
    )
    return cfg, params


def main():
    cfg, params = build_rwkv()

    # 1. sequential decode
    @functools.partial(jax.jit, donate_argnums=(2,))
    def step1(params, tok, state):
        return rwkv.forward(cfg, params, tok, state, last_only=True,
                            parallel=False)

    state = rwkv.init_state(cfg, 1)
    tok = jnp.zeros((1, 1), jnp.int32) + 5
    logits, state = step1(params, tok, state)
    np.asarray(logits)
    t0 = time.perf_counter()
    for _ in range(20):
        logits, state = step1(params, tok, state)
    np.asarray(logits)
    ms = 1e3 * (time.perf_counter() - t0) / 20
    print(f"RESULT rwkv decode {N_EMBD}x{N_LAYER}: {ms:.2f} ms/tok", flush=True)

    # 2. prefill T=PREFILL_T parallel vs sequential
    toks = jnp.zeros((1, PREFILL_T), jnp.int32) + 7
    for par in (True, False):
        f = jax.jit(lambda p, t, s, _par=par: rwkv.forward(
            cfg, p, t, s, last_only=True, parallel=_par))
        st = rwkv.init_state(cfg, 1)
        lg, _ = f(params, toks, st)
        np.asarray(lg)
        st = rwkv.init_state(cfg, 1)
        t0 = time.perf_counter()
        lg, _ = f(params, toks, st)
        np.asarray(lg)
        dt = time.perf_counter() - t0
        print(f"RESULT rwkv prefill T={PREFILL_T} parallel={par}: "
              f"{1e3 * dt:.1f} ms = {PREFILL_T / dt:.0f} tok/s", flush=True)

    # 3. engine throughput
    from llama_cpp_q_4_0_tpu.runtime.batch_engine import Request
    from llama_cpp_q_4_0_tpu.runtime.rwkv_engine import RwkvBatchEngine
    from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams

    rng = np.random.default_rng(0)
    eng = RwkvBatchEngine(cfg, params, n_slots=SLOTS)
    greedy = SamplingParams(temp=-1.0)
    prompts = [rng.integers(5, 1000, 16).tolist() for _ in range(SLOTS)]
    eng.start()
    try:
        warm = [eng.submit(Request(p, n_predict=4, sampling=greedy))
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
    print(f"RESULT rwkv engine slots={SLOTS}: {total} tok in {dt:.2f}s = "
          f"{total / dt:.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
