"""int8-activation (q8x) PREFILL experiment on the real chip.

The q8x kernel was ruled out for decode shapes (T=1 28.45 ms vs 11 ms
default, hw-validate.log 2026-08-19) — decode is HBM-bound and the extra
activation-quant VPU work has nothing to hide behind.  Prefill-512 is the
opposite regime: compute-bound at ~60% MFU with the bf16 MXU (decomp-prefill
2026-08-20: qmm-sweep 47.6 ms of the 58.8 ms total), and the v5e int8 MXU
runs 2x the bf16 rate — the same trade the reference makes by quantizing
activations to q8_0 for its q4_0 vec_dot (ggml.c INIT task).  If the int8
dot halves qmm time, prefill lands near the 70%-MFU target (<=48 ms).

Each variant runs in a fresh subprocess (env read at trace time; persistent
XLA cache makes revisits cheap).  Also prints a one-shot logit delta vs the
bf16-compute path so the accuracy cost of int8 activations at prefill is
recorded alongside the speed.
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

BUDGET_S = float(os.environ.get("TUNE_BUDGET_S", "2400"))
PER_VARIANT_S = float(os.environ.get("TUNE_VARIANT_TIMEOUT_S", "1100"))
_T0 = time.monotonic()

BODY = r'''
import os, statistics, numpy as np, jax, jax.numpy as jnp
import bench

cfg, params = bench.build_llama()
ms = statistics.median(bench.bench_prefill(cfg, params, t=512, iters=5))
tag = " ".join(f"{k}={os.environ[k]}" for k in
               ("QMM_Q8X", "QMM_Q8X_MAX_B", "QMM_BLOCK_N", "QMM_BLOCK_K")
               if os.environ.get(k)) or "default"
print(f"RESULT q8x-prefill512 [{tag}]: {ms:.1f} ms  "
      f"({512 / ms * 1e3:.0f} tok/s, "
      f"{100 * 2 * 6.74e9 * 512 / (ms * 1e-3) / 197e12:.0f}% MFU)",
      flush=True)
'''

# Accuracy probe: same 512-token prefill, q8x logits vs default-path logits
# (both on chip so the only delta is the activation quantization).
ACC = r'''
import os, numpy as np, jax, jax.numpy as jnp
import bench
from llama_cpp_q_4_0_tpu.models import transformer

cfg, params = bench.build_llama(n_layer=8)
toks = jnp.asarray(np.random.default_rng(0).integers(5, 3200, (1, 512)))
def logits():
    ck, cv = transformer.init_cache(cfg, 1, cfg.n_ctx)
    out, _, _ = transformer.forward(cfg, params, toks, jnp.int32(0), ck, cv,
                                    last_only=True, kv_window=512)
    return np.asarray(out)[0, -1]
base = logits()
os.environ["QMM_Q8X"] = "1"; os.environ["QMM_Q8X_MAX_B"] = "512"
jax.clear_caches()
test = logits()
rel = float(np.max(np.abs(test - base)) / (np.max(np.abs(base)) + 1e-9))
am = "SAME" if int(test.argmax()) == int(base.argmax()) else "DIFFERS"
print(f"RESULT q8x-prefill-accuracy: max-rel {rel:.2e}, argmax {am}",
      flush=True)
'''

VARIANTS = [
    ({}, BODY),                                        # control (raw view)
    ({"QMM_Q8X": "1", "QMM_Q8X_MAX_B": "512"}, BODY),  # int8 MXU
    ({"QMM_Q8X": "1", "QMM_Q8X_MAX_B": "512",
      "QMM_BLOCK_K": "1024"}, BODY),                   # smaller k tile
    ({"QMM_Q8X": "bf16", "QMM_Q8X_MAX_B": "512"}, BODY),  # isolate quant cost
    ({}, ACC),                                         # accuracy probe
]

for env, body in VARIANTS:
    left = BUDGET_S - (time.monotonic() - _T0)
    if left < PER_VARIANT_S:
        print(f"SKIPPED (budget: {left:.0f}s left) env={env}", flush=True)
        continue
    r = subprocess.run([sys.executable, "-c", body],
                       env=dict(os.environ, **env), cwd=ROOT,
                       timeout=PER_VARIANT_S)
    if r.returncode != 0:
        print(f"VARIANT FAILED rc={r.returncode} env={env}", flush=True)
print("Q8X PREFILL TUNE DONE", flush=True)
