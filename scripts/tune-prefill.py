"""Prefill-512 block/flag sweep on the real chip (VERDICT r2 #6: get the
512-token 7B prefill from ~59.5 ms toward the <=48 ms / 70% MFU target).

Each variant runs in a FRESH subprocess (env flags are read at trace time;
the persistent XLA cache in .jax_cache makes repeat visits cheap).  Strictly
sequential — one python process at a time on this tunnel.

Variants: qmm tile shapes (QMM_BLOCK_N/K), zero-fold unpack, flash on/off,
and their best combination.  Prints one RESULT line per variant.
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# Stay inside the hw-validate.sh step timeout: with backend init measured at
# ~410 s per subprocess (2026-08-20), 9 variants cannot fit a 3000 s step.
# Launch variants only while enough budget remains for a full one; print
# SKIPPED for the rest (they can run in a later window).  A timeout-killed
# in-flight compile wedges the tunnel — never let the step timer do the kill.
BUDGET_S = float(os.environ.get("TUNE_BUDGET_S", "2700"))
PER_VARIANT_S = float(os.environ.get("TUNE_VARIANT_TIMEOUT_S", "1000"))
_T0 = time.monotonic()

BODY = r'''
import os, time, functools, numpy as np, jax, jax.numpy as jnp
import bench
from llama_cpp_q_4_0_tpu.models import transformer

cfg, params = bench.build_llama()
import statistics
ms = statistics.median(bench.bench_prefill(cfg, params, t=512, iters=5))
tag = " ".join(f"{k}={os.environ[k]}" for k in
               ("QMM_BLOCK_N", "QMM_BLOCK_K", "QMM_ZERO_FOLD",
                "QMM_FUSE_PANELS", "FLASH_PREFILL", "FLASH_BF16")
               if os.environ.get(k)) or "default"
print(f"RESULT prefill512 [{tag}]: {ms:.1f} ms  "
      f"({512 / ms * 1e3:.0f} tok/s, "
      f"{100 * 2 * 6.74e9 * 512 / (ms * 1e-3) / 197e12:.0f}% MFU)",
      flush=True)
'''

# Ordered by expected information value — only the first ~4-5 fit a
# 2700 s budget at ~500 s/variant (init-dominated).
VARIANTS = [
    {},                                             # current default
    # bf16 flash operands (2x MXU rate; the attention stack is ~11 of the
    # 58.8 ms total vs 1.4 ms of FLOPs — decomp-prefill 2026-08-20)
    {"FLASH_BF16": "1"},
    {"FLASH_BF16": "1", "QMM_BLOCK_K": "4096"},
    {"QMM_BLOCK_K": "4096"},
    {"QMM_ZERO_FOLD": "1"},
    {"QMM_BLOCK_N": "512", "QMM_BLOCK_K": "1024"},
    {"QMM_FUSE_PANELS": "1"},
    {"QMM_BLOCK_N": "512"},
    {"QMM_BLOCK_K": "1024"},
    {"QMM_ZERO_FOLD": "1", "QMM_BLOCK_N": "512"},
    {"FLASH_PREFILL": "0"},                         # flash opt-out control
]

for env in VARIANTS:
    left = BUDGET_S - (time.monotonic() - _T0)
    if left < PER_VARIANT_S:
        print(f"SKIPPED (budget: {left:.0f}s left) env={env}", flush=True)
        continue
    r = subprocess.run([sys.executable, "-c", BODY],
                       env=dict(os.environ, **env), cwd=ROOT,
                       timeout=PER_VARIANT_S)
    if r.returncode != 0:
        print(f"VARIANT FAILED rc={r.returncode} env={env}", flush=True)
print("PREFILL TUNE DONE", flush=True)
