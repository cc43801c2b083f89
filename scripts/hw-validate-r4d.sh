#!/bin/bash
# Round-4 fourth queue: the 16x2048 long-context engine numbers, attempt 3.
# Queue-3 attempts OOM'd HBM; the fixes (in-place _scatter_rows, chunked-
# lane deferral for long admissions, budget-aware fold drop) are CPU-gated
# — this queue validates them on chip and finally produces the VERDICT #1
# serving datum at a real 2048 attention window.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-hw-validate-r4d.log}

probe() {
  sleep 60
  timeout 1500 python -c "
import jax, numpy as np, jax.numpy as jnp
print('probe ok', float(np.asarray(jnp.ones((8,128)) @ jnp.ones((128,8)))[0,0]))"
}

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $(date +%T) START $name ===" | tee -a "$LOG"
  timeout "$to" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "=== $(date +%T) END $name rc=$rc ===" | tee -a "$LOG"
  if [ $rc -ne 0 ]; then
    probe >>"$LOG" 2>&1 || {
      echo "TUNNEL WEDGED after $name — aborting queue" | tee -a "$LOG"
      exit 2
    }
  fi
}

probe >>"$LOG" 2>&1 || { echo "probe failed — tunnel wedged" | tee -a "$LOG"; exit 1; }
echo "tunnel alive — starting r4d queue $(date +%T)" | tee -a "$LOG"

run engine-long-q8 3000 env CACHE=q8 N_CTX=2048 PROMPT_LEN=1900 N_PREDICT=96 \
                        python scripts/engine-bench.py
run engine-long-q8-fused 3000 env CACHE=q8 N_CTX=2048 PROMPT_LEN=1900 \
                        N_PREDICT=96 FUSED_ATTN=1 FUSED_MAX_T=16 \
                        python scripts/engine-bench.py
# medium-context control at 16 slots (same code path, known-feasible size)
run engine-16-q8-1024 2400 env CACHE=q8 N_CTX=1024 PROMPT_LEN=900 \
                        N_PREDICT=96 python scripts/engine-bench.py
# bf16 flash-prefill operands (2x MXU rate on the ~11 ms attention stack)
run bench-flash-bf16 1500 env FLASH_BF16=1 python bench.py

echo "=== R4D QUEUE DONE $(date +%T) ===" | tee -a "$LOG"
grep -E "RESULT|engine:" "$LOG" | tail -10
