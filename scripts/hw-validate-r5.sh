#!/bin/bash
# Round-5 hardware queue — converts the three measurements VERDICT r4 says
# are owed, in risk-last order:
#   1. the 16x2048 long-context engine numbers (attempt 4; fixed code,
#      never yet run) + the FUSED_ATTN/q8 default decision data,
#   2. steady-state decode at REAL windows (n_past ~1800-2040) across
#      occupancies (engine-steady.py, new),
#   3. the HBM roofline large-tile sweep (per-kernel vmem_limit_bytes),
#   4. the int8-MXU prefill retry (lane-compact q8x kernel, new layout).
# Step 0 is the CPU preflight: every entry's admission shapes, kernel
# VMEM plans, and HBM plan are vetted locally before the chip is touched.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-hw-validate-r5.log}

python scripts/preflight.py "$0" | tee -a "$LOG" || {
  echo "PREFLIGHT FAILED — queue refused" | tee -a "$LOG"; exit 3; }

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
echo "tunnel alive — starting r5 queue $(date +%T)" | tee -a "$LOG"

# -- regression gate: bench + smoke + TPU gate (first Mosaic compile of the
#    lane-compact q8x kernel happens inside the gate at small shapes)
run bench 1500 python bench.py
run smoke 1500 python scripts/tpu-smoke.py
run gate 2400 env LLAMA_TPU_TESTS=1 python -m pytest tests/test_tpu_gate.py -x -q

# -- r5 decode lever: kfold (in-kernel bias-from-scales, no gbias stream,
#    -17% decode bytes) vs zerofold vs plain, interleaved medians
run ab-decode 2700 python scripts/ab-decode.py

# -- VERDICT #1: the 16x2048 long-context engine numbers (prompt 1900)
run engine-long-q8 3000 env CACHE=q8 N_CTX=2048 PROMPT_LEN=1900 N_PREDICT=96 \
                        python scripts/engine-bench.py
run engine-long-q8-fused 3000 env CACHE=q8 N_CTX=2048 PROMPT_LEN=1900 \
                        N_PREDICT=96 FUSED_ATTN=1 FUSED_MAX_T=16 \
                        python scripts/engine-bench.py
# medium-context control at 16 slots (same code path, known-feasible size)
run engine-16-q8-1024 2400 env CACHE=q8 N_CTX=1024 PROMPT_LEN=900 \
                        N_PREDICT=96 python scripts/engine-bench.py

# -- VERDICT #6: steady-state decode at real windows, occupancy table
run engine-steady-q8 3600 env CACHE=q8 OCCUPANCIES=4,8,16 \
                        python scripts/engine-steady.py
run engine-steady-q8-fused 3600 env CACHE=q8 OCCUPANCIES=4,8,16 \
                        FUSED_ATTN=1 FUSED_MAX_T=16 \
                        python scripts/engine-steady.py

# -- VERDICT #3: HBM roofline, large-tile sweep (vmem_limit_bytes per kernel)
run hbm-sweep 2400 python -m llama_cpp_q_4_0_tpu benchmark-matmult \
                        --stream --stream-sweep --stream-gib 4

# -- VERDICT #4: int8-MXU prefill with the lane-compact kernel
run tune-q8x-prefill 2700 env TUNE_BUDGET_S=2400 \
                        python scripts/tune-q8x-prefill.py

# -- prefill experiment: bf16 flash operands (2x MXU rate on attention)
run bench-flash-bf16 1500 env FLASH_BF16=1 python bench.py

echo "=== R5 QUEUE DONE $(date +%T) ===" | tee -a "$LOG"
grep -E "RESULT|engine:|read-stream|\"metric\"" "$LOG" | tail -30
