#!/bin/bash
# Round-5 follow-up queue: the steps the r5 main queue lost to the
# (now fixed) Mosaic last-dim lowering bug in the kfold/q8x scale-plane
# specs — re-gate the fixed kernels, then the kfold A/B the decode
# default decision needs.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-hw-validate-r5b.log}

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
echo "tunnel alive — starting r5b queue $(date +%T)" | tee -a "$LOG"

# fixed kernels back through the full on-chip gate (kfold + q8x tests)
run gate 2400 env LLAMA_TPU_TESTS=1 python -m pytest tests/test_tpu_gate.py -x -q
# the kfold-vs-zerofold decode decision data (VERDICT #7 lever)
run ab-decode 2700 python scripts/ab-decode.py

echo "=== R5B QUEUE DONE $(date +%T) ===" | tee -a "$LOG"
grep -E "RESULT|passed|failed" "$LOG" | tail -10
