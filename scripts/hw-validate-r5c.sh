#!/bin/bash
# Round-5 third queue: the steady-state occupancy table at real windows,
# completed (occ=16 retry via subprocess-per-occupancy) + the q8-vs-bf16
# KV comparison at the occupancies where bf16 fits HBM — isolating the
# q8 scale-elementwise cost in the regime that motivated FUSED_ATTN.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-hw-validate-r5c.log}

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
echo "tunnel alive — starting r5c queue $(date +%T)" | tee -a "$LOG"

# full q8 table (one occupancy per subprocess now)
run engine-steady-q8 4800 env CACHE=q8 OCCUPANCIES=4,8,16 \
                        python scripts/engine-steady.py
# bf16 KV at the occupancies that fit HBM: isolates the q8 penalty
run engine-steady-bf16 3600 env CACHE=bf16 OCCUPANCIES=4,8 \
                        python scripts/engine-steady.py

echo "=== R5C QUEUE DONE $(date +%T) ===" | tee -a "$LOG"
grep -E "RESULT" "$LOG" | tail -10
