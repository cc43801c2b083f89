#!/bin/bash
# One-shot hardware validation queue — run the moment the TPU tunnel answers
# (NOTES-NEXT-ROUND.md "HARDWARE-PENDING VALIDATION").  Strictly sequential:
# ONE python process at a time; generous timeouts because killing an
# in-flight Mosaic compile re-wedges the tunnel for hours.  After any failed
# step, a quick probe decides whether the tunnel is wedged (abort) or the
# step itself failed (continue).
#
# usage: scripts/hw-validate.sh   (logs to hw-validate.log, tee'd summaries)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-hw-validate.log}

probe() {
  # generous timeout + settle time: the tunnel needs ~30-60 s to drain
  # after a heavy step, and KILLING a probe mid-backend-init re-wedges it
  # (that ended the 2026-08-19 00:43 queue after a mere test failure).
  # 560 s, not 300: a recovering tunnel answers backend init in ~280 s
  # (measured 12:14 2026-08-19) — a 300 s timeout kills it mid-init and
  # re-wedges (measured 12:20 the same day: killed probe -> wedge)
  sleep 60
  timeout 560 python -c "
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

probe >>"$LOG" 2>&1 || { echo "probe failed — tunnel still wedged" | tee -a "$LOG"; exit 1; }
echo "tunnel alive — starting queue $(date +%T)" | tee -a "$LOG"

# Round-3 queue (2026-08-19).  Ordering rationale: cheap/known-good first,
# the OOM-risky 16x2048 engine runs LAST so a wedge can't starve the rest.
# smoke re-added per ADVICE.md (kernel fixes landed after it last passed).
run bench          900  python bench.py
run smoke          900  python scripts/tpu-smoke.py
run tpu-gate       2400 env LLAMA_TPU_TESTS=1 python -m pytest tests/test_tpu_gate.py -q
# flash prefill is DEFAULT now; this step quantifies it by opting out
run noflash-bench  700  env FLASH_PREFILL=0 python bench.py
# zero-fold experiment: mask/shift-only nibble unpack (ops/qtensor.fold_zero)
run zerofold-bench 700  env QMM_ZERO_FOLD=1 python bench.py
run tune-q8x       1800 env SKIP_CHECK=1 python scripts/tune-q8x.py
run hbm-stream     700  python -m llama_cpp_q_4_0_tpu benchmark-matmult --stream
run rwkv-bench     1200 python scripts/rwkv-bench.py
run engine-16      1500 python scripts/engine-bench.py
# q8 KV at 16x2048 = 8.6 GB cache + 4.2 GB weights — fits; bf16 (17.2 GB) does not.
run engine-16-q8   1500 env CACHE=q8 N_CTX=2048 python scripts/engine-bench.py
run engine-16-q8-fused 1500 env CACHE=q8 N_CTX=2048 FUSED_ATTN=1 python scripts/engine-bench.py

echo "=== QUEUE DONE $(date +%T) ===" | tee -a "$LOG"
grep -E "RESULT|metric|passed|failed|GB/s" "$LOG" | tail -40
