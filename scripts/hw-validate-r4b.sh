#!/bin/bash
# Round-4 follow-up hardware queue: validate the morning's code changes and
# collect the remaining promotion data.  Run AFTER scripts/hw-validate.sh
# completes (one python process at a time on this tunnel).
#
#  1. tpu-smoke     — the qmm kernel changed (high-nibble >>4-only unpack,
#                     fma_fold variant, vmem-guard fix): full-arch smoke.
#  2. ab-decode     — now 3 variants (plain / zerofold / fma): the
#                     fma-vs-zerofold default decision (VERDICT #2 follow-up).
#  3. rwkv-bench    — the scoped-vmem guard units fix (VERDICT #5): b=256
#                     parallel prefill must now compile and run.
#  4. engine long-ctx (PROMPT_LEN=1900, N_CTX=2048, q8): decode at real
#                     2048-window attention — the q8/fused decision data the
#                     short-prompt engine benches could not produce.
#  5. hbm-stream    — fixed sweep (vmem_limit_bytes + scoped-vmem flag):
#                     the roofline number at real tile sizes (VERDICT #3).
#  6. tpu-gate      — full hardware gate with the promoted defaults.
#  7. bench         — the flagship number with everything promoted.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-hw-validate-r4b.log}

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
echo "tunnel alive — starting r4b queue $(date +%T)" | tee -a "$LOG"

# Ordering: decision-critical first; the two steps that crashed compiles
# in queue 1 (rwkv-bench scoped-vmem, hbm-stream big tiles) run LAST so a
# repeat wedge cannot cost the promotion data again.
run tpu-smoke      1500 python scripts/tpu-smoke.py
run ab-decode      2400 python scripts/ab-decode.py
# prefill side of the fold/fma default decision (r3 recorded a fold
# prefill regression 57.9->62.1 on single samples — settle with medians)
run decomp-prefill 2400 python scripts/decomp-prefill.py
run engine-long-q8 2700 env CACHE=q8 N_CTX=2048 PROMPT_LEN=1900 N_PREDICT=96 \
                        python scripts/engine-bench.py
run engine-long-q8-fused 2700 env CACHE=q8 N_CTX=2048 PROMPT_LEN=1900 \
                        N_PREDICT=96 FUSED_ATTN=1 FUSED_MAX_T=16 \
                        python scripts/engine-bench.py
run tpu-gate       2700 env LLAMA_TPU_TESTS=1 python -m pytest tests/test_tpu_gate.py -x -q
run bench          1500 python bench.py
# never ran in queue 1 (aborted at the rwkv-bench wedge)
run tune-prefill   3000 python scripts/tune-prefill.py
run rwkv-bench     1800 python scripts/rwkv-bench.py
run hbm-stream     1800 python -m llama_cpp_q_4_0_tpu benchmark-matmult --stream --stream-sweep

echo "=== R4B QUEUE DONE $(date +%T) ===" | tee -a "$LOG"
grep -E "RESULT|metric|passed|failed|GB/s" "$LOG" | tail -40
