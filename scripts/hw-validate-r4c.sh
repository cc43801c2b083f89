#!/bin/bash
# Round-4 third hardware queue: the long-context engine numbers the r4b
# queue could not produce (both runs died on the b=32768 batched-admission
# compile, now capped + row-chunked), the bf16 engine baseline, and the
# int8-activation PREFILL experiment (decode-ruled-out, prefill-untried).
#
# Run strictly alone (one python process at a time on this tunnel).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-hw-validate-r4c.log}

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
echo "tunnel alive — starting r4c queue $(date +%T)" | tee -a "$LOG"

# smoke first: the dispatch changed (MAX_PALLAS_ROWS, q8x cap env) and the
# f16-scale on-chip exactness check is new
run tpu-smoke      1500 python scripts/tpu-smoke.py
# fp16 scale planes (−17% folded decode bytes, exact): the ab harness
# decides plain/zerofold/zf-f16s/plain-f16s in one interleaved process
run ab-decode      2700 python scripts/ab-decode.py
# flagship numbers with the f16-plane experiment on (decode AND prefill)
run bench-f16s     1500 env QMM_F16_SCALES=1 python bench.py

# The VERDICT #1 headline config, at last with real 2048-window attention.
run engine-long-q8 3000 env CACHE=q8 N_CTX=2048 PROMPT_LEN=1900 N_PREDICT=96 \
                        python scripts/engine-bench.py
run engine-long-q8-fused 3000 env CACHE=q8 N_CTX=2048 PROMPT_LEN=1900 \
                        N_PREDICT=96 FUSED_ATTN=1 FUSED_MAX_T=16 \
                        python scripts/engine-bench.py
# bf16 baseline at the HBM-feasible ctx (the 750-tok/s comparison config)
run engine-16-bf16 1800 env CACHE=bf16 N_CTX=512 PROMPT_LEN=16 N_PREDICT=64 \
                        python scripts/engine-bench.py
# int8-MXU prefill: compute-bound regime the decode rule-out never tested
run tune-q8x-prefill 2500 python scripts/tune-q8x-prefill.py
# roofline sweep, third attempt (XLA_FLAGS abort fixed: per-kernel
# vmem_limit_bytes only, failed tiles keep sweeping)
run hbm-stream 1800 python -m llama_cpp_q_4_0_tpu benchmark-matmult --stream --stream-sweep

echo "=== R4C QUEUE DONE $(date +%T) ===" | tee -a "$LOG"
grep -E "RESULT|metric|GB/s" "$LOG" | tail -20
