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

# Round-4 measurement queue (2026-08-20).  Ordering rationale (VERDICT r3
# #1/#8): the flagship 16x2048 engine benches have NEVER completed in two
# rounds of queues dying before them — they run FIRST, right after one
# cheap bench sanity-check.  Experimental/risky steps last.
# 2026-08-20: backend init measured at ~410-420 s per process this round
# (two probes: 421.8 / 411.4 s) — every step pays it once, bench.py twice
# (its subprocess probe).  Timeouts sized init + work + margin; a timeout
# kill mid-compile re-wedges the tunnel, so generous beats tight.
run bench          1800 python bench.py
# q8 KV at 16x2048 = 8.6 GB cache + 4.2 GB weights — fits; bf16 (17.2 GB) does not.
run engine-16-q8   3000 env CACHE=q8 N_CTX=2048 python scripts/engine-bench.py
run engine-16-q8-fused 3000 env CACHE=q8 N_CTX=2048 FUSED_ATTN=1 FUSED_MAX_T=16 python scripts/engine-bench.py
run engine-16      2400 python scripts/engine-bench.py
# zero-fold vs default, one process, interleaved medians (VERDICT #2)
run ab-decode      1800 python scripts/ab-decode.py
# T=8 cost decomposition + fuse-panels A/B (VERDICT #4)
run decomp-t8      2700 python scripts/decomp-t8.py
# fixed instrument: array as jit arg, tile sweep (VERDICT #3)
run hbm-stream     1800 python -m llama_cpp_q_4_0_tpu benchmark-matmult --stream --stream-sweep
# VMEM-OOM fix validation: b=256 parallel prefill (VERDICT #5)
run rwkv-bench     1800 python scripts/rwkv-bench.py
run tune-prefill   3000 python scripts/tune-prefill.py

echo "=== QUEUE DONE $(date +%T) ===" | tee -a "$LOG"
grep -E "RESULT|metric|passed|failed|GB/s" "$LOG" | tail -40
