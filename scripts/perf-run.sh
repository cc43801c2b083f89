#!/usr/bin/env bash
# Decode-speed sweep — parity with scripts/perf-run-all.sh (64 tokens,
# fixed seed, ignore EOS).
# usage: perf-run.sh <model.bin> [n_ctx]
set -euo pipefail
MODEL=${1:?model path}
CTX=${2:-2048}
python -m llama_cpp_q_4_0_tpu main -m "$MODEL" -c "$CTX" -n 64 \
  --ignore-eos -s 1 -p "The quick brown fox" 2>&1 | grep -E "eval time|sample time"
