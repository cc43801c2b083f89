#!/usr/bin/env bash
# Interactive chat launcher — parity with scripts/*/chat-*.sh (reverse
# prompt + interactive mode, oasst-style framing optional via -ins).
# usage: chat.sh <model.bin> [extra main args...]
set -euo pipefail
MODEL=${1:?model path}; shift || true
exec python -m llama_cpp_q_4_0_tpu main -m "$MODEL" \
  --interactive-first --color -r "User:" \
  -p "Transcript of a dialog where the User interacts with an Assistant named Bob. Bob is helpful and friendly.

User: Hello, Bob.
Bob: Hello. How may I help you today?
User:" \
  "$@"
