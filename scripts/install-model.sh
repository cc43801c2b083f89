#!/usr/bin/env bash
# Convert + quantize a local HF checkpoint into a ready-to-run q4_0 ggjt.
# Parity with the reference's scripts/*/install-*.sh pipelines (which
# download + convert + quantize); this environment is zero-egress, so the
# checkpoint dir must already be on disk.
#
# usage: install-model.sh <hf_checkpoint_dir> <out_dir> [ftype]
set -euo pipefail
SRC=${1:?hf checkpoint dir}
OUT=${2:?output dir}
FTYPE=${3:-q4_0}
mkdir -p "$OUT"
BASE="$OUT/model-f16.bin"
QUANT="$OUT/model-$FTYPE.bin"
python -m llama_cpp_q_4_0_tpu convert "$SRC" "$BASE"
python -m llama_cpp_q_4_0_tpu quantize "$BASE" "$QUANT" "$FTYPE"
echo "ready: $QUANT"
