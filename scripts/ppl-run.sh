#!/usr/bin/env bash
# wikitext-2 perplexity — parity with scripts/ppl-run-all.sh.
# usage: ppl-run.sh <model.bin> <wiki.test.raw> [n_ctx]
set -euo pipefail
python -m llama_cpp_q_4_0_tpu perplexity -m "${1:?model}" -f "${2:?wiki.test.raw}" -c "${3:-512}"
