"""Minimal library usage — examples/simple/simple.cpp parity.

Load a ggjt model, evaluate a prompt, greedy-decode a few tokens, print
them.  Everything else (sampling chains, sessions, servers) lives in the
CLI tools; this is the smallest end-to-end program.

    python examples/simple.py <model.bin> "Hello my name is"
"""

import sys

import numpy as np

from llama_cpp_q_4_0_tpu.formats.ggjt import detect_arch, read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.tokenizer import Tokenizer, Vocab


def main(model_path: str, prompt: str, n_predict: int = 32) -> int:
    gf = read_ggjt(model_path, detect_arch(model_path))
    cfg = config_from_ggjt(gf, n_ctx=512)
    tokenizer = Tokenizer(Vocab.from_ggjt(gf))
    ctx = Context(cfg, load_transformer(gf, cfg), n_ctx=512)

    tokens = tokenizer.tokenize(prompt, bos=True)
    print(prompt, end="", flush=True)
    logits = ctx.eval(np.asarray([tokens], np.int32))
    for _ in range(n_predict):
        tok = int(np.argmax(logits[0, -1]))
        if tok == 2:  # EOS
            break
        sys.stdout.buffer.write(tokenizer.token_text(tok))
        sys.stdout.flush()
        logits = ctx.eval(np.asarray([[tok]], np.int32))
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2
                          else "Hello my name is"))
