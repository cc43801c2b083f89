"""`embedding` — print the model's final hidden state for a prompt
(examples/embedding/embedding.cpp:1-97)."""

from __future__ import annotations

import argparse

from ..runtime.tokenizer import TOKEN_BOS
from .common import add_model_args, load_model


def build_parser(p: argparse.ArgumentParser | None = None):
    p = p or argparse.ArgumentParser("embedding", description=__doc__)
    add_model_args(p)
    p.add_argument("-p", "--prompt", required=True)
    return p


def run(args) -> int:
    lm = load_model(args)
    toks = lm.tokenizer.tokenize(args.prompt, bos=True) or [TOKEN_BOS]
    emb = lm.ctx.embed(toks)  # [1, n_embd]
    print(" ".join(f"{x:f}" for x in emb[0]))
    print("\n" + lm.ctx.timings.report())
    return 0


def main(argv=None) -> int:
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
