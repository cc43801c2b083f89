"""Generation driver: the examples/main decode loop.

Implements prefill -> sample -> feed-back with the reference's infinite-text
context swap (keep n_keep tokens, re-feed the last (n_ctx - n_keep)/2,
main.cpp:366-389) on top of a Context.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np

from .context import Context
from .sampling import Sampler, SamplingParams
from .tokenizer import TOKEN_BOS, TOKEN_EOS, Tokenizer


@dataclass
class GenerateParams:
    n_predict: int = 128
    n_keep: int = 0
    ignore_eos: bool = False
    sampling: SamplingParams = field(default_factory=SamplingParams)
    seed: int = -1


def generate(
    ctx: Context,
    prompt_tokens: list[int],
    gp: GenerateParams,
    *,
    antiprompts: tuple[list[int], ...] = (),
    eos_token: int = TOKEN_EOS,
) -> Iterator[int]:
    """Yields sampled token ids, one at a time."""
    sampler = Sampler(gp.sampling, ctx.cfg.n_vocab, gp.seed)
    n_ctx = ctx.n_ctx
    n_keep = gp.n_keep if gp.n_keep >= 0 else len(prompt_tokens)
    last_tokens: list[int] = list(prompt_tokens)

    logits = ctx.eval(np.asarray([prompt_tokens], dtype=np.int32))
    t_sample = 0.0
    n_out = 0
    while gp.n_predict < 0 or n_out < gp.n_predict:
        t0 = time.perf_counter()
        tok = sampler.sample(logits[0, -1], last_tokens)
        t_sample += time.perf_counter() - t0
        ctx.timings.n_sample += 1
        if tok == eos_token and not gp.ignore_eos:
            break
        last_tokens.append(tok)
        yield tok
        n_out += 1
        if antiprompts and any(
            last_tokens[-len(ap):] == ap for ap in antiprompts if ap
        ):
            break

        # infinite-text context swap (main.cpp:366-389)
        if ctx.n_past + 1 > n_ctx:
            n_left = ctx.n_past - n_keep
            keep = last_tokens[-(n_left // 2):]
            ctx.reset()
            refeed = list(prompt_tokens[:n_keep]) + keep
            logits = ctx.eval(np.asarray([refeed], dtype=np.int32))
            continue

        logits = ctx.eval(np.asarray([[tok]], dtype=np.int32))
    ctx.timings.t_sample_ms += t_sample * 1e3


def generate_text(
    ctx: Context,
    tokenizer: Tokenizer,
    prompt: str,
    gp: GenerateParams | None = None,
    *,
    bos: bool = True,
) -> str:
    gp = gp or GenerateParams()
    # empty text tokenizes to NOTHING (llama.cpp:1788-1790); start from a
    # bare BOS like the reference's empty-input path (main.cpp:345)
    toks = tokenizer.tokenize(prompt, bos=bos) or [TOKEN_BOS]
    out = list(generate(ctx, toks, gp))
    return tokenizer.detokenize(out).decode("utf-8", errors="replace")
