"""`main` — the text-generation CLI (examples/main/main.cpp:57-675).

Covers the reference's decode loop end-to-end: prompt-cache sessions with
prefix reuse (main.cpp:157-230), infinite-text context swap (366-389), the
full sampling chain, antiprompts, interactive & instruct modes, and the
timings report."""

from __future__ import annotations

import argparse
import sys


from ..runtime.generate import GenerateParams, generate
from ..runtime.session import (
    load_session, save_session, session_prefix_match,
)
from ..runtime.tokenizer import TOKEN_BOS, TOKEN_EOS
from .common import add_model_args, add_sampling_args, load_model, sampling_from_args


def build_parser(p: argparse.ArgumentParser | None = None):
    p = p or argparse.ArgumentParser("main", description=__doc__)
    add_model_args(p)
    add_sampling_args(p)
    p.add_argument("-p", "--prompt", default="")
    p.add_argument("-f", "--file", default=None, help="prompt file")
    p.add_argument("--n-keep", type=int, default=0,
                   help="tokens kept on context swap (-1 = whole prompt)")
    p.add_argument("--prompt-cache", default=None, dest="path_prompt_cache",
                   help="session file for prompt state reuse")
    p.add_argument("-r", "--reverse-prompt", action="append", default=[],
                   dest="antiprompt")
    p.add_argument("-i", "--interactive", action="store_true")
    p.add_argument("--interactive-first", action="store_true")
    p.add_argument("-ins", "--instruct", action="store_true",
                   help="instruction mode (alpaca framing, main.cpp:244)")
    p.add_argument("--oasst", action="store_true",
                   help="OpenAssistant chat framing with <|prompter|>/"
                        "<|assistant|> tokens (main-oasst.cpp:155-265)")
    p.add_argument("--ondevice-sampling", action="store_true",
                   help="sample on the TPU in chunked device loops "
                        "(temp/top-k/top-p + repetition penalties; "
                        "amortizes host round trips — measured 6x tok/s "
                        "on tunneled devices)")
    p.add_argument("--draft", type=int, default=0, metavar="K",
                   help="speculative decoding: verify K drafted tokens per "
                        "forward (prompt-lookup drafting; exact for greedy, "
                        "unbiased for sampling)")
    p.add_argument("--draft-model", default=None, metavar="PATH",
                   help="small same-vocab model that drafts for --draft "
                        "(default: model-free prompt-lookup drafting)")
    p.add_argument("--color", action="store_true")
    p.add_argument("--multiline-input", action="store_true",
                   dest="multiline_input",
                   help="reverse the `\\` convention: lines continue until "
                        "a trailing `\\` or `/` (common.cpp:285-286)")
    p.add_argument("--in-prefix", default="", dest="input_prefix",
                   help="string prepended to every interactive input "
                        "(main.cpp:599-602)")
    p.add_argument("--in-suffix", default="", dest="input_suffix",
                   help="string appended to every interactive input "
                        "(main.cpp:618-621)")
    p.add_argument("--verbose-prompt", action="store_true")
    return p


def run(args) -> int:
    lm = load_model(args)
    ctx, tok = lm.ctx, lm.tokenizer
    gp = GenerateParams(
        n_predict=args.n_predict,
        n_keep=args.n_keep,
        ignore_eos=args.ignore_eos,
        sampling=sampling_from_args(args),
        seed=args.seed,
    )

    prompt = args.prompt
    if args.file:
        with open(args.file) as f:
            prompt = f.read()
    if args.instruct:
        prompt = f"### Instruction:\n\n{prompt}\n\n### Response:\n\n"

    def frame_oasst(text: str) -> list[int]:
        """<|prompter|>text<|endoftext|><|assistant|> token framing
        (main-oasst.cpp:262-266); falls back to plain text markers when the
        vocab lacks the special tokens."""
        t2i = tok.vocab.token_to_id
        pid = t2i.get(b"<|prompter|>")
        aid = t2i.get(b"<|assistant|>")
        if pid is None or aid is None:
            return tok.tokenize(f"<|prompter|>{text}<|endoftext|><|assistant|>")
        return [pid] + tok.tokenize(text) + [TOKEN_EOS, aid]

    if args.oasst:
        prompt_tokens = frame_oasst(prompt)
    else:
        prompt_tokens = tok.tokenize(prompt, bos=(lm.arch != "rwkv"))
        if not prompt_tokens and lm.arch != "rwkv":
            # empty prompt tokenizes to NOTHING (llama.cpp:1788-1790);
            # generation starts from a bare BOS (main.cpp:345)
            prompt_tokens = [TOKEN_BOS]
    if args.verbose_prompt:
        for t in prompt_tokens:
            print(f"{t:6d} -> '{tok.token_text(t).decode(errors='replace')}'",
                  file=sys.stderr)

    # --prompt-cache: reuse the saved state's common prefix (main.cpp:157-230)
    session_tokens: list[int] = []
    if args.path_prompt_cache:
        import os

        if os.path.exists(args.path_prompt_cache):
            session_tokens = load_session(args.path_prompt_cache, ctx)
            n_match = session_prefix_match(session_tokens, prompt_tokens)
            if n_match == len(prompt_tokens) and n_match > 0:
                # exact match: re-eval the REAL last token for fresh logits
                # (main.cpp:226-229; a duplicate token would shift the first
                # new token's distribution)
                n_match -= 1
            if n_match <= ctx.n_past:
                # rewind to the matched prefix (safe under the kv_mask
                # design: slots >= n_past are invisible until rewritten) —
                # sessions normally include generated tokens, so the saved
                # state is ahead of the prompt and rewinding reuses it all
                ctx.n_past = n_match
            else:
                ctx.reset()
                n_match = 0
            # truncate the session list to the reused prefix (the
            # reference's session_tokens.resize, main.cpp:228): slots past
            # n_match will be overwritten, so keeping the old tokens would
            # desync the saved token list from the KV contents
            session_tokens = session_tokens[:n_match]
            prompt_tokens = prompt_tokens[n_match:]
            print(f"session: reused {n_match} tokens", file=sys.stderr)
        if not prompt_tokens:
            prompt_tokens = [(tok.tokenize(prompt, bos=True)
                              or [TOKEN_BOS])[-1]]

    antiprompts = tuple(tok.tokenize(a) for a in args.antiprompt)

    def emit(token_id: int):
        sys.stdout.buffer.write(tok.token_text(token_id))
        sys.stdout.flush()

    from .console import Color, Console

    console = Console(use_color=args.color and sys.stdout.isatty(),
                      multiline_input=args.multiline_input)

    all_tokens = list(session_tokens) + list(prompt_tokens)
    console.set_color(Color.PROMPT)  # prompt echo (main.cpp:339)
    print(prompt, end="", flush=True)
    console.set_color(Color.DEFAULT)
    device_bias = tuple(sorted(gp.sampling.logit_bias.items()))
    if args.draft > 0:
        from ..runtime.device_sample import DeviceSampling
        from ..runtime.speculative import (
            DraftModelDrafter, SpecParams, SpecStats, generate_speculative,
        )

        stats = SpecStats()
        from ..runtime.context import RwkvContext

        if isinstance(ctx, RwkvContext):
            # recurrent state can't rewind, so the host verify loop doesn't
            # apply; the device chunk gathers the accepted-prefix state
            # from the parallel verify (rwkv_spec_chunk)
            from ..runtime.device_spec import generate_ondevice_spec_rwkv

            if args.draft_model:
                print("warning: --draft-model is not supported for rwkv; "
                      "using prompt-lookup drafting", file=sys.stderr)

            out = generate_ondevice_spec_rwkv(
                ctx, prompt_tokens, args.n_predict,
                sampling=DeviceSampling(
                    temp=args.temp, top_k=args.top_k, top_p=args.top_p,
                    repeat_penalty=args.repeat_penalty,
                    repeat_last_n=args.repeat_last_n,
                    frequency_penalty=args.frequency_penalty,
                    presence_penalty=args.presence_penalty,
                    tfs_z=args.tfs, typical_p=args.typical,
                    logit_bias=device_bias),
                spec=SpecParams(n_draft=args.draft),
                seed=max(0, args.seed), ignore_eos=args.ignore_eos,
                stats=stats,
            )
        elif args.ondevice_sampling and not args.draft_model:
            # whole draft-verify loop on device (runtime/device_spec.py):
            # measured 204 tok/s on 7B q4_0 vs 25 tok/s host-loop
            from ..runtime.device_spec import generate_ondevice_spec

            out = generate_ondevice_spec(
                ctx, prompt_tokens, args.n_predict,
                sampling=DeviceSampling(
                    temp=args.temp, top_k=args.top_k, top_p=args.top_p,
                    repeat_penalty=args.repeat_penalty,
                    repeat_last_n=args.repeat_last_n,
                    frequency_penalty=args.frequency_penalty,
                    presence_penalty=args.presence_penalty,
                    tfs_z=args.tfs, typical_p=args.typical,
                    logit_bias=device_bias),
                spec=SpecParams(n_draft=args.draft),
                seed=max(0, args.seed), ignore_eos=args.ignore_eos,
                stats=stats, n_keep=args.n_keep,
            )
        elif args.ondevice_sampling and args.draft_model:
            # both models inside one device scan
            import copy

            from ..runtime.device_spec import generate_ondevice_spec_draft

            dargs = copy.copy(args)
            dargs.model = args.draft_model
            dargs.lora = None
            out = generate_ondevice_spec_draft(
                ctx, load_model(dargs).ctx, prompt_tokens, args.n_predict,
                sampling=DeviceSampling(
                    temp=args.temp, top_k=args.top_k, top_p=args.top_p,
                    repeat_penalty=args.repeat_penalty,
                    repeat_last_n=args.repeat_last_n,
                    frequency_penalty=args.frequency_penalty,
                    presence_penalty=args.presence_penalty,
                    tfs_z=args.tfs, typical_p=args.typical,
                    logit_bias=device_bias),
                n_draft=args.draft, seed=max(0, args.seed),
                ignore_eos=args.ignore_eos, stats=stats,
            )
        else:
            drafter = None
            if args.draft_model:
                import copy

                dargs = copy.copy(args)
                dargs.model = args.draft_model
                dargs.lora = None
                drafter = DraftModelDrafter(load_model(dargs).ctx)
            out = generate_speculative(
                ctx, prompt_tokens, args.n_predict,
                sampling=DeviceSampling(
                    temp=args.temp, top_k=args.top_k, top_p=args.top_p,
                    repeat_penalty=args.repeat_penalty,
                    repeat_last_n=args.repeat_last_n,
                    frequency_penalty=args.frequency_penalty,
                    presence_penalty=args.presence_penalty,
                    tfs_z=args.tfs, typical_p=args.typical,
                    logit_bias=device_bias),
                spec=SpecParams(n_draft=args.draft), drafter=drafter,
                seed=max(0, args.seed), ignore_eos=args.ignore_eos,
                stats=stats,
            )
        for t in out:
            emit(t)
        print(f"\nspeculative: {stats.tokens_per_step:.2f} tokens/step, "
              f"{100 * stats.acceptance:.0f}% drafts accepted "
              f"({stats.n_accepted}/{stats.n_drafted})", file=sys.stderr)
        print(ctx.timings.report(), file=sys.stderr)
        return 0
    if args.ondevice_sampling:
        from ..runtime.device_sample import DeviceSampling, generate_ondevice

        out = generate_ondevice(
            ctx, prompt_tokens, args.n_predict,
            sampling=DeviceSampling(
                    temp=args.temp, top_k=args.top_k, top_p=args.top_p,
                    repeat_penalty=args.repeat_penalty,
                    repeat_last_n=args.repeat_last_n,
                    frequency_penalty=args.frequency_penalty,
                    presence_penalty=args.presence_penalty,
                    tfs_z=args.tfs, typical_p=args.typical,
                    logit_bias=device_bias),
            seed=max(0, args.seed),
        )
        for t in out:
            emit(t)
        print("\n" + ctx.timings.report(), file=sys.stderr)
        return 0
    interactive = (args.interactive or args.interactive_first
                   or args.instruct or args.oasst)
    try:
        while True:
            for t in generate(ctx, prompt_tokens, gp, antiprompts=antiprompts,
                              eos_token=TOKEN_EOS):
                emit(t)
                all_tokens.append(t)
            if not interactive:
                break
            print("\n> ", end="", flush=True)
            if args.input_prefix:
                print(args.input_prefix, end="", flush=True)
            buffer = console.read_input()
            if buffer is None:  # EOF / Ctrl-D
                break
            # bare Enter passes control back without new tokens — but the
            # reference appends input_prefix BEFORE the length check
            # (main.cpp:599-616), so with --in-prefix set a bare Enter
            # still tokenizes prefix+newline
            text = args.input_prefix + buffer
            if len(text) <= 1:
                prompt_tokens = []
                continue
            if args.input_suffix:
                text += args.input_suffix
                print(args.input_suffix, end="", flush=True)
            if args.instruct:
                text = f"### Instruction:\n\n{text}\n\n### Response:\n\n"
            if args.oasst:
                prompt_tokens = frame_oasst(text)
            else:
                prompt_tokens = tok.tokenize(text)
            all_tokens += prompt_tokens
    except KeyboardInterrupt:
        console.cleanup()
        print(file=sys.stderr)
    console.cleanup()

    if args.path_prompt_cache:
        # a .ggsn path writes the reference's binary session format —
        # the file then loads in the reference binary (and vice versa:
        # load_session auto-detects GGSN by magic)
        save_session(args.path_prompt_cache, ctx, all_tokens,
                     hparams=lm.hparams, ftype=lm.ftype)
        print(f"session: saved to {args.path_prompt_cache}", file=sys.stderr)
    print("\n" + ctx.timings.report(), file=sys.stderr)
    return 0


def main(argv=None) -> int:
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
