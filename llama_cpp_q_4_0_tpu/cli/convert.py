"""`convert` — local HF checkpoint dir -> ggjt model file (convert.py and
scripts/*/convert-*-to-ggml.py)."""

from __future__ import annotations

import argparse

from ..formats.convert_hf import CONVERTERS, detect_hf_arch


def build_parser(p: argparse.ArgumentParser | None = None):
    p = p or argparse.ArgumentParser("convert", description=__doc__)
    p.add_argument("model_dir", help="local HF checkpoint directory")
    p.add_argument("out", help="output ggjt path")
    p.add_argument("--arch", default=None,
                   help="llama|gptneox|falcon|rwkv|bonsai (default: detect "
                        "from config.json model_type)")
    p.add_argument("--outtype", choices=("f16", "f32"), default="f16")
    return p


def run(args) -> int:
    arch = args.arch or detect_hf_arch(args.model_dir)
    CONVERTERS[arch](args.model_dir, args.out, f16=(args.outtype == "f16"))
    print(f"wrote {args.out} ({arch}, {args.outtype})")
    return 0


def main(argv=None) -> int:
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
