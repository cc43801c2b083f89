"""Tokenizer fuzz gate against the compiled reference.

The bigram tokenizer is a compatibility contract (llama.cpp:1655-1802):
every token id feeding the models must match what the reference would
produce.  The shipped goldens cover 6 strings; this fuzzes a few hundred
adversarial cases (UTF-8 boundaries, byte-fallback, space runs, repeated
merges, truncated multibyte sequences) through the actual reference
tokenizer compiled from /root/reference (tests/oracle/ref_tokenize.cpp)
and requires ID-exact agreement from BOTH our implementations — the pure
Python one and the native C++ gt_tokenize."""

import os
import struct
import subprocess

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.runtime.tokenizer import Tokenizer, Vocab

REF = "/root/reference"
VOCAB_BIN = f"{REF}/models/ggml-vocab.bin"
BUILD = "/tmp/refbuild"
TOK_ORACLE = f"{BUILD}/ref_tokenize"


@pytest.fixture(scope="module")
def tok_oracle_bin():
    if not os.path.exists(VOCAB_BIN):
        pytest.skip("reference vocab fixture unavailable")
    if not os.path.exists(TOK_ORACLE):
        os.makedirs(BUILD, exist_ok=True)
        src = os.path.join(os.path.dirname(__file__), "oracle",
                           "ref_tokenize.cpp")
        flags = ["-O2", "-fPIC", "-pthread", "-DGGML_USE_K_QUANTS", f"-I{REF}"]
        try:
            for cf in ("ggml.c", "k_quants.c"):
                obj = f"{BUILD}/{cf.replace('.c', '.o')}"
                if not os.path.exists(obj):
                    subprocess.run(["gcc", *flags, "-c", f"{REF}/{cf}",
                                    "-o", obj], check=True,
                                   capture_output=True, text=True)
            subprocess.run(
                ["g++", "-std=c++11", *flags, src, f"{REF}/llama.cpp",
                 f"{BUILD}/ggml.o", f"{BUILD}/k_quants.o", "-o", TOK_ORACLE],
                check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build tokenize oracle: "
                        f"{getattr(e, 'stderr', '')[-500:]}")
    return TOK_ORACLE


def _corpus() -> list[bytes]:
    """Deterministic adversarial byte strings (NUL-free: the reference API
    takes a C string)."""
    rng = np.random.default_rng(42)
    words = [b"Hello", b"World", b"the", b"tokenizer", b"llama", b"a", b"I",
             b"don't", b"can't", b"123", b"3.14159", b"x86_64", b"--flag",
             b"CamelCaseWord", b"snake_case_name", b"http://a.b/c?d=e"]
    uni = ["é", "ß", "ñ", "Б", "ъ", "лгар", "ски", "中", "文", "日本語",
           "🦙", "👍🏽", "€", "…", "—", " ", " "]
    cases: list[bytes] = [
        b"", b" ", b"  ", b"   leading", b"trailing   ", b"\n", b"\t",
        b"\r\n", b"a\nb", " this is \U0001f999.cpp".encode(),
        b"!@#$%^&*()_+-=[]{}|;':\",./<>?", b"aaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        (b"ab" * 50), b"\xf0\x9f\xa6",  # truncated emoji (byte fallback)
        b"\xc3", b"\xe4\xb8", b"\xff\xfe\xfd",  # invalid UTF-8 tails
        "нещо на Български".encode(),
        "a b c".encode(),
    ]
    for _ in range(120):
        n = int(rng.integers(1, 8))
        parts = []
        for _ in range(n):
            kind = int(rng.integers(0, 4))
            if kind == 0:
                parts.append(words[int(rng.integers(len(words)))])
            elif kind == 1:
                parts.append(uni[int(rng.integers(len(uni)))].encode())
            elif kind == 2:
                parts.append(bytes(rng.integers(33, 127, int(rng.integers(1, 10))).astype(np.uint8)))
            else:
                parts.append(b" " * int(rng.integers(1, 4)))
        sep = b" " if rng.random() < 0.5 else b""
        cases.append(sep.join(parts))
    for _ in range(40):  # raw high-byte soup: pure byte-fallback stress
        n = int(rng.integers(1, 12))
        raw = bytes(b for b in rng.integers(1, 256, n).astype(np.uint8))
        cases.append(raw)
    return cases


def _ref_tokenize_batch(oracle, cases, bos_flags, tmp_path):
    blob = struct.pack("<I", len(cases))
    for c, bos in zip(cases, bos_flags):
        blob += struct.pack("<IB", len(c), 1 if bos else 0) + c
    inp = tmp_path / "cases.bin"
    out = tmp_path / "out.txt"
    inp.write_bytes(blob)
    subprocess.run([oracle, VOCAB_BIN, str(inp), str(out)],
                   check=True, capture_output=True, text=True)
    lines = out.read_text().split("\n")[: len(cases)]
    return [[int(x) for x in ln.split()] if ln else [] for ln in lines]


def test_tokenizer_fuzz_matches_reference(tok_oracle_bin, tmp_path):
    vocab = Vocab.from_ggjt(read_ggjt(VOCAB_BIN, "llama"))
    py = Tokenizer(vocab, use_native=False)
    nat = Tokenizer(vocab)  # native gt_tokenize when buildable

    cases = _corpus()
    bos_flags = [i % 2 == 0 for i in range(len(cases))]
    want = _ref_tokenize_batch(tok_oracle_bin, cases, bos_flags, tmp_path)

    for c, bos, ref_ids in zip(cases, bos_flags, want):
        got_py = py.tokenize(c, bos=bos)
        assert got_py == ref_ids, (c, bos, got_py, ref_ids)
        got_nat = nat.tokenize(c, bos=bos)
        assert got_nat == ref_ids, ("native", c, bos, got_nat, ref_ids)


def test_detokenize_concat_matches_vocab(tok_oracle_bin, tmp_path):
    """Reference detokenization is plain token-string concatenation
    (llama_token_to_str); ours must reproduce the exact byte stream."""
    vocab = Vocab.from_ggjt(read_ggjt(VOCAB_BIN, "llama"))
    py = Tokenizer(vocab, use_native=False)
    for c in _corpus()[:40]:
        ids = py.tokenize(c, bos=False)
        want = b"".join(vocab.id_to_text(i) for i in ids)
        assert py.detokenize(ids) == want
