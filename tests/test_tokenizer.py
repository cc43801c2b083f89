"""Tokenizer goldens from tests/test-tokenizer-0.cpp against the shipped

reference vocab fixture (models/ggml-vocab.bin, the only model artifact in
the reference repo)."""

import os

import pytest

from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.runtime.tokenizer import Tokenizer, Vocab

VOCAB_BIN = "/root/reference/models/ggml-vocab.bin"

GOLDENS = {
    "Hello World": [1, 10994, 2787],
    " Hello World": [1, 15043, 2787],
    " Hello World!": [1, 15043, 2787, 29991],
    " this is 🦙.cpp": [1, 445, 338, 29871, 243, 162, 169, 156, 29889, 8223],
    "w048 7tuijk dsdfhu": [1, 29893, 29900, 29946, 29947, 29871, 29955, 9161, 13535, 18031, 2176, 6905],
    "нещо на Български": [1, 821, 4851, 665, 1386, 29713, 1305],
}


@pytest.fixture(scope="module")
def tok():
    if not os.path.exists(VOCAB_BIN):
        pytest.skip("reference vocab fixture unavailable")
    gf = read_ggjt(VOCAB_BIN, "llama")
    assert gf.hparams["n_vocab"] == 32000
    return Tokenizer(Vocab.from_ggjt(gf))


@pytest.mark.parametrize("text", list(GOLDENS), ids=lambda s: s[:12])
def test_goldens(tok, text):
    assert tok.tokenize(text, bos=True) == GOLDENS[text]


def test_detokenize_roundtrip(tok):
    ids = tok.tokenize(" this is 🦙.cpp", bos=False)
    assert tok.detokenize(ids).decode("utf-8") == " this is 🦙.cpp"


def test_empty(tok):
    # empty text returns NOTHING, not even BOS — the reference early-returns
    # before the bos push (llama.cpp:1788-1793; fuzz-oracle-confirmed)
    assert tok.tokenize("", bos=True) == []
    assert tok.tokenize("", bos=False) == []
