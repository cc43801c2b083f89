"""Native C++ runtime vs pure-Python parity (native/ggjt_native.cpp).

Both paths must produce byte-identical results — the C++ layer is purely a
host-speed optimization, like ggml's SIMD-vs-scalar split (SURVEY.md §4
test-quantize-fns '--reference vs SIMD impl check')."""

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu import native
from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor
from llama_cpp_q_4_0_tpu.quant.pack import pack_planar
from llama_cpp_q_4_0_tpu.quant.registry import quantize
from llama_cpp_q_4_0_tpu.quant.types import GGMLType

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


@pytest.mark.parametrize("n,k", [(8, 64), (128, 256), (96, 704)])
def test_pack_q4_0_matches_python(n, k):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((n, k)) * 0.3).astype(np.float32)
    blocks = quantize(w, GGMLType.Q4_0)
    ref = QTensor.from_planar(pack_planar(blocks, GGMLType.Q4_0, (n, k)))
    assert ref.packed
    packed, scales = native.pack_q4_0(blocks, n, k)
    np.testing.assert_array_equal(packed, np.asarray(ref.levels_t))
    np.testing.assert_array_equal(scales, np.asarray(ref.gscale_t))


def test_pack_q4_0_multithreaded_deterministic():
    rng = np.random.default_rng(1)
    w = (rng.standard_normal((256, 512)) * 0.3).astype(np.float32)
    blocks = quantize(w, GGMLType.Q4_0)
    a = native.pack_q4_0(blocks, 256, 512, n_threads=1)
    b = native.pack_q4_0(blocks, 256, 512, n_threads=8)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_native_tokenizer_matches_python(tmp_path):
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.runtime.tokenizer import Tokenizer, Vocab

    path = str(tmp_path / "m.bin")
    make_llama_ggjt(path, n_vocab=512, n_embd=64, n_head=4, n_layer=1)
    vocab = Vocab.from_ggjt(read_ggjt(path, "llama"))
    t_py = Tokenizer(vocab, use_native=False)
    t_nat = Tokenizer(vocab, use_native=True)
    assert t_nat._native is not None and t_py._native is None
    cases = [
        "hello world", "", " ", "a", "tok400 tok401", "émojis 🦙🦙 done",
        "tabs\tand\nnewlines", "x" * 500,
        bytes(range(256)).decode("latin-1"),
    ]
    for s in cases:
        py = t_py.tokenize(s, bos=True)
        nat = t_nat.tokenize(s, bos=True)
        assert py == nat, (s[:40], py[:12], nat[:12])
        assert t_py.detokenize(py) == t_py.detokenize(nat)


def test_native_loader_fast_path(tmp_path):
    """load_tensor must produce an identical QTensor through the C++ path."""
    import os

    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import load_tensor

    path = str(tmp_path / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=1,
                    qtype=GGMLType.Q4_0)
    gf = read_ggjt(path, "llama")
    fast = load_tensor(gf, "layers.0.attention.wq.weight")

    os.environ["LLAMA_TPU_NO_NATIVE"] = "1"
    try:
        native._tried, native._lib = False, None
        assert not native.available()
        slow = load_tensor(gf, "layers.0.attention.wq.weight")
    finally:
        del os.environ["LLAMA_TPU_NO_NATIVE"]
        native._tried, native._lib = False, None

    assert fast.packed and slow.packed
    np.testing.assert_array_equal(np.asarray(fast.levels_t),
                                  np.asarray(slow.levels_t))
    np.testing.assert_array_equal(np.asarray(fast.gscale_t),
                                  np.asarray(slow.gscale_t))


def test_native_quantize_q4_0_bit_exact():
    """C++ quantizer must be BYTE-identical to the numpy reference — this
    is the same gate the reference applies to its SIMD quantizers
    (test-quantize-fns 'reference vs SIMD')."""
    from llama_cpp_q_4_0_tpu.quant.blockq import quantize_q4_0

    rng = np.random.default_rng(3)
    for shape in ((4, 64), (33, 11008 // 86 * 32), (128, 4096)):
        w = (rng.standard_normal(shape) * rng.uniform(0.001, 4.0)).astype(np.float32)
        # exercise edge cases: zeros rows, subnormal scales, exact ties
        w[0, :32] = 0.0
        w[1, :32] = 6e-8
        ref = quantize_q4_0(w)
        raw = native.quantize_q4_0(w)
        np.testing.assert_array_equal(
            raw.reshape(shape[0], -1),
            ref.reshape(shape[0], -1).view(np.uint8).reshape(shape[0], -1))
        a = native.quantize_q4_0(w, n_threads=1)
        b = native.quantize_q4_0(w, n_threads=8)
        np.testing.assert_array_equal(a, b)
