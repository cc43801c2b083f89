"""Sampling-chain oracle: our samplers vs the COMPILED reference functions.

The reference ships distribution goldens (tests/test-sampling.cpp) that it
checks to 1e-5 against hand-computed arrays; this gate is stronger — it
calls the actual `llama_sample_*` implementations (llama.cpp:1804-2209,
compiled into a shared library; they all accept a NULL context) on random
candidate arrays through ctypes and requires our runtime/sampling.py to
agree on the surviving candidate IDs, their order, logits, and
probabilities.  Covers the deterministic transforms — softmax, top-k,
top-p, tail-free, typical, temperature, repetition/frequency/presence
penalties, greedy — and the main.cpp chain composition.  (RNG-consuming
samplers are gated separately by distribution property tests; the
reference draws from a C++ mt19937 discrete_distribution whose stream our
numpy sampler intentionally does not replicate.)
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.runtime import sampling as S

REF = "/root/reference"
BUILD = "/tmp/refbuild"
LIB = f"{BUILD}/libllama_ref.so"


class TokenData(ctypes.Structure):
    _fields_ = [("id", ctypes.c_int32), ("logit", ctypes.c_float),
                ("p", ctypes.c_float)]


class TokenDataArray(ctypes.Structure):
    _fields_ = [("data", ctypes.POINTER(TokenData)),
                ("size", ctypes.c_size_t), ("sorted", ctypes.c_bool)]


@pytest.fixture(scope="module")
def reflib():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    if not os.path.exists(LIB):
        os.makedirs(BUILD, exist_ok=True)
        flags = ["-O2", "-fPIC", "-pthread", "-DGGML_USE_K_QUANTS", f"-I{REF}"]
        try:
            for cf in ("ggml.c", "k_quants.c"):
                obj = f"{BUILD}/{cf.replace('.c', '.o')}"
                if not os.path.exists(obj):
                    subprocess.run(["gcc", *flags, "-c", f"{REF}/{cf}",
                                    "-o", obj], check=True,
                                   capture_output=True, text=True)
            subprocess.run(
                ["g++", "-std=c++11", "-shared", *flags, f"{REF}/llama.cpp",
                 f"{BUILD}/ggml.o", f"{BUILD}/k_quants.o", "-o", LIB],
                check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build sampling oracle: "
                        f"{getattr(e, 'stderr', '')[-500:]}")
    lib = ctypes.CDLL(LIB)
    arrp = ctypes.POINTER(TokenDataArray)
    lib.llama_sample_softmax.argtypes = [ctypes.c_void_p, arrp]
    lib.llama_sample_top_k.argtypes = [ctypes.c_void_p, arrp, ctypes.c_int,
                                       ctypes.c_size_t]
    lib.llama_sample_top_p.argtypes = [ctypes.c_void_p, arrp, ctypes.c_float,
                                       ctypes.c_size_t]
    lib.llama_sample_tail_free.argtypes = [ctypes.c_void_p, arrp,
                                           ctypes.c_float, ctypes.c_size_t]
    lib.llama_sample_typical.argtypes = [ctypes.c_void_p, arrp,
                                         ctypes.c_float, ctypes.c_size_t]
    lib.llama_sample_temperature.argtypes = [ctypes.c_void_p, arrp,
                                             ctypes.c_float]
    lib.llama_sample_repetition_penalty.argtypes = [
        ctypes.c_void_p, arrp, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_size_t, ctypes.c_float]
    lib.llama_sample_frequency_and_presence_penalties.argtypes = [
        ctypes.c_void_p, arrp, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_size_t, ctypes.c_float, ctypes.c_float]
    lib.llama_sample_token_greedy.argtypes = [ctypes.c_void_p, arrp]
    lib.llama_sample_token_greedy.restype = ctypes.c_int32
    return lib


class RefCandidates:
    """A llama_token_data_array mirroring a Candidates' current content."""

    def __init__(self, c: S.Candidates):
        n = c.size
        self.buf = (TokenData * n)()
        for i in range(n):
            self.buf[i].id = int(c.ids[i])
            self.buf[i].logit = float(c.logits[i])
            self.buf[i].p = float(c.p[i]) if c.p is not None else 0.0
        self.arr = TokenDataArray(ctypes.cast(self.buf,
                                              ctypes.POINTER(TokenData)),
                                  n, c.sorted)

    @property
    def ptr(self):
        return ctypes.byref(self.arr)

    def snapshot(self):
        n = self.arr.size
        ids = np.asarray([self.arr.data[i].id for i in range(n)], np.int32)
        logits = np.asarray([self.arr.data[i].logit for i in range(n)],
                            np.float32)
        p = np.asarray([self.arr.data[i].p for i in range(n)], np.float32)
        return ids, logits, p


def _fresh(rng, n=160):
    """Random tie-free logits (ties would expose std::sort instability that
    is unspecified even between reference builds)."""
    logits = rng.standard_normal(n).astype(np.float32) * 3.0
    return S.Candidates.from_logits(logits)


def _check(lib, apply_ref, apply_ours, rng, with_p=True, n=160):
    ours = _fresh(rng, n)
    ref = RefCandidates(ours)
    apply_ref(ref)
    apply_ours(ours)
    ids, logits, p = ref.snapshot()
    assert ours.size == len(ids)
    np.testing.assert_array_equal(ours.ids, ids)
    np.testing.assert_allclose(ours.logits, logits, rtol=1e-6, atol=1e-6)
    if with_p and ours.p is not None:
        np.testing.assert_allclose(ours.p, p, rtol=2e-5, atol=2e-7)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_softmax(reflib, seed):
    rng = np.random.default_rng(seed)
    _check(reflib, lambda r: reflib.llama_sample_softmax(None, r.ptr),
           S.sample_softmax, rng)


@pytest.mark.parametrize("k,min_keep", [(40, 1), (1, 1), (5, 8), (0, 3),
                                        (1000, 1)])
def test_top_k(reflib, k, min_keep):
    rng = np.random.default_rng(k * 7 + min_keep)
    _check(reflib,
           lambda r: reflib.llama_sample_top_k(None, r.ptr, k, min_keep),
           lambda c: S.sample_top_k(c, k, min_keep), rng, with_p=False)


@pytest.mark.parametrize("p", [0.1, 0.5, 0.9, 0.99, 1.0])
def test_top_p(reflib, p):
    rng = np.random.default_rng(int(p * 100))
    _check(reflib,
           lambda r: reflib.llama_sample_top_p(None, r.ptr, p, 1),
           lambda c: S.sample_top_p(c, p, 1), rng)


def test_tail_free_reference_is_noop_discovery(reflib):
    """REFERENCE-BUG DISCOVERY (pinned): llama_sample_tail_free computes
    `abs(second_derivatives[i])` with UNQUALIFIED abs on floats
    (llama.cpp:1869-1871).  Under g++/libstdc++ that resolves to the
    integer abs(int) — every |p|<1 second derivative truncates to 0, the
    normalization divides 0/0 into NaNs, `NaN > z` is false, and the
    truncation never fires: the compiled reference's tail-free sampling is
    a silent NO-OP on this platform (verified: abs(-0.37f) == 0 under the
    same include set).  Our sample_tail_free implements the intended
    float semantics (Bricken's TFS as documented by the API), so the two
    legitimately diverge — this test pins the reference's broken behavior
    so the divergence stays explained."""
    rng = np.random.default_rng(5)
    for z in (0.2, 0.5, 0.95):
        ours = _fresh(rng, 160)
        ref = RefCandidates(ours)
        reflib.llama_sample_tail_free(None, ref.ptr, z, 1)
        assert ref.arr.size == 160  # reference: no truncation ever
        S.sample_tail_free(ours, z, 1)
        assert ours.size < 160  # ours: real tail-free truncation


def test_tail_free_z1_noop_both(reflib):
    rng = np.random.default_rng(105)
    _check(reflib,
           lambda r: reflib.llama_sample_tail_free(None, r.ptr, 1.0, 1),
           lambda c: S.sample_tail_free(c, 1.0, 1), rng)


@pytest.mark.parametrize("p", [0.2, 0.5, 0.9, 1.0])
def test_typical(reflib, p):
    rng = np.random.default_rng(int(p * 100) + 9)
    _check(reflib,
           lambda r: reflib.llama_sample_typical(None, r.ptr, p, 1),
           lambda c: S.sample_typical(c, p, 1), rng)


@pytest.mark.parametrize("temp", [0.1, 0.7, 1.0, 2.5])
def test_temperature(reflib, temp):
    rng = np.random.default_rng(int(temp * 10) + 3)
    _check(reflib,
           lambda r: reflib.llama_sample_temperature(None, r.ptr, temp),
           lambda c: S.sample_temperature(c, temp), rng, with_p=False)


@pytest.mark.parametrize("penalty", [1.1, 1.3, 0.8])
def test_repetition_penalty(reflib, penalty):
    rng = np.random.default_rng(int(penalty * 10))
    last = rng.integers(0, 160, 24).astype(np.int32)
    lastc = (ctypes.c_int32 * len(last))(*last.tolist())
    _check(reflib,
           lambda r: reflib.llama_sample_repetition_penalty(
               None, r.ptr, lastc, len(last), penalty),
           lambda c: S.sample_repetition_penalty(c, last.tolist(), penalty),
           rng, with_p=False)


@pytest.mark.parametrize("af,ap", [(0.5, 0.0), (0.0, 0.7), (0.3, 0.4)])
def test_frequency_presence(reflib, af, ap):
    rng = np.random.default_rng(int(af * 10) + int(ap * 100))
    last = rng.integers(0, 160, 40).astype(np.int32)
    lastc = (ctypes.c_int32 * len(last))(*last.tolist())
    _check(reflib,
           lambda r: reflib.llama_sample_frequency_and_presence_penalties(
               None, r.ptr, lastc, len(last), af, ap),
           lambda c: S.sample_frequency_and_presence_penalties(
               c, last.tolist(), af, ap), rng, with_p=False)


@pytest.mark.parametrize("seed", [0, 4])
def test_greedy_chain(reflib, seed):
    """The main.cpp greedy path with penalties, composed end-to-end: both
    sides must pick the same token id."""
    rng = np.random.default_rng(seed)
    ours = _fresh(rng, 320)
    last = rng.integers(0, 320, 64).astype(np.int32)
    lastc = (ctypes.c_int32 * len(last))(*last.tolist())

    ref = RefCandidates(ours)
    reflib.llama_sample_repetition_penalty(None, ref.ptr, lastc, len(last),
                                           1.2)
    reflib.llama_sample_frequency_and_presence_penalties(
        None, ref.ptr, lastc, len(last), 0.25, 0.4)
    want = reflib.llama_sample_token_greedy(None, ref.ptr)

    S.sample_repetition_penalty(ours, last.tolist(), 1.2)
    S.sample_frequency_and_presence_penalties(ours, last.tolist(), 0.25, 0.4)
    got = S.sample_token_greedy(ours)
    assert got == want
