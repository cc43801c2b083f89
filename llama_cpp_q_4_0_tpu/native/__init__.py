"""ctypes bindings + lazy build for the native C++ host runtime.

The reference's host runtime is C++ (loader llama.cpp:391-700, tokenizer
llama.cpp:1655-1802); ours keeps the hot host paths native too:
  - gt_pack_q4_0: multithreaded block_q4_0 -> planar split-half repack
    (the load-time transpose that feeds the Pallas kernel layout)
  - gt_tokenize: bigram tokenizer (identical semantics to
    runtime/tokenizer.py, which stays as the pure-python fallback)

The shared library builds on first use with g++ (cached in build/); every
entry point degrades to the Python implementation when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ggjt_native.cpp")
_SO = os.path.join(_DIR, "build", "libggjt_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off",
           "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        print(f"native build failed:\n{res.stderr[:2000]}", file=sys.stderr)
        return False
    return True


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LLAMA_TPU_NO_NATIVE"):
            return None
        stale = (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.gt_pack_q4_0.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.gt_pack_q4_0.restype = None
        lib.gt_quantize_q4_0.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.gt_quantize_q4_0.restype = None
        lib.gt_vocab_create.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.gt_vocab_create.restype = ctypes.c_void_p
        lib.gt_vocab_free.argtypes = [ctypes.c_void_p]
        lib.gt_tokenize.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.gt_tokenize.restype = ctypes.c_int32
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def pack_q4_0(blocks_raw: np.ndarray, n: int, k: int,
              n_threads: int = 0) -> tuple[np.ndarray, np.ndarray] | None:
    """block_q4_0 bytes [N*(K/32)*18] -> (packed uint8 [K2P, N],
    scales f32 [2, K2P/32, N]) in QTensor packed layout; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    assert k % 64 == 0, f"k={k}: half-panels must hold whole 32-groups"
    blocks_raw = np.ascontiguousarray(blocks_raw).view(np.uint8).reshape(-1)
    assert blocks_raw.size == n * (k // 32) * 18, (blocks_raw.size, n, k)
    k2p = -(-(k // 2) // 256) * 256
    packed = np.zeros((k2p, n), np.uint8)
    scales = np.zeros((2, k2p // 32, n), np.float32)
    lib.gt_pack_q4_0(
        blocks_raw.ctypes.data, n, k, k2p,
        packed.ctypes.data, scales.ctypes.data, n_threads,
    )
    return packed, scales


def quantize_q4_0(x: np.ndarray, n_threads: int = 0) -> np.ndarray | None:
    """f32 [N, K] -> raw block_q4_0 bytes [N, K/32, 18]; None if no lib.
    Bit-exact with quant.blockq.quantize_q4_0 (tested)."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n, k = x.shape
    assert k % 32 == 0, k
    out = np.empty((n, k // 32, 18), np.uint8)
    lib.gt_quantize_q4_0(x.ctypes.data, n, k, out.ctypes.data, n_threads)
    return out


class NativeVocab:
    """Tokenizer vocab handle for gt_tokenize."""

    def __init__(self, tokens: list[bytes], scores: list[float]):
        lib = get_lib()
        assert lib is not None
        self._lib = lib
        blob = b"".join(tokens)
        offsets = np.zeros(len(tokens) + 1, np.int64)
        np.cumsum([len(t) for t in tokens], out=offsets[1:])
        self._blob = np.frombuffer(blob, np.uint8).copy() if blob else \
            np.zeros(1, np.uint8)
        self._offsets = offsets
        self._scores = np.asarray(scores, np.float32)
        self._handle = lib.gt_vocab_create(
            self._blob.ctypes.data, offsets.ctypes.data,
            self._scores.ctypes.data, len(tokens),
        )

    def tokenize(self, text: bytes, bos: bool) -> list[int]:
        cap = len(text) + 8
        out = np.empty(cap, np.int32)
        n = self._lib.gt_tokenize(
            self._handle, text, len(text), 1 if bos else 0,
            out.ctypes.data, cap,
        )
        assert n >= 0, "tokenize output overflow"
        return out[:n].tolist()

    def __del__(self):
        try:
            self._lib.gt_vocab_free(self._handle)
        except Exception:
            pass
