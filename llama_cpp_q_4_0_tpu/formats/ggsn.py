"""GGSN v1 session files — byte-level interop with the reference.

The reference persists a generation session as magic 'ggsn' + version +
raw `llama_hparams` + prompt tokens + an opaque state blob
(llama_save_session_file / llama_load_session_file, llama.cpp:3291-3368);
the blob layout is fixed by llama_copy_state_data / llama_set_state_data
(llama.cpp:3085-3289):

    size_t rng_size; char rng[65536]      # std::mt19937 <<-serialization
    size_t logits_cap; size_t logits_size; float[logits_cap]
    size_t emb_size; float[emb_size]
    size_t kv_bytes; int32 kv_ntok
    k: [n_layer, kv_ntok, n_embd]  (f16 by default — ggml kout3d)
    v: [n_layer, n_embd, kv_ntok]  (the reference's transposed V cache)

This module reads and writes that exact layout, so sessions saved by the
reference binary load here and vice versa.  The repo-native zip format
(runtime/session.py) remains the richer default (it also carries sampler
state and per-slot metadata); GGSN is the compatibility surface.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 0x6767736E  # 'ggsn' (llama.h:41)
VERSION = 1  # llama.h:47
MAX_RNG_STATE = 64 * 1024  # llama.cpp:3044
_MB = 1024 * 1024  # ggml buffer slack in kv_self.buf (llama.cpp:69,745)

HPARAM_FIELDS = ("n_vocab", "n_ctx", "n_embd", "n_mult", "n_head",
                 "n_layer", "n_rot", "ftype")


def mt19937_stream(seed: int = 5489) -> str:
    """std::mt19937 state in libstdc++ operator<< form ("x0 .. x623 p"):
    the reference parses the rng blob with `rng_ss >> ctx->rng` and asserts
    success, so our writer must emit a stream that round-trips."""
    s = np.empty(624, np.uint64)
    s[0] = seed & 0xFFFFFFFF
    for i in range(1, 624):
        s[i] = (1812433253 * (s[i - 1] ^ (s[i - 1] >> 30)) + i) & 0xFFFFFFFF
    return " ".join(str(int(x)) for x in s) + " 624"


def pack_hparams(hp: dict, n_ctx: int, ftype: int) -> bytes:
    """Raw `llama_hparams` (8 consecutive u32s, llama.cpp:133-141).  The
    reference memcmp-compares this on load, so n_ctx must be the context
    size the loading process will use."""
    vals = dict(hp)
    vals["n_ctx"] = n_ctx
    vals["ftype"] = ftype
    return struct.pack("<8I", *(vals[f] for f in HPARAM_FIELDS))


def _cache_rows(cache, n: int) -> np.ndarray:
    """First n slots of one layer's [1, S, H, D] cache row as [n, E] f32."""
    from ..ops.kvcache import QuantKV

    if isinstance(cache, QuantKV):
        data = np.asarray(cache.data[0, :n]).astype(np.float32)
        scale = np.asarray(cache.scale[0, :n]).astype(np.float32)
        vals = data * scale[..., None]
    else:
        vals = np.asarray(cache[0, :n]).astype(np.float32)
    return vals.reshape(n, -1)


def save_session_ggsn(path: str, ctx, tokens: list[int], hparams: dict,
                      ftype: int, *, rng_seed: int = 5489,
                      kv_dtype=np.float16) -> None:
    """Write ctx (batch-1 Context) as a reference-loadable GGSN v1 file.

    hparams: the model file's header dict (GGJTFile.hparams — llama arch);
    the session's n_ctx field is ctx.n_ctx, so load the file from a
    reference context created with the same -c."""
    assert ctx.batch == 1, "GGSN sessions are single-stream"
    cfg = ctx.cfg
    missing = [f for f in HPARAM_FIELDS
               if f not in hparams and f not in ("n_ctx", "ftype")]
    if missing:
        raise ValueError(
            f"GGSN sessions are llama-architecture only (the raw "
            f"llama_hparams block needs {missing}; {cfg.arch} model "
            f"headers do not carry them) — use the native zip format")
    ntok = ctx.n_past
    e, L, s = cfg.n_embd, cfg.n_layer, ctx.n_ctx
    elt = np.dtype(kv_dtype).itemsize

    rng = mt19937_stream(rng_seed).encode()
    assert len(rng) < MAX_RNG_STATE
    logits = (np.zeros((cfg.n_vocab,), np.float32)
              if ctx.logits is None
              else np.asarray(ctx.logits)[0, -1].astype(np.float32))

    with open(path, "wb") as f:
        f.write(struct.pack("<II", MAGIC, VERSION))
        f.write(pack_hparams(hparams, s, ftype))
        f.write(struct.pack("<I", len(tokens)))
        f.write(np.asarray(tokens, np.int32).tobytes())
        # --- state blob (llama_copy_state_data layout) ---
        f.write(struct.pack("<Q", len(rng)))
        f.write(rng.ljust(MAX_RNG_STATE, b"\0"))
        f.write(struct.pack("<QQ", cfg.n_vocab, cfg.n_vocab))
        f.write(logits.tobytes())
        f.write(struct.pack("<Q", 0))  # embedding_size (not requested)
        kv_bytes = 2 * L * s * e * elt + 2 * _MB
        f.write(struct.pack("<Qi", kv_bytes, ntok))
        if ntok:
            k = np.stack([_cache_rows(ctx.cache_k[l], ntok)
                          for l in range(L)])  # [L, ntok, E]
            v = np.stack([_cache_rows(ctx.cache_v[l], ntok).T
                          for l in range(L)])  # [L, E, ntok]
            f.write(k.astype(kv_dtype).tobytes())
            f.write(v.astype(kv_dtype).tobytes())


def load_session_ggsn(path: str, ctx) -> list[int]:
    """Load a GGSN v1 file (reference- or self-written) into ctx: restores
    the KV cache, n_past and last logits; returns the token history.
    The KV element size (f16 by default, f32 under the reference's
    --memory-f32) is inferred from the recorded kv_self buffer size.
    Raises ValueError on magic/version/hparams-shape mismatch (the
    reference prints and returns false, llama.cpp:3299-3310)."""
    import jax.numpy as jnp

    from ..ops.kvcache import QuantKV, quantize_kv

    cfg = ctx.cfg
    with open(path, "rb") as f:
        magic, version = struct.unpack("<II", f.read(8))
        if magic != MAGIC or version != VERSION:
            raise ValueError(f"not a GGSN v1 session: {magic:08x} v{version}")
        hp = dict(zip(HPARAM_FIELDS, struct.unpack("<8I", f.read(32))))
        if (hp["n_vocab"], hp["n_embd"], hp["n_layer"]) != (
                cfg.n_vocab, cfg.n_embd, cfg.n_layer):
            raise ValueError(f"session hparams mismatch: {hp}")
        if hp["n_ctx"] != ctx.n_ctx:
            raise ValueError(
                f"session n_ctx {hp['n_ctx']} != context {ctx.n_ctx}")
        (n_tok,) = struct.unpack("<I", f.read(4))
        tokens = np.frombuffer(f.read(4 * n_tok), np.int32).tolist()
        # --- state blob ---
        struct.unpack("<Q", f.read(8))  # rng_size
        f.read(MAX_RNG_STATE)  # mt19937 text; our sampler rng is numpy
        logits_cap, logits_size = struct.unpack("<QQ", f.read(16))
        logits = np.frombuffer(f.read(4 * logits_size), np.float32)
        f.read(4 * (logits_cap - logits_size))
        (emb_size,) = struct.unpack("<Q", f.read(8))
        f.read(4 * emb_size)
        kv_bytes, ntok = struct.unpack("<Qi", f.read(12))
        e, L, s = cfg.n_embd, cfg.n_layer, ctx.n_ctx
        if ntok:
            # kv_bytes records kv_self.buf.size = 2*L*s*e*elt + 2 MB
            # (llama.cpp:745) — recover the element size instead of
            # assuming f16 (the reference's --memory-f32 writes f32)
            elt = (kv_bytes - 2 * _MB) // (2 * L * s * e)
            if elt not in (2, 4):
                raise ValueError(f"unrecognized KV element size {elt} "
                                 f"(kv_bytes={kv_bytes})")
            kv_dtype = np.float16 if elt == 2 else np.float32
            k = np.frombuffer(f.read(L * ntok * e * elt), kv_dtype)
            v = np.frombuffer(f.read(L * ntok * e * elt), kv_dtype)
            k = k.astype(np.float32).reshape(L, ntok, e)
            v = v.astype(np.float32).reshape(L, e, ntok)

    hd = cfg.head_dim

    def put(cache, rows):
        rows = rows.reshape(1, -1, cfg.kv_heads, hd)
        if isinstance(cache, QuantKV):
            q, sc = quantize_kv(jnp.asarray(rows))
            return QuantKV(cache.data.at[:1, :rows.shape[1]].set(q),
                           cache.scale.at[:1, :rows.shape[1]].set(sc))
        return cache.at[:1, :rows.shape[1]].set(
            jnp.asarray(rows, cache.dtype))

    if ntok:
        ctx.cache_k = tuple(put(ctx.cache_k[l], k[l])
                            for l in range(cfg.n_layer))
        ctx.cache_v = tuple(put(ctx.cache_v[l], v[l].T.copy())
                            for l in range(cfg.n_layer))
    ctx.n_past = int(ntok)
    if logits_size:
        ctx._logits = logits.reshape(1, 1, -1).copy()
    return tokens


def is_ggsn(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return struct.unpack("<I", f.read(4))[0] == MAGIC
    except (OSError, struct.error):
        return False
