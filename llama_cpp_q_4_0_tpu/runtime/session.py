"""Context state snapshot / session files / KV-cache shift.

TPU-native parity with the reference's three checkpoint mechanisms
(SURVEY.md §5):

  - raw state blob: llama_get_state_size / llama_copy_state_data /
    llama_set_state_data (llama.cpp:3054-3289) -> get_state / set_state
    dicts + to_bytes/from_bytes
  - session files: GGSN v1 magic, token list + state blob
    (llama_{load,save}_session_file, llama.cpp:3291-3368) -> save_session /
    load_session (zip of meta.json + arrays.npz, magic kept for greppability)
  - O(1) KV shift: llama_shift_kv_cache (llama.cpp:3016-3042).  The
    reference memmoves K rows, which silently breaks RoPE'd llama caches
    (only the NeoX-family rope-after-cache trick survives it).  Here the
    moved K slice is *re-rotated* by -n_discard positions — rotation
    composition makes the shift exact for every family.
"""

from __future__ import annotations

import io
import json
import zipfile
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..ops.layers import rope
from .context import Context

SESSION_MAGIC = "ggsn"
SESSION_VERSION = 1


def _rng_state_to_json(state) -> str:
    """numpy bit-generator state -> JSON (plain dict of ints/str/arrays).
    No pickle anywhere: session files may come from untrusted sources."""
    def enc(o):
        if isinstance(o, np.ndarray):
            return {"__ndarray__": o.tolist(), "dtype": str(o.dtype)}
        if isinstance(o, np.integer):
            return int(o)
        raise TypeError(f"unserializable rng state field {type(o)}")

    return json.dumps(state, default=enc)


def _rng_state_from_json(s: str):
    def hook(d):
        if "__ndarray__" in d:
            return np.asarray(d["__ndarray__"], dtype=d["dtype"])
        return d

    return json.loads(s, object_hook=hook)


# ---------------------------------------------------------------- state blob

def get_state(ctx) -> dict:
    """Snapshot everything needed to resume decoding (the
    llama_copy_state_data payload: kv k/v + n_past + logits; RNG is the
    sampler's and is passed separately if needed)."""
    state = {"n_past": ctx.n_past}
    if hasattr(ctx, "cache_k"):
        # bf16 upcast to f32: lossless, and npz has no bfloat16 support.
        # QuantKV caches store levels + scales verbatim (lossless, 1/4 the
        # blob size).
        from ..models.transformer import QuantKV

        for i, (k, v) in enumerate(zip(ctx.cache_k, ctx.cache_v)):
            for name, c in ((f"k{i}", k), (f"v{i}", v)):
                if isinstance(c, QuantKV):
                    state[name] = np.asarray(c.data)
                    state[name + "_s"] = np.asarray(c.scale)
                else:
                    state[name] = np.asarray(c.astype(jnp.float32))
    else:  # recurrent (rwkv)
        for name, arr in ctx.get_state().items():
            state["s_" + name] = np.asarray(arr)
    if ctx.logits is not None:
        state["logits"] = np.asarray(ctx.logits)
    return state


def set_state(ctx, state: dict) -> None:
    ctx.n_past = int(state["n_past"])
    if hasattr(ctx, "cache_k"):
        from ..models.transformer import QuantKV, quantize_kv

        def restore(name, cur):
            saved_q = name + "_s" in state
            if isinstance(cur, QuantKV):
                if saved_q:
                    return QuantKV(jnp.asarray(state[name], jnp.int8),
                                   jnp.asarray(state[name + "_s"], jnp.float32))
                q, sc = quantize_kv(jnp.asarray(state[name], jnp.float32))
                return QuantKV(q, sc)
            if saved_q:  # q8 blob into a float cache: dequantize
                deq = (jnp.asarray(state[name], jnp.float32)
                       * jnp.asarray(state[name + "_s"])[..., None])
                return deq.astype(cur.dtype)
            return jnp.asarray(state[name], cur.dtype)

        n_layer = len(ctx.cache_k)
        ctx.cache_k = tuple(restore(f"k{i}", ctx.cache_k[i])
                            for i in range(n_layer))
        ctx.cache_v = tuple(restore(f"v{i}", ctx.cache_v[i])
                            for i in range(n_layer))
    else:
        ctx.set_state({k[2:]: v for k, v in state.items() if k.startswith("s_")})
    if "logits" in state:
        ctx._logits = state["logits"]


def state_to_bytes(state: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in state.items()})
    return buf.getvalue()


def state_from_bytes(data: bytes) -> dict:
    arrs = dict(np.load(io.BytesIO(data)))
    return {k: (int(v) if v.ndim == 0 else v) for k, v in arrs.items()}


def get_state_size(ctx) -> int:
    """llama_get_state_size analogue (upper bound, llama.h:289)."""
    return len(state_to_bytes(get_state(ctx)))


# ------------------------------------------------------------- session files

def save_session(path: str, ctx, tokens: list[int], *, rng=None,
                 hparams: dict | None = None, ftype: int = 0) -> None:
    """Token list + full state (main.cpp --prompt-cache, llama.cpp:3330).

    A path ending in .ggsn writes the reference's binary GGSN v1 format
    instead (formats/ggsn.py; needs the model file's hparams dict) — the
    file then loads in the reference binary."""
    if path.endswith(".ggsn"):
        from ..formats.ggsn import save_session_ggsn

        if hparams is None:
            raise ValueError("GGSN save needs the model hparams "
                             "(GGJTFile.hparams)")
        save_session_ggsn(path, ctx, tokens, hparams, ftype)
        return
    meta = {
        "magic": SESSION_MAGIC,
        "version": SESSION_VERSION,
        "tokens": [int(t) for t in tokens],
        "has_rng": rng is not None,
    }
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("meta.json", json.dumps(meta))
        z.writestr("state.npz", state_to_bytes(get_state(ctx)))
        if rng is not None:
            z.writestr("rng.json", _rng_state_to_json(rng.bit_generator.state))


def load_session(path: str, ctx, *, rng=None) -> list[int]:
    """Restores ctx state, returns the session's token list.  GGSN v1
    files (written by the reference binary or by our .ggsn save) are
    auto-detected by magic."""
    from ..formats.ggsn import is_ggsn, load_session_ggsn

    if is_ggsn(path):
        return load_session_ggsn(path, ctx)
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("magic") != SESSION_MAGIC:
            raise ValueError(f"bad session magic in {path}")
        if meta.get("version") != SESSION_VERSION:
            raise ValueError(f"unsupported session version {meta.get('version')}")
        set_state(ctx, state_from_bytes(z.read("state.npz")))
        if rng is not None and meta.get("has_rng"):
            rng.bit_generator.state = _rng_state_from_json(
                z.read("rng.json").decode())
    return list(meta["tokens"])


def session_prefix_match(session_tokens: list[int], prompt: list[int]) -> int:
    """Longest reusable prefix (main.cpp:191-230 session prefix logic)."""
    n = 0
    for a, b in zip(session_tokens, prompt):
        if a != b:
            break
        n += 1
    return n


# ----------------------------------------------------------------- KV shift

@partial(jax.jit, static_argnames=("cfg", "n_keep", "n_discard"))
def _shift_kv(cfg: ModelConfig, cache_k, cache_v, n_keep: int,
              n_discard: int):
    from ..models.transformer import QuantKV, quantize_kv

    s = cache_k[0].shape[1]
    idx = jnp.arange(s)
    src = jnp.where(idx >= n_keep, idx + n_discard, idx)  # gather source
    src = jnp.minimum(src, s - 1)
    delta = jnp.full((s,), -n_discard, jnp.int32)
    new_k, new_v = [], []
    for k, v in zip(cache_k, cache_v):
        is_q = isinstance(k, QuantKV)
        kf = (jnp.take(k.data, src, axis=1).astype(jnp.float32)
              * jnp.take(k.scale, src, axis=1)[..., None]) if is_q else (
            jnp.take(k, src, axis=1))
        if cfg.n_rot > 0:
            # re-rotate moved K by -n_discard positions: rope(p1) then
            # rope(delta) == rope(p1+delta)
            moved = rope(kf, jnp.broadcast_to(delta, kf.shape[:2]), cfg.n_rot,
                         neox=cfg.rope_neox, base=cfg.rope_base)
            keep_mask = (idx < n_keep)[None, :, None, None]
            kf = jnp.where(keep_mask, kf, moved.astype(kf.dtype))
        if is_q:
            # requantize the shifted K (one extra rounding on moved rows)
            new_k.append(QuantKV(*quantize_kv(kf)))
            new_v.append(QuantKV(jnp.take(v.data, src, axis=1),
                                 jnp.take(v.scale, src, axis=1)))
        else:
            new_k.append(kf.astype(k.dtype))
            new_v.append(jnp.take(v, src, axis=1))
    return tuple(new_k), tuple(new_v)


def shift_kv_cache(ctx: Context, n_keep: int, n_discard: int) -> None:
    """Drop tokens [n_keep, n_keep+n_discard) from the cache in O(1) device
    ops; positions of the surviving tokens are rewritten exactly."""
    assert n_keep + n_discard <= ctx.n_past
    ctx.cache_k, ctx.cache_v = _shift_kv(
        ctx.cfg, ctx.cache_k, ctx.cache_v, n_keep, n_discard
    )
    ctx.n_past -= n_discard
