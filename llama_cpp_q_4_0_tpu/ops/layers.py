"""Model-graph ops: norms, RoPE, attention, activations.

jnp re-implementations of the forward ops the reference models use
(ggml.c:7615-15640 ``ggml_compute_forward_*``), expressed XLA-first: static
shapes, fused elementwise chains, causal masking over a preallocated KV
buffer instead of ggml's dynamic KV views (llama.cpp:1362-1374).

RoPE mode semantics follow ggml_rope (ggml.h:1060-1071):
  mode & 1 — (unused here) skip n_past
  mode & 2 — GPT-NeoX style: rotate (x[i], x[i + n_rot/2]) half-split pairs
  default  — GPT-J/LLaMA-ggml style: rotate adjacent pairs (x[2i], x[2i+1])
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """ggml_rms_norm (ggml.c:10389) followed by the weight mul the models do."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)).astype(dt)


def rms_norm_ref(x: jax.Array, weight: jax.Array,
                 eps: float = 1e-6) -> jax.Array:
    """ggml_rms_norm bit-faithfully (ggml.c:10424-10439): f32 squares
    summed in DOUBLE (emulated by a Kahan-compensated sequential sum —
    equal after the final f32 cast except within half an ulp of a
    rounding boundary), mean cast to f32, scale = 1.0f/sqrtf(mean+eps).
    Parity-gate path (ModelConfig.act_f16_table); the default rms_norm
    keeps the cheaper f32 rsqrt."""
    xf = x.astype(jnp.float32)
    xx = jnp.moveaxis(xf * xf, -1, 0)
    z = jnp.zeros(xx.shape[1:], jnp.float32)

    def step(carry, v):
        s, c = carry
        y = v - c
        t = s + y
        return (t, (t - s) - y), None

    (s, _), _ = jax.lax.scan(step, (z, z), xx)
    mean = s[..., None] / jnp.float32(x.shape[-1])
    scale = jnp.float32(1.0) / jnp.sqrt(mean + jnp.float32(eps))
    return (xf * scale) * weight.astype(jnp.float32)


def rms_norm_bias(x, weight, bias, eps: float = 1e-6):
    """Bonsai's RMSNorm-with-bias (bonsai.cpp:1139-1166)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return (out + bias.astype(jnp.float32)).astype(dt)


def layer_norm(x, weight, bias, eps: float = 1e-5):
    """ggml_norm + mul/add (GPT-NeoX / Falcon / RWKV LayerNorm)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return (out + bias.astype(jnp.float32)).astype(dt)


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    """tanh-approx GELU, matching ggml_gelu's table-quantized tanh form."""
    return jax.nn.gelu(x, approximate=True)


def act_f16_table(fn, x):
    """ggml's fp16-lookup-table activation semantics, exactly: the
    reference compiles with GGML_GELU_FP16 / GGML_SILU_FP16 (ggml.c:120-122)
    so every activation is y = f16(fn(f16(x))) read back as f32
    (table build: ggml.c:4246-4253).  Used by the reference-parity gates
    (ModelConfig.act_f16_table) to shrink the oracle tolerance from the
    per-layer table noise to float-rounding level."""
    xh = x.astype(jnp.float16).astype(jnp.float32)
    return fn(xh).astype(jnp.float16).astype(jnp.float32)


def rope(
    x: jax.Array,
    positions: jax.Array,
    n_rot: int,
    *,
    neox: bool,
    base: float = 10000.0,
) -> jax.Array:
    """Rotary embedding over the first n_rot dims of each head.

    x: [..., T, n_head, head_dim]; positions: [..., T] int32.
    neox=True  -> half-split pairs (ggml_rope mode 2, gptneox.cpp:1220)
    neox=False -> adjacent pairs (ggml default; llama.cpp stores weights
                  permuted for this layout, convert.py:271-275)
    """
    head_dim = x.shape[-1]
    dt = x.dtype
    xf = x.astype(jnp.float32)
    half = n_rot // 2
    freqs = base ** (-jnp.arange(half, dtype=jnp.float32) * 2.0 / n_rot)
    # [..., T, 1, half]: broadcasts against x's [..., T, n_head, half]
    theta = positions.astype(jnp.float32)[..., None, None] * freqs
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)

    if neox:
        x0 = xf[..., :half]
        x1 = xf[..., half:n_rot]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.concatenate([r0, r1], axis=-1)
    else:
        xr = xf[..., :n_rot].reshape(*xf.shape[:-1], half, 2)
        x0 = xr[..., 0]
        x1 = xr[..., 1]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.stack([r0, r1], axis=-1).reshape(*xf.shape[:-1], n_rot)

    if n_rot < head_dim:
        rotated = jnp.concatenate([rotated, xf[..., n_rot:]], axis=-1)
    return rotated.astype(dt)


def alibi_bias(n_head: int, kv_len: int, n_head_log2_bias: float = 8.0) -> jax.Array:
    """ggml_alibi slopes (ggml.c alibi; used by some NeoX-family models)."""
    import math

    n2 = 2 ** math.floor(math.log2(n_head))
    m0 = 2.0 ** (-8.0 / n2)
    m1 = 2.0 ** (-4.0 / n2)
    slopes = []
    for h in range(n_head):
        if h < n2:
            slopes.append(m0 ** (h + 1))
        else:
            slopes.append(m1 ** (2 * (h - n2) + 1))
    slopes = jnp.asarray(slopes, dtype=jnp.float32)
    pos = jnp.arange(kv_len, dtype=jnp.float32)
    return slopes[:, None] * pos[None, :]  # [n_head, kv_len]


def use_flash_prefill(t: int, hd: int) -> bool:
    """Whole-prompt prefill eligibility for the TPU flash-attention kernel
    shipped with JAX (jax.experimental.pallas.ops.tpu.flash_attention).
    DEFAULT ON for TPU prefills (measured 63.2 -> 59.5 ms on the 512-token
    7B prefill, r2 hardware run; parity gated on chip by
    test_flash_prefill_on_chip at the measured bf16 tolerance) —
    FLASH_PREFILL=0 opts out; the kernel needs seq/head_dim multiples of
    its 128 MIN_BLOCK_SIZE."""
    import os

    if os.environ.get("FLASH_PREFILL", "1") == "0":
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    return on_tpu and t >= 128 and t % 128 == 0 and hd % 128 == 0


def _flash_prefill(q, k, v, scale):
    """attention_fn (models.transformer.forward contract) running the
    whole-prompt (n_past == 0) prefill through JAX's TPU flash kernel:
    no [B, H, T, S] score materialization — the reference's
    ggml_flash_attn analogue (ggml.c:13928) for the prompt pass.

    FLASH_BF16=1 (experiment): feed the kernel bf16 Q/K/V instead of f32.
    The v5e MXU runs bf16 at ~2x the f32 rate and the kernel accumulates
    f32 regardless; the in-forward attention stack measured ~11 ms of the
    58.8 ms 512-token prefill vs ~1.4 ms of pure FLOPs (decomp-prefill
    2026-08-20) — the f32 operand rate is the prime suspect."""
    import os

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    cd = jnp.bfloat16 if os.environ.get("FLASH_BF16") == "1" else jnp.float32
    b, t, h, d = q.shape
    g = k.shape[2]
    if g != h:
        # MQA/GQA: the kernel wants equal head counts; repeating the FRESH
        # prompt K/V (not the cache) is a [B,T,H,D] prompt-sized temp
        k = jnp.repeat(k, h // g, axis=2)
        v = jnp.repeat(v, h // g, axis=2)
    out = flash_attention(
        q.astype(cd).transpose(0, 2, 1, 3),
        k.astype(cd).transpose(0, 2, 1, 3),
        v.astype(cd).transpose(0, 2, 1, 3),
        causal=True, sm_scale=float(scale),
    )
    return out.transpose(0, 2, 1, 3).astype(jnp.float32)


def flash_prefill_fn():
    """Module-level singleton so jits treating attention_fn as a static
    argument get a stable hash across calls."""
    return _flash_prefill


def _use_fused_decode(rep: int, t: int, s: int, hd: int) -> bool:
    """Fused Pallas decode-attention eligibility (see pallas/attention.py).

    RULED OUT as a default (r5, 2026-08-20): at its motivating case —
    w~2000 decode with q8 KV, the shape it was designed for — fused
    measured 33.0 vs 23.5 ms/tick at occ=4 and 91.0 vs 49.7 at occ=8
    (engine-steady, same engine adjacent queue steps), on top of losing
    at toy windows (r4: 586 vs 621 tok/s).  XLA's fused softmax-matmul
    schedule beats the hand Pallas kernel at every measured shape.  Kept
    env-gated (FUSED_ATTN=1) with its chip gates as a documented
    negative result.  Covers MQA/GQA (rep > 1, grouped MXU contraction
    in-kernel) as well as rep == 1; FUSED_MAX_T widens to
    speculative-verify shapes."""
    import os

    if not os.environ.get("FUSED_ATTN"):
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    max_t = int(os.environ.get("FUSED_MAX_T", "8"))
    return (on_tpu and t <= max_t and hd % 64 == 0
            and s % min(256, s) == 0 and s >= 128)


def _softmax_ref_f16(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """ggml's table-based softmax, exactly: val = f16(exp(f16(s - max)))
    via the 64k fp16 exp table (ggml.c:12314-12343, table built at
    ggml.c:4253), then a plain 1/sum scale.  Parity-gate semantics only."""
    m = jnp.max(jnp.where(valid, scores, -jnp.inf), axis=-1, keepdims=True)
    sh = (scores - m).astype(jnp.float16).astype(jnp.float32)
    e = jnp.exp(sh).astype(jnp.float16).astype(jnp.float32)
    e = jnp.where(valid, e, 0.0)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def attention(
    q: jax.Array,
    k_cache,
    v_cache,
    q_positions: jax.Array,
    kv_mask: jax.Array,
    scale: float,
    *,
    ref_f16_softmax: bool = False,
) -> jax.Array:
    """Causal attention over a preallocated KV buffer.

    q:        [B, T, n_head, hd]
    k_cache:  [B, S, n_kv_head, hd]   (S = max context, static) — a float
              array or a QuantKV (int8 levels + per-token-head scales)
    v_cache:  [B, S, n_kv_head, hd]   (same)
    q_positions: [B, T] absolute positions of the query tokens
    kv_mask:  [B, S] bool — True where the cache slot holds a valid token
    returns [B, T, n_head, hd] float32 — the KQ->mask->softmax->KQV chain of
    llama_eval_internal (llama.cpp:1396-1445) with masking replacing ggml's
    dynamic views.

    QuantKV scales are folded into the small [B,H,T,S] tensors, never the
    [B,S,H,D] cache: K's scale multiplies the scores, V's multiplies the
    softmax probabilities — so only int8 streams from HBM.
    """
    from .kvcache import QuantKV

    def split(c):
        if isinstance(c, QuantKV):
            return c.data, c.scale  # int8 [B,S,Hkv,D], f32 [B,S,Hkv]
        return c, None

    kd, ks = split(k_cache)
    vd, vs = split(v_cache)
    b, t, n_head, hd = q.shape
    s = kd.shape[1]
    n_kv = kd.shape[2]
    assert n_head % n_kv == 0
    rep = n_head // n_kv

    # parity mode pins the fp16-table softmax — never the fused kernel
    if not ref_f16_softmax and _use_fused_decode(rep, t, s, hd):
        from .pallas.attention import mha_decode

        return mha_decode(
            q.astype(jnp.float32), kd, ks, vd, vs,
            q_positions.astype(jnp.int32), kv_mask, float(scale),
            block_s=min(256, s),
        )

    qf = q.astype(jnp.float32)
    # STORAGE-DTYPE MXU path (r5, the long-context serving fix): the f32
    # upcast of the [B, S, H, D] window for the HIGHEST-precision einsums
    # materialized f32 copies of the WHOLE cache every decode step —
    # ~2.1 GB of temps per slot at S=2048, which made steady-state ticks
    # SUPERLINEAR in occupancy (measured 23.0/51.4/149.5 ms/step at occ
    # 4/8/16 vs a ~27 ms linear bandwidth model, engine-steady
    # 2026-08-20; bf16 ≈ q8, so dequant was not the cost — the f32 temps
    # were).  For bf16/int8 caches the MXU consumes the stored operands
    # directly (bf16 in, f32 accumulate): no f32 window temp exists, and
    # the K/V values were ALREADY bf16-rounded at insertion, so only q
    # and the probs lose f32->bf16 input rounding (the 2.5e-3-class
    # drift the flash/fused gates already bound).  f32 caches — every
    # CPU oracle/parity gate — keep the exact f32 HIGHEST chain.
    # ATTN_MXU=0 opts out.
    mxu = (not ref_f16_softmax and kd.dtype != jnp.float32
           and os.environ.get("ATTN_MXU", "1") != "0")
    if mxu:
        kf = kd if kd.dtype == jnp.bfloat16 else kd.astype(jnp.bfloat16)
        vf = vd if vd.dtype == jnp.bfloat16 else vd.astype(jnp.bfloat16)
        qdot = qf.astype(jnp.bfloat16)
        prec = dict(preferred_element_type=jnp.float32)
    else:
        kf = kd.astype(jnp.float32)
        vf = vd.astype(jnp.float32)
        qdot = qf
        prec = dict(precision=jax.lax.Precision.HIGHEST)
    if rep == 1:
        # [B, H, T, S].  HIGHEST (f32 path): at t == 1 this lowers to
        # exact vector ops, but t > 1 (speculative verify) becomes a
        # single-pass bf16 MXU matmul on v5e (measured 2.5e-3 drift, r3
        # gate) — ggml computes attention in f32 always
        # (llama.cpp:1396-1445), so pin it there
        scores = jnp.einsum("bthd,bshd->bhts", qdot, kf, **prec) * scale
        if ks is not None:
            scores = scores * ks.transpose(0, 2, 1)[:, :, None, :]
        kv_pos = jnp.arange(s)[None, None, None, :]  # slot index = position
        causal = kv_pos <= q_positions[:, None, :, None]
        valid = kv_mask[:, None, None, :] & causal
        scores = jnp.where(valid, scores, -jnp.inf)
        if ref_f16_softmax:
            probs = _softmax_ref_f16(scores, valid)
        else:
            probs = jax.nn.softmax(scores, axis=-1)
            probs = jnp.where(valid, probs, 0.0)
        if vs is not None:
            probs = probs * vs.transpose(0, 2, 1)[:, :, None, :]
        return jnp.einsum("bhts,bshd->bthd",
                          probs.astype(jnp.bfloat16) if mxu else probs,
                          vf, **prec)

    # MQA/GQA: group the query heads by kv head and contract against the
    # SINGLE stored K/V head — broadcast happens inside the einsum, the
    # [B,S,n_head,D] repeat the reference materializes (falcon.cpp:1225-1227
    # "cheap hack", ggml_repeat) never exists here
    qg = qdot.reshape(b, t, n_kv, rep, hd)
    # f32 path keeps HIGHEST: XLA's excess-precision upgrade covers the
    # rep == 1 einsums but NOT this batched-gemm form — at default
    # precision it lowers to a single bf16 MXU pass on v5e (measured
    # 2.6e-2-class score drift, r3 gate), silently degrading every
    # GQA/MQA (falcon) f32-cache forward.  The storage-dtype path takes
    # the bf16 MXU pass deliberately (see mxu above).
    scores = jnp.einsum("btgrd,bsgd->bgrts", qg, kf, **prec) * scale
    if ks is not None:
        scores = scores * ks.transpose(0, 2, 1)[:, :, None, None, :]
    kv_pos = jnp.arange(s)[None, None, None, None, :]
    causal = kv_pos <= q_positions[:, None, None, :, None]
    valid = kv_mask[:, None, None, None, :] & causal
    scores = jnp.where(valid, scores, -jnp.inf)
    if ref_f16_softmax:
        probs = _softmax_ref_f16(scores, valid)
    else:
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(valid, probs, 0.0)
    if vs is not None:
        probs = probs * vs.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bgrts,bsgd->btgrd",
                     probs.astype(jnp.bfloat16) if mxu else probs,
                     vf, **prec)
    return out.reshape(b, t, n_head, hd)
