"""On-chip localizer for the RWKV parallel-prefill divergence seen in
test_rwkv_parallel_prefill_on_chip (hw-validate 2026-08-18: max rel 3.0 vs
the sequential scan, CPU-exact).

Hypotheses, cheapest first:
  H1 f32 exp of the -1e30 state sentinel: TPU exp range reduction computes
     round(x/ln2) in int32, which overflows for |x| >~ 1.5e9 — exp(-1e30)
     can be garbage instead of 0 (the sequential path feeds the sentinel
     through different expressions, so garbage diverges).
  H2 lax.associative_scan TPU lowering error (tuple carry, axis=1).
  H3 something in the layer plumbing (shift/where) — localized by the
     stage dump.

ONE process, every section syncs via np.asarray. Run:
    timeout 560 python scripts/debug-rwkv-prefill.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from llama_cpp_q_4_0_tpu.utils.compile_cache import enable as _enable

_enable()

import jax
import jax.numpy as jnp
import numpy as np


def sec(name):
    print(f"--- {name}", flush=True)


# H1: exp of huge negatives
sec("H1 exp sentinel")
xs = jnp.asarray([-1e30, -1e20, -1e10, -2e9, -1e9, -1e5, -88.0, -80.0],
                 jnp.float32)
print("exp:", np.asarray(jnp.exp(xs)).tolist(), flush=True)
m = jnp.float32(-1e30)
print("exp(m - max(m, 1.0)):", float(np.asarray(jnp.exp(m - jnp.maximum(m, 1.0)))),
      flush=True)

# H2: associative scans in isolation (same shapes as a 12-token prefill)
sec("H2 scans")
rng = np.random.default_rng(0)
b, t, e = 1, 12, 64
w = jnp.asarray(-np.exp(rng.standard_normal(e).astype(np.float32) * 0.5))
k = jnp.asarray(rng.standard_normal((b, t, e)).astype(np.float32))


def mcomb(l, r):
    a1, b1 = l
    a2, b2 = r
    return a1 + a2, jnp.maximum(b1 + a2, b2)


a_el = jnp.broadcast_to(w, (b, t, e))
am, bm = jax.lax.associative_scan(mcomb, (a_el, k), axis=1)
# sequential reference on host
am_h = np.cumsum(np.broadcast_to(np.asarray(w), (b, t, e)), axis=1)
bm_h = np.empty((b, t, e), np.float32)
acc = np.full((b, e), -np.inf, np.float32)
for i in range(t):
    acc = np.maximum(acc + np.asarray(w), np.asarray(k)[:, i])
    bm_h[:, i] = acc
print("mscan max|d| a:", float(np.abs(np.asarray(am) - am_h).max()),
      "b:", float(np.abs(np.asarray(bm) - bm_h).max()), flush=True)


def lcomb(l, r):
    a1, b1 = l
    a2, b2 = r
    return a1 * a2, a2 * b1 + b2


al = jnp.asarray(rng.uniform(0.1, 1.0, (b, t, e)).astype(np.float32))
be = jnp.asarray(rng.standard_normal((b, t, e)).astype(np.float32))
aa, bb = jax.lax.associative_scan(lcomb, (al, be), axis=1)
aa_h = np.cumprod(np.asarray(al), axis=1)
bb_h = np.empty((b, t, e), np.float32)
acc = np.zeros((b, e), np.float32)
for i in range(t):
    acc = np.asarray(al)[:, i] * acc + np.asarray(be)[:, i]
    bb_h[:, i] = acc
print("lscan max|d| a:", float(np.abs(np.asarray(aa) - aa_h).max()),
      "b:", float(np.abs(np.asarray(bb) - bb_h).max()), flush=True)

# H3: per-stage model comparison, parallel vs sequential, on chip
sec("H3 model stages")
import tempfile

from llama_cpp_q_4_0_tpu.formats import fixtures
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models import rwkv as rwkv_mod
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_rwkv

with tempfile.TemporaryDirectory() as d:
    p = os.path.join(d, "r.bin")
    fixtures.make_rwkv_ggjt(p, n_vocab=256, n_embd=64, n_layer=2)
    gf = read_ggjt(p, "rwkv")
    cfg = config_from_ggjt(gf)
    params = load_rwkv(gf, cfg)
toks = jnp.asarray([[3, 9, 27, 6, 101, 7, 55, 2, 19, 19, 4, 88]], jnp.int32)

seq_l, seq_st = rwkv_mod.forward(cfg, params, toks,
                                 rwkv_mod.init_state(cfg, 1), parallel=False)
par_l, par_st = rwkv_mod.forward(cfg, params, toks,
                                 rwkv_mod.init_state(cfg, 1), parallel=True)
sl, pl_ = np.asarray(seq_l), np.asarray(par_l)
print("logits max|d|:", float(np.abs(sl - pl_).max()), flush=True)
print("logits max|d| per pos:",
      np.abs(sl - pl_).reshape(t, -1).max(axis=1).round(5).tolist(),
      flush=True)
for key in seq_st:
    ds = float(np.abs(np.asarray(seq_st[key]) - np.asarray(par_st[key])).max())
    print(f"state {key}: max|d| {ds:.3e}", flush=True)

# layer-0 internals: run both paths one layer at a time
st0 = rwkv_mod.init_state(cfg, 1)
from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor

emb = (params.wte.rows(toks) if isinstance(params.wte, QTensor)
       else jnp.take(params.wte, toks, axis=0).astype(jnp.float32))
x = rwkv_mod.layer_norm(emb, params.ln_pre_g, params.ln_pre_b, cfg.norm_eps)
lay = params.layers[0]
ls0 = {kk: st0[kk][0] for kk in st0}
xp, stp = rwkv_mod._layer_parallel(cfg, lay, ls0, x, None)
xs_out = []
st_s = ls0
for i in range(t):
    xo, st_s = rwkv_mod._layer_step(cfg, lay, st_s, x[:, i])
    xs_out.append(xo)
xs_arr = np.stack([np.asarray(v) for v in xs_out], axis=1)
print("layer0 x max|d| per pos:",
      np.abs(np.asarray(xp) - xs_arr).reshape(t, -1).max(axis=1)
      .round(5).tolist(), flush=True)
for key in stp:
    dd = float(np.abs(np.asarray(stp[key]) - np.asarray(st_s[key])).max())
    print(f"layer0 state {key}: max|d| {dd:.3e}", flush=True)
print("DONE", flush=True)
