"""T=8 verify-forward cost decomposition, single process, interleaved.

VERDICT r3 #4: T=8 forward is 20.2 ms vs 11.4 at T=1 — same 4.2 GB of
weights streamed, so if decode were purely bandwidth-bound the two would be
equal.  The profiler is unusable through the tunnel (jax.profiler.trace
hangs), so this decomposes at the MODEL level (isolated kernel timings are
too noisy here):

  1. full forward           T in {1, 8}   (the number being explained)
  2. qmm-only weight sweep  T in {1, 8}   (every QTensor in the model hit
                                           once per step — same HBM bytes
                                           as a forward, no attention/norms)
  3. attention-only stack   T in {1, 8}   (32 layers of cache attention at
                                           w=512, no weights streamed)
  4. forward / qmm-sweep with QMM_FUSE_PANELS=1 (one concatenated lo|hi
                                           MXU dot per grid step, not two)

If (2)'s T8-T1 delta accounts for the forward delta, the cost is in the
qmm kernel (unpack VPU or MXU passes) and (4) tests the MXU-issue-count
hypothesis.  If not, attention/elementwise is the residual.

NOTE: QMM_FUSE_PANELS is read by the dispatch at TRACE time, so each fuse
case is compiled (warm call) with the env var set and timed after it is
cleared — the compiled executable keeps the traced branch.
"""
import contextlib
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llama_cpp_q_4_0_tpu.utils.compile_cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

import bench
from llama_cpp_q_4_0_tpu.models import transformer
from llama_cpp_q_4_0_tpu.ops import layers
from llama_cpp_q_4_0_tpu.ops.qmatmul import q_matmul
from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor

REPS = int(os.environ.get("REPS", "5"))
STEPS = int(os.environ.get("STEPS", "10"))


@contextlib.contextmanager
def env(**kv):
    old = {k: os.environ.get(k) for k in kv}
    os.environ.update({k: v for k, v in kv.items() if v is not None})
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def make_qmm_sweep(params, t):
    """One jitted call = every weight matrix (except tok_embeddings, which
    forward only gathers) applied to a [t, K] activation — the exact HBM
    weight traffic of a forward step, nothing else.  The accumulator chain
    forces layer-like sequencing."""
    ws = tuple(w for w in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, QTensor))
        if isinstance(w, QTensor) and w is not params.tok_embeddings)

    @jax.jit
    def sweep(ws, xs):
        acc = jnp.zeros((t,), jnp.float32)
        for w in ws:
            y = q_matmul(xs[w.shape[1]] + acc[:, None] * 0.0, w)
            acc = acc + y[:, :1].sum(axis=1)
        return acc

    xs = {k: jnp.ones((t, k), jnp.float32) * 0.01
          for k in {w.shape[1] for w in ws}}
    return lambda: sweep(ws, xs)


def make_attn_stack(cfg, t, w, n_layer=32):
    h, d = cfg.n_head, cfg.head_dim

    @jax.jit
    def stack(q, ck, cv, pos, mask):
        out = q
        for _ in range(n_layer):
            out = layers.attention(out, ck, cv, pos, mask, 0.088)
        return out

    q = jnp.ones((1, t, h, d), jnp.float32) * 0.1
    ck = jnp.ones((1, w, h, d), jnp.bfloat16) * 0.1
    cv = jnp.ones((1, w, h, d), jnp.bfloat16) * 0.1
    pos = jnp.full((1, t), 100, jnp.int32) + jnp.arange(t, dtype=jnp.int32)
    mask = (jnp.arange(w)[None] < 100 + t) & jnp.ones((1, 1), bool)
    return lambda: stack(q, ck, cv, pos, mask)


def make_forward(cfg, params, t, w=512):
    @functools.partial(jax.jit, static_argnames=("t", "w"),
                       donate_argnames=("ck", "cv"))
    def step(p, toks, n_past, ck, cv, t, w):
        return transformer.forward(cfg, p, toks, n_past, ck, cv,
                                   last_only=True, kv_window=w)

    toks = jnp.zeros((1, t), jnp.int32) + 5
    state = {"c": transformer.init_cache(cfg, 1, w)}

    def run():
        ck, cv = state["c"]
        logits, k, v = step(params, toks, jnp.int32(100), ck, cv, t=t, w=w)
        state["c"] = (k, v)
        return logits

    return run


def main():
    cfg, params = bench.build_llama()
    jax.block_until_ready(params)

    cases = {}  # name -> callable; compiled+warmed immediately, in order
    for t in (1, 8):
        for name, fn in ((f"forward T={t}", make_forward(cfg, params, t)),
                         (f"qmm-sweep T={t}", make_qmm_sweep(params, t)),
                         (f"attn-stack T={t}",
                          make_attn_stack(cfg, t, 512))):
            np.asarray(fn())
            print(f"compiled {name}", flush=True)
            cases[name] = fn
    if os.environ.get("FUSE") != "0":
        with env(QMM_FUSE_PANELS="1"):
            for t in (1, 8):
                for name, fn in ((f"forward+fuse T={t}",
                                  make_forward(cfg, params, t)),
                                 (f"qmm-sweep+fuse T={t}",
                                  make_qmm_sweep(params, t))):
                    np.asarray(fn())  # traced HERE, env captured in branch
                    print(f"compiled {name}", flush=True)
                    cases[name] = fn

    times = {k: [] for k in cases}
    for rep in range(REPS):
        for name, fn in cases.items():
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = fn()
            np.asarray(out)
            times[name].append((time.perf_counter() - t0) / STEPS * 1e3)

    for name, ts in times.items():
        print(f"RESULT decomp {name:20s}: median "
              f"{statistics.median(ts):6.2f} ms  min {min(ts):6.2f}  "
              f"all {[round(x, 2) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
