"""One-off: int8-activation qmm + fused attention hardware probe, then
model-level timings. Strictly sequential."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

CHECK = r'''
import time, numpy as np, jax.numpy as jnp
from llama_cpp_q_4_0_tpu.ops import QTensor, q_matmul
from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed_q8x
from llama_cpp_q_4_0_tpu.quant import GGMLType
rng = np.random.default_rng(0)
w = (rng.standard_normal((1024, 1024)) * 0.1).astype(np.float32)
qt = QTensor.quantize(w, GGMLType.Q4_0)
x = (rng.standard_normal((8, 1024)) * 0.5).astype(np.float32)
ref = np.asarray(q_matmul(jnp.asarray(x), qt, use_pallas=False))
for mode in (True, False):
    t0 = time.perf_counter()
    out = np.asarray(qmm_packed_q8x(jnp.asarray(x), qt.levels_t, qt.gscale_t,
                                    gsize=qt.gsize, zero=qt.pack_zero,
                                    block_n=256, block_k=512,
                                    int8_mxu=mode))
    dt = time.perf_counter() - t0
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    print(f"RESULT q8x int8={mode} compile+run {dt:.1f}s rel {rel:.2e}",
          flush=True)

from llama_cpp_q_4_0_tpu.ops.pallas.attention import mha_decode
from llama_cpp_q_4_0_tpu.ops.layers import attention
from llama_cpp_q_4_0_tpu.ops.kvcache import QuantKV, quantize_kv
b, t, s, h, d = 2, 1, 512, 8, 128
q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
pos = jnp.full((b, t), 100, jnp.int32)
mask = jnp.asarray(np.arange(s)[None] < 101) & jnp.ones((b, 1), bool)
want = np.asarray(attention(q, k, v, pos, mask, 0.088))
for name, args in (
    ("f32", (q, k, None, v, None)),
):
    t0 = time.perf_counter()
    got = np.asarray(mha_decode(*args, pos, mask, 0.088, block_s=256))
    dt = time.perf_counter() - t0
    rel = np.abs(got - want).max() / np.abs(want).max()
    print(f"RESULT mha_decode {name} compile+run {dt:.1f}s rel {rel:.2e}",
          flush=True)
kq, ks = quantize_kv(k); vq, vs = quantize_kv(v)
want = np.asarray(attention(q, QuantKV(kq, ks), QuantKV(vq, vs), pos, mask, 0.088))
t0 = time.perf_counter()
got = np.asarray(mha_decode(q, kq, ks, vq, vs, pos, mask, 0.088, block_s=256))
dt = time.perf_counter() - t0
rel = np.abs(got - want).max() / np.abs(want).max()
print(f"RESULT mha_decode q8kv compile+run {dt:.1f}s rel {rel:.2e}", flush=True)
'''

BODY = r'''
import os, time, functools, numpy as np, jax, jax.numpy as jnp
import bench
from llama_cpp_q_4_0_tpu.models import transformer
cfg, params = bench.build_llama()

@functools.partial(jax.jit, static_argnames=("t","w"), donate_argnames=("ck","cv"))
def step(params, toks, n_past, ck, cv, t, w):
    return transformer.forward(cfg, params, toks, n_past, ck, cv,
                               last_only=(t == 1), kv_window=w)

tag = ("q8x=" + os.environ.get("QMM_Q8X", "off")
       + (" zerofold" if os.environ.get("QMM_ZERO_FOLD") else ""))
for t in (1, 8):
    ck, cv = transformer.init_cache(cfg, 1, 2048)
    toks = jnp.zeros((1, t), jnp.int32) + 5
    logits, ck, cv = step(params, toks, jnp.int32(100), ck, cv, t=t, w=512)
    np.asarray(logits)
    t0 = time.perf_counter()
    for i in range(20):
        logits, ck, cv = step(params, toks, jnp.int32(100), ck, cv, t=t, w=512)
    np.asarray(logits)
    print(f"RESULT {tag}: T={t} {1e3*(time.perf_counter()-t0)/20:.2f} ms",
          flush=True)
'''

if os.environ.get("SKIP_CHECK") != "1":
    subprocess.run([sys.executable, "-c", CHECK], cwd=ROOT, timeout=560)
for env in ({}, {"QMM_ZERO_FOLD": "1"}, {"QMM_Q8X": "1"},
            {"QMM_Q8X": "bf16"}):
    subprocess.run([sys.executable, "-c", BODY],
                   env=dict(os.environ, **env), cwd=ROOT, timeout=560)
print("TUNE DONE", flush=True)
