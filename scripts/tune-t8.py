"""One-off tuning run: T=8 verify-forward block sweep + q8-KV long-context
decode timing, strictly sequential on the single chip."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

BODY = r'''
import os, time, functools, numpy as np, jax, jax.numpy as jnp
import bench
from llama_cpp_q_4_0_tpu.models import transformer
cfg, params = bench.build_llama()

@functools.partial(jax.jit, static_argnames=("t","w"), donate_argnames=("ck","cv"))
def step(params, toks, n_past, ck, cv, t, w):
    return transformer.forward(cfg, params, toks, n_past, ck, cv,
                               last_only=(t == 1), kv_window=w)

mode = os.environ.get("MODE")
if mode == "t8":
    ck, cv = transformer.init_cache(cfg, 1, 2048)
    toks = jnp.zeros((1, 8), jnp.int32) + 5
    logits, ck, cv = step(params, toks, jnp.int32(100), ck, cv, t=8, w=512)
    np.asarray(logits)
    t0 = time.perf_counter()
    for i in range(20):
        logits, ck, cv = step(params, toks, jnp.int32(100), ck, cv, t=8, w=512)
    np.asarray(logits)
    print(f"RESULT BN={os.environ.get('QMM_BLOCK_N')} BK={os.environ.get('QMM_BLOCK_K')}: "
          f"T=8 {1e3*(time.perf_counter()-t0)/20:.2f} ms", flush=True)
else:
    for name, dt in (("bf16", jnp.bfloat16), ("q8", jnp.int8)):
        ck, cv = transformer.init_cache(cfg, 1, 2048, dtype=dt)
        toks = jnp.zeros((1, 1), jnp.int32) + 5
        logits, ck, cv = step(params, toks, jnp.int32(1900), ck, cv, t=1, w=2048)
        np.asarray(logits)
        t0 = time.perf_counter()
        for i in range(20):
            logits, ck, cv = step(params, toks, jnp.int32(1900), ck, cv, t=1, w=2048)
        np.asarray(logits)
        print(f"RESULT {name} KV n_past=1900 w=2048: "
              f"{1e3*(time.perf_counter()-t0)/20:.2f} ms/tok", flush=True)
'''

configs = [("0", "0"), ("256", "1024"), ("1024", "0"), ("256", "0")]
for bn, bk in configs:
    env = dict(os.environ, MODE="t8", QMM_BLOCK_N=bn, QMM_BLOCK_K=bk)
    subprocess.run([sys.executable, "-c", BODY], env=env, cwd=ROOT,
                   timeout=500)
subprocess.run([sys.executable, "-c", BODY],
               env=dict(os.environ, MODE="kv"), cwd=ROOT, timeout=500)
print("TUNE DONE", flush=True)
