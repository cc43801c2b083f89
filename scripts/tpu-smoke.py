# end-to-end on REAL TPU: every arch + several ftypes through the full
# stack (fixture file -> loader -> Context -> greedy decode), plus ppl CLI
# TPU smoke test: every architecture + quant format end-to-end on the real
# chip (fixture file -> loader -> Context -> greedy decode) plus the
# perplexity CLI.  Run after kernel changes: interpret mode does NOT catch
# Mosaic lowering bugs (see git history: lane-axis reshape, xg tile align).
import os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
from llama_cpp_q_4_0_tpu.utils.compile_cache import enable as _enable_cache
_enable_cache()
from llama_cpp_q_4_0_tpu.formats import fixtures
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer, load_rwkv
from llama_cpp_q_4_0_tpu.runtime.context import Context, RwkvContext
from llama_cpp_q_4_0_tpu.quant.types import GGMLType

d = tempfile.mkdtemp()
makers = {
    "llama":   (fixtures.make_llama_ggjt, {}),
    "gptneox": (fixtures.make_gptneox_ggjt, {}),
    "falcon":  (fixtures.make_falcon_like_ggjt, {"arch": "falcon"}),
    "bonsai":  (fixtures.make_falcon_like_ggjt, {"arch": "bonsai"}),
    "rwkv":    (fixtures.make_rwkv_ggjt, {}),
}
for arch, (mk, kw) in makers.items():
    p = os.path.join(d, f"{arch}.bin")
    try:
        mk(p, n_vocab=256, n_embd=64, n_layer=2, **({"n_head": 4} if arch != "rwkv" else {}), **kw)
    except TypeError:
        mk(p, n_vocab=256, n_embd=64, n_layer=2)
    gf = read_ggjt(p, arch)
    cfg = config_from_ggjt(gf, n_ctx=64)
    if arch == "rwkv":
        ctx = RwkvContext(cfg, load_rwkv(gf, cfg))
    else:
        ctx = Context(cfg, load_transformer(gf, cfg), n_ctx=64)
    logits = ctx.eval(np.asarray([[3, 9, 27]], np.int32))
    toks = []
    for _ in range(4):
        t = int(np.argmax(logits[0, -1])); toks.append(t)
        logits = ctx.eval(np.asarray([[t]], np.int32))
    ok = np.isfinite(logits).all()
    print(f"{arch:8s}: decode {'OK' if ok else 'NAN'} tokens={toks}")

# k-quant + q5/q8 llama models end to end
for qt in (GGMLType.Q4_K, GGMLType.Q5_0, GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q6_K):
    p = os.path.join(d, f"llama_{qt.name}.bin")
    fixtures.make_llama_ggjt(p, n_vocab=256, n_embd=256, n_mult=256, n_head=4, n_layer=2, qtype=qt)
    gf = read_ggjt(p, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    ctx = Context(cfg, load_transformer(gf, cfg), n_ctx=64)
    logits = ctx.eval(np.asarray([[3, 9, 27, 6]], np.int32))
    print(f"llama {qt.name:5s}: decode {'OK' if np.isfinite(logits).all() else 'NAN'}")

# huge-row qmm (the T=2048 prefill bucket shape): exercises the r4 VMEM
# guard's block_n shrink on the REAL Mosaic allocator — the engine-long
# bench hits this shape mid-queue, so fail here first if it can't compile
import jax.numpy as jnp
from llama_cpp_q_4_0_tpu.ops import QTensor, q_matmul
rngq = np.random.default_rng(0)
wq = QTensor.quantize((rngq.standard_normal((512, 4096)) * 0.1)
                      .astype(np.float32), GGMLType.Q4_0)
xb = jnp.asarray((rngq.standard_normal((2048, 4096)) * 0.3)
                 .astype(np.float32))
yb = np.asarray(q_matmul(xb, wq))
print(f"qmm b=2048: {'OK' if np.isfinite(yb).all() else 'NAN'}")

# fma-fold kernel variant on chip (mask/shift+FMA unpack, r4)
from llama_cpp_q_4_0_tpu.ops.pallas.qmm import qmm_packed
xf = jnp.asarray((rngq.standard_normal((8, 4096)) * 0.3).astype(np.float32))
yf = np.asarray(qmm_packed(xf, wq.levels_t, wq.gscale_t, None,
                           gsize=wq.gsize, zero=wq.pack_zero,
                           block_n=256, block_k=1024, fma_fold=True))
yr = np.asarray(qmm_packed(xf, wq.levels_t, wq.gscale_t, None,
                           gsize=wq.gsize, zero=wq.pack_zero,
                           block_n=256, block_k=1024))
rel = np.abs(yf - yr).max() / np.abs(yr).max()
print(f"qmm fma_fold: {'OK' if rel < 3e-3 else f'DRIFT {rel:.2e}'}")

# fp16 scale planes on chip: the u16 bit-decode (_scales_f32) must
# reproduce the f32-plane result EXACTLY — folded and unfolded (r4
# bandwidth lever; earlier-round chip run predates the zero-fold kernel)
from llama_cpp_q_4_0_tpu.ops.qtensor import cast_scales_f16, fold_zero_points
wq16 = cast_scales_f16({"w": wq})["w"]
y32 = np.asarray(q_matmul(xf, wq))
y16 = np.asarray(q_matmul(xf, wq16))
wf32 = fold_zero_points({"w": wq})["w"]
wf16 = fold_zero_points({"w": wq16})["w"]
z32 = np.asarray(q_matmul(xf, wf32))
z16 = np.asarray(q_matmul(xf, wf16))
ok16 = np.array_equal(y16, y32) and np.array_equal(z16, z32)
print(f"qmm f16-scales: {'OK' if ok16 else 'MISMATCH'}")

# perplexity CLI on TPU
from llama_cpp_q_4_0_tpu.cli import perplexity as ppl
txt = os.path.join(d, "c.txt")
open(txt, "w").write("the quick brown fox jumps over the lazy dog. " * 40)
rc = ppl.main(["-m", os.path.join(d, "llama.bin"), "-f", txt, "-c", "32", "-b", "32"])
print("ppl CLI rc:", rc)
