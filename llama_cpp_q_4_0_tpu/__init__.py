"""llama.cpp-q_4_0_tpu — a TPU-native weight-only-quantized LLM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``Fcucgvhhhvjv/llama.cpp-q_4_0`` (byroneverson's multi-architecture llama.cpp
fork): ggml block-quant formats (q4_0/q4_1/q5_0/q5_1/q8_0 + Q2_K..Q6_K
super-block k-quants), a single fused dequant+matmul hot path shared by all
model families (LLaMA, GPT-NeoX, Falcon, RWKV v4, Bonsai), GGJT v3 model file
compatibility, the full sampling chain, and — beyond the single-node
reference — first-class multi-chip sharding over `jax.sharding.Mesh`.

Subpackage map (mirrors SURVEY.md §2 component inventory):
  quant/    — block formats, reference quantize/dequantize, vtable (ggml.c:870-1716, k_quants.c)
  ops/      — TPU compute ops: Pallas fused dequant-matmul, norm/rope/attention
  models/   — per-architecture runtimes (llama.cpp, arch/{gptneox,falcon,rwkv,bonsai})
  formats/  — GGJT v3 / ggla file IO, HF converters (llama.cpp:391-700, convert.py)
  runtime/  — KV cache, eval loop, tokenizer, sampling (llama.cpp:1217-2209)
  parallel/ — mesh/sharding layer (replaces ggml-cuda.cu row-split, SURVEY §2.3)
  utils/    — timings, config
  cli/      — main/quantize/perplexity/server entry points (examples/)
"""

__version__ = "0.1.0"


def load(model_path: str, *, n_ctx: int = 2048, arch: str | None = None,
         cache_dtype=None):
    """One-call bring-up: returns (context, tokenizer).

    >>> ctx, tok = llama_cpp_q_4_0_tpu.load("7b-q4_0.bin")
    >>> logits = ctx.eval([tok.tokenize("Hello", bos=True)])
    """
    import jax.numpy as jnp

    from .formats.ggjt import detect_arch, read_ggjt
    from .models.loading import config_from_ggjt, load_rwkv, load_transformer
    from .runtime.context import Context, RwkvContext
    from .runtime.tokenizer import Tokenizer, Vocab

    arch = arch or detect_arch(model_path)
    gf = read_ggjt(model_path, arch)
    cfg = config_from_ggjt(gf, n_ctx=n_ctx)
    tokenizer = Tokenizer(Vocab.from_ggjt(gf))
    if arch == "rwkv":
        return RwkvContext(cfg, load_rwkv(gf, cfg)), tokenizer
    ctx = Context(cfg, load_transformer(gf, cfg), n_ctx=n_ctx,
                  cache_dtype=cache_dtype or jnp.bfloat16)
    return ctx, tokenizer
