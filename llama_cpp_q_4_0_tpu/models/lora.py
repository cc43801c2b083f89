"""Apply a ggla LoRA adapter to loaded params: w += (alpha/r) * BA.

llama_apply_lora_from_file_internal (llama.cpp:2716-2991), TPU-style: the
delta is added on the host once at load time; quantized targets are
dequantized, patched, and re-quantized to their original format (the
reference instead mutates in f16/f32 and warns that quantized+LoRA degrades
quality — same caveat here).  An optional f16/f32 base model file supplies
clean weights (--lora-base, llama.cpp:2897-2908).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..formats.ggla import GglaFile, read_ggla
from ..ops.qtensor import QTensor
from .transformer import TransformerParams

# ggml tensor base-name -> (Block field) (convert-lora-to-ggml.py:12-25)
_FIELD_MAP = {
    "attention.wq": "wq",
    "attention.wk": "wk",
    "attention.wv": "wv",
    "attention.wo": "wo",
    "feed_forward.w1": "w_gate",
    "feed_forward.w2": "w_down",
    "feed_forward.w3": "w_up",
    "attention_norm": "attn_norm_w",
    "ffn_norm": "ffn_norm_w",
}


def _parse_base(base_name: str) -> tuple[int, str] | None:
    # "layers.{i}.{sub}.weight"
    parts = base_name.split(".")
    if parts[0] != "layers" or parts[-1] != "weight":
        return None
    layer = int(parts[1])
    sub = ".".join(parts[2:-1])
    field = _FIELD_MAP.get(sub)
    return (layer, field) if field else None


def _patched(w, delta: np.ndarray, base: np.ndarray | None):
    """w (QTensor or dense) + delta, preserving storage format."""
    import jax.numpy as jnp

    if isinstance(w, QTensor):
        basef = base if base is not None else np.asarray(w.dequantize())
        return QTensor.quantize(basef.astype(np.float32) + delta, w.qtype)
    basef = base if base is not None else np.asarray(w, np.float32)
    return jnp.asarray(basef + delta, dtype=w.dtype)


def apply_lora(
    params: TransformerParams,
    adapter: str | GglaFile,
    *,
    base_weights: dict[str, np.ndarray] | None = None,
    merge: bool = True,
    progress=None,
) -> TransformerParams:
    """Returns params with the LoRA adapter applied (functional; originals
    untouched).

    merge=True reproduces the reference semantics (w += (α/r)BA, with
    requantization of quantized targets, llama.cpp:2716-2991).
    merge=False keeps the quantized base bit-exact and attaches the delta as
    an unmerged low-rank patch applied at matmul time (ops/lowrank.py) —
    zero requantization error, hot-swappable adapters.
    base_weights optionally maps ggml base-names to f32 arrays from an
    unquantized base model (--lora-base)."""
    from ..ops.lowrank import patch

    gf = read_ggla(adapter) if isinstance(adapter, str) else adapter
    pairs = gf.pairs()
    blocks = list(params.blocks)
    warned = False
    for i, base_name in enumerate(sorted(pairs)):
        parsed = _parse_base(base_name)
        if parsed is None:
            raise ValueError(f"unknown lora tensor '{base_name}'")
        layer, fieldname = parsed
        blk = blocks[layer]
        w = getattr(blk, fieldname)
        if w is None:
            raise ValueError(f"model has no tensor for '{base_name}'")
        a, b = pairs[base_name]
        n, k = w.shape
        if (b.shape[0], a.shape[0]) != (n, k):
            raise ValueError(
                f"incompatible lora dims for {base_name}: "
                f"{(b.shape[0], a.shape[0])} vs {(n, k)}"
            )
        if not merge:
            new_w = patch(w, a.T, b, gf.scaling)  # a stored [K, r] -> [r, K]
        else:
            if isinstance(w, QTensor) and not warned:
                import sys

                print("apply_lora: warning: merging into quantized weights "
                      "requantizes — quality may degrade; use merge=False "
                      "or an f16/f32 --lora-base (llama.cpp:2915)",
                      file=sys.stderr)
                warned = True
            base = base_weights.get(base_name) if base_weights else None
            new_w = _patched(w, gf.delta(base_name), base)
        blocks[layer] = dataclasses.replace(blk, **{fieldname: new_w})
        if progress:
            progress(i + 1, len(pairs))
    return dataclasses.replace(params, blocks=tuple(blocks))


def convert_peft_dir(peft_dir: str, out_path: str) -> None:
    """PEFT adapter dir -> ggla (convert-lora-to-ggml.py semantics)."""
    import json
    import os
    import re

    import torch

    from ..formats.ggla import write_ggla

    with open(os.path.join(peft_dir, "adapter_config.json")) as f:
        cfgj = json.load(f)
    assert cfgj["peft_type"] == "LORA", cfgj["peft_type"]
    assert not cfgj.get("fan_in_fan_out"), "fan_in_fan_out unsupported"
    model = torch.load(os.path.join(peft_dir, "adapter_model.bin"),
                       map_location="cpu")
    hf_map = {
        "self_attn.q_proj": "attention.wq", "self_attn.k_proj": "attention.wk",
        "self_attn.v_proj": "attention.wv", "self_attn.o_proj": "attention.wo",
        "mlp.gate_proj": "feed_forward.w1", "mlp.down_proj": "feed_forward.w2",
        "mlp.up_proj": "feed_forward.w3",
    }
    tensors = {}
    for k, v in model.items():
        k = k.replace(".default.weight", ".weight")
        m = re.match(r".*layers\.(\d+)\.(\w+\.\w+)\.lora_(A|B)\.weight", k)
        if not m:
            continue
        sub = hf_map[m.group(2)]
        t = v.float().numpy()
        if m.group(3) == "A":
            t = t.T
        tensors[f"layers.{m.group(1)}.{sub}.weight.lora{m.group(3)}"] = t
    write_ggla(out_path, int(cfgj["r"]), int(cfgj["lora_alpha"]), tensors)
