"""Training checkpoint save/resume (model + optimizer state).

The reference trainer serializes model weights and the full ggml_opt state
(Adam moments / L-BFGS history) into its checkpoint file so training resumes
deterministically (save_checkpoint/load_checkpoint,
train-text-from-scratch.cpp).  Here the pytrees (TransformerParams and the
optax state) flatten to a single .npz keyed by tree path, plus the
ModelConfig as JSON — readable with plain numpy, no framework needed.
"""

from __future__ import annotations

import dataclasses
import io
import json
import zipfile

import jax
import numpy as np

from ..models.config import ModelConfig


def _flatten(tree, prefix: str) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(tree, prefix: str, arrays: dict):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    new = [arrays[prefix + jax.tree_util.keystr(p)] for p, _ in leaves]
    return jax.tree_util.tree_unflatten(treedef, new)


def save_checkpoint(path: str, cfg: ModelConfig, params, opt_state=None,
                    step: int = 0, extra: dict | None = None) -> None:
    arrays = _flatten(params, "params")
    if opt_state is not None:
        arrays.update(_flatten(opt_state, "opt"))
    meta = {
        "config": dataclasses.asdict(cfg),
        "step": step,
        "has_opt": opt_state is not None,
        "extra": extra or {},
    }
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("meta.json", json.dumps(meta))
        z.writestr("arrays.npz", buf.getvalue())


def load_checkpoint(path: str, params_like, opt_state_like=None):
    """Returns (cfg, params, opt_state, step). *_like provide the pytree
    structure (build with init_transformer / tx.init on abstract arrays)."""
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        with z.open("arrays.npz") as f:
            arrays = dict(np.load(io.BytesIO(f.read())))
    cfg = ModelConfig(**meta["config"])
    params = _unflatten(params_like, "params", arrays)
    opt_state = None
    if meta["has_opt"] and opt_state_like is not None:
        opt_state = _unflatten(opt_state_like, "opt", arrays)
    return cfg, params, opt_state, meta["step"]
