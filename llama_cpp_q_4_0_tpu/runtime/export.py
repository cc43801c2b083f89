"""Ahead-of-time graph export/import — static-graph deployment.

Parity with the reference's graph serialization story (SURVEY.md §5):
ggml_graph_export/import (ggml.c:17621-18348) + llama_eval_export
(llama.cpp:3413) dump the whole compute graph with its data so a stripped
runner (examples/metal/metal.cpp) can replay it without model code.  The
XLA-native equivalent: `jax.export` serializes the jitted decode step to a
portable StableHLO artifact; the weights (dense or QTensor) travel
alongside, and `load_exported` replays with no model code — only the
compiled graph.  Load exported files from trusted sources only (the weight
pytree is pickled, like the reference's raw-mmap graph blobs)."""

from __future__ import annotations

import dataclasses
import json
import pickle
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

from ..models import transformer
from ..models.config import ModelConfig
from ..models.transformer import TransformerParams, init_cache

EXPORT_MAGIC = "ggtx"  # ggml-graph-export analogue, TPU/XLA flavour


def _register_pytrees():
    """jax.export needs (de)serializers for our pytree node types; auxdata
    for register_dataclass nodes is the tuple of meta-field values."""
    from ..models.rwkv import RwkvLayer, RwkvParams
    from ..models.transformer import Block
    from ..ops.qtensor import QTensor as QT

    for cls in (QT, Block, TransformerParams, RwkvLayer, RwkvParams):
        try:
            jax.export.register_pytree_node_serialization(
                cls,
                serialized_name=f"llama_cpp_q_4_0_tpu.{cls.__name__}",
                serialize_auxdata=lambda aux: pickle.dumps(aux, protocol=4),
                deserialize_auxdata=pickle.loads,
            )
        except ValueError:  # already registered
            pass


_register_pytrees()


def export_decode(cfg: ModelConfig, params: TransformerParams, path: str,
                  *, batch: int = 1, n_tokens: int = 1,
                  n_ctx: int | None = None,
                  platforms: tuple[str, ...] | None = None) -> None:
    """Serialize one decode step (tokens -> logits + updated cache) plus the
    weights.  The artifact replays on any listed platform via jax.export."""
    n_ctx = n_ctx or cfg.n_ctx
    cache_k, cache_v = init_cache(cfg, batch, n_ctx)
    tokens = jnp.zeros((batch, n_tokens), jnp.int32)

    def step(params, tokens, n_past, cache_k, cache_v):
        return transformer.forward(cfg, params, tokens, n_past,
                                   cache_k, cache_v, last_only=True)

    exp = jax.export.export(jax.jit(step), platforms=platforms)(
        params, tokens, jnp.int32(0), cache_k, cache_v
    )
    meta = {
        "magic": EXPORT_MAGIC,
        "config": dataclasses.asdict(cfg),
        "batch": batch,
        "n_tokens": n_tokens,
        "n_ctx": n_ctx,
    }
    host_params = jax.tree.map(np.asarray, params)
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("meta.json", json.dumps(meta))
        z.writestr("step.stablehlo", exp.serialize())
        z.writestr("params.pkl", pickle.dumps(host_params, protocol=4))


class ExportedModel:
    """Standalone replayer (examples/metal/metal.cpp analogue): the
    deserialized compiled step + the weight arrays; no model code runs."""

    def __init__(self, meta: dict, exported, params):
        self._exported = exported
        self.meta = meta
        self.cfg = ModelConfig(**meta["config"])
        self._params = params
        self.n_ctx = meta["n_ctx"]
        self.batch = meta["batch"]
        self.n_tokens = meta["n_tokens"]
        self.cache_k, self.cache_v = init_cache(self.cfg, self.batch, self.n_ctx)
        self.n_past = 0

    def step(self, tokens: np.ndarray) -> np.ndarray:
        tokens = np.atleast_2d(np.asarray(tokens, np.int32))
        assert tokens.shape == (self.batch, self.n_tokens), (
            f"exported for shape {(self.batch, self.n_tokens)}, got {tokens.shape}")
        logits, self.cache_k, self.cache_v = self._exported.call(
            self._params, jnp.asarray(tokens), jnp.int32(self.n_past),
            self.cache_k, self.cache_v,
        )
        self.n_past += tokens.shape[1]
        return np.asarray(logits)


def load_exported(path: str) -> ExportedModel:
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("magic") != EXPORT_MAGIC:
            raise ValueError(f"{path}: not an exported graph")
        exported = jax.export.deserialize(bytearray(z.read("step.stablehlo")))
        params = jax.tree.map(jnp.asarray, pickle.loads(z.read("params.pkl")))
    return ExportedModel(meta, exported, params)
