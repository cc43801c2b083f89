"""Device-mesh construction: the TPU-native replacement for the reference's
hand-rolled multi-device engine (ggml_cuda_set_tensor_split / ggml_cuda_op,
ggml-cuda.cu:1820-2567).

Instead of splitting weight rows by VRAM fraction and gathering results with
cudaMemcpyAsync, we build a `jax.sharding.Mesh` over the chips and annotate
arrays with NamedShardings; XLA inserts the all-gather/psum collectives over
ICI.  Axes:

  dp — data parallel (batch / independent requests)
  sp — sequence parallel (shard the token axis of activations; attention
       all-gathers KV over ICI, the ring-attention-lite answer to the
       reference's single-chip n_ctx cap, SURVEY.md §2.3)
  tp — tensor parallel (shard weight output/reduce dims; psum partial sums)
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("dp", "sp", "tp")


def make_mesh(dp: int = 1, sp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * sp * tp
    assert n <= len(devices), (n, len(devices))
    dev = np.asarray(devices[:n]).reshape(dp, sp, tp)
    return Mesh(dev, MESH_AXES)


def auto_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """Split devices over (dp, sp, tp) favouring tp (ICI-bandwidth-bound
    matmul partials want the tightest axis), then dp, then sp."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    tp = math.gcd(n, 4) if n % 2 == 0 else 1
    rest = n // tp
    dp = 2 if rest % 2 == 0 else 1
    sp = rest // dp
    return make_mesh(dp=dp, sp=sp, tp=tp, devices=devices)


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
