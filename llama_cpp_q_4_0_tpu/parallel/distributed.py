"""Multi-host bring-up: jax.distributed + cross-host meshes over ICI/DCN.

The reference is single-process by design (SURVEY.md §2.3: no MPI/NCCL);
this module is the from-scratch distributed layer the TPU build needs.
Process groups come from `jax.distributed.initialize` (GKE/TPU-VM
environments auto-detect coordinator/process_id), and the mesh helpers
below lay the (dp, sp, tp) axes out so tp stays *inside* a host's ICI
domain while dp spans hosts over DCN — collectives for matmul partials ride
the fast fabric, gradient/batch reductions tolerate the slow one (the
scaling-book recipe).

Failure semantics follow the llama.cpp spirit (SURVEY.md §5): fail fast —
any host error aborts the job; restart + checkpoint reload (training/
checkpoint.py, runtime/session.py) is the recovery path.  There is no
in-job elasticity, matching the reference's GGML_ASSERT-and-abort model.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import MESH_AXES


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with auto-detection on TPU pods; no-op if
    already initialized or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def pod_mesh(tp: int | None = None, sp: int = 1) -> Mesh:
    """Mesh over every addressable chip in the job: tp packed within each
    host's chips (ICI), dp spanning hosts (DCN).  Default tp = chips per
    host."""
    devices = jax.devices()
    local = jax.local_device_count()
    tp = tp or local
    n = len(devices)
    assert n % (tp * sp) == 0, (n, tp, sp)
    dp = n // (tp * sp)
    # jax.devices() orders by process first: reshaping keeps each host's
    # chips contiguous on the tp axis
    dev = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(dev, MESH_AXES)


def is_primary() -> bool:
    return jax.process_index() == 0


def sync_hosts(name: str = "barrier") -> None:
    """Cross-host barrier (checkpoint write coordination)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
