"""Test config: force a virtual 8-device CPU mesh for the whole suite.

The container's sitecustomize.py registers and force-initializes the axon
TPU backend at interpreter start (ignoring JAX_PLATFORMS), so the env-var
route doesn't work — we must flip jax's platform config after import.
Multi-chip sharding tests then run on the 8-device CPU mesh
(--xla_force_host_platform_device_count), the TPU analogue of the
reference's single-process CI (SURVEY.md §4).  Real-TPU benchmarking happens
in bench.py, not in the test suite.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# LLAMA_TPU_TESTS=1 keeps the real backend for the hardware gate:
#   LLAMA_TPU_TESTS=1 python -m pytest tests/ -m tpu -q   (strictly alone)
# covers on-chip qmm numerics for every format, all five arch decodes, a
# spec_chunk tick, and the Pallas attention/int8 kernels — the repeatable
# answer to "interpret mode does not catch Mosaic lowering bugs".
_TPU_MODE = os.environ.get("LLAMA_TPU_TESTS") == "1"
if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs the real TPU (run with LLAMA_TPU_TESTS=1, "
        "strictly alone)")


def pytest_collection_modifyitems(config, items):
    import pytest

    if _TPU_MODE:
        return
    skip = pytest.mark.skip(reason="TPU gate: set LLAMA_TPU_TESTS=1")
    for it in items:
        if "tpu" in it.keywords:
            it.add_marker(skip)

# Persistent XLA compile cache: the suite is compile-dominated on the 1-cpu
# CI box; cached executables cut reruns from ~9 min to ~2 min.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_runtest_teardown(item, nextitem):
    """Drop jit caches at module boundaries.

    Full-suite runs segfault in jaxlib's executable serialize/deserialize
    once ~30 min of compiled executables have accumulated in one process
    (victim test moves as the suite grows: tp engine shard_map compiles,
    then tp per-row, then test_training's first grad compile — always the
    first LARGE cache op reached late in the process, frames in
    backend_compile_and_load / put_executable_and_time).  Freeing live
    executables between modules keeps XLA-CPU/LLVM JIT state bounded; the
    persistent disk cache makes the resulting recompiles cheap."""
    if nextitem is None or item.module is not getattr(nextitem, "module", None):
        import gc

        jax.clear_caches()
        gc.collect()
