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

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
