"""Test configuration: force CPU with an 8-device virtual mesh.

Mirrors the reference's strategy of running the real system in miniature on CPU
(reference tests/examples/test_example.py); multi-chip sharding is exercised on
the virtual device mesh (SURVEY.md §4).

Note: a sitecustomize.py may have already imported jax and pointed it at a
tunneled TPU plugin before this file runs, so setting env vars alone is not
enough — we must update the jax config directly (backends initialize lazily,
so this works as long as no computation ran yet).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in xla_flags:
    # this box's XLA:CPU backend has a pathological O2 LLVM pass for fused
    # gather+cross elementwise kernels (e.g. the ant physics substep: 150-500s
    # to compile at O2, ~2s at O1); O1 is plenty for test-size workloads
    xla_flags = (xla_flags + " --xla_backend_optimization_level=1").strip()
os.environ["XLA_FLAGS"] = xla_flags

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow tests unless SF_TPU_RUN_SLOW=1 — keeps the
    default `pytest tests/` signal under the CI time budget while the full
    e2e sweep stays one env var away (reference keeps its heavyweight
    examples tests in a separate slow tier too)."""
    if os.environ.get("SF_TPU_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow test; set SF_TPU_RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
