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
    """Three test tiers (reference Makefile:46-49 has a fast/slow split):

    - default `pytest tests/`: unit + small e2e, target <10 min on a 2-core box
    - medium (SF_TPU_RUN_MEDIUM=1): multi-process/jax.distributed suites and
      the 100k+-step learning runs, ~15 extra minutes
    - slow (SF_TPU_RUN_SLOW=1): the full 400k+-step convergence sweeps;
      implies medium
    """
    run_slow = bool(os.environ.get("SF_TPU_RUN_SLOW"))
    run_medium = run_slow or bool(os.environ.get("SF_TPU_RUN_MEDIUM"))
    skip_slow = pytest.mark.skip(reason="slow test; set SF_TPU_RUN_SLOW=1 to run")
    skip_medium = pytest.mark.skip(reason="medium test; set SF_TPU_RUN_MEDIUM=1 (or SF_TPU_RUN_SLOW=1) to run")
    for item in items:
        if not run_slow and "slow" in item.keywords:
            item.add_marker(skip_slow)
        elif not run_medium and "medium" in item.keywords:
            item.add_marker(skip_medium)
