"""Test configuration: run on CPU with 8 virtual devices and float64.

The 8-device CPU mesh is the fake-backend substitute for a TPU pod slice
(SURVEY §4e): sharded-vs-single-device equality tests run here without
hardware. float64 is enabled so operator convergence tests hit their
asymptotic order before hitting roundoff.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU relay
# and a sitecustomize imports jax at interpreter start, so env vars are too
# late — go through jax.config (effective until backends initialize).
# SWMHD_TEST_TPU=1 keeps the ambient TPU backend instead, which is how the
# @skipif(default_backend != "tpu") hardware-equality tests are run:
#   SWMHD_TEST_TPU=1 pytest tests/test_fused.py -k tpu
_USE_TPU = os.environ.get("SWMHD_TEST_TPU", "0") == "1"

import jax  # noqa: E402

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA-CPU compiles of the WENO tendency graphs
# take tens of seconds on a small host; cache them across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: designed to run on the real TPU backend "
        "(SWMHD_TEST_TPU=1); everything else assumes the f64 CPU mesh")


def pytest_collection_modifyitems(config, items):
    """Under SWMHD_TEST_TPU=1 x64 stays disabled, so every f64
    interpret-mode test (rtol 1e-12) would fail spuriously on
    downcast-to-f32 arrays — auto-skip everything not marked ``tpu``
    instead of relying on a ``-k tpu`` convention (advisor r3)."""
    if not _USE_TPU:
        return
    skip = pytest.mark.skip(
        reason="SWMHD_TEST_TPU=1: f64 CPU-mesh test (not marked tpu)")
    for item in items:
        if "tpu" not in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def convergence_order(ns, errors):
    """Log-log least-squares slope, the fit the reference prints
    (test_jacobian.jl:65-71, test_formulations.jl:205-211)."""
    ns = np.asarray(ns, dtype=float)
    errors = np.asarray(errors, dtype=float)
    slope = np.polyfit(np.log10(ns), np.log10(errors), 1)[0]
    return -slope
