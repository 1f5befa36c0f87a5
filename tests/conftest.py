"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware (SURVEY §4 note: multi-host tier).
IMPORTANT: platform selection must happen via jax.config (the JAX_PLATFORMS
env var can hang during axon plugin discovery in this environment), before
any jax computation.
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      os.environ.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow tests")
    parser.addoption("--blocking", dest="blocking", action="store_true",
                     default=None)
    parser.addoption("--record", dest="record", action="store_true", default=False)
    parser.addoption(
        "--force-sparse", dest="force_sparse", action="store_true",
        default=False,
        help="run the whole suite with auto_sparse_limit=0 so every Matrix "
             "is sparse-backed — the dense-vs-sparse analog of the "
             "reference's vanilla-backend axis (conftest.py:20-91)")


def pytest_configure(config):
    # tripwire for the scoped-x64 design (core/utils.py:x64_methods): any
    # library path that touches a 64-bit array outside the x64 scope emits
    # this truncation warning — fail loudly instead of silently downcasting
    config.addinivalue_line(
        "filterwarnings", "error:.*truncated to dtype.*")
    if config.getoption("--force-sparse", default=False) or \
            os.environ.get("GB_FORCE_SPARSE"):
        import graphblas_tpu as gb

        gb.config["auto_sparse_limit"] = 0
    # --blocking axis (reference conftest.py:20-91 randomizes its blocking
    # mode per run): explicit flag forces blocking init; otherwise pick
    # randomly so both dispatch modes accumulate coverage across runs
    blocking = config.getoption("blocking")
    if blocking is None:
        blocking = bool(np.random.default_rng().integers(2))
    import graphblas_tpu as gb

    gb.init(blocking=bool(blocking))
    config._gb_blocking = bool(blocking)


def pytest_report_header(config):
    return f"graphblas_tpu: blocking={getattr(config, '_gb_blocking', None)}"


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap compiled-executable memory across the suite: the behavioral
    grids alone compile ~1000 distinct programs, and accumulated
    executables can exhaust memory deep into the run (XLA's CPU compiler
    segfaults rather than erroring when allocation fails)."""
    yield
    import jax

    jax.clear_caches()
