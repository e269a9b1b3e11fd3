"""Test configuration.

Tests run on the JAX CPU backend by default (deterministic, works anywhere),
with 8 virtual devices so the multi-chip sharding path is exercised without
TPU hardware.  Set ``JAX_PLATFORMS=tpu`` to run against a real chip.
"""

import os

_platform = os.environ.get("NUFHE_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may pin JAX_PLATFORMS to a TPU plugin; the config update
# takes precedence, so this reliably selects the CPU backend for tests.
jax.config.update("jax_platforms", _platform)

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """XLA:CPU can segfault in backend_compile_and_load once the
    in-process executable cache has accumulated many large programs
    (observed under --heavy and, since the round-4 transform_type
    parametrization doubled the gate programs, in the default suite too).
    Start every module with a clean cache; compiles are cheap on CPU."""
    jax.clear_caches()
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="module", params=["NTT", "FFT"])
def transform_type(request):
    """Engine accuracy mode: 'NTT' = exact, 'FFT' = rounded-key (the
    reference parametrizes its whole suite the same way,
    ``/root/reference/test/conftest.py:81-88``).  Module-scoped so
    module-scoped key fixtures can parametrize over it."""
    return request.param


def pytest_addoption(parser):
    parser.addoption(
        "--heavy", action="store_true", default=False,
        help="run heavy (full-parameter, benchmark-sized) tests")
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="run the slow exhaustive sweeps (full integer-circuit "
             "families, chunked-kernel interpret run); implied by --heavy")
    parser.addoption(
        "--perf", action="store_true", default=False,
        help="run performance measurement tests")


def pytest_collection_modifyitems(config, items):
    skip_heavy = pytest.mark.skip(reason="needs --heavy")
    skip_perf = pytest.mark.skip(reason="needs --perf")
    skip_slow = pytest.mark.skip(reason="needs --slow (or --heavy)")
    run_slow = config.getoption("--slow") or config.getoption("--heavy")
    for item in items:
        if "heavy" in item.keywords and not config.getoption("--heavy"):
            item.add_marker(skip_heavy)
        if "perf" in item.keywords and not config.getoption("--perf"):
            item.add_marker(skip_perf)
        if "slow" in item.keywords and not run_slow:
            item.add_marker(skip_slow)


def pytest_configure(config):
    config.addinivalue_line("markers", "heavy: full-parameter / slow tests")
    config.addinivalue_line("markers", "perf: performance measurement tests")
    config.addinivalue_line(
        "markers", "slow: exhaustive sweeps behind --slow (default tier "
        "keeps the dual-mode gate/bootstrap/parallel coverage and the "
        "reference-parity uint_min)")
