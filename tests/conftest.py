"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the row-sharded
multi-chip path is exercised without TPU hardware (the TPU analogue of
"test multi-node without a cluster" — SURVEY §4).

This environment may pre-import jax from sitecustomize (TPU tunnel), so
env vars set here can be too late; jax.config.update still steers the
platform as long as no backend has been initialized yet.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")

# OPT-IN persistent XLA compile cache (RBL_TEST_COMPILE_CACHE=1): cuts a
# warm full-suite run ~3×.  Reloading serialized CPU executables that use
# buffer donation can abort the process (reproduced: a warm rerun of
# test_sharded_generalized_pencil dies with SIGABRT inside executable
# load — a JAX/XLA:CPU deserialization bug, not solver state), so the
# cached run also sets RBL_NO_DONATION=1 — the donation allowlist
# (utils/aot.py:donate): donated programs are simply compiled without
# donation under the cache, keeping them out of the crash path while
# everything else reloads.  Donation is a memory optimization only;
# test problems are small.  Delete .jax_cache/ if a cached run crashes.
if os.environ.get("RBL_TEST_COMPILE_CACHE"):
    os.environ["RBL_NO_DONATION"] = "1"
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles many hundreds of XLA CPU executables in one
    process (every module jits at its own shapes); letting them all stay
    resident eventually segfaults the CPU JIT inside
    ``backend_compile_and_load`` — observed ~85% into the suite at
    varying, unrelated tests (test_spectra / test_svd), exit 139.
    Clearing per module keeps the live-executable footprint at one
    module's worth; intra-module caching (the expensive solver sweeps)
    is unaffected."""
    yield
    jax.clear_caches()
