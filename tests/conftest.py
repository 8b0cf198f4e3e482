"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware; multi-chip sharding paths are validated
on XLA's host-platform virtual devices. Note: this environment's
sitecustomize registers an ``axon`` TPU backend and forces
``jax_platforms="axon,cpu"`` via ``jax.config.update`` at interpreter
startup, so setting the env var is not enough — we must update the config
after import, before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the per-module jax.clear_caches() below
# (XLA:CPU segfault workaround) forces recompiles of shared programs in
# every module — the disk cache turns those into deserializations. The
# XLA:CPU AOT loader logs spurious machine-feature-mismatch errors on
# load (the printed feature sets are identical modulo +/- notation —
# upstream cosmetic bug); harmless, captured by pytest.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Reset JAX's compiled-executable caches between test modules.

    The full suite accumulates hundreds of XLA:CPU executables in one
    process; past ~110 tests the next compilation segfaults inside
    backend_compile_and_load (deterministically, only in the full-suite
    order — every subset passes). Clearing per module keeps peak JIT state
    bounded and sidesteps the crash at the cost of some recompilation.

    Round-4 repro hunt (tools/xla_cpu_segfault_repro.py): 400 distinct
    scan-containing compilations on the 8-virtual-device CPU client do NOT
    reproduce — executable-count accumulation alone is not the trigger; the
    crash needs the suite's real program mix (donation / shard_map /
    multi-process among them). Left as a documented workaround; the script
    is the starting point for an upstream-reportable repro."""
    yield
    jax.clear_caches()
