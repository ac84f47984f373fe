"""Test harness: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the `axon` TPU tunnel plugin and
force-sets jax_platforms="axon,cpu"; tests must run on CPU (fast init,
8 virtual devices for sharding tests), so we override it back BEFORE any
backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the interpret-mode Pallas parity tests trace
# large programs (minutes of XLA compile on CPU); cache them across runs.
# NOTE must be the config call, not the env var — the container
# sitecustomize imports jax before conftest runs, so env-var config is
# already frozen by now (observed: cache silently "disabled/not
# initialized" with the env-var route).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The interpret-mode Pallas parity suites each hold multi-GB compiled
    programs; letting them accumulate across the whole run has crashed
    the CPU client (segfault in whichever heavy module ran ~55 tests in,
    reproducible, while every module passes in a fresh process)."""
    yield
    jax.clear_caches()


# -- fast/heavy tiers --------------------------------------------------------
# `pytest -m "not heavy"` is the fast tier (round-3 verdict item 4: the
# full suite's interpret-mode Pallas parity modules take tens of minutes
# cold).  Module-level marking keeps the tier list in one place.
_HEAVY_MODULES = {
    "test_pallas_contact", "test_pallas_dynamics", "test_pallas_megastep",
    "test_warm_start",
    # spawns 2 OS processes that each compile the sharded train program
    "test_multihost",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _HEAVY_MODULES:
            item.add_marker(pytest.mark.heavy)


def xla_physics(cfg):
    """Flip a Cfg to the plain XLA physics path (no Pallas kernels).

    Used by the FAST tier's env/ppo fixtures: on CPU the Pallas paths
    run in interpret mode, whose compiles take minutes per program and
    dominate a cold fast-tier run.  Env/learn semantics are backend-
    independent; the Pallas paths keep their own parity + golden
    coverage in the heavy tier."""
    import dataclasses
    return dataclasses.replace(cfg, sim=dataclasses.replace(
        cfg.sim, use_pallas_contact=False, megastep=False))
