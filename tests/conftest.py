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

# persistent compile cache: the interpret-mode Pallas parity tests trace
# large programs (minutes of XLA compile on CPU); cache them across runs
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
