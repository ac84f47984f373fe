"""Persistent XLA compile cache for the CLI scripts.

A cold 4000-env training program takes ~8 minutes of XLA compile on the
TPU; with the persistent cache a rerun of the same revision/config starts
in seconds.  Must be configured through jax.config (NOT the env var): the
container pre-imports jax in sitecustomize, so env-var config is frozen
before any script runs (same pitfall documented in tests/conftest.py).
"""
from __future__ import annotations

import os

import jax


def enable_persistent_cache(path: str | None = None) -> str:
    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
