"""Persistent compilation cache helper: enable, populate, no-op without env."""

import os

import jax
import jax.numpy as jnp
import pytest

from tsdiff_tpu.utils.compile_cache import (
    enable_compile_cache,
    maybe_enable_compile_cache,
)


def test_maybe_noop_without_env(monkeypatch):
    monkeypatch.delenv("TSDIFF_COMPILE_CACHE", raising=False)
    assert maybe_enable_compile_cache() is False


def test_enable_populates_cache_dir(tmp_path, monkeypatch):
    cache = str(tmp_path / "xla_cache")
    assert enable_compile_cache(cache) is True
    try:
        # production keeps the 0.5 s compile-time floor (TPU compiles are
        # tens of seconds); CPU test compiles are instant, so lower it here
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

        # a fresh compilation must land files in the cache dir
        @jax.jit
        def f(x):
            return (x @ x.T).sum()

        float(f(jnp.ones((64, 37))))
        entries = os.listdir(cache)
        assert entries, "compilation cache dir stayed empty"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
