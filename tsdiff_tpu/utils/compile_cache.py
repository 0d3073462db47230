"""Persistent XLA compilation cache.

Every (bucket, tier) shape the sampler or serving stack touches costs a
20-40 s XLA compile the first time (TPU).  JAX's persistent compilation
cache stores the compiled executables on disk so a restarted process (a
redeployed server, a resumed training run, the next CLI invocation) skips
straight to execution — the serving cold-start drops from minutes to
seconds.  The reference has no counterpart (torch eager).

Enable explicitly via ``enable_compile_cache(path)`` or ambiently via the
``TSDIFF_COMPILE_CACHE`` environment variable (the CLIs and the serving
front end call :func:`maybe_enable_compile_cache` at startup).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def enable_compile_cache(path: str) -> bool:
    """Point JAX's persistent compilation cache at ``path`` (created if
    needed).  Returns False (with a log line) if this JAX build lacks the
    feature."""
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: sampler scans compile in tens of seconds, but the
        # small helper jits are worth keeping too
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return True
    except Exception as e:  # noqa: BLE001 - feature-gate, never fatal
        logger.warning("persistent compilation cache unavailable: %s", e)
        return False


def maybe_enable_compile_cache(path: str | None = None) -> bool:
    """Enable the cache from an explicit path or ``TSDIFF_COMPILE_CACHE``;
    no-op when neither is set."""
    path = path or os.environ.get("TSDIFF_COMPILE_CACHE")
    if not path:
        return False
    return enable_compile_cache(path)
