"""Test configuration: force an 8-device virtual CPU backend.

Tests never touch the real TPU; multi-device sharding is exercised on the
standard virtual-device CPU mesh (the JAX equivalent of a fake multi-chip
backend — see SURVEY.md section 4).

NOTE: this environment registers an experimental TPU platform plugin from
``sitecustomize`` at interpreter startup, which imports jax before any test
code runs — so the ``JAX_PLATFORMS`` env var is already captured and must be
overridden through ``jax.config``.  ``XLA_FLAGS`` is still read lazily at
backend initialization, so setting it here (before any computation) works.

A persistent XLA compilation cache was tried for suite speed and REVERTED:
XLA:CPU's AOT loader rejects its own cache entries on reload ("Target
machine feature +prefer-no-gather is not supported on the host machine" on
the very machine that wrote them), and the reload noise plus fallback
recompiles slowed the spawned multihost clusters enough to trip Gloo's 30 s
rendezvous deadline.  Suite parallelism comes from pytest-xdist instead
(auto-enabled on multi-core machines by the root conftest.py).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
