"""Multi-host (multi-process) SPMD support.

Production TPU pods run ONE process per host; every process sees only its
local chips, JAX stitches them into one global device set after
``jax.distributed.initialize``, and each process feeds the LOCAL shard of
every global batch.  The reference has no distributed story at all
(SURVEY §2.10 — single-GPU torch); here the existing (dp[, ens]) and
hybrid (dp_dcn, dp, ens) meshes work unchanged over the global device set,
and this module supplies the three things multi-process execution needs:

  * :func:`initialize` — cluster bring-up (auto-detect on TPU pods, explicit
    coordinator/rank flags elsewhere, e.g. the CPU Gloo cluster the suite
    uses);
  * :func:`is_coordinator` — gate checkpoint writes / logging to process 0;
  * :func:`make_global_batch` / :func:`global_from_full` — identical full
    host copies on every process -> global jax.Arrays with any sharding
    (``jax.make_array_from_callback`` slices each process's addressable
    shards out of the full copy).

Determinism contract (how every process stays on the SAME program): each
process builds the IDENTICAL global batch sequence (same corpus file, same
seed, same bucket schedule); placement slices out the shards its devices
own.  Bucket sizes are
part of the compiled shapes, so divergent schedules would deadlock the
collectives — slicing a shared global plan makes divergence impossible,
at the cost of each host packing rows it does not feed (negligible next to
the device step).

Tested without TPU hardware: tests/test_multihost.py forms a REAL
2-process CPU cluster (cross-process Gloo collectives) and asserts loss
parity with the single-process run.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from tsdiff_tpu.parallel.sharding import batch_spec


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """``jax.distributed.initialize`` wrapper.

    On TPU pods all three arguments are discovered from the environment —
    call with no arguments.  On CPU/GPU clusters (or local multi-process
    tests) pass ``coordinator`` ("host:port"), ``num_processes`` and
    ``process_id`` explicitly.  Must run before the first device use.
    """
    if coordinator is None and (num_processes is not None or process_id is not None):
        raise ValueError(
            "--nprocs/--procid were given without --coordinator; explicit "
            "cluster flags require all three (on TPU pods omit all three "
            "and the cluster is auto-detected)"
        )
    if coordinator is not None and (num_processes is None or process_id is None):
        raise ValueError(
            "--coordinator was given without --nprocs/--procid; explicit "
            "cluster flags require all three (on TPU pods omit all three "
            "and the cluster is auto-detected)"
        )
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def is_coordinator() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def make_global_batch(batch, mesh):
    """IDENTICAL global numpy batch on every process -> global jax.Array
    pytree sharded over the mesh's data axes (``dp``, plus ``dp_dcn`` on
    hybrid meshes).  Callback-based placement: each process transfers only
    its addressable shards, and row ownership follows the sharding's own
    index map — correct for ANY device ordering (flat process-contiguous
    meshes and slice-grouped hybrid meshes alike)."""
    return global_from_full(batch, batch_spec(mesh))


def make_replicated(tree, mesh):
    """Fully-replicated global arrays from identical per-process copies
    (multi-process replacement for ``device_put(tree, replicated_spec)``)."""
    from tsdiff_tpu.parallel.sharding import replicated_spec

    return global_from_full(tree, replicated_spec(mesh))


def global_from_full(tree, sharding):
    """IDENTICAL full host arrays on every process -> global jax.Arrays with
    ``sharding`` (any spec: dp-sharded batches, ens-sharded stacked params,
    replicated statics).  Each process transfers only its addressable
    shards; the callback slices them out of the full copy."""

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def global_key(key, mesh):
    """Process-local PRNG key -> fully-replicated global key array (every
    process derives identical key data from the shared seed)."""
    from tsdiff_tpu.parallel.sharding import replicated_spec

    kd = np.asarray(jax.random.key_data(key))
    return jax.random.wrap_key_data(global_from_full(kd, replicated_spec(mesh)))


@functools.lru_cache(maxsize=None)
def _replicator(mesh):
    # one cached jitted identity per mesh — a fresh jax.jit per call would
    # retrace + recompile the all-gather for every batch
    from tsdiff_tpu.parallel.sharding import replicated_spec

    return jax.jit(lambda y: y, out_shardings=replicated_spec(mesh))


def replicate_output(x, mesh):
    """Reshard a (possibly dp-sharded) global array to fully-replicated so
    every process can ``np.asarray`` the complete value.  XLA inserts the
    all-gather; ALL processes must call this (it is a collective)."""
    return _replicator(mesh)(x)


