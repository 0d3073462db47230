"""Device-mesh utilities: data-parallel training, ensemble-parallel sampling.

The reference has NO distributed support of any kind (SURVEY.md section 2.10);
this module is the from-scratch TPU-native scaling layer:

  * ``make_mesh``: a named mesh over the local devices, axes ``dp`` (data)
    and ``ens`` (ensemble members).
  * training: batches sharded over ``dp`` (leading batch axis), parameters
    replicated; under ``jax.jit`` XLA propagates the shardings and inserts
    the gradient ``psum`` over ICI automatically — the NCCL-allreduce
    equivalent with zero user-level communication code.
  * ensemble sampling: the stacked member-parameter pytree is sharded over
    ``ens`` while the batch shards over ``dp``; the member-mean of edge
    scores becomes a cross-device reduction XLA schedules on ICI.

Everything works identically on the virtual 8-device CPU backend used in
tests (``--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, ens: int = 1, devices=None) -> Mesh:
    """Mesh of shape (dp, ens).  ``dp=None`` uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % ens == 0, f"{n} devices not divisible by ens={ens}"
        dp = n // ens
    assert dp * ens <= n, f"mesh {dp}x{ens} needs more than {n} devices"
    dev_array = np.asarray(devices[: dp * ens]).reshape(dp, ens)
    return Mesh(dev_array, axis_names=("dp", "ens"))


def shard_batch(batch, mesh: Mesh):
    """Place a ReactionBatch with its leading (graph) axis split over ``dp``."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_ensemble_params(stacked_params, mesh: Mesh):
    """Shard the member axis (leading) of a stacked parameter pytree over ``ens``."""
    sharding = NamedSharding(mesh, P("ens"))
    return jax.device_put(stacked_params, sharding)


def batch_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
