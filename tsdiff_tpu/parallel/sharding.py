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


def make_hybrid_mesh(
    ens: int = 1,
    dp: int | None = None,
    num_slices: int | None = None,
    devices=None,
) -> Mesh:
    """Multi-slice mesh with axes ``("dp_dcn", "dp", "ens")``.

    Slice-aware layout for pods/multislice: ``dp_dcn`` (outermost data
    parallelism) spans TPU slices so its collectives ride DCN — data
    parallelism tolerates DCN latency because the gradient all-reduce is one
    transfer per step — while ``dp``/``ens`` stay within a slice so batch
    and ensemble collectives ride ICI.  Uses
    ``mesh_utils.create_hybrid_device_mesh`` when the runtime exposes slice
    indices; otherwise (CPU tests, single-slice) contiguous device blocks
    emulate slices, which preserves the axis semantics for compilation
    checks.

    ``num_slices=None`` auto-detects (1 when the platform has no slice
    concept).  The per-slice data axis ``dp=None`` uses all remaining
    devices in the slice.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)

    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    detected = len(slice_ids)
    if num_slices is None:
        num_slices = detected
    if detected > 1 and num_slices != detected:
        # a contiguous-reshape fallback here would silently let intra-slice
        # axes straddle the DCN boundary (per-step collectives off ICI)
        raise ValueError(
            f"num_slices={num_slices} but the runtime reports {detected} "
            "slices; pass num_slices=None to auto-detect"
        )
    assert n % num_slices == 0, f"{n} devices not divisible by {num_slices} slices"
    per_slice = n // num_slices
    if dp is None:
        assert per_slice % ens == 0, f"{per_slice}/slice not divisible by ens={ens}"
        dp = per_slice // ens
    assert dp * ens == per_slice, (
        f"per-slice mesh {dp}x{ens} != {per_slice} devices/slice"
    )

    if detected == num_slices and detected > 1:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, dp, ens),
            dcn_mesh_shape=(num_slices, 1, 1),
            devices=devices,
        )
    else:
        dev_array = np.asarray(devices).reshape(num_slices, dp, ens)
    return Mesh(dev_array, axis_names=("dp_dcn", "dp", "ens"))


def _data_axes(mesh: Mesh) -> tuple[str, ...]:
    """All data-parallel axes present in the mesh (hybrid or flat)."""
    return tuple(a for a in ("dp_dcn", "dp") if a in mesh.axis_names)


def shard_batch(batch, mesh: Mesh):
    """Place a ReactionBatch with its leading (graph) axis split over the
    data axes (``dp``, plus ``dp_dcn`` on hybrid meshes)."""
    sharding = NamedSharding(mesh, P(_data_axes(mesh)))
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
    return NamedSharding(mesh, P(_data_axes(mesh)))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
