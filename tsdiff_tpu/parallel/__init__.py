"""Parallelism layer: device-mesh utilities for scaling tsdiff_tpu.

Home of the (dp, ens) mesh toolkit (tsdiff_tpu/parallel/sharding.py): data-
parallel training over ``dp``, ensemble-member sharding over ``ens``, with
XLA inserting all collectives over ICI.  Multi-process (one process per TPU
host) execution lives in tsdiff_tpu/parallel/multihost.py — cluster
bring-up, coordinator gating, per-process batch feeding.  The reference has
no distributed support at all (SURVEY.md section 2.10) — this package is
new capability.
"""

from tsdiff_tpu.parallel.sharding import (  # noqa: F401
    batch_spec,
    make_hybrid_mesh,
    make_mesh,
    replicate,
    replicated_spec,
    shard_batch,
    shard_ensemble_params,
)
from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, stack_params  # noqa: F401
