"""Parallelism facade: device-mesh utilities for scaling tsdiff_tpu.

Re-exports the (dp, ens) mesh toolkit (implementation in
tsdiff_tpu/train/sharding.py) under the package layout suggested for the
framework: ``tsdiff_tpu.parallel``.
"""

from tsdiff_tpu.train.sharding import (  # noqa: F401
    batch_spec,
    make_mesh,
    replicate,
    replicated_spec,
    shard_batch,
    shard_ensemble_params,
)
from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, stack_params  # noqa: F401
