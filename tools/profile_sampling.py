#!/usr/bin/env python
"""Sampling-step microprofiler: isolates the cost of each stage on device.

Usage:
    python tools/profile_sampling.py [--batch 100] [--n_pad 24] [--members 8]
        [--dtype bfloat16] [--fused_score] [--steps 110]

Reports (with true host synchronization — see utils/profiling):
  * per-step time of the full sampling scan (scan-length differencing);
  * one ensemble score evaluation;
  * the position-independent precompute;
  * derived residue (step minus score) = eq_transform + update + RNG + masks.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--n_pad", type=int, default=24)
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--fused_score", action="store_true")
    ap.add_argument("--use_pallas", action="store_true")
    ap.add_argument("--steps", type=int, default=110)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _production_model_config, _random_batch
    from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, stack_params
    from tsdiff_tpu.diffusion.sampler import SamplingSettings, dynamic_sampling
    from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
    from tsdiff_tpu.models import get_model
    from tsdiff_tpu.utils.profiling import timed_blocked

    cfg = _production_model_config()
    cfg.fused_score = args.fused_score
    cfg.use_pallas = args.use_pallas
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    model = get_model(cfg, dtype=dtype)
    schedule = DiffusionSchedule.from_config(cfg)
    batch = _random_batch(np.random.default_rng(0), args.batch, args.n_pad)
    init_args = (
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    members = [model.init(jax.random.key(s), *init_args) for s in range(args.members)]
    stacked = stack_params(members)
    pos0 = jax.random.normal(jax.random.key(1), batch.pos.shape)

    # score-fn creation INSIDE jit: its precomputed statics must be traced
    # computations, not HLO constants
    score_j = jax.jit(
        lambda p: make_ensemble_score_fn(model, stacked, batch)(p)[0].sum()
    )
    timed_blocked(score_j, pos0)  # compile
    ts = min(timed_blocked(score_j, pos0)[0] for _ in range(5))
    print(
        f"standalone score eval ({args.members} members, INCLUDES the "
        f"position-independent precompute rebuilt per call): {ts * 1000:.2f} ms"
    )

    # full scan, length differencing
    def run(n):
        s = SamplingSettings(sampling_type="ld", n_steps=n, step_lr=1e-7)
        return dynamic_sampling(
            make_ensemble_score_fn(model, stacked, batch),
            schedule, pos0, batch.node_mask, jax.random.key(2), s,
        ).pos.sum()

    run_j = jax.jit(run, static_argnums=0)
    timed_blocked(run_j, 10)
    timed_blocked(run_j, args.steps)
    t10 = min(timed_blocked(run_j, 10)[0] for _ in range(2))
    tN = min(timed_blocked(run_j, args.steps)[0] for _ in range(2))
    per = (tN - t10) / (args.steps - 10)
    print(f"full sampling step (precompute hoisted out of the scan): {per * 1000:.2f} ms")
    print(
        f"=> {args.batch / (per * 5000):.3f} samples/s at 5000 steps, batch {args.batch}"
    )

    t0 = time.perf_counter()
    _ = jax.tree_util.tree_leaves(
        jax.jit(
            lambda: model.apply(
                members[0],
                batch.atom_type, batch.r_feat, batch.p_feat,
                batch.bond_mat, batch.node_mask,
                method="precompute_static",
            )
        )()
    )[0].block_until_ready()
    print(f"precompute_static (1 member, incl. possible compile): {time.perf_counter() - t0:.2f} s")


if __name__ == "__main__":
    main()
