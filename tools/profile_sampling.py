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
    ap.add_argument("--packed", action="store_true",
                    help="profile the offset-packed path: full step vs "
                         "kernel-only vs glue (masks/distances, eq_transform, "
                         "update rule)")
    ap.add_argument("--steps", type=int, default=110)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tsdiff_tpu.utils.compile_cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # TSDIFF_COMPILE_CACHE: reruns skip compiles

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

    if args.packed:
        _profile_packed(args, model, schedule, stacked, batch, pos0)
        return

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


def _profile_packed(args, model, schedule, stacked, batch, pos0):
    """Decompose the packed-path step: scan step = kernel + glue.

    kernel-only: the member-vmapped packed_score_pallas on FROZEN pair info
    (realistic shapes, no per-step mask/distance rebuild); glue = step minus
    kernel = packed distances/masks + eq_transform_packed + ensemble mean +
    update rule + RNG + center_pos.
    """
    import jax
    import jax.numpy as jnp

    from tsdiff_tpu.diffusion.ensemble import make_packed_ensemble_eps_fn
    from tsdiff_tpu.diffusion.sampler import SamplingSettings, dynamic_sampling
    from tsdiff_tpu.ops.pallas.condensed_score_packed import (
        extract_weights_packed,
        packed_score_pallas,
    )
    from tsdiff_tpu.utils.profiling import timed_blocked

    # full packed step via scan-length differencing
    def run(n):
        s = SamplingSettings(sampling_type="ld", n_steps=n, step_lr=1e-7)
        return dynamic_sampling(
            make_packed_ensemble_eps_fn(model, stacked, batch),
            schedule, pos0, batch.node_mask, jax.random.key(2), s,
        ).pos.sum()

    run_j = jax.jit(run, static_argnums=0)
    timed_blocked(run_j, 10)
    timed_blocked(run_j, args.steps)
    t10 = min(timed_blocked(run_j, 10)[0] for _ in range(3))
    tN = min(timed_blocked(run_j, args.steps)[0] for _ in range(3))
    per = (tN - t10) / (args.steps - 10)
    print(f"packed full step: {per * 1000:.3f} ms "
          f"=> {args.batch / (per * 5000):.3f} samples/s at 5000 steps")

    # kernel-only on frozen info, same member vmap + mean as the real path
    pp = model.precompute_packed_pairs(batch.bond_mat, batch.node_mask)
    z_m = jax.vmap(
        lambda p: model.apply(
            p, batch.atom_type, batch.r_feat, batch.p_feat, batch.node_mask,
            method="node_states",
        )
    )(stacked)
    weights_m = jax.vmap(extract_weights_packed)(stacked)
    info = jax.jit(
        lambda pos: model.build_packed_pair_info(pos, batch.node_mask, pp)
    )(pos0)
    dtype = model.dtype or jnp.float32

    def kernel_once(d_in, cmask):
        def member(w, z):
            return packed_score_pallas(
                w, z, d_in, cmask,
                pp.type_r_in, pp.type_p_in, pp.type_r_out, pp.type_p_out,
                num_blocks=model.num_convs, dtype=dtype,
                interpret=jax.default_backend() != "tpu",
            )

        return jnp.mean(jax.vmap(member)(weights_m, z_m), axis=0).sum()

    # loop the kernel body n times so dispatch overhead amortizes like a scan
    def kernel_n(n):
        def body(i, acc):
            return acc + kernel_once(info.d_in + 0.0 * acc, info.cmask)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    kn_j = jax.jit(kernel_n, static_argnums=0)
    timed_blocked(kn_j, 10)
    timed_blocked(kn_j, args.steps)
    k10 = min(timed_blocked(kn_j, 10)[0] for _ in range(3))
    kN = min(timed_blocked(kn_j, args.steps)[0] for _ in range(3))
    kper = (kN - k10) / (args.steps - 10)
    print(f"kernel-only ({args.members}-member vmap + mean, frozen pair info): "
          f"{kper * 1000:.3f} ms")
    print(f"glue (distances/masks + eq_transform + update + RNG): "
          f"{(per - kper) * 1000:.3f} ms = {100 * (per - kper) / per:.1f}% of step")


if __name__ == "__main__":
    main()
