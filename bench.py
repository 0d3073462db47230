"""Headline benchmark: 8-ensemble Langevin-dynamics TS sampling throughput.

Reference baseline (BASELINE.md): the only in-repo timing of the reference is
~0.5 samples/s on one CUDA GPU for 100 samples of one reaction with ONE
checkpoint at 5000 ddpm steps.  The paper-reproduction config is batch 100,
``--sampling_type ld``, 5000 steps, EIGHT checkpoints — i.e. 8x the network
cost per step.  We benchmark exactly that paper config (batch 100, 8-member
ensemble, 5000 LD steps, production model: SchNet H=256 x 7 convs, edge
orders 4/3, cutoff 10 A) on one TPU chip and report samples/sec.

``vs_baseline`` divides by the reference's 0.5 samples/s single-checkpoint
number — conservative in our disfavor (the reference would be ~8x slower
at the 8-ensemble config we actually run).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _production_model_config, _random_batch
    from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, stack_params
    from tsdiff_tpu.diffusion.sampler import SamplingSettings, dynamic_sampling
    from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
    from tsdiff_tpu.models import get_model

    BATCH = 100     # reference paper-run batch size (sampling.py:84)
    N_PAD = 24      # wb97xd3 molecules are <= ~23 atoms
    ENSEMBLE = 8    # 8 trained checkpoints averaged (README.md:77)
    N_STEPS = 5000  # full reverse diffusion (sampling.py:105)
    # timed sub-scans: per-step cost is constant, so the difference of two
    # scan lengths isolates pure step time from dispatch overhead.
    STEPS_SHORT, STEPS_LONG = 10, 110

    cfg = _production_model_config()
    # bf16 network compute (f32 schedule math / geometry / update algebra),
    # fully-fused Pallas score kernel (edge embed + interaction stack + head)
    cfg.fused_score = True
    model = get_model(cfg, dtype=jnp.bfloat16)
    schedule = DiffusionSchedule.from_config(cfg)
    batch = _random_batch(np.random.default_rng(0), batch_size=BATCH, n_pad=N_PAD)

    init_args = (
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    members = [model.init(jax.random.key(s), *init_args) for s in range(ENSEMBLE)]
    stacked = stack_params(members)

    pos_init = jax.random.normal(jax.random.key(1), batch.pos.shape)

    def run(n_steps: int):
        settings = SamplingSettings(sampling_type="ld", n_steps=n_steps, step_lr=1e-7)
        res = dynamic_sampling(
            make_ensemble_score_fn(model, stacked, batch),
            schedule,
            pos_init,
            batch.node_mask,
            jax.random.key(2),
            settings,
        )
        # reduce on-device; fetching the scalar forces true host sync
        # (block_until_ready does not synchronize on tunneled backends)
        return res.pos.sum(), res.nan_detected

    run_j = jax.jit(run, static_argnums=0)

    def timed(n: int) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s, nan = run_j(n)
            s = float(s)
            best = min(best, time.perf_counter() - t0)
        assert not bool(nan), "NaN during benchmark sampling"
        return best

    float(run_j(STEPS_SHORT)[0])  # compile
    float(run_j(STEPS_LONG)[0])   # compile
    t_short = timed(STEPS_SHORT)
    t_long = timed(STEPS_LONG)

    step_time = (t_long - t_short) / (STEPS_LONG - STEPS_SHORT)
    samples_per_sec = BATCH / (step_time * N_STEPS)

    baseline = 0.5  # reference GPU samples/s (single ckpt; see module docstring)
    print(
        json.dumps(
            {
                "metric": "8-ensemble LD TS sampling throughput (batch 100, 5000 steps, 1 chip)",
                "value": round(samples_per_sec, 3),
                "unit": "samples/sec",
                "vs_baseline": round(samples_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
