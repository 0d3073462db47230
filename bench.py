"""Headline benchmark: 8-ensemble Langevin-dynamics TS sampling throughput.

Reference baseline (BASELINE.md): the only in-repo timing of the reference is
~0.5 samples/s on one CUDA GPU for 100 samples of one reaction with ONE
checkpoint at 5000 ddpm steps.  The paper-reproduction config is batch 100,
``--sampling_type ld``, 5000 steps, EIGHT checkpoints — i.e. 8x the network
cost per step.  We benchmark exactly that paper config (batch 100, 8-member
ensemble, 5000 LD steps, production model: SchNet H=256 x 7 convs, edge
orders 4/3, cutoff 10 A) on one TPU chip.

Headline metric (round 2): TEST-SET-WEIGHTED samples/s.  The sampling CLI
pads each batch to its size bucket (N=16 / N=24), so per-reaction cost is the
bucket's step time; the headline weights the measured bucket throughputs by
the real-reaction size distribution.  Size sample: the 13 reactions of the
reference's own benchmark set (birkholz_benchmark/selected_rxns.txt — atom
counts 3..22, mean 12.3, 10/13 within the N=16 bucket), consistent with the
documented wb97xd3 average of ~14 atoms.  Per-bucket numbers (including the
worst-case N=24 bucket round 1 reported as headline) ride in the same JSON.

Headline robustness (round 3): the real 10k-test-set size histogram is not
recoverable in this environment (the corpus ships only feat_dict.pkl), so the
output carries a SENSITIVITY BAND: weighted samples/s under (a) the birkholz
proxy distribution, (b) a synthetic mean-14 histogram (discretized normal,
sigma 3.5, truncated to 4..24 — the documented corpus mean), and (c) the
worst case of every reaction landing in the N=24 bucket.  The headline value
stays (a); (c) is the unconditional lower bound no distribution can undercut.

``--full`` additionally runs ONE un-extrapolated full-5000-step wall-clock
measurement per bucket and reports it next to the extrapolation (the
differencing methodology's anchor; recorded in BENCH_NOTES.md per round).

Respaced line (round 4): when the committed quality evidence
(artifacts/respacing_curve.json, produced on trained weights by
tools/respacing_curve.py) contains a respaced point whose D-MAE is within
the quality gate of the full-schedule run, the output carries an additional
``respaced`` section — same per-step cost, M strided steps instead of 5000 —
NEXT TO the reference-parity 5000-step headline, never replacing it.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# atom counts of reference birkholz_benchmark/selected_rxns.txt (atom-mapped
# SMARTS, counted over map indices) — the repo's only real reaction-size sample
BIRKHOLZ_SIZES = [3, 4, 6, 9, 10, 11, 13, 14, 15, 16, 17, 20, 22]
BUCKETS = (8, 16, 24)  # the sampling CLI's default ladder (data/dataset.py)

BATCH = 100     # reference paper-run batch size (sampling.py:84)
ENSEMBLE = 8    # 8 trained checkpoints averaged (README.md:77)
N_STEPS = 5000  # full reverse diffusion (sampling.py:105)
# timed sub-scans: per-step cost is constant, so the difference of two scan
# lengths isolates pure step time from dispatch overhead
STEPS_SHORT, STEPS_LONG = 10, 110
BASELINE = 0.5  # reference GPU samples/s (single ckpt; see module docstring)


def mean14_histogram() -> dict[int, float]:
    """Synthetic size histogram matching the documented corpus mean of ~14
    atoms: discretized normal (sigma 3.5) truncated to [4, 24]."""
    sizes = np.arange(4, 25)
    w = np.exp(-0.5 * ((sizes - 14.0) / 3.5) ** 2)
    w /= w.sum()
    return dict(zip(sizes.tolist(), w.tolist()))


def measure_bucket(n_pad: int, quant: str | None = None, full: bool = False):
    """Per-step wall time (s) of the full 8-ensemble scan at this bucket.

    With ``full`` also returns the single-run wall-clock of the entire
    5000-step schedule (seconds) as a second element."""
    import jax

    from __graft_entry__ import _production_model_config, _random_batch
    from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, stack_params
    from tsdiff_tpu.diffusion.sampler import SamplingSettings, dynamic_sampling
    from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
    from tsdiff_tpu.models import get_model

    import jax.numpy as jnp

    cfg = _production_model_config()
    # bf16 network compute (f32 schedule math / geometry / update algebra),
    # offset-packed fused Pallas score kernel (2x pair-FLOP cut, in-kernel
    # bond embeddings; ops/pallas/condensed_score_packed.py).  quant="int8"
    # additionally runs the pair matmuls in int8 (2x MXU rate,
    # ops/pallas/condensed_score_packed_int8.py; quality-gated, BENCH_NOTES).
    cfg.fused_score = True
    if quant:
        cfg.score_quant = quant
    model = get_model(cfg, dtype=jnp.bfloat16)
    schedule = DiffusionSchedule.from_config(cfg)
    batch = _random_batch(np.random.default_rng(0), batch_size=BATCH, n_pad=n_pad)

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
            schedule, pos_init, batch.node_mask, jax.random.key(2), settings,
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
    step = (timed(STEPS_LONG) - timed(STEPS_SHORT)) / (STEPS_LONG - STEPS_SHORT)
    if not full:
        return step, None
    float(run_j(N_STEPS)[0])  # compile the full-length scan
    t0 = time.perf_counter()
    s, nan = run_j(N_STEPS)
    s = float(s)
    full_s = time.perf_counter() - t0
    assert not bool(nan)
    return step, full_s


def quality_gated_respacing(
    curve_path: str = "artifacts/respacing_curve.json",
    rel_tol: float = 0.05,
    abs_tol: float = 0.01,
    frac_tol: float = 0.05,
) -> dict | None:
    """Pick the cheapest committed respaced point that is quality-equal to
    the measured full-schedule run on ALL THREE committed statistics: mean
    and p90 D-MAE within rel_tol + abs_tol of the same curve's full
    5000-step LD anchor, and frac_under_0.3 no more than frac_tol below it
    (a tail regression fails the gate even when the mean holds — VERDICT r04
    weak #3).  Returns None when no curve exists or nothing passes — the
    bench then claims nothing about respacing.  The returned dict carries the
    curve's member provenance (val loss / iteration per ensemble member) so
    the headline self-describes what weights back it."""
    import os

    if not os.path.exists(curve_path):
        return None
    with open(curve_path) as f:
        data = json.load(f)
    curve = data.get("curve", [])
    full = {e["rule"]: e for e in curve if e["steps"] >= N_STEPS}
    # the quality bar is the PRODUCTION full run (ld 5000); fall back to any
    # full-schedule point if the curve lacks an ld anchor
    ref = full.get("ld") or (next(iter(full.values())) if full else None)
    if ref is None:
        return None

    def passes(e) -> bool:
        if e["dmae_mean"] > ref["dmae_mean"] * (1 + rel_tol) + abs_tol:
            return False
        # older curves may lack the tail statistics; a point can only pass a
        # statistic the anchor also carries
        if "dmae_p90" in e and "dmae_p90" in ref:
            if e["dmae_p90"] > ref["dmae_p90"] * (1 + rel_tol) + abs_tol:
                return False
        if "dmae_frac_under_0.3" in e and "dmae_frac_under_0.3" in ref:
            if e["dmae_frac_under_0.3"] < ref["dmae_frac_under_0.3"] - frac_tol:
                return False
        return True

    passing = [e for e in curve if e["steps"] < N_STEPS and passes(e)]
    if not passing:
        return None
    best = min(passing, key=lambda e: e["steps"])
    return {
        "steps": best["steps"],
        "rule": best["rule"],
        "dmae_mean": best["dmae_mean"],
        "dmae_p90": best.get("dmae_p90"),
        "dmae_frac_under_0.3": best.get("dmae_frac_under_0.3"),
        "full_dmae_mean": ref["dmae_mean"],
        "full_dmae_p90": ref.get("dmae_p90"),
        "full_dmae_frac_under_0.3": ref.get("dmae_frac_under_0.3"),
        "gate": {"rel_tol": rel_tol, "abs_tol": abs_tol, "frac_tol": frac_tol,
                 "stats_gated": ["dmae_mean", "dmae_p90", "dmae_frac_under_0.3"]},
        "members_meta": data.get("members_meta"),
        "curve_file": curve_path,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--full", action="store_true", default=False,
                        help="also run one un-extrapolated full-5000-step "
                             "measurement per bucket")
    parser.add_argument("--quant", type=str, default=None, choices=["int8"],
                        help="int8 pair matmuls in the packed kernel")
    args = parser.parse_args(argv)

    measured = {n: measure_bucket(n, quant=args.quant, full=args.full) for n in BUCKETS}
    step_time = {n: t for n, (t, _) in measured.items()}
    per_bucket_sps = {n: BATCH / (t * N_STEPS) for n, t in step_time.items()}

    def bucket_of(size: int) -> int:
        return next(b for b in BUCKETS if size <= b)

    def weighted(dist: dict[int, float]) -> float:
        """samples/s when reaction sizes follow ``dist`` (size -> weight)."""
        cost = sum(
            w * step_time[bucket_of(s)] * N_STEPS / BATCH for s, w in dist.items()
        ) / sum(dist.values())
        return 1.0 / cost

    birkholz = {s: BIRKHOLZ_SIZES.count(s) for s in set(BIRKHOLZ_SIZES)}
    band = {
        "birkholz_proxy": weighted(birkholz),
        "mean14_synthetic": weighted(mean14_histogram()),
        "all_n24_worst_case": per_bucket_sps[24],
    }
    weighted_sps = band["birkholz_proxy"]

    out = {
        "metric": (
            "test-set-weighted 8-ensemble LD TS sampling throughput "
            "(batch 100, 5000 steps, 1 chip; buckets N=8/16/24 weighted "
            "by the reference benchmark-set size distribution)"
        ),
        "value": round(weighted_sps, 3),
        "unit": "samples/sec",
        "vs_baseline": round(weighted_sps / BASELINE, 2),
        "bucket_samples_per_sec": {
            str(n): round(v, 3) for n, v in per_bucket_sps.items()
        },
        "bucket_step_ms": {
            str(n): round(t * 1e3, 3) for n, t in step_time.items()
        },
        "worst_bucket_vs_baseline": round(per_bucket_sps[24] / BASELINE, 2),
        # headline robustness: samples/s under alternative size distributions;
        # all_n24_worst_case is the floor no distribution can undercut
        "weighted_sps_sensitivity": {
            k: round(v, 3) for k, v in band.items()
        },
        "sensitivity_vs_baseline": {
            k: round(v / BASELINE, 2) for k, v in band.items()
        },
    }
    resp = quality_gated_respacing()
    if resp is not None:
        # same per-step cost, M strided steps instead of N_STEPS; quality
        # equality is carried by the committed measured curve, not assumed
        m = resp["steps"]
        resp_sps = {n: BATCH / (t * m) for n, t in step_time.items()}

        def weighted_resp(dist):
            cost = sum(
                w * step_time[bucket_of(s)] * m / BATCH for s, w in dist.items()
            ) / sum(dist.values())
            return 1.0 / cost

        resp_band = {
            "birkholz_proxy": weighted_resp(birkholz),
            "mean14_synthetic": weighted_resp(mean14_histogram()),
            "all_n24_worst_case": resp_sps[24],
        }
        out["respaced"] = {
            **{k: resp[k] for k in ("steps", "rule", "dmae_mean", "dmae_p90",
                                    "dmae_frac_under_0.3", "full_dmae_mean",
                                    "full_dmae_p90", "full_dmae_frac_under_0.3",
                                    "gate", "members_meta", "curve_file")},
            "value": round(resp_band["birkholz_proxy"], 3),
            "vs_baseline": round(resp_band["birkholz_proxy"] / BASELINE, 2),
            "bucket_samples_per_sec": {
                str(n): round(v, 3) for n, v in resp_sps.items()
            },
            "sensitivity_vs_baseline": {
                k: round(v / BASELINE, 2) for k, v in resp_band.items()
            },
        }
    if args.quant:
        out["quant"] = args.quant
    if args.full:
        out["full_run_s"] = {
            str(n): round(f, 2) for n, (_, f) in measured.items()
        }
        out["full_vs_extrapolated_pct"] = {
            str(n): round(100.0 * (f / (step_time[n] * N_STEPS) - 1.0), 2)
            for n, (_, f) in measured.items()
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
