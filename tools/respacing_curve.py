"""Measured D-MAE degradation curve vs sampling step count (respacing).

The per-step bf16 floor is proven (BENCH_NOTES round 3: 83% of roofline at
N=24), so the remaining throughput lever is FEWER steps: walk an
evenly-strided subsequence of the 5000-step window (DDIM-style respacing,
``--timestep_respacing``; reference dualenc.py:871-908 is the reference's own
step-skipping rule).  This tool measures what respacing costs in quality:
for each (rule, step-count) point it samples the test set through the
production sampling CLI with a trained ensemble and scores automorphism-aware
D-MAE, emitting one JSON curve the bench notes and BENCH_rN.json can cite.

Usage:
    python tools/respacing_curve.py RUN_DIR [RUN_DIR ...] \
        --test_set data/synthetic/test_data.pkl --save_dir logs/respace \
        --out artifacts/respacing_curve.json \
        [--ensemble 4] [--n_test 400] [--points ld:5000 ld:2500 ...]

Each point is ``rule:steps`` — steps == 5000 means the full contiguous
schedule; anything smaller runs ``--timestep_respacing steps``.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]

DEFAULT_POINTS = [
    "ld:5000", "ld:2500", "ld:1250", "ld:625",
    "generalized:2500", "generalized:1250", "generalized:625",
    "ddpm:2500", "ddpm:1250",
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dirs", nargs="+", help="train-CLI log dir(s) or explicit .ckpt paths")
    ap.add_argument("--test_set", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--out", default="artifacts/respacing_curve.json")
    ap.add_argument("--ensemble", type=int, default=4)
    ap.add_argument("--n_test", type=int, default=400,
                    help="subset of the test set per point (full set x many "
                         "points would be hours; the subset is the SAME for "
                         "every point so the comparison is paired)")
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--n_steps", type=int, default=5000)
    ap.add_argument("--step_lr", type=float, default=1e-7)
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--points", nargs="+", default=DEFAULT_POINTS)
    ap.add_argument("--seed", type=int, default=2022)
    args = ap.parse_args(argv)

    from tools.full_campaign import ckpt_meta, rank_checkpoints
    from tsdiff_tpu.cli import evaluate as evaluate_cli
    from tsdiff_tpu.cli import sampling as sampling_cli

    if args.run_dirs[0].endswith(".ckpt") or args.run_dirs[0].endswith(".orbax"):
        members = [ckpt_meta(p) for p in args.run_dirs]
    else:
        ranked = rank_checkpoints(args.run_dirs)
        if len(ranked) < args.ensemble:
            raise SystemExit(f"only {len(ranked)} ranked checkpoints; need {args.ensemble}")
        members = ranked[: args.ensemble]
    member_paths = [p for _, _, p in members]
    # member provenance rides in the output so any reader of the curve (and
    # bench.py's quality gate) can see what weights back each quality number
    members_meta = [
        {"val": (None if v != v else round(v, 4)),
         "iter": (None if i < 0 else i), "path": os.path.relpath(p)}
        for v, i, p in members
    ]
    print("ensemble members (val loss @ iteration):")
    for v, i, p in members:
        print(f"  {v:.4f} @ {i:>7,}  {p}")

    os.makedirs(args.save_dir, exist_ok=True)
    curve = []
    for point in args.points:
        rule, _, steps_s = point.partition(":")
        steps = int(steps_s)
        tag = f"{rule}_{steps}"
        out_dir = os.path.join(args.save_dir, tag)
        os.makedirs(out_dir, exist_ok=True)
        sample_argv = member_paths + [
            "--test_set", args.test_set,
            "--save_dir", out_dir,
            "--end_idx", str(args.n_test),
            "--n_steps", str(args.n_steps),
            "--sampling_type", rule,
            "--step_lr", str(args.step_lr),
            "--batch_size", str(args.batch_size),
            "--seed", str(args.seed),
            "--dtype", "bfloat16",
            "--fused_score",
            "--sort_by_size",
        ]
        if args.use_ema:
            sample_argv.append("--use_ema")
        if steps < args.n_steps:
            sample_argv += ["--timestep_respacing", str(steps)]
        t0 = time.monotonic()
        sampling_cli.main(sample_argv)
        wall_s = time.monotonic() - t0

        samples_path = os.path.join(out_dir, "samples_all.pkl")
        with open(samples_path, "rb") as f:
            n_samples = len(pickle.load(f))
        stats_path = os.path.join(out_dir, "dmae_stats.pkl")
        evaluate_cli.main(["--samples", samples_path, "--out", stats_path])
        with open(stats_path, "rb") as f:
            stats = pickle.load(f)
        import numpy as np

        dmae = np.asarray(stats["dmae"], dtype=float)
        entry = {
            "rule": rule,
            "steps": steps,
            "n_samples": n_samples,
            "wall_s": round(wall_s, 1),
            "samples_per_s": round(n_samples / wall_s, 3),
            "dmae_mean": round(float(dmae.mean()), 4),
            "dmae_median": round(float(np.median(dmae)), 4),
            "dmae_p90": round(float(np.quantile(dmae, 0.9)), 4),
            "dmae_frac_under_0.3": round(float((dmae <= 0.3).mean()), 3),
        }
        curve.append(entry)
        print(json.dumps(entry))
        # incremental write: an interrupted sweep keeps every finished point
        _write(args, members_meta, curve, partial=True)

    _write(args, members_meta, curve, partial=False)
    print(f"wrote {args.out}")


def _write(args, members_meta, curve, partial: bool):
    result = {
        "test_set": args.test_set,
        "n_test": args.n_test,
        "ensemble": len(members_meta),
        "use_ema": bool(args.use_ema),
        "members": [m["path"] for m in members_meta],
        "members_meta": members_meta,
        "curve": curve,
    }
    if partial:
        result["partial"] = True
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
