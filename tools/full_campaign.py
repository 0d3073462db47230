"""Paper-shaped sampling campaign from a finished production training run.

The reference's paper run samples its full test set with an 8-checkpoint
ensemble (README.md:77-83: idx 0-9999, batch 100, ld, 5000 steps; the 8
members are independently trained checkpoints).  This tool reproduces that
campaign from ONE of our full-schedule runs: the plateau-LR trainer saves a
checkpoint at every validation improvement, so the run's best-K checkpoints
(distinct iterations, lowest val loss) form a trajectory self-ensemble —
distinct weights, honest ensemble compute, no extra training.

Steps:
  1. rank every checkpoint across the given run dirs by its stored
     ``avg_val_loss`` and keep the best K (default 8);
  2. run the production sampling CLI over the FULL test set (5000 LD steps,
     batch 100, bf16 fused kernel, size-sorted bucketing), timing it;
  3. run the evaluate CLI (automorphism-aware D-MAE) on the samples;
  4. print one JSON summary line.

Usage:
    python tools/full_campaign.py RUN_DIR [RESUME_DIR ...]
        --test_set data/synthetic/test_data.pkl --save_dir logs/campaign
        [--ensemble 8] [--use_ema] [--n_steps 5000] [--batch_size 100]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pickle
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]


def rank_checkpoints(run_dirs):
    """[(val_loss, iteration, path)] sorted best-first, across all run dirs.

    A resumed run re-saves its starting checkpoint into the new dir (same
    weights, fresh validation), so entries are deduped by iteration (best
    val wins) — an ensemble member must be a distinct point on the
    trajectory, not the same weights twice."""
    import json

    from tsdiff_tpu.train import load_checkpoint

    by_iter = {}
    for d in run_dirs:
        # both backends: <iter>.ckpt pickle files and <iter>.orbax directories
        paths = glob.glob(os.path.join(d, "checkpoints", "*.ckpt")) + glob.glob(
            os.path.join(d, "checkpoints", "*.orbax")
        )
        for path in paths:
            if path.endswith(".orbax"):
                # ranking needs only iteration/val-loss: read the tiny
                # meta sidecar instead of restoring the full param tree
                try:
                    with open(path + ".meta.json") as f:
                        meta = json.load(f)
                except (OSError, json.JSONDecodeError):
                    continue
                val, it = meta.get("avg_val_loss"), meta.get("iteration")
            else:
                ck = load_checkpoint(path)
                val, it = ck.get("avg_val_loss"), ck.get("iteration")
            if val is None or it is None:
                continue
            cand = (float(val), int(it), path)
            if int(it) not in by_iter or cand < by_iter[int(it)]:
                by_iter[int(it)] = cand
    return sorted(by_iter.values())


def ckpt_meta(path: str) -> tuple[float, int, str]:
    """(val_loss, iteration, path) read from one checkpoint's stored metadata
    (exported params-only ckpts keep avg_val_loss/iteration — export_ckpt.py),
    so explicit-member runs record the same provenance as ranked ones."""
    from tsdiff_tpu.train import load_checkpoint

    if path.endswith(".orbax"):
        try:
            with open(path + ".meta.json") as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            meta = {}
    else:
        meta = load_checkpoint(path)
    val, it = meta.get("avg_val_loss"), meta.get("iteration")
    return (
        float(val) if val is not None else float("nan"),
        int(it) if it is not None else -1,
        path,
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dirs", nargs="+", help="train-CLI log dir(s), resumes included")
    ap.add_argument("--test_set", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--ensemble", type=int, default=8)
    ap.add_argument("--n_steps", type=int, default=5000)
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--step_lr", type=float, default=1e-7)
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--seed", type=int, default=2022)
    ap.add_argument("--timestep_respacing", type=int, default=None,
                    help="run the campaign on the respaced (strided) schedule")
    ap.add_argument("--sampling_type", default="ld")
    ap.add_argument("--ckpts", nargs="+", default=None,
                    help="explicit member checkpoints (skip the best-K "
                         "trajectory ranking; e.g. independent-seed members)")
    args = ap.parse_args(argv)

    if args.ckpts is not None:
        members = [ckpt_meta(p) for p in args.ckpts]
        print("ensemble members (explicit; val loss @ iteration from ckpt metadata):")
        for val, it, path in members:
            print(f"  {val:.4f} @ {it:>7,}  {path}")
    else:
        ranked = rank_checkpoints(args.run_dirs)
        if len(ranked) < args.ensemble:
            raise SystemExit(
                f"only {len(ranked)} checkpoints with val loss under {args.run_dirs}; "
                f"need --ensemble {args.ensemble}"
            )
        members = ranked[: args.ensemble]
        print("ensemble members (val loss @ iteration):")
        for val, it, path in members:
            print(f"  {val:.4f} @ {it:>7,}  {path}")

    from tsdiff_tpu.cli import evaluate as evaluate_cli
    from tsdiff_tpu.cli import sampling as sampling_cli

    os.makedirs(args.save_dir, exist_ok=True)
    sample_argv = [p for _, _, p in members] + [
        "--test_set", args.test_set,
        "--save_dir", args.save_dir,
        "--end_idx", str(10**9),
        "--n_steps", str(args.n_steps),
        "--sampling_type", args.sampling_type,
        "--step_lr", str(args.step_lr),
        "--batch_size", str(args.batch_size),
        "--repeat", str(args.repeat),
        "--seed", str(args.seed),
        "--dtype", "bfloat16",
        "--fused_score",
        "--sort_by_size",
    ]
    if args.use_ema:
        sample_argv.append("--use_ema")
    if args.timestep_respacing is not None:
        sample_argv += ["--timestep_respacing", str(args.timestep_respacing)]
    t0 = time.monotonic()
    sampling_cli.main(sample_argv)
    wall_s = time.monotonic() - t0

    samples_path = os.path.join(args.save_dir, "samples_all.pkl")
    with open(samples_path, "rb") as f:
        n_samples = len(pickle.load(f))

    stats_path = os.path.join(args.save_dir, "dmae_stats.pkl")
    evaluate_cli.main(["--samples", samples_path, "--out", stats_path])
    with open(stats_path, "rb") as f:
        stats = pickle.load(f)
    import numpy as np

    dmae = np.asarray(stats["dmae"], dtype=float)

    summary = {
        "n_samples": n_samples,
        "ensemble": len(members),
        "n_steps": args.n_steps,
        "timestep_respacing": args.timestep_respacing,
        "wall_s": round(wall_s, 1),
        "samples_per_s": round(n_samples / wall_s, 3),
        "dmae_mean": round(float(dmae.mean()), 4) if dmae.size else None,
        "dmae_median": round(float(np.median(dmae)), 4) if dmae.size else None,
        "dmae_frac_under_0.3": round(float((dmae <= 0.3).mean()), 3) if dmae.size else None,
        "members": [
            {"val": (None if v != v else v), "iter": (None if i < 0 else i),
             "path": os.path.relpath(p)}
            for v, i, p in members
        ],
    }
    print(json.dumps(summary))
    with open(os.path.join(args.save_dir, "campaign_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
