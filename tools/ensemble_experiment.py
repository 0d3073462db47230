"""The reference's REAL production ensemble recipe: K independent seeds.

The paper's inference averages the per-edge scores of 8 INDEPENDENTLY
trained checkpoints (reference README.md:77; logs/trained_ckpt/ens0..9
configs differ only in ``train.seed``; models/sampler.py:95-111 does the
score mean).  Round 3's soup experiment showed TRAJECTORY ensembling (best-K
checkpoints of one run) adds nothing over the best single checkpoint —
members are correlated.  This experiment exercises the real recipe: given K
independently seeded finished runs, measure on the full test set

  a) independent-seed score-average ensemble (the paper recipe),
  b) the best single seed,
  c) soup of the K seeds (weight average — EXPECTED to fail: independently
     trained nets live in different loss basins, averaging them is not a
     model; worth showing),
  d) trajectory ensemble: best-K checkpoints of ONE seed's run (the round-3
     full_campaign arm, for direct comparison).

Usage:
    python tools/ensemble_experiment.py SEED_RUN_DIR [SEED_RUN_DIR ...] \
        --test_set data/synthetic/test_data.pkl --workdir logs/ens_exp \
        --out artifacts/ensemble_experiment.json [--use_ema] [--n_test 0]

Each SEED_RUN_DIR is one seed's train-CLI log dir.  ``--n_test 0`` = full
test set.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]


def best_checkpoint(run_dir: str):
    """(val_loss, iteration, path) of the best checkpoint in one run dir."""
    from tools.full_campaign import rank_checkpoints

    ranked = rank_checkpoints([run_dir])
    if not ranked:
        raise SystemExit(f"no ranked checkpoints in {run_dir}")
    return ranked[0]


def run_arm(name, ckpt_paths, args, extra_argv=()):
    from tsdiff_tpu.cli import evaluate as evaluate_cli
    from tsdiff_tpu.cli import sampling as sampling_cli

    out_dir = os.path.join(args.workdir, name)
    os.makedirs(out_dir, exist_ok=True)
    argv = list(ckpt_paths) + [
        "--test_set", args.test_set,
        "--save_dir", out_dir,
        "--end_idx", str(args.n_test if args.n_test > 0 else 10**9),
        "--n_steps", str(args.n_steps),
        "--sampling_type", args.sampling_type,
        "--step_lr", str(args.step_lr),
        "--batch_size", str(args.batch_size),
        "--seed", str(args.seed),
        "--dtype", "bfloat16",
        "--fused_score",
        "--sort_by_size",
        *extra_argv,
    ]
    if args.use_ema:
        argv.append("--use_ema")
    t0 = time.monotonic()
    sampling_cli.main(argv)
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
        "arm": name,
        "members": [os.path.relpath(p) for p in ckpt_paths],
        "n_samples": n_samples,
        "wall_s": round(wall_s, 1),
        "samples_per_s": round(n_samples / wall_s, 3),
        "dmae_mean": round(float(dmae.mean()), 4),
        "dmae_median": round(float(np.median(dmae)), 4),
        "dmae_frac_under_0.3": round(float((dmae <= 0.3).mean()), 3),
    }
    print(json.dumps(entry))
    return entry


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("seed_dirs", nargs="+", help="one train-CLI log dir per seed")
    ap.add_argument("--test_set", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--out", default="artifacts/ensemble_experiment.json")
    ap.add_argument("--n_test", type=int, default=0, help="0 = full test set")
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--n_steps", type=int, default=5000)
    ap.add_argument("--sampling_type", default="ld")
    ap.add_argument("--step_lr", type=float, default=1e-7)
    ap.add_argument("--seed", type=int, default=2022)
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--timestep_respacing", type=int, default=None,
                    help="run every arm respaced (pairs this experiment with "
                         "tools/respacing_curve.py)")
    ap.add_argument("--skip_trajectory", action="store_true")
    ap.add_argument("--k_sweep", nargs="*", type=int, default=None,
                    help="additionally run intermediate ensemble sizes "
                         "(best-K of the given seeds, by val loss) — the "
                         "D-MAE-vs-K curve of the paper recipe; default "
                         "when given bare: every power of two below K")
    args = ap.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    resp = (
        ["--timestep_respacing", str(args.timestep_respacing)]
        if args.timestep_respacing
        else []
    )

    seed_best = [best_checkpoint(d) for d in args.seed_dirs]
    print("per-seed best checkpoints (val @ iter):")
    for (v, i, p), d in zip(seed_best, args.seed_dirs):
        print(f"  {v:.4f} @ {i:>7,}  {p}")
    seed_paths = [p for _, _, p in seed_best]
    best_single = min(seed_best)[2]

    results = []

    def _checkpoint_write(partial: bool = True):
        # incremental write: an interrupted experiment keeps finished arms
        payload = _payload(args, seed_best, results)
        if partial:
            payload["partial"] = True
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
            f.write("\n")

    # a) the paper recipe: K independent seeds, score-averaged
    results.append(run_arm("indep_ensemble", seed_paths, args, resp))
    _checkpoint_write()
    # b) best single seed
    results.append(run_arm("best_single", [best_single], args, resp))
    _checkpoint_write()
    # c) soup of seeds (expected failure — committed as a negative result)
    from tools.soup import soup_checkpoints

    soup_path = os.path.join(args.workdir, "seed_soup.ckpt")
    with open(soup_path, "wb") as f:
        pickle.dump(soup_checkpoints(seed_paths, use_ema=args.use_ema), f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    soup_args = argparse.Namespace(**{**vars(args), "use_ema": False})
    results.append(run_arm("soup_of_seeds", [soup_path], soup_args, resp))
    _checkpoint_write()
    # a') intermediate ensemble sizes (paper-recipe K axis): best-K seeds
    if args.k_sweep is not None:
        ks = args.k_sweep or [
            k for k in (2, 4, 8) if 1 < k < len(seed_paths)
        ]
        by_val = [p for _, _, p in sorted(seed_best)]
        for k in ks:
            if 1 < k < len(seed_paths):
                results.append(
                    run_arm(f"indep_ensemble_k{k}", by_val[:k], args, resp)
                )
                _checkpoint_write()
    # d) trajectory ensemble: best-K checkpoints of seed 0's run
    if not args.skip_trajectory:
        from tools.full_campaign import rank_checkpoints

        traj = rank_checkpoints([args.seed_dirs[0]])[: len(args.seed_dirs)]
        results.append(
            run_arm("trajectory_ensemble", [p for _, _, p in traj], args, resp)
        )

    _checkpoint_write(partial=False)
    print(f"wrote {args.out}")


def _payload(args, seed_best, results):
    return {
        "test_set": args.test_set,
        "n_test": args.n_test or "full",
        "n_steps": args.n_steps,
        "sampling_type": args.sampling_type,
        "timestep_respacing": args.timestep_respacing,
        "use_ema": bool(args.use_ema),
        "seeds": args.seed_dirs,
        "per_seed_best": [
            {"val": v, "iter": i, "path": os.path.relpath(p)}
            for v, i, p in seed_best
        ],
        "arms": results,
    }


if __name__ == "__main__":
    main()
