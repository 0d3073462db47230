"""Reproduce the DEMO.md soup-vs-ensemble measurement end-to-end.

Pipeline (one TPU chip; ~15 min with the defaults):

  1. generate a synthetic wb97xd3-shaped corpus (tools/make_synthetic_corpus);
  2. train the production model for --iters iterations (checkpoints saved on
     every val improvement);
  3. build the soup of the best --members trajectory checkpoints
     (tools/soup.py, EMA weights);
  4. sample the test set three ways through the production sampling CLI —
     best-K score-averaged ensemble, the weight-averaged soup of the same K,
     and the best single checkpoint — timing each run;
  5. score all three with automorphism-aware D-MAE (cli/evaluate).

Prints one JSON line per configuration: {"config", "wall_s", "dmae_mean",
"dmae_median"}.  Run: ``python tools/soup_experiment.py --workdir /tmp/soup``.
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


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--members", type=int, default=4)
    ap.add_argument("--n_train", type=int, default=8000)
    ap.add_argument("--n_eval", type=int, default=400)
    ap.add_argument("--n_steps", type=int, default=5000)
    args = ap.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    import yaml

    from tsdiff_tpu.cli import sampling as sampling_cli
    from tsdiff_tpu.cli import train as train_cli
    from tsdiff_tpu.train import load_checkpoint

    import make_synthetic_corpus
    import soup as soup_tool

    data = os.path.join(args.workdir, "data")
    make_synthetic_corpus.main([
        "--save_dir", data, "--n_train", str(args.n_train),
        "--n_val", str(args.n_eval), "--n_test", str(args.n_eval),
    ])
    cfg = yaml.safe_load(open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "synthetic_production.yml")))
    cfg["dataset"] = {
        "train": os.path.join(data, "train_data.pkl"),
        "val": os.path.join(data, "valid_data.pkl"),
        "test": os.path.join(data, "test_data.pkl"),
    }
    cfg_path = os.path.join(args.workdir, "cfg.yml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    logdir = os.path.join(args.workdir, "logs")
    train_cli.main([cfg_path, "--logdir", logdir, "--max_iters", str(args.iters),
                    "--dtype", "bfloat16", "--packed_train", "--device_data", "on"])

    ckpts = sorted(
        glob.glob(os.path.join(logdir, "*", "checkpoints", "*.ckpt")),
        key=lambda p: load_checkpoint(p)["avg_val_loss"],
    )[: args.members]
    if len(ckpts) < 2:
        raise SystemExit("training produced <2 checkpoints; raise --iters")
    print(f"best-{len(ckpts)} members: {[os.path.basename(p) for p in ckpts]}")

    soup_path = os.path.join(args.workdir, "soup.ckpt")
    soup_tool.main([*ckpts, "--out", soup_path, "--use_ema"])

    configs = {
        f"ens{len(ckpts)}": [*ckpts, "--use_ema"],
        "soup": [soup_path],
        "single_best": [ckpts[0], "--use_ema"],
    }
    results = []
    for name, ck_args in configs.items():
        out_dir = os.path.join(args.workdir, f"out_{name}")
        t0 = time.perf_counter()
        sampling_cli.main([
            *ck_args, "--test_set", cfg["dataset"]["test"],
            "--save_dir", out_dir, "--batch_size", "100",
            "--sampling_type", "ld", "--n_steps", str(args.n_steps),
            "--step_lr", "1e-7", "--dtype", "bfloat16", "--fused_score",
            "--sort_by_size",
        ])
        wall = time.perf_counter() - t0
        with open(os.path.join(out_dir, "samples_all.pkl"), "rb") as f:
            samples = pickle.load(f)
        from tsdiff_tpu.eval.dmae import dmae_for_graph

        import numpy as np

        dmaes = np.asarray([
            dmae_for_graph(g, np.asarray(g["pos_gen"])) for g in samples
        ])
        row = {
            "config": name, "wall_s": round(wall, 1),
            "dmae_mean": round(float(dmaes.mean()), 4),
            "dmae_median": round(float(np.median(dmaes)), 4),
        }
        results.append(row)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
