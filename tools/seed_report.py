"""Extract committed evidence from finished train-CLI runs.

Parses each run dir's ``log.txt`` into a val-loss curve CSV and emits one
summary JSON (best val/iteration, LR trajectory, wall-clock) — the committed
face of the training runs (artifacts/seeds/).

Usage:
    python tools/seed_report.py logs/seeds/seed101_* logs/seeds/seed102_* \
        --out_dir artifacts/seeds
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import re
import sys

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]

VAL_RE = re.compile(
    r"\[(?P<ts>[\d\- :,]+)::train::INFO\] \[Validate\] Iter (?P<it>\d+) \| "
    r"Loss (?P<loss>[\d.eE+-]+)"
)
TRAIN_RE = re.compile(
    r"\[Train\] Iter (?P<it>\d+) \| Loss (?P<loss>[\d.eE+-]+) \| "
    r"Grad (?P<grad>[\d.eE+-]+) \| LR (?P<lr>[\d.eE+-]+)"
)


def parse_run(run_dir: str) -> dict:
    log_path = os.path.join(run_dir, "log.txt")
    vals, lrs = [], []
    with open(log_path) as f:
        for line in f:
            m = VAL_RE.search(line)
            if m:
                vals.append((int(m["it"]), float(m["loss"]), m["ts"].strip()))
            m = TRAIN_RE.search(line)
            if m:
                lrs.append((int(m["it"]), float(m["lr"])))
    if not vals:
        raise SystemExit(f"no validation lines in {log_path}")
    best_it, best_val, _ = min(vals, key=lambda v: v[1])
    # LR drop points (plateau scheduler evidence)
    drops = [
        {"iter": it, "lr": lr}
        for (it, lr), (_, prev) in zip(lrs[1:], lrs[:-1])
        if lr < prev * 0.999
    ]
    from datetime import datetime

    def _t(ts):
        return datetime.strptime(ts.split(",")[0], "%Y-%m-%d %H:%M:%S")

    wall_s = (_t(vals[-1][2]) - _t(vals[0][2])).total_seconds()
    return {
        "run_dir": run_dir,
        "n_val_points": len(vals),
        "first_val": {"iter": vals[0][0], "loss": vals[0][1]},
        "best_val": {"iter": best_it, "loss": best_val},
        "last_val": {"iter": vals[-1][0], "loss": vals[-1][1]},
        "lr_drops": drops,
        "final_lr": lrs[-1][1] if lrs else None,
        "wall_s_first_to_last_val": round(wall_s, 1),
        "_curve": [(it, loss) for it, loss, _ in vals],
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--out_dir", required=True)
    args = ap.parse_args(argv)

    run_dirs = []
    for pat in args.run_dirs:
        run_dirs.extend(sorted(glob.glob(pat)) or [pat])
    os.makedirs(args.out_dir, exist_ok=True)
    summary = []
    for d in run_dirs:
        info = parse_run(d)
        tag = os.path.basename(d.rstrip("/"))
        csv_path = os.path.join(args.out_dir, f"{tag}_val_curve.csv")
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["iteration", "val_loss"])
            w.writerows(info.pop("_curve"))
        info["val_curve_csv"] = os.path.basename(csv_path)
        summary.append(info)
        print(json.dumps({k: v for k, v in info.items() if k != "lr_drops"}))
    out = os.path.join(args.out_dir, "seeds_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
