"""Calibrate the protein quality gate by running its EXACT pipeline.

Runs ``tests/test_protein_gate.run_gate`` (the same corpus, model, training
loop, and production protein_sampling CLI the committed gate uses) at one or
more training budgets and appends the measured points to
``artifacts/protein_calibration.json`` — the committed evidence the gate's
thresholds cite.  Because the measurement IS the gate function, thresholds
can never drift from what the gate actually runs.

Usage:
    python tools/protein_gate_calibrate.py [--iters 4000 ...] \
        [--out artifacts/protein_calibration.json] [--workdir .scratch/pcal]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tests")]

# match the suite's backend (the gate runs under the CPU conftest)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", nargs="+", type=int, default=[4000])
    ap.add_argument("--out", default="artifacts/protein_calibration.json")
    ap.add_argument("--workdir", default=".scratch/pcal")
    args = ap.parse_args(argv)

    import test_protein_gate as G

    points = []
    for it in args.iters:
        wd = pathlib.Path(args.workdir) / f"iters{it}"
        wd.mkdir(parents=True, exist_ok=True)
        m = G.run_gate(wd, iters=it)
        m["sigma_begin"] = float(G.CFG.sigma_begin)
        points.append(m)
        print(json.dumps(m))

    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    out["gate"] = {
        "description": "measured by tools/protein_gate_calibrate.py running "
                       "tests/test_protein_gate.run_gate verbatim (multi-"
                       "residue SER/CYS/VAL corpus, sigma_begin 2.0)",
        "points": points,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
