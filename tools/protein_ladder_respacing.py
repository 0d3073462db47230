"""Measured quality cost of DSM sigma-ladder respacing (protein family).

The diffusion family's timestep respacing (artifacts/respacing_curve.json)
has a DSM analog: anneal through only an evenly-strided m-level subsequence
of the sigma ladder (``--sigma_respacing``; dual_objective.py
dsm_annealed_sampling).  Per-sample cost scales with m/num_noise_level, so
the question is what m costs in held-out quality.  This tool trains ONE gate
model (tests/test_protein_gate.train_gate_model — the exact calibrated
pipeline, sigma_begin 2.0, 10 levels) and samples the held-out chains at a
sweep of m values through the production protein_sampling CLI, committing
chi1 accuracy / rotamer concentration / sidechain RMSD / wall time per point
to ``artifacts/protein_ladder_respacing.json``.  cli/sampling.py's and
cli/protein_sampling.py's --sigma_respacing help strings cite this artifact.

Usage:
    python tools/protein_ladder_respacing.py [--iters 8000] \
        [--levels 10 7 5 3] [--out artifacts/protein_ladder_respacing.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

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
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--levels", nargs="+", type=int, default=[10, 7, 5, 3])
    ap.add_argument("--out", default="artifacts/protein_ladder_respacing.json")
    ap.add_argument("--workdir", default=".scratch/ladder_respace")
    args = ap.parse_args(argv)

    import test_protein_gate as G

    wd = pathlib.Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    t0 = time.monotonic()
    params0, params, loss, test_pkl, _ = G.train_gate_model(wd, iters=args.iters)
    train_s = time.monotonic() - t0

    n_levels_full = int(G.CFG.num_noise_level)
    points = []
    for m in args.levels:
        extra = []
        if m < n_levels_full:
            extra = ["--sigma_respacing", str(m)]
        t0 = time.monotonic()
        rms, chi1, n_chi1, rot = G.sample_and_score(
            wd, params, f"m{m}", test_pkl, extra_argv=extra)
        wall_s = time.monotonic() - t0

        def _r(x, nd=3):
            x = float(x)
            return round(x, nd) if x == x and abs(x) != float("inf") else None

        entry = {
            "levels": m,
            "cost_fraction": round(m / n_levels_full, 3),
            "wall_s": round(wall_s, 1),
            "rmsd": _r(rms),
            "chi1": _r(chi1),
            "n_chi1": n_chi1,
            "rot_gplus": _r(rot["wells"].get("g+", float("nan"))),
            "circ_R": _r(rot["circ_R"]),
        }
        points.append(entry)
        print(json.dumps(entry), flush=True)

    out = {
        "description": (
            "DSM sigma-ladder respacing quality sweep: gate pipeline "
            "(tests/test_protein_gate.py — multi-residue SER/CYS/VAL corpus, "
            "sigma_begin 2.0, 10 noise levels, 300 Langevin steps/level, "
            "production protein_sampling CLI on 2 held-out chains), one "
            "trained model sampled at m evenly-strided ladder levels "
            "(--sigma_respacing). cost_fraction = m / num_noise_level."
        ),
        "iters": args.iters,
        "final_loss": round(loss, 1),
        "train_wall_s": round(train_s, 1),
        "n_levels_full": n_levels_full,
        "points": points,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2, allow_nan=False)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
