"""Checkpoint soup: weight-average trajectory checkpoints into ONE model.

The reference's inference recipe averages the SCORES of 8 independently
trained checkpoints every step (8x the per-step network cost,
reference README.md:77).  For checkpoints drawn from ONE training
trajectory (the full_campaign setting), averaging the WEIGHTS instead
("model soup" / LAWA-style trajectory averaging) collapses the ensemble
into a single network — same per-step cost as one member, i.e. ~Kx the
sampling throughput of a K-member ensemble — whenever the quality holds.
tools/soup_experiment.py reproduces the DEMO.md soup-vs-ensemble
measurement end-to-end; this tool just builds the soup.

Usage:
    python tools/soup.py CKPT1 CKPT2 ... --out soup.ckpt [--use_ema]

The output is a standard self-describing checkpoint (config from the first
member) usable by every CLI.  Configs must agree on the model section.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]


def soup_checkpoints(paths: list[str], use_ema: bool = False) -> dict:
    import numpy as np

    import jax

    from tsdiff_tpu.train import load_checkpoint, select_params

    cks = [load_checkpoint(p) for p in paths]
    model_cfgs = [ck["config"].get("model") for ck in cks]
    if any(c != model_cfgs[0] for c in model_cfgs[1:]):
        raise ValueError("checkpoints disagree on the model config; "
                         "souping requires identical architectures")

    trees = [select_params(ck, use_ema)[0] for ck in cks]
    mean = jax.tree_util.tree_map(
        lambda *leaves: np.mean(np.stack([np.asarray(x) for x in leaves]), axis=0),
        *trees,
    )
    return {
        "format": "tsdiff_tpu.ckpt.v1",
        "config": cks[0]["config"],
        "params": mean,
        "opt_state": None,
        "scheduler": None,
        "iteration": max(int(ck.get("iteration") or 0) for ck in cks),
        "avg_val_loss": None,
        "soup_members": [os.path.basename(p) for p in paths],
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpts", nargs="+", help="member checkpoints (>=2)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--use_ema", action="store_true", default=False,
                    help="average the EMA weights where present")
    args = ap.parse_args(argv)
    if len(args.ckpts) < 2:
        raise SystemExit("need at least 2 checkpoints to soup")
    payload = soup_checkpoints(args.ckpts, use_ema=args.use_ema)
    with open(args.out, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"wrote {args.out}: soup of {len(args.ckpts)} checkpoints "
          f"(latest iteration {payload['iteration']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
