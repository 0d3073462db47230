"""Post-run report for a full production training schedule.

The reference trains 400k iterations x batch 200 with a plateau LR schedule
and keeps the lowest-val-loss checkpoint (reference train.py:124-231,
configs/train_config.yml:37-53); it records nothing beyond the log lines.
This tool turns one of our training log directories into the evidence the
run exists to produce:

  * the validation-loss curve (milestone table + best/final summary),
  * every plateau-LR drop with the iteration it happened at,
  * an EMA-vs-raw comparison at the best checkpoint (EMA is our addition —
    absent in the reference — so this quantifies what it buys), evaluated
    with the SAME fixed validation keys the train CLI uses, so the raw
    number reproduces the logged val loss (bit-exact on the training
    platform; ~0.1% off when re-evaluated on CPU vs a bf16 TPU run).

A resumed run logs into a fresh ``*_resume`` directory (mirroring the
reference's resume flow), so the tool accepts MULTIPLE run dirs and merges
their logs into one curve: later dirs win on duplicate iterations, and the
EMA comparison uses the latest checkpoint across all of them.

Usage:
    python tools/prod_run_report.py logs/prod_full/<run_dir> [<resume_dir> ...]
        [--ema_compare] [--markdown out.md]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]

LOG_TRAIN = re.compile(
    r"\[Train\] Iter (\d+) \| Loss ([\d.]+) \| Grad ([\d.eE+-]+) \| LR ([\d.eE+-]+)"
)
LOG_VAL = re.compile(r"\[Validate\] Iter (\d+) \| Loss ([\d.]+)")


def parse_log(path: str):
    train, val = [], []
    with open(path) as f:
        for line in f:
            m = LOG_TRAIN.search(line)
            if m:
                train.append(
                    (int(m.group(1)), float(m.group(2)), float(m.group(3)), float(m.group(4)))
                )
                continue
            m = LOG_VAL.search(line)
            if m:
                val.append((int(m.group(1)), float(m.group(2))))
    return train, val


def lr_drops(train):
    """(iteration, old_lr, new_lr) for every plateau-scheduler step-down."""
    drops = []
    for (i0, _, _, lr0), (i1, _, _, lr1) in zip(train, train[1:]):
        if lr1 < lr0 * (1 - 1e-9):
            drops.append((i1, lr0, lr1))
    return drops


def milestone_table(val, every: int = 20_000):
    rows = [(it, v) for it, v in val if it % every == 0 or (it, v) == val[-1]]
    # always include the best point
    best = min(val, key=lambda t: t[1])
    if best not in rows:
        rows.append(best)
        rows.sort()
    lines = ["| iteration | val loss |", "|---|---|"]
    for it, v in rows:
        mark = " **(best)**" if (it, v) == best else ""
        lines.append(f"| {it:,} | {v:.4f}{mark} |")
    return "\n".join(lines)


def latest_checkpoint(run_dirs):
    """(path, iteration) of the newest checkpoint across all run dirs."""
    from tsdiff_tpu.train import get_checkpoint_path

    best = None
    for d in run_dirs:
        ckpt_dir = os.path.join(d, "checkpoints")
        if not os.path.isdir(ckpt_dir) or not os.listdir(ckpt_dir):
            continue
        path, it = get_checkpoint_path(ckpt_dir)
        if best is None or it > best[1]:
            best = (path, it)
    if best is None:
        raise SystemExit(f"no checkpoints under any of {run_dirs}")
    return best


def ema_compare(run_dirs, dtype_name="float32", platform="cpu"):
    """Val loss with raw vs EMA params at the latest checkpoint (train-CLI keys).

    ``dtype_name`` must match the train run's --dtype (a CLI flag, not stored
    in the checkpoint config) for the raw number to reproduce the logged one.
    """
    import jax

    if platform:  # before any computation; env JAX_PLATFORMS is unreliable here
        jax.config.update("jax_platforms", platform)

    from tsdiff_tpu.config import Config
    from tsdiff_tpu.data import PaddedBatchLoader, TSDataset
    from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
    from tsdiff_tpu.models import get_model
    from tsdiff_tpu.train import load_checkpoint
    from tsdiff_tpu.train.trainer import make_eval_step

    ckpt_path, it = latest_checkpoint(run_dirs)
    ck = load_checkpoint(ckpt_path)
    config = Config(ck["config"])
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None
    model = get_model(config.model, dtype=dtype)
    schedule = DiffusionSchedule.from_config(config.model)
    eval_step = make_eval_step(
        model, schedule,
        t0=config.model.get("t0", 0), t1=config.model.get("t1", None),
        anneal_power=config.train.get("anneal_power", 2.0),
    )
    val_loader = PaddedBatchLoader(
        TSDataset(config.dataset.val), config.train.batch_size, shuffle=False,
        bucket_sizes=config.get("tpu", Config()).get("bucket_sizes", None),
    )

    def run(params):
        params = jax.tree_util.tree_map(jnp.asarray, params)
        sum_loss = sum_n = 0.0
        for vi, batch in enumerate(val_loader):
            ls, nn = eval_step(params, batch, jax.random.key(10_000_000 + vi))
            sum_loss += float(ls)
            sum_n += float(nn)
        return sum_loss / max(sum_n, 1.0)

    raw = run(ck["params"])
    ema = run(ck["ema_params"]) if ck.get("ema_params") is not None else None
    return {
        "ckpt": ckpt_path,
        "iteration": it,
        "logged_val": ck.get("avg_val_loss"),
        "raw_val": raw,
        "ema_val": ema,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dirs", nargs="+",
                    help="train-CLI log dir(s); pass the original run plus any "
                         "*_resume dirs, oldest first")
    ap.add_argument("--ema_compare", action="store_true",
                    help="evaluate raw vs EMA params at the best checkpoint")
    ap.add_argument("--milestone_every", type=int, default=20_000)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                    help="compute dtype for --ema_compare; must match the "
                         "train run's --dtype to reproduce its logged val loss")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for --ema_compare (default cpu so the "
                         "report never contends with a live TPU training run; "
                         "pass '' to use the session default)")
    ap.add_argument("--markdown", default=None, help="also write the report here")
    args = ap.parse_args(argv)

    run_dirs = []
    for run_dir in args.run_dirs:
        if os.path.exists(os.path.join(run_dir, "log.txt")):
            run_dirs.append(run_dir)
            continue
        subs = sorted(glob.glob(os.path.join(run_dir, "*", "log.txt")))
        if not subs:
            raise SystemExit(f"no log.txt under {run_dir}")
        run_dirs.extend(os.path.dirname(s) for s in subs)

    train_by_it, val_by_it = {}, {}
    for d in run_dirs:  # later dirs (resumes) win on duplicate iterations
        t, v = parse_log(os.path.join(d, "log.txt"))
        train_by_it.update({row[0]: row for row in t})
        val_by_it.update({it: (it, loss) for it, loss in v})
    train = [train_by_it[k] for k in sorted(train_by_it)]
    val = [val_by_it[k] for k in sorted(val_by_it)]
    if not val:
        raise SystemExit("no [Validate] lines found — did the run reach val_freq?")

    out = [f"# Production run report — {', '.join(run_dirs)}", ""]
    best_it, best_v = min(val, key=lambda t: t[1])
    out += [
        f"- iterations logged: train {train[-1][0]:,}, last val at {val[-1][0]:,}",
        f"- first val loss: {val[0][1]:.4f} (iter {val[0][0]:,})",
        f"- best val loss: **{best_v:.4f}** at iter {best_it:,}",
        f"- final val loss: {val[-1][1]:.4f} (iter {val[-1][0]:,})",
        f"- final train LR: {train[-1][3]:.6g}",
        "",
        "## Validation-loss curve",
        "",
        milestone_table(val, args.milestone_every),
        "",
        "## Plateau-LR events",
        "",
    ]
    drops = lr_drops(train)
    if drops:
        out += [f"- iter {it:,}: {lr0:.6g} -> {lr1:.6g}" for it, lr0, lr1 in drops]
    else:
        out += ["- none (LR stayed at its initial value)"]

    if args.ema_compare:
        cmp = ema_compare(run_dirs, dtype_name=args.dtype, platform=args.platform)
        out += [
            "",
            "## EMA vs raw at the best checkpoint",
            "",
            f"- checkpoint: `{cmp['ckpt']}` (iter {cmp['iteration']:,})",
            f"- raw-params val loss: {cmp['raw_val']:.6f}"
            + (f" (logged at save time: {cmp['logged_val']:.6f})"
               if cmp["logged_val"] is not None else ""),
        ]
        if cmp["ema_val"] is not None:
            delta = (cmp["raw_val"] - cmp["ema_val"]) / cmp["raw_val"] * 100.0
            out += [
                f"- EMA-params val loss: {cmp['ema_val']:.6f} "
                f"({delta:+.2f}% vs raw; positive = EMA better)",
            ]
        else:
            out += ["- checkpoint carries no EMA params"]

    report = "\n".join(out)
    print(report)
    if args.markdown:
        with open(args.markdown, "w") as f:
            f.write(report + "\n")


if __name__ == "__main__":
    main()
