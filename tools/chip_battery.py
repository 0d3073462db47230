"""Round-5 on-chip evidence battery: one resumable driver for every run.

The round-5 evidence plan (VERDICT r04 asks #2/#3/#4) needs a long sequence
of real-TPU runs — the 400k production continuation FIRST (the respacing
headline must be re-validated on converged weights), the respacing quality
curve including ddpm points, 8 independently seeded trainings to 150k iters,
the powered ensemble experiment (n_test 1000, K in {1,2,4,8}), the full
5000-step 10k campaign, serving benches with per-tier quality, and
full-length bench anchors.
The chip must only ever be driven by ONE process, and a session restart must
not lose progress, so this driver runs the stages strictly sequentially with
a stamp file per finished stage (.scratch/battery/<stage>.done): rerunning
the script skips finished stages, and interrupted seed trainings resume
through the train CLI's own log-dir resume path.

Every stage's committed face lands in artifacts/ (see artifacts/README.md);
stage stdout/stderr go to .scratch/battery/<stage>.log.

Usage (real TPU, from the repo root):
    python tools/chip_battery.py [--only STAGE [STAGE ...]] [--list]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [ROOT]

PY = sys.executable
SCRATCH = os.path.join(ROOT, ".scratch")
BATTERY = os.path.join(SCRATCH, "battery")
SEEDS_DIR = os.path.join(SCRATCH, "seeds")
SEEDS = (101, 102, 103, 104, 105, 106, 107, 108, 109)
# homogeneous-budget members for the paper's K-vs-quality question (seed 101
# continues to 400k in prod_400k, so it would dominate any arm it joins —
# the K sweep needs members at EQUAL training budget to isolate the
# score-averaging effect)
ENSEMBLE_SEEDS = (102, 103, 104, 105, 106, 107, 108, 109)
# Round-5 per-seed schedule: 150k iters (VERDICT r04 ask #4 — the round-4
# 30k-iter members were budget casualties; at the measured ~8.4 ms/iter
# that's ~21 min/seed, well past the first LR drops).  Seed 101 additionally
# continues to the full 400k reference schedule in the prod_400k stage.
TRAIN_ITERS = int(os.environ.get("BATTERY_TRAIN_ITERS", "150000"))
# Paired test subset per experiment point (full 10k-point sweeps are for the
# dedicated campaign stages).  Round 5: 1000 so a few-percent D-MAE ensemble
# effect is resolvable (VERDICT r04 ask #4).
N_TEST = int(os.environ.get("BATTERY_N_TEST", "1000"))
COMMIT = os.environ.get("BATTERY_COMMIT", "1") != "0"

os.chdir(ROOT)


def git_commit(stage: str) -> None:
    """Commit the stage's artifacts immediately — evidence must survive a
    session reset (scratch/logs do not)."""
    if not COMMIT:
        return
    subprocess.run(["git", "add", "-A", "artifacts"], check=False)
    diff = subprocess.run(["git", "diff", "--cached", "--quiet"])
    if diff.returncode == 0:
        return
    subprocess.run(
        ["git", "commit", "-q", "-m",
         f"Evidence battery: {stage} artifacts from on-chip run"],
        check=False,
    )


def seed_config(seed: int) -> str:
    """Write .scratch/seeds/seed<seed>.yml — the production config with only
    train.seed changed (the reference's ens0..9 configs differ only in
    train.seed; logs/trained_ckpt/ens*.yml)."""
    os.makedirs(SEEDS_DIR, exist_ok=True)
    path = os.path.join(SEEDS_DIR, f"seed{seed}.yml")
    with open(os.path.join(ROOT, "configs", "synthetic_production.yml")) as f:
        text = f.read()
    text = text.replace("  seed: 0\n", f"  seed: {seed}\n")
    assert f"seed: {seed}" in text
    with open(path, "w") as f:
        f.write(text)
    return path


def seed_run_dirs(seed: int) -> list[str]:
    """Existing train-CLI log dirs for one seed (original + any resumes),
    oldest first."""
    return sorted(
        d for d in glob.glob(os.path.join(SEEDS_DIR, f"seed{seed}_*"))
        if os.path.isdir(d)
    )


def all_seed_dirs() -> list[str]:
    return [d for s in SEEDS for d in seed_run_dirs(s)]


def best_seed_ckpts(k: int = 8) -> list[str]:
    """Best checkpoint per seed, best-k across seeds by val loss (the
    independent-seed ensemble members; k=8 matches the reference's
    8-checkpoint production recipe, README.md:77)."""
    from tools.full_campaign import ckpt_meta, rank_checkpoints

    out = []
    for s in SEEDS:
        ranked = rank_checkpoints(seed_run_dirs(s))
        if ranked:
            out.append(ranked[0])
            continue
        # scratch wiped between sessions: fall back to the committed export
        exported = os.path.join("artifacts", "seeds", "ckpts", f"seed{s}_best.ckpt")
        if not os.path.exists(exported):
            continue
        out.append(ckpt_meta(exported))
    if not out:
        raise SystemExit("no seed checkpoints anywhere")
    return [p for _, _, p in sorted(out)[:k]]


def gated_respacing() -> tuple[str, int]:
    """(rule, steps) of the quality-gated respaced point from the committed
    curve; falls back to ld:2500 when the curve is absent (the fallback is
    only used for scheduling later stages, never for quality claims)."""
    from bench import quality_gated_respacing

    resp = quality_gated_respacing()
    if resp is None:
        return "ld", 2500
    return resp["rule"], resp["steps"]


def run_cmds(stage: str, cmds: list[list[str]]) -> None:
    log_path = os.path.join(BATTERY, f"{stage}.log")
    with open(log_path, "a") as log:
        for cmd in cmds:
            log.write(f"\n=== {time.strftime('%F %T')} $ {' '.join(cmd)}\n")
            log.flush()
            subprocess.run(cmd, check=True, stdout=log, stderr=subprocess.STDOUT)


def train_stage(seed: int) -> None:
    dirs = seed_run_dirs(seed)
    target = dirs[-1] if dirs else seed_config(seed)
    run_cmds(f"train_seed{seed}", [[
        PY, "-m", "tsdiff_tpu.cli.train", target,
        "--logdir", SEEDS_DIR, "--tag", f"seed{seed}",
        "--max_iters", str(TRAIN_ITERS),
        "--dtype", "bfloat16", "--packed_train", "--device_data", "auto",
    ]])
    # the run dir exists only AFTER training — build the report args now
    run_cmds(f"train_seed{seed}", [[
        PY, "tools/seed_report.py", *all_seed_dirs(),
        "--out_dir", "artifacts/seeds",
    ]])
    # commit the seed's best checkpoint params-only: the ensemble members
    # must survive the scratch wipe between sessions
    from tools.full_campaign import rank_checkpoints

    ranked = rank_checkpoints(seed_run_dirs(seed))
    if ranked:
        run_cmds(f"train_seed{seed}", [[
            PY, "tools/export_ckpt.py", ranked[0][2],
            os.path.join("artifacts", "seeds", "ckpts", f"seed{seed}_best.ckpt"),
        ]])


def respacing_stage() -> None:
    # trajectory best-4 of seed 101 AFTER the 400k production continuation
    # (VERDICT r04 ask #2: the curve must be measured on converged weights):
    # the curve is a PAIRED quality comparison (same members at every step
    # count), so trajectory members are valid; the independent-seed
    # experiment re-measures the gated point separately.  ddpm points are
    # REQUIRED coverage — under the production step_lr the LD min-clamp makes
    # generalized == ld, so respaced-ddpm is the only rule with genuinely
    # different update algebra at the respaced pairs (VERDICT r04 weak #6).
    run_cmds("respacing_curve_prod", [[
        PY, "tools/respacing_curve.py", *seed_run_dirs(101),
        "--test_set", "data/synthetic/test_data.pkl",
        "--save_dir", os.path.join(SCRATCH, "respace_r05"),
        "--out", "artifacts/respacing_curve.json",
        "--ensemble", "4", "--n_test", str(N_TEST),
        "--points", "ld:5000", "ld:2500", "ld:1250", "ld:625",
        "ddpm:5000", "ddpm:2500", "ddpm:1250", "ddpm:625",
        "generalized:1250",
    ]])


def ensemble_stage() -> None:
    # run the arms at the quality-gated respaced point — pairs this
    # experiment with the committed curve and fits the session budget; the
    # gated point is by construction quality-equal to the 5000-step schedule.
    # Members: the 8 EQUAL-BUDGET seeds (150k iters), K in {1,2,4,8} — the
    # reference's 8-checkpoint recipe (README.md:77) at homogeneous training,
    # n_test 1000 so a few-percent effect is resolvable (VERDICT r04 ask #4).
    rule, steps = gated_respacing()
    extra = []
    if steps < 5000:
        extra = ["--sampling_type", rule, "--timestep_respacing", str(steps)]
    run_cmds("ensemble_experiment", [[
        PY, "tools/ensemble_experiment.py",
        *(seed_run_dirs(s)[-1] for s in ENSEMBLE_SEEDS if seed_run_dirs(s)),
        "--test_set", "data/synthetic/test_data.pkl",
        "--workdir", os.path.join(SCRATCH, "ens_exp_r05"),
        "--out", "artifacts/ensemble_experiment.json",
        "--n_test", str(N_TEST),
        "--k_sweep", *extra,
    ]])


def campaign_stage(respaced: bool) -> None:
    name = "campaign_10k_respaced" if respaced else "campaign_10k"
    # fresh scratch dir per round: the sampling CLI resumes from existing
    # sample shards, which would silently mix round-4 members' samples in
    save_dir = os.path.join(SCRATCH, name + "_r05")
    cmd = [
        PY, "tools/full_campaign.py", SEEDS_DIR,  # run_dirs unused with --ckpts
        "--test_set", "data/synthetic_10k/test_data.pkl",
        "--save_dir", save_dir,
        "--ckpts", *best_seed_ckpts(),
    ]
    if respaced:
        rule, steps = gated_respacing()
        cmd += ["--sampling_type", rule, "--timestep_respacing", str(steps)]
    art_dir = os.path.join("artifacts", name)
    run_cmds(name, [
        cmd,
        ["mkdir", "-p", art_dir],
        ["cp", os.path.join(save_dir, "campaign_summary.json"), art_dir],
    ])


def serve_stage(mixed: bool) -> None:
    name = "serve_bench_mixed" if mixed else "serve_bench"
    _, steps = gated_respacing()
    cmd = [
        PY, "tools/serve_bench.py",
        "--draft_respacing", str(steps),
        "--json", f"artifacts/{name}_r05.json",
        # trained members + ground truth => per-tier quality columns
        "--ckpts", *best_seed_ckpts(),
        "--test_set", "data/synthetic/test_data.pkl",
    ]
    if mixed:
        cmd.append("--mixed")
    run_cmds(name, [cmd])


def bench_full_stage() -> None:
    log_path = os.path.join(BATTERY, "bench_full.log")
    with open(log_path, "a") as log:
        out = subprocess.run(
            [PY, "bench.py", "--full"], check=True,
            stdout=subprocess.PIPE, stderr=log, text=True,
        ).stdout
    # last stdout line is the JSON result
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    with open("artifacts/bench_full_r05.json", "w") as f:
        f.write(line + "\n")


def prod_400k_stage() -> None:
    # continuation target for seed 101 — the full 400k reference schedule
    # when a session has the budget, otherwise whatever BATTERY_PROD_ITERS
    # allows (the train CLI resumes from the latest checkpoint either way)
    target = os.environ.get("BATTERY_PROD_ITERS", "400000")
    run_cmds("prod_400k", [[
        PY, "-m", "tsdiff_tpu.cli.train", seed_run_dirs(101)[-1],
        "--logdir", SEEDS_DIR, "--tag", "seed101",
        "--max_iters", target,
        "--dtype", "bfloat16", "--packed_train", "--device_data", "auto",
    ]])
    # refresh the committed val curves and the params-only best export so the
    # converged member survives a scratch wipe (same tail as train_stage)
    run_cmds("prod_400k", [[
        PY, "tools/seed_report.py", *all_seed_dirs(),
        "--out_dir", "artifacts/seeds",
    ]])
    from tools.full_campaign import rank_checkpoints

    ranked = rank_checkpoints(seed_run_dirs(101))
    if ranked:
        run_cmds("prod_400k", [[
            PY, "tools/export_ckpt.py", ranked[0][2],
            os.path.join("artifacts", "seeds", "ckpts", "seed101_best.ckpt"),
        ]])


def prod_report_stage() -> None:
    os.makedirs("artifacts/prod_full", exist_ok=True)
    log_path = os.path.join(BATTERY, "prod_report.log")
    with open(log_path, "a") as log:
        out = subprocess.run(
            [PY, "tools/prod_run_report.py", *seed_run_dirs(101),
             "--ema_compare", "--dtype", "bfloat16",
             "--markdown", "artifacts/prod_full/report.md"],
            check=True, stdout=subprocess.PIPE, stderr=log, text=True,
        ).stdout
    with open("artifacts/prod_full/report_stdout.txt", "w") as f:
        f.write(out)


STAGES: list[tuple[str, callable]] = [
    ("corpus", lambda: run_cmds("corpus", [[
        PY, "tools/make_synthetic_corpus.py", "--save_dir", "data/synthetic"]])),
    ("corpus_10k", lambda: run_cmds("corpus_10k", [[
        PY, "tools/make_synthetic_corpus.py", "--save_dir", "data/synthetic_10k",
        "--n_train", "0", "--n_val", "0", "--n_test", "10000",
        "--seed", "1042"]])),
    # round-5 ordering (strictly by value-per-minute; every stage commits its
    # own evidence): the 400k production continuation FIRST — the respacing
    # headline must be re-measured on converged weights (VERDICT r04 ask #2),
    # and prod_report closes DEMO.md's dangling citation (ask #3)
    ("prod_400k", prod_400k_stage),
    ("prod_report", prod_report_stage),
    ("respacing_curve_prod", respacing_stage),
    ("bench_full_r05", bench_full_stage),
    # equal-budget independent seeds for the powered K sweep and the
    # 8-member campaign (102-104 resume from their 30k round-4 dirs)
    *[(f"train_seed{s}_150k", lambda s=s: train_stage(s))
      for s in ENSEMBLE_SEEDS],
    ("ensemble_experiment_r05", ensemble_stage),
    ("campaign_10k_full", lambda: campaign_stage(respaced=False)),
    ("campaign_10k_respaced_r05", lambda: campaign_stage(respaced=True)),
    ("serve_bench_r05", lambda: serve_stage(mixed=False)),
    ("serve_bench_mixed_r05", lambda: serve_stage(mixed=True)),
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", nargs="+", default=None,
                    help="run only these stages (still skips finished ones)")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--force", nargs="*", default=(),
                    help="ignore these stages' stamps")
    args = ap.parse_args(argv)

    # The driver itself must NEVER claim the TPU — only one process may drive
    # the chip at a time, and that is always the stage subprocess.  Helpers
    # like rank_checkpoints import jax transitively, so pin this process to
    # CPU before any backend initialization (env vars are ignored here — the
    # axon plugin registers in sitecustomize; see .claude/skills/verify).
    import jax

    jax.config.update("jax_platforms", "cpu")

    os.makedirs(BATTERY, exist_ok=True)
    if args.list:
        for name, _ in STAGES:
            stamp = os.path.join(BATTERY, f"{name}.done")
            print(f"{'done' if os.path.exists(stamp) else '    '}  {name}")
        return

    for name, fn in STAGES:
        if args.only and name not in args.only:
            continue
        stamp = os.path.join(BATTERY, f"{name}.done")
        if os.path.exists(stamp) and name not in args.force:
            print(f"[battery] skip {name} (done)", flush=True)
            continue
        print(f"[battery] start {name} at {time.strftime('%F %T')}", flush=True)
        t0 = time.monotonic()
        fn()
        with open(stamp, "w") as f:
            f.write(f"{time.strftime('%F %T')} wall_s={time.monotonic() - t0:.1f}\n")
        git_commit(name)
        print(f"[battery] done {name} in {time.monotonic() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
