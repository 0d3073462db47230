"""Run the test suite and commit a per-test timing table.

TESTING.md's suite-time story (VERDICT r03 weak #4) needs committed
numbers: this runs ``pytest tests/`` with a tiny timing plugin and writes
``artifacts/suite_timings.json`` with the total wall-clock, the environment
(cores — auto-xdist engages at >=4), pass/fail counts, and the slowest
tests.

Usage:
    python tools/suite_timings.py [--out artifacts/suite_timings.json] \
        [-m MARKEXPR] [--top 40] [pytest-args ...]
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

PLUGIN = """
import json, os


class _Timings:
    def __init__(self):
        self.records = {}
        self.outcomes = {}

    def pytest_runtest_logreport(self, report):
        rec = self.records.setdefault(report.nodeid, 0.0)
        self.records[report.nodeid] = rec + getattr(report, "duration", 0.0)
        if report.when == "call" or (report.when == "setup" and report.skipped):
            self.outcomes[report.nodeid] = report.outcome
        elif report.failed:
            # pytest's standard "error" case: a failure in setup/teardown has
            # no call-phase report, and would otherwise vanish from the
            # counts (ADVICE r04)
            self.outcomes[report.nodeid] = "error"

    def pytest_sessionfinish(self, session):
        # one shard per xdist worker; the controller (which sees forwarded
        # reports too) writes nothing when workers exist
        wid = os.environ.get("PYTEST_XDIST_WORKER")
        path = BASE + ("." + wid if wid else "")
        if wid is None and session.config.pluginmanager.hasplugin("dsession"):
            return
        with open(path, "w") as f:
            json.dump({"tests": self.records, "outcomes": self.outcomes}, f)


def pytest_configure(config):
    config.pluginmanager.register(_Timings(), "suite-timings")
"""


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="artifacts/suite_timings.json")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("-m", dest="markexpr", default=None)
    ap.add_argument("pytest_args", nargs="*")
    args = ap.parse_args(argv)

    scratch = os.path.join(ROOT, ".scratch")
    os.makedirs(scratch, exist_ok=True)
    base = os.path.join(scratch, "suite_timings_raw.json")
    for p in glob.glob(base + "*"):
        os.unlink(p)
    with open(os.path.join(scratch, "_timing_plugin.py"), "w") as f:
        f.write(f"BASE = {base!r}\n" + PLUGIN)

    env = dict(os.environ)
    env["PYTHONPATH"] = scratch + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q",
           "-p", "_timing_plugin"]
    if args.markexpr:
        cmd += ["-m", args.markexpr]
    cmd += args.pytest_args
    t0 = time.monotonic()
    proc = subprocess.run(cmd, cwd=ROOT, env=env)
    wall_s = time.monotonic() - t0

    records: dict[str, float] = {}
    outcomes: dict[str, str] = {}
    shards = sorted(glob.glob(base + ".*"))
    for p in shards or ([base] if os.path.exists(base) else []):
        with open(p) as f:
            d = json.load(f)
        for k, v in d["tests"].items():
            records[k] = records.get(k, 0.0) + v
        outcomes.update(d["outcomes"])

    counts: dict[str, int] = {}
    for o in outcomes.values():
        counts[o] = counts.get(o, 0) + 1
    slowest = sorted(records.items(), key=lambda kv: -kv[1])[: args.top]
    out = {
        "wall_s": round(wall_s, 1),
        "cpu_count": os.cpu_count(),
        "xdist_workers": len(shards),
        "markexpr": args.markexpr,
        "exit_code": proc.returncode,
        "n_tests": len(outcomes),
        "outcomes": counts,
        "sum_test_s": round(sum(records.values()), 1),
        "slowest": [{"test": k, "s": round(v, 1)} for k, v in slowest],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("wall_s", "n_tests", "outcomes", "exit_code")}))
    print(f"wrote {args.out}")
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
