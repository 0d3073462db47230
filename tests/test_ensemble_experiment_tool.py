"""Unit coverage for tools/ensemble_experiment.py arm selection.

The heavy sampling arms are stubbed; what's asserted is the experiment's
STRUCTURE: the paper-recipe member sets each arm receives (reference
README.md:77 — 8 independently seeded checkpoints, score-averaged;
models/sampler.py:95-111) and the best-K-by-val-loss ordering of the
--k_sweep axis.
"""

import json

import tools.ensemble_experiment as E
import tools.soup as S


def _run(monkeypatch, tmp_path, argv_extra=()):
    calls = []

    def fake_run_arm(name, paths, args, extra=()):
        calls.append((name, list(paths)))
        return {"arm": name, "members": list(paths), "dmae_mean": 0.1}

    vals = {"d1": (0.2, 10, "p1"), "d2": (0.3, 20, "p2"),
            "d3": (0.1, 30, "p3"), "d4": (0.4, 40, "p4")}
    monkeypatch.setattr(E, "run_arm", fake_run_arm)
    monkeypatch.setattr(E, "best_checkpoint", lambda d: vals[d])
    monkeypatch.setattr(S, "soup_checkpoints",
                        lambda paths, use_ema=False: {"stub": True})
    out = tmp_path / "out.json"
    E.main(["d1", "d2", "d3", "d4", "--test_set", "t.pkl",
            "--workdir", str(tmp_path / "wd"), "--out", str(out),
            "--skip_trajectory", *argv_extra])
    return calls, json.loads(out.read_text())


def test_arms_and_members(monkeypatch, tmp_path):
    calls, payload = _run(monkeypatch, tmp_path)
    names = [n for n, _ in calls]
    assert names == ["indep_ensemble", "best_single", "soup_of_seeds"]
    assert ("indep_ensemble", ["p1", "p2", "p3", "p4"]) in calls
    assert ("best_single", ["p3"]) in calls  # lowest val loss
    assert payload["per_seed_best"][2]["val"] == 0.1


def test_k_sweep_selects_best_k_by_val(monkeypatch, tmp_path):
    calls, _ = _run(monkeypatch, tmp_path, ["--k_sweep"])
    # bare --k_sweep with 4 seeds: one intermediate point, K=2,
    # members = the two lowest-val seeds in val order
    assert ("indep_ensemble_k2", ["p3", "p1"]) in calls
    assert not any(n == "indep_ensemble_k4" for n, _ in calls)


def test_k_sweep_explicit_sizes(monkeypatch, tmp_path):
    calls, _ = _run(monkeypatch, tmp_path, ["--k_sweep", "2", "3"])
    assert ("indep_ensemble_k2", ["p3", "p1"]) in calls
    assert ("indep_ensemble_k3", ["p3", "p1", "p2"]) in calls
