"""tools/prod_run_report.py — log parsing, resume merging, LR-drop detection.

The tool turns train-CLI log dirs (reference train.py:124-231 semantics:
plateau LR, checkpoint-on-improvement) into the production-run report; these
tests cover the pure log-handling half (the --ema_compare half is exercised
against a real run directory by hand, see DEMO.md).
"""

import importlib.util
import os
import sys

import pytest

_TOOL = os.path.join(os.path.dirname(__file__), os.pardir, "tools", "prod_run_report.py")
_spec = importlib.util.spec_from_file_location("prod_run_report", _TOOL)
prod_run_report = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(prod_run_report)


def _write_log(dirpath, lines):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "log.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _train_line(it, loss, grad, lr):
    return (f"[2026-08-17 09:00:00,000::train::INFO] [Train] Iter {it:05d} | "
            f"Loss {loss:.2f} | Grad {grad:.2f} | LR {lr:.6f}")


def _val_line(it, loss):
    return f"[2026-08-17 09:00:01,000::train::INFO] [Validate] Iter {it:05d} | Loss {loss:.6f}"


def test_parse_log_roundtrip(tmp_path):
    d = str(tmp_path / "run")
    _write_log(d, [
        _train_line(2000, 81.5, 310.48, 5e-4),
        _val_line(2000, 65.003587),
        "[2026-08-17 09:00:02,000::train::INFO] Saved checkpoint at iter 2000 (val 65.003587)",
        _train_line(4000, 70.1, 250.0, 5e-4),
        _val_line(4000, 60.5),
    ])
    train, val = prod_run_report.parse_log(os.path.join(d, "log.txt"))
    assert [t[0] for t in train] == [2000, 4000]
    assert train[0][3] == pytest.approx(5e-4)
    assert val == [(2000, pytest.approx(65.003587)), (4000, pytest.approx(60.5))]


def test_lr_drops_detects_plateau_steps():
    train = [(2000, 80.0, 1.0, 5e-4), (4000, 75.0, 1.0, 5e-4),
             (6000, 74.0, 1.0, 4e-4), (8000, 73.0, 1.0, 4e-4),
             (10000, 72.0, 1.0, 3.2e-4)]
    drops = prod_run_report.lr_drops(train)
    assert [(it, lr1) for it, _, lr1 in drops] == [(6000, 4e-4), (10000, 3.2e-4)]


def test_resume_merge_later_dir_wins(tmp_path, capsys):
    """Original + _resume dirs merge into one curve; overlapping iterations
    take the resume's values (it reran them from the restored checkpoint)."""
    orig = str(tmp_path / "run_orig")
    res = str(tmp_path / "run_resume")
    _write_log(orig, [
        _train_line(2000, 81.5, 300.0, 5e-4), _val_line(2000, 65.0),
        _train_line(4000, 70.0, 280.0, 5e-4), _val_line(4000, 60.0),
    ])
    _write_log(res, [
        _train_line(4000, 69.5, 275.0, 5e-4), _val_line(4000, 59.5),
        _train_line(6000, 65.0, 260.0, 5e-4), _val_line(6000, 55.0),
    ])
    out_md = str(tmp_path / "report.md")
    prod_run_report.main([orig, res, "--markdown", out_md, "--milestone_every", "2000"])
    report = open(out_md).read()
    assert "best val loss: **55.0000** at iter 6,000" in report
    assert "| 4,000 | 59.5000 |" in report  # resume's value, not 60.0
    assert "| 2,000 | 65.0000 |" in report  # original's value carried


def test_missing_log_is_an_error(tmp_path):
    with pytest.raises(SystemExit):
        prod_run_report.main([str(tmp_path / "nope")])
