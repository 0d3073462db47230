"""Checkpoint soup (tools/soup.py): weight averaging, config guard, CLI."""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from soup import main as soup_main, soup_checkpoints  # noqa: E402


def _ckpt(tmp_path, name, scale, cfg_extra=None, ema_scale=None):
    cfg = {"model": {"network": "condensenc", "hidden_dim": 4}}
    if cfg_extra:
        cfg["model"].update(cfg_extra)
    params = {"params": {
        "dense": {"kernel": np.full((2, 3), scale, np.float32),
                  "bias": np.full((3,), scale, np.float32)},
    }}
    ck = {
        "format": "tsdiff_tpu.ckpt.v1", "config": cfg, "params": params,
        "opt_state": None, "scheduler": None,
        "iteration": int(scale * 10), "avg_val_loss": float(scale),
        "ema_params": None if ema_scale is None else {
            "params": {"dense": {
                "kernel": np.full((2, 3), ema_scale, np.float32),
                "bias": np.full((3,), ema_scale, np.float32)}}},
    }
    path = str(tmp_path / name)
    with open(path, "wb") as f:
        pickle.dump(ck, f)
    return path


def test_soup_is_leafwise_mean(tmp_path):
    a = _ckpt(tmp_path, "a.ckpt", 1.0)
    b = _ckpt(tmp_path, "b.ckpt", 3.0)
    out = soup_checkpoints([a, b])
    k = out["params"]["params"]["dense"]["kernel"]
    np.testing.assert_allclose(k, np.full((2, 3), 2.0))
    assert out["iteration"] == 30
    assert out["soup_members"] == ["a.ckpt", "b.ckpt"]


def test_soup_uses_ema_when_asked(tmp_path):
    a = _ckpt(tmp_path, "a.ckpt", 1.0, ema_scale=5.0)
    b = _ckpt(tmp_path, "b.ckpt", 3.0, ema_scale=7.0)
    out = soup_checkpoints([a, b], use_ema=True)
    k = out["params"]["params"]["dense"]["kernel"]
    np.testing.assert_allclose(k, np.full((2, 3), 6.0))
    # members without EMA fall back to raw params
    c = _ckpt(tmp_path, "c.ckpt", 9.0)
    out = soup_checkpoints([a, c], use_ema=True)
    np.testing.assert_allclose(
        out["params"]["params"]["dense"]["kernel"], np.full((2, 3), 7.0)
    )


def test_soup_rejects_config_mismatch(tmp_path):
    a = _ckpt(tmp_path, "a.ckpt", 1.0)
    b = _ckpt(tmp_path, "b.ckpt", 1.0, cfg_extra={"hidden_dim": 8})
    with pytest.raises(ValueError, match="disagree"):
        soup_checkpoints([a, b])


def test_soup_cli_roundtrip(tmp_path):
    from tsdiff_tpu.train import load_checkpoint

    a = _ckpt(tmp_path, "a.ckpt", 2.0)
    b = _ckpt(tmp_path, "b.ckpt", 4.0)
    out = str(tmp_path / "soup.ckpt")
    assert soup_main([a, b, "--out", out]) == 0
    ck = load_checkpoint(out)
    np.testing.assert_allclose(
        np.asarray(ck["params"]["params"]["dense"]["bias"]), np.full((3,), 3.0)
    )
