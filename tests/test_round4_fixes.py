"""Regression tests for the round-4 advisor findings (ADVICE.md)."""

import os
import pickle
import zipfile

import numpy as np
import pytest

from tsdiff_tpu.data.dataset import tier_ladder


def test_initialize_rejects_coordinator_without_nprocs_procid():
    # converse of the round-3 validation: --coordinator without --nprocs /
    # --procid must produce the friendly flag error, not a cryptic library one
    from tsdiff_tpu.parallel.multihost import initialize

    with pytest.raises(ValueError, match="--coordinator was given without"):
        initialize(coordinator="localhost:1234", num_processes=None, process_id=None)
    with pytest.raises(ValueError, match="--coordinator was given without"):
        initialize(coordinator="localhost:1234", num_processes=2, process_id=None)
    with pytest.raises(ValueError, match="without --coordinator"):
        initialize(coordinator=None, num_processes=2, process_id=0)


def test_load_checkpoint_pickle_with_embedded_zip_bytes(tmp_path):
    """zipfile.is_zipfile false-positives on a pickle whose payload embeds a
    zip archive (EOCD record near the tail); load_checkpoint must still route
    it to the pickle reader, not the torch converter."""
    from tsdiff_tpu.train import load_checkpoint

    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("blob.bin", b"x" * 10)
    payload = {
        "format": "tsdiff_tpu.ckpt.v1",
        "params": {"w": np.zeros(2, np.float32)},
        "config": {},
        # trailing zip bytes make is_zipfile(path) return True
        "attachment": buf.getvalue(),
    }
    path = tmp_path / "embedded_zip.ckpt"
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    assert zipfile.is_zipfile(path)  # the trap this test guards against
    ck = load_checkpoint(str(path))
    assert ck["format"] == "tsdiff_tpu.ckpt.v1"


def test_load_checkpoint_unknown_format_is_value_error(tmp_path):
    from tsdiff_tpu.train import load_checkpoint

    path = tmp_path / "legacy.pt"
    with open(path, "wb") as f:
        pickle.dump({"model": {}}, f)  # not a torch zip, not our format
    with pytest.raises(ValueError, match="unrecognized checkpoint format"):
        load_checkpoint(str(path))


def test_tier_ladder_max_tiers_cap():
    assert tier_ladder(100, 1) == [100, 50, 25, 12, 6]
    assert tier_ladder(100, 1, max_tiers=3) == [100, 50, 25]
    assert tier_ladder(100, 1, max_tiers=1) == [100]
    # dp multiples still respected under the cap
    assert tier_ladder(64, 4, max_tiers=2) == [64, 32]


def test_bench_quality_gated_respacing(tmp_path):
    """bench.py only claims a respaced headline when the committed measured
    curve has a point quality-equal to the full-schedule production run."""
    import json
    import sys

    sys.path[:0] = ["/root/repo"]
    from bench import quality_gated_respacing

    assert quality_gated_respacing(str(tmp_path / "missing.json")) is None

    p = tmp_path / "curve.json"
    p.write_text(json.dumps({"curve": [
        {"rule": "ld", "steps": 5000, "dmae_mean": 0.48},
        {"rule": "ld", "steps": 2500, "dmae_mean": 0.49},
        {"rule": "ld", "steps": 1250, "dmae_mean": 0.80},
    ]}))
    got = quality_gated_respacing(str(p))
    assert got["steps"] == 2500 and got["rule"] == "ld"

    # every respaced point degraded -> no claim
    p.write_text(json.dumps({"curve": [
        {"rule": "ld", "steps": 5000, "dmae_mean": 0.48},
        {"rule": "ld", "steps": 2500, "dmae_mean": 0.70},
    ]}))
    assert quality_gated_respacing(str(p)) is None

    # no full-schedule anchor -> no claim
    p.write_text(json.dumps({"curve": [
        {"rule": "ld", "steps": 2500, "dmae_mean": 0.40},
    ]}))
    assert quality_gated_respacing(str(p)) is None


def test_sampling_resume_multihost_visibility_error(monkeypatch, tmp_path):
    """--resume under --multihost must fail fast with the multihost-specific
    message when the file is missing, instead of desyncing at open()."""
    import jax

    from tsdiff_tpu.cli import sampling as sampling_cli

    # simulate a 2-process cluster without spawning one
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)

    # a minimal checkpoint the CLI can load before it reaches the resume check
    from tests.test_learning_sanity import CFG
    from tsdiff_tpu.core.graph import from_numpy_graphs
    from tsdiff_tpu.models import get_model

    g = dict(
        atom_type=np.full(4, 6, np.int32),
        r_feat=np.eye(4, dtype=np.float32)[np.zeros(4, int)],
        p_feat=np.eye(4, dtype=np.float32)[np.zeros(4, int)],
        pos=np.zeros((4, 3), np.float32),
        bond_mat=np.zeros((4, 4), np.int64),
        smiles="x",
    )
    batch = from_numpy_graphs([g], max_nodes=8)
    model = get_model(CFG)
    params = model.init(
        jax.random.key(0), batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    ck = {
        "format": "tsdiff_tpu.ckpt.v1",
        "params": params,
        "config": {"model": dict(CFG)},
        "iteration": 0,
    }
    ckpt = tmp_path / "m.ckpt"
    with open(ckpt, "wb") as f:
        pickle.dump(ck, f)
    from tsdiff_tpu.data import save_dataset

    test_pkl = tmp_path / "test.pkl"
    save_dataset(str(test_pkl), [g])

    with pytest.raises(SystemExit, match="visible to ALL processes"):
        sampling_cli.main([
            str(ckpt),
            "--test_set", str(test_pkl),
            "--save_dir", str(tmp_path / "out"),
            "--resume", str(tmp_path / "missing.pkl"),
            "--n_steps", "2",
        ])
