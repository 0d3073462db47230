"""Full-pipeline integration: dataset -> train CLI -> sampling CLI -> clustering CLI.

Runs in-process on the CPU backend with a tiny model config; verifies the
reference workflow (train a model, checkpoint on val improvement, load the
ensemble from self-describing checkpoints, generate, cluster) end to end.
"""

import glob
import os
import pickle

import numpy as np
import pytest
import yaml

from tsdiff_tpu.data import save_dataset

from test_data import make_graph_dicts

# One chained workflow off a module-scoped workspace: later tests consume
# earlier tests' artifacts, so the whole module is one integration unit.
pytestmark = pytest.mark.heavy

FEAT_DIM = 6


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    graphs = make_graph_dicts(rng, [5, 6, 7, 5, 6, 7, 5, 6], feat_dim=FEAT_DIM)
    for g in graphs:
        g["pos"] = np.asarray(g["pos"]) * 0.8
    save_dataset(str(root / "train.pkl"), graphs[:6])
    save_dataset(str(root / "val.pkl"), graphs[6:])

    config = {
        "model": {
            "network": "condensenc",
            "edge_cutoff": 10.0,
            "edge_order": 4,
            "pred_edge_order": 3,
            "encoder": {
                "name": "schnet", "edge_emb": False, "num_convs": 2,
                "cutoff": 10.0, "smooth_conv": False, "mlp_act": "swish",
                "hidden_dim": 16,
            },
            "feat_dim": FEAT_DIM,
            "hidden_dim": 16,
            "edge_encoder": "mlp",
            "mlp_act": "swish",
            "edge_cat_act": "swish",
            "beta_schedule": "sigmoid",
            "beta_start": 1.0e-7,
            "beta_end": 2.0e-3,
            "num_diffusion_timesteps": 30,
        },
        "train": {
            "seed": 0,
            "batch_size": 4,
            "val_freq": 5,
            "log_freq": 5,
            "max_iters": 10,
            "max_grad_norm": 3000.0,
            "anneal_power": 2.0,
            "optimizer": {
                "type": "adam", "lr": 5.0e-4, "weight_decay": 0.0,
                "beta1": 0.95, "beta2": 0.999,
            },
            "scheduler": {
                "type": "plateau", "factor": 0.8, "patience": 10, "min_lr": 1.25e-4,
            },
        },
        "dataset": {
            "train": str(root / "train.pkl"),
            "val": str(root / "val.pkl"),
            "test": str(root / "val.pkl"),
        },
    }
    cfg_path = root / "config.yml"
    cfg_path.write_text(yaml.safe_dump(config))
    return root


def test_train_sample_cluster(workspace):
    from tsdiff_tpu.cli import clustering as cluster_cli
    from tsdiff_tpu.cli import sampling as sampling_cli
    from tsdiff_tpu.cli import train as train_cli

    root = workspace
    log_dir = train_cli.main([str(root / "config.yml"), "--logdir", str(root / "logs")])
    ckpts = glob.glob(os.path.join(log_dir, "checkpoints", "*.ckpt"))
    assert ckpts, "training produced no checkpoint"

    # resume path: train a few more iters from the log dir
    log_dir2 = train_cli.main(
        [log_dir, "--logdir", str(root / "logs"), "--max_iters", "12"]
    )
    assert glob.glob(os.path.join(log_dir2, "checkpoints", "*.ckpt")) or True

    # sampling with a 2-member ensemble from the same ckpt
    out = sampling_cli.main(
        [ckpts[0], ckpts[0],
         "--test_set", str(root / "val.pkl"),
         "--save_dir", str(root / "gen"),
         "--n_steps", "5",
         "--sampling_type", "ld",
         "--batch_size", "4",
         "--repeat", "3"]
    )
    with open(out, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 6  # 2 val graphs x repeat 3
    for g in results:
        n = g["atom_type"].shape[0]
        assert g["pos_gen"].shape == (n, 3)
        assert np.isfinite(g["pos_gen"]).all()

    # clustering on the repeated samples of reaction 0
    save_dir = cluster_cli.main(
        ["--sample_path", out,
         "--sample_index", "0",
         "--save_dir", str(root / "clusters"),
         "--thresh", "10.0"]
    )
    with open(os.path.join(save_dir, "stat_clustering.pkl"), "rb") as f:
        stat = pickle.load(f)
    assert stat["num_clusters"] >= 1
    assert len(stat["cluster"]) == 3
    assert glob.glob(os.path.join(save_dir, "cluster_*.xyz"))


def test_train_cli_dualenc(workspace):
    """Legacy dual-encoder family trains through the same CLI."""
    import yaml as _yaml

    from tsdiff_tpu.cli import train as train_cli

    root = workspace
    cfg = _yaml.safe_load((root / "config.yml").read_text())
    cfg["model"] = {
        "type": "diffusion",
        "network": "dualenc",
        "TS": True,
        "hidden_dim": 16,
        "num_convs": 2,
        "num_convs_local": 2,
        "cutoff": 10.0,
        "mlp_act": "relu",
        "edge_cat_act": "relu",
        "beta_schedule": "sigmoid",
        "beta_start": 1.0e-7,
        "beta_end": 2.0e-3,
        "num_diffusion_timesteps": 30,
        "edge_order": 3,
        "edge_encoder": "mlp",
        "smooth_conv": False,
    }
    cfg["train"]["max_iters"] = 6
    cfg["train"]["val_freq"] = 3
    cfg_path = root / "config_dualenc.yml"
    cfg_path.write_text(_yaml.safe_dump(cfg))
    log_dir = train_cli.main(
        [str(cfg_path), "--logdir", str(root / "logs_dual"), "--profile"]
    )
    assert glob.glob(os.path.join(log_dir, "checkpoints", "*.ckpt"))


def test_sampling_cli_dualenc(workspace):
    """Legacy-family checkpoints sample through the same CLI (dual-branch eps)."""
    from tsdiff_tpu.cli import sampling as sampling_cli

    root = workspace
    ckpts = glob.glob(str(root / "logs_dual" / "*" / "checkpoints" / "*.ckpt"))
    assert ckpts, "dualenc training must have produced a checkpoint"
    out = sampling_cli.main(
        [ckpts[0],
         "--test_set", str(root / "val.pkl"),
         "--save_dir", str(root / "gen_dual"),
         "--n_steps", "4",
         "--sampling_type", "ld",
         "--batch_size", "4"]
    )
    with open(out, "rb") as f:
        results = pickle.load(f)
    assert all(np.isfinite(g["pos_gen"]).all() for g in results)


def test_evaluate_cli(workspace):
    from tsdiff_tpu.cli import evaluate as evaluate_cli

    root = workspace
    out = str(root / "gen" / "samples_all.pkl")
    stats = evaluate_cli.main(["--samples", out])
    assert len(stats["dmae"]) == 6
    assert np.isfinite(stats["dmae"]).all()


def test_sampling_from_ts_guess(workspace):
    from tsdiff_tpu.cli import sampling as sampling_cli

    root = workspace
    ckpts = glob.glob(str(root / "logs" / "*" / "checkpoints" / "*.ckpt"))
    out = sampling_cli.main(
        [ckpts[0],
         "--test_set", str(root / "val.pkl"),
         "--save_dir", str(root / "gen_guess"),
         "--n_steps", "3",
         "--from_ts_guess",
         "--denoise_from_time_t", "10",
         "--sampling_type", "ld",
         "--batch_size", "4"]
    )
    with open(out, "rb") as f:
        results = pickle.load(f)
    assert all(np.isfinite(g["pos_gen"]).all() for g in results)


def test_evaluate_cli_covmat_branch(workspace):
    """--covmat runs the conformer evaluator when pos_ref stacks are present."""
    import pickle as _pickle

    import numpy as np_
    from tsdiff_tpu.cli import evaluate as evaluate_cli

    root = workspace
    with open(root / "gen" / "samples_all.pkl", "rb") as f:
        samples = _pickle.load(f)
    # fabricate a packed multi-conformer entry from the generated data
    packed = []
    for g in samples[:2]:
        g = dict(g)
        n = g["atom_type"].shape[0]
        g["pos_ref"] = np_.stack([g["pos"], g["pos"]])
        g["pos_gen"] = np_.stack([g["pos_gen"]] * 4)
        packed.append(g)
    p = root / "packed.pkl"
    with open(p, "wb") as f:
        _pickle.dump(packed, f)
    stats = evaluate_cli.main(["--samples", str(p), "--covmat"])
    assert "covmat" in stats
    assert stats["covmat"].CoverageR.shape[0] == 2
