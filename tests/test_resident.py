"""Device-resident input pipeline (data/resident.py).

Covers: epoch plans are exact permutations (every graph exactly once per
epoch, padding slots map to the masked empty row), gather_batch reproduces
from_numpy_graphs packing bit-for-bit, the resident train step matches the
streaming train step on the same batch, and the train CLI runs end-to-end
in --device_data on mode (plus an off-mode streaming sanity run).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from tsdiff_tpu.core.graph import from_numpy_graphs
from tsdiff_tpu.data.resident import DeviceResidentData, gather_batch

from test_data import make_graph_dicts

FEAT_DIM = 6


@pytest.fixture(scope="module")
def graphs():
    rng = np.random.default_rng(3)
    return make_graph_dicts(rng, [5, 6, 7, 5, 6, 7, 5, 6, 4, 7, 6], feat_dim=FEAT_DIM)


def test_epoch_plan_covers_corpus_once(graphs):
    res = DeviceResidentData(graphs, batch_size=4, bucket_sizes=[8], seed=0)
    assert res.n_graphs[8] == len(graphs)
    n_batches = res.n_batches[8]
    assert n_batches == 3  # ceil(11 / 4)
    for epoch in (0, 1):
        plan = np.asarray(res.make_plan(8, epoch))
        assert plan.shape == (12,)
        real = plan[plan < len(graphs)]
        assert sorted(real.tolist()) == list(range(len(graphs)))
        # padding slots point at the empty row (index M)
        assert (plan >= len(graphs)).sum() == 1
        assert plan.max() == len(graphs)
    # different epochs shuffle differently
    assert not np.array_equal(
        np.asarray(res.make_plan(8, 0)), np.asarray(res.make_plan(8, 1))
    )


def test_gather_matches_from_numpy_graphs(graphs):
    res = DeviceResidentData(graphs, batch_size=4, bucket_sizes=[8], seed=0)
    plan = res.fixed_plan(8)
    for ci in range(res.n_batches[8]):
        got = gather_batch(res.buckets[8], plan, jnp.asarray(ci, jnp.int32), 4)
        idxs = np.asarray(plan)[ci * 4 : (ci + 1) * 4]
        chunk = [graphs[i] for i in idxs if i < len(graphs)]
        want = from_numpy_graphs(
            chunk
            + [
                {
                    "atom_type": np.zeros((0,), np.int32),
                    "r_feat": np.zeros((0, FEAT_DIM), np.float32),
                    "p_feat": np.zeros((0, FEAT_DIM), np.float32),
                    "pos": np.zeros((0, 3), np.float32),
                    "edge_index": np.zeros((2, 0), np.int32),
                    "edge_type": np.zeros((0,), np.int32),
                }
            ]
            * (4 - len(chunk)),
            max_nodes=8,
        )
        for field in ("atom_type", "r_feat", "p_feat", "pos", "bond_mat", "node_mask"):
            g, w = np.asarray(getattr(got, field)), np.asarray(getattr(want, field))
            assert g.dtype == w.dtype, field
            np.testing.assert_array_equal(g, w, err_msg=field)


def test_wire_format_guard():
    g = {
        "atom_type": np.asarray([1, 400], np.int32),  # exceeds uint8
        "r_feat": np.zeros((2, 4), np.float32),
        "p_feat": np.zeros((2, 4), np.float32),
        "pos": np.zeros((2, 3), np.float32),
        "bond_mat": np.zeros((2, 2), np.int64),
    }
    with pytest.raises(ValueError, match="uint8"):
        DeviceResidentData([g], batch_size=1, bucket_sizes=[2])


def test_wire_format_guard_sparse_edges():
    # the edge_index/edge_type input path must apply the same uint8 range
    # check as the dense bond_mat path (no silent modulo-256 truncation)
    g = {
        "atom_type": np.asarray([1, 2], np.int32),
        "r_feat": np.zeros((2, 4), np.float32),
        "p_feat": np.zeros((2, 4), np.float32),
        "pos": np.zeros((2, 3), np.float32),
        "edge_index": np.asarray([[0, 1], [1, 0]], np.int32),
        "edge_type": np.asarray([300, 300], np.int64),  # exceeds uint8
    }
    with pytest.raises(ValueError, match="uint8"):
        DeviceResidentData([g], batch_size=1, bucket_sizes=[2])


def test_corpus_too_large_raises_before_upload():
    from tsdiff_tpu.data.resident import CorpusTooLarge

    g = {
        "atom_type": np.asarray([1, 2], np.int32),
        "r_feat": np.zeros((2, 4), np.float32),
        "p_feat": np.zeros((2, 4), np.float32),
        "pos": np.zeros((2, 3), np.float32),
        "bond_mat": np.zeros((2, 2), np.int64),
    }
    uploads = []

    def counting_put(a):
        uploads.append(a)
        return jnp.asarray(a)

    with pytest.raises(CorpusTooLarge):
        DeviceResidentData(
            [g], batch_size=1, bucket_sizes=[2], put=counting_put, max_bytes=8
        )
    assert uploads == [], "oversized corpus must not transfer a single array"

    # within budget: uploads proceed and nbytes reports the packed size
    res = DeviceResidentData(
        [g], batch_size=1, bucket_sizes=[2], put=counting_put, max_bytes=10**9
    )
    assert len(uploads) == 7  # 6 bucket arrays + the PRNG base key
    assert res.nbytes == sum(a.nbytes for a in uploads[:6])


def test_deferred_upload_checks_combined_budget():
    """upload=False packs host-side only; the train CLI inspects the
    COMBINED train+val size against the budget before either corpus
    transfers a byte, then calls .upload() on both."""
    g = {
        "atom_type": np.asarray([1, 2], np.int32),
        "r_feat": np.zeros((2, 4), np.float32),
        "p_feat": np.zeros((2, 4), np.float32),
        "pos": np.zeros((2, 3), np.float32),
        "bond_mat": np.zeros((2, 2), np.int64),
    }
    uploads = []

    def counting_put(a):
        uploads.append(a)
        return jnp.asarray(a)

    a = DeviceResidentData([g], batch_size=1, bucket_sizes=[2],
                           put=counting_put, upload=False)
    b = DeviceResidentData([g], batch_size=1, bucket_sizes=[2],
                           put=counting_put, upload=False)
    assert uploads == [] and a.nbytes > 0 and a.nbytes + b.nbytes > 0
    a.upload()
    b.upload()
    assert len(uploads) == 14  # (6 arrays + base key) x 2
    a.upload()  # idempotent
    assert len(uploads) == 14
    # a deferred-then-uploaded corpus serves batches normally
    sched = a.epoch_schedule()
    assert sched == [2]


def test_negative_values_rejected():
    base = {
        "atom_type": np.asarray([1, 2], np.int32),
        "r_feat": np.zeros((2, 4), np.float32),
        "p_feat": np.zeros((2, 4), np.float32),
        "pos": np.zeros((2, 3), np.float32),
    }
    bad_bond = dict(base, bond_mat=np.asarray([[0, -1], [-1, 0]], np.int64))
    with pytest.raises(ValueError, match="uint8"):
        DeviceResidentData([bad_bond], batch_size=1, bucket_sizes=[2])
    bad_edge = dict(
        base,
        edge_index=np.asarray([[0, 1], [1, 0]], np.int32),
        edge_type=np.asarray([-3, -3], np.int64),
    )
    with pytest.raises(ValueError, match="uint8"):
        DeviceResidentData([bad_edge], batch_size=1, bucket_sizes=[2])
    bad_atom = dict(base, bond_mat=np.zeros((2, 2), np.int64))
    bad_atom["atom_type"] = np.asarray([-6, 1], np.int32)
    with pytest.raises(ValueError, match="uint8"):
        DeviceResidentData([bad_atom], batch_size=1, bucket_sizes=[2])


def _tiny_model_setup(graphs):
    from tsdiff_tpu.config import Config
    from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
    from tsdiff_tpu.models import get_model
    from tsdiff_tpu.train import (
        init_model_params,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    model_cfg = Config(
        {
            "network": "condensenc",
            "edge_cutoff": 10.0,
            "edge_order": 4,
            "pred_edge_order": 3,
            "encoder": {
                "name": "schnet", "edge_emb": False, "num_convs": 2,
                "cutoff": 10.0, "smooth_conv": False, "mlp_act": "swish",
                "hidden_dim": 16,
            },
            "feat_dim": FEAT_DIM, "hidden_dim": 16,
            "edge_encoder": "mlp", "mlp_act": "swish", "edge_cat_act": "swish",
            "beta_schedule": "sigmoid", "beta_start": 1e-7, "beta_end": 2e-3,
            "num_diffusion_timesteps": 30,
        }
    )
    model = get_model(model_cfg)
    schedule = DiffusionSchedule.from_config(model_cfg)
    opt_cfg = Config(
        {"type": "adam", "lr": 5e-4, "weight_decay": 0.0, "beta1": 0.95, "beta2": 0.999}
    )
    tx = make_optimizer(opt_cfg, 3000.0)
    train_step = make_train_step(model, tx, schedule, t0=0, t1=30)
    probe = from_numpy_graphs(graphs[:4], max_nodes=8)
    params = init_model_params(model, jax.random.key(0), probe)
    state = init_train_state(model, tx, params)
    return train_step, state


def test_resident_step_matches_streaming_step(graphs):
    from tsdiff_tpu.train import make_resident_train_step

    train_step, state = _tiny_model_setup(graphs)
    res = DeviceResidentData(graphs, batch_size=4, bucket_sizes=[8], seed=0)
    res_step = make_resident_train_step(train_step, 4)
    plan = res.make_plan(8, 0)
    key = jax.random.key(7)

    state_r, metrics_r, cursor = res_step(
        state, res.buckets[8], plan, jnp.asarray(0, jnp.int32), key, 5e-4
    )
    assert int(cursor) == 1

    # identical batch through the streaming path
    idxs = [i for i in np.asarray(plan)[:4] if i < len(graphs)]
    batch = from_numpy_graphs([graphs[i] for i in idxs], max_nodes=8)
    state_s, metrics_s = train_step(state, batch, key, 5e-4)

    assert np.allclose(float(metrics_r["loss"]), float(metrics_s["loss"]), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_r.params),
        jax.tree_util.tree_leaves(state_s.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


@pytest.mark.heavy
@pytest.mark.parametrize("device_data", ["on", "off"])
def test_train_cli_device_data(tmp_path, graphs, device_data):
    from tsdiff_tpu.cli import train as train_cli
    from tsdiff_tpu.data import save_dataset

    save_dataset(str(tmp_path / "train.pkl"), graphs[:8])
    save_dataset(str(tmp_path / "val.pkl"), graphs[8:])
    config = {
        "model": {
            "network": "condensenc", "edge_cutoff": 10.0, "edge_order": 4,
            "pred_edge_order": 3,
            "encoder": {
                "name": "schnet", "edge_emb": False, "num_convs": 2,
                "cutoff": 10.0, "smooth_conv": False, "mlp_act": "swish",
                "hidden_dim": 16,
            },
            "feat_dim": FEAT_DIM, "hidden_dim": 16, "edge_encoder": "mlp",
            "mlp_act": "swish", "edge_cat_act": "swish",
            "beta_schedule": "sigmoid", "beta_start": 1.0e-7, "beta_end": 2.0e-3,
            "num_diffusion_timesteps": 30,
        },
        "train": {
            "seed": 0, "batch_size": 4, "val_freq": 4, "log_freq": 4,
            "max_iters": 8, "max_grad_norm": 3000.0, "anneal_power": 2.0,
            "optimizer": {
                "type": "adam", "lr": 5.0e-4, "weight_decay": 0.0,
                "beta1": 0.95, "beta2": 0.999,
            },
            "scheduler": {
                "type": "plateau", "factor": 0.8, "patience": 10, "min_lr": 1.25e-4,
            },
        },
        "dataset": {
            "train": str(tmp_path / "train.pkl"),
            "val": str(tmp_path / "val.pkl"),
            "test": str(tmp_path / "val.pkl"),
        },
    }
    (tmp_path / "config.yml").write_text(yaml.safe_dump(config))
    log_dir = train_cli.main(
        [
            str(tmp_path / "config.yml"), "--logdir", str(tmp_path / "logs"),
            "--device_data", device_data,
        ]
    )
    assert glob.glob(os.path.join(log_dir, "checkpoints", "*.ckpt")), (
        "training produced no checkpoint"
    )
    # resume continues in the same mode
    log_dir2 = train_cli.main(
        [
            log_dir, "--logdir", str(tmp_path / "logs"), "--max_iters", "10",
            "--device_data", device_data,
        ]
    )
    assert os.path.isdir(log_dir2)
