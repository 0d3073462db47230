"""Multi-process SPMD training (parallel/multihost.py + train CLI --multihost).

Forms a REAL 2-process JAX cluster on the CPU backend (coordinator service +
cross-process Gloo collectives, 4 virtual devices per process = 8 global)
and runs the ACTUAL train CLI in both processes; the coordinator's
checkpoint must exist, carry a finite val loss, and match the
single-process 8-device run bit-for-bit in data semantics (same seeds, same
global batches) — loss parity is the assertion.

This is the closest a single machine gets to a TPU pod: distinct processes,
process-local devices, a global mesh, and collectives crossing process
boundaries.
"""

import glob
import os
import pickle
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest
import yaml

from test_data import make_graph_dicts

# xdist_group: under `-n auto --dist loadgroup` (root conftest.py) all
# cluster tests stay on one worker — each spawns a 2-3 process JAX cluster
# and stacking clusters trips Gloo's 30 s rendezvous deadline.
pytestmark = [pytest.mark.heavy, pytest.mark.xdist_group("multihost")]

FEAT = 6
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _tiny_cfg(root, batch_size=8, max_iters=6, val_freq=3):
    rng = np.random.default_rng(0)
    graphs = make_graph_dicts(rng, [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6, 7],
                              feat_dim=FEAT)
    from tsdiff_tpu.data import save_dataset

    save_dataset(os.path.join(root, "train.pkl"), graphs[:8])
    save_dataset(os.path.join(root, "val.pkl"), graphs[8:])
    cfg = {
        "model": {
            "network": "condensenc",
            "edge_cutoff": 10.0, "edge_order": 4, "pred_edge_order": 3,
            "encoder": {
                "name": "schnet", "edge_emb": False, "num_convs": 2,
                "cutoff": 10.0, "smooth_conv": False, "mlp_act": "swish",
                "hidden_dim": 16,
            },
            "feat_dim": FEAT, "hidden_dim": 16, "edge_encoder": "mlp",
            "mlp_act": "swish", "edge_cat_act": "swish",
            "beta_schedule": "sigmoid", "beta_start": 1e-7, "beta_end": 2e-3,
            "num_diffusion_timesteps": 30,
        },
        "train": {
            "seed": 0, "batch_size": batch_size, "val_freq": val_freq,
            "log_freq": val_freq, "max_iters": max_iters,
            "max_grad_norm": 3000.0, "anneal_power": 2.0,
            "optimizer": {"type": "adam", "lr": 5e-4, "weight_decay": 0.0,
                          "beta1": 0.95, "beta2": 0.999},
            "scheduler": {"type": "plateau", "factor": 0.8, "patience": 10,
                          "min_lr": 1.25e-4},
        },
        "dataset": {
            "train": os.path.join(root, "train.pkl"),
            "val": os.path.join(root, "val.pkl"),
            "test": os.path.join(root, "val.pkl"),
        },
    }
    cfg_path = os.path.join(root, "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


_RUNNER = textwrap.dedent("""
    import sys
    sys.path[:0] = [{repo!r}]
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tsdiff_tpu.cli import train
    train.main({argv!r})
""")


def _spawn(argv, extra_env=None):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    if extra_env:
        env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, "-c", _RUNNER.format(repo=REPO, argv=argv)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _best_val_loss(logdir) -> float:
    ckpts = sorted(glob.glob(os.path.join(logdir, "*", "checkpoints", "*.ckpt")))
    assert ckpts, f"no checkpoints under {logdir}"
    with open(ckpts[-1], "rb") as f:
        ck = pickle.load(f)
    return float(ck["avg_val_loss"])


def test_two_process_hybrid_train_cli(tmp_path):
    """Train CLI --mesh_layout hybrid across 2 processes: the dp_dcn axis
    crosses the process boundary (multi-slice-over-DCN shape), with the
    device-resident input pipeline.  Loss parity vs single-process hybrid.

    (An overlapped single-process reference was tried and reverted: on a
    loaded 1-core box the extra compile starves the cluster past Gloo's
    30 s rendezvous deadline — measured.  Suite parallelism comes from
    xdist instead; see the root conftest.py.)"""
    cfg_path = _tiny_cfg(str(tmp_path))
    port = _free_port()
    hybrid = ["--mesh_layout", "hybrid", "--num_slices", "2",
              "--device_data", "on"]

    mh_dir = str(tmp_path / "mh")
    procs = [
        _spawn([
            cfg_path, "--logdir", mh_dir, *hybrid,
            "--multihost", "--coordinator", f"127.0.0.1:{port}",
            "--nprocs", "2", "--procid", str(pid),
        ])
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    mh_loss = _best_val_loss(mh_dir)

    sp_dir = str(tmp_path / "sp")
    sp = _spawn(
        [cfg_path, "--logdir", sp_dir, *hybrid],
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    out, _ = sp.communicate(timeout=540)
    assert sp.returncode == 0, out[-4000:]
    sp_loss = _best_val_loss(sp_dir)
    np.testing.assert_allclose(mh_loss, sp_loss, rtol=2e-3)


_SAMPLE_RUNNER = textwrap.dedent("""
    import sys
    sys.path[:0] = [{repo!r}]
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tsdiff_tpu.cli import sampling
    sampling.main({argv!r})
""")


def test_two_process_sampling_matches_single_process(tmp_path):
    """Multi-process production sampling: the CLI (dp, ens) mesh spans two
    processes; the coordinator's samples must match the single-process
    8-device mesh run."""
    import jax

    from tsdiff_tpu.data import save_dataset
    from tsdiff_tpu.models import get_model

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_condensenc import MODEL_CFG, make_batch

    root = str(tmp_path)
    rng = np.random.default_rng(0)
    graphs = make_graph_dicts(rng, [5, 6, 7, 5, 6], feat_dim=8)
    save_dataset(os.path.join(root, "test.pkl"), graphs)
    batch = make_batch(rng, [5, 8])
    model = get_model(MODEL_CFG)
    for s in range(2):
        params = model.init(
            jax.random.key(s),
            batch.atom_type, batch.r_feat, batch.p_feat,
            batch.pos, batch.bond_mat, batch.node_mask,
        )
        ck = {
            "format": "tsdiff_tpu.ckpt.v1",
            "config": {"model": dict(MODEL_CFG)},
            "params": jax.tree_util.tree_map(np.asarray, params),
            "opt_state": None, "scheduler": None,
            "iteration": 1, "avg_val_loss": None,
        }
        with open(os.path.join(root, f"ens{s}.pkl"), "wb") as f:
            pickle.dump(ck, f)

    def argv(out, extra):
        return [
            os.path.join(root, "ens0.pkl"), os.path.join(root, "ens1.pkl"),
            "--test_set", os.path.join(root, "test.pkl"),
            "--save_dir", os.path.join(root, out),
            "--n_steps", "6", "--batch_size", "4", "--seed", "5",
            "--mesh", "4,2", *extra,
        ]

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             _SAMPLE_RUNNER.format(repo=REPO, argv=argv("out_mh", [
                 "--multihost", "--coordinator", f"127.0.0.1:{port}",
                 "--nprocs", "2", "--procid", str(pid)]))],
            env={**os.environ,
                 "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    sp = subprocess.Popen(
        [sys.executable, "-c",
         _SAMPLE_RUNNER.format(repo=REPO, argv=argv("out_sp", []))],
        env={**os.environ, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    out, _ = sp.communicate(timeout=540)
    assert sp.returncode == 0, out[-4000:]

    with open(os.path.join(root, "out_mh", "samples_all.pkl"), "rb") as f:
        r_mh = pickle.load(f)
    with open(os.path.join(root, "out_sp", "samples_all.pkl"), "rb") as f:
        r_sp = pickle.load(f)
    assert len(r_mh) == len(r_sp) == 5
    for a, b in zip(r_mh, r_sp):
        np.testing.assert_allclose(a["pos_gen"], b["pos_gen"], rtol=1e-4, atol=1e-5)


_SERVE_RUNNER = textwrap.dedent("""
    import pickle, sys
    sys.path[:0] = [{repo!r}]
    import jax
    jax.config.update("jax_platforms", "cpu")
    {init}
    from tsdiff_tpu.parallel import make_mesh
    from tsdiff_tpu.serve import SamplerService

    svc = SamplerService(
        {ckpts!r}, n_steps=6, dtype="float32", max_batch=8,
        max_wait_s=3.0, seed=5, mesh=make_mesh(dp=4, ens=2),
    )
    if svc._is_coord:
        with open({graphs_pkl!r}, "rb") as f:
            graphs = pickle.load(f)
        outs = svc.generate(graphs)
        svc.close()
        with open({out_pkl!r}, "wb") as f:
            pickle.dump(outs, f)
    else:
        svc.worker_loop()
""")


def test_two_process_serving_matches_single_process(tmp_path):
    """SPMD serving: the coordinator batches requests and broadcasts each
    round; a worker process follows.  Results must match the single-process
    8-device service."""
    import jax

    from tsdiff_tpu.models import get_model

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_condensenc import MODEL_CFG, make_batch

    root = str(tmp_path)
    rng = np.random.default_rng(0)
    graphs = make_graph_dicts(rng, [5, 6, 7, 5], feat_dim=8)
    with open(os.path.join(root, "graphs.pkl"), "wb") as f:
        pickle.dump(graphs, f)
    batch = make_batch(rng, [5, 8])
    model = get_model(MODEL_CFG)
    ckpts = []
    for s in range(2):
        params = model.init(
            jax.random.key(s),
            batch.atom_type, batch.r_feat, batch.p_feat,
            batch.pos, batch.bond_mat, batch.node_mask,
        )
        ck = {
            "format": "tsdiff_tpu.ckpt.v1",
            "config": {"model": dict(MODEL_CFG)},
            "params": jax.tree_util.tree_map(np.asarray, params),
            "opt_state": None, "scheduler": None,
            "iteration": 1, "avg_val_loss": None,
        }
        path = os.path.join(root, f"ens{s}.pkl")
        with open(path, "wb") as f:
            pickle.dump(ck, f)
        ckpts.append(path)

    def run(out_name, init, env):
        return subprocess.Popen(
            [sys.executable, "-c", _SERVE_RUNNER.format(
                repo=REPO, init=init, ckpts=ckpts,
                graphs_pkl=os.path.join(root, "graphs.pkl"),
                out_pkl=os.path.join(root, out_name),
            )],
            env={**os.environ, **env},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )

    port = _free_port()
    procs = [
        run("out_mh.pkl",
            f"jax.distributed.initialize('127.0.0.1:{port}', 2, {pid})",
            {"XLA_FLAGS": "--xla_force_host_platform_device_count=4"})
        for pid in range(2)
    ]
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    sp = run("out_sp.pkl", "",
             {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    out, _ = sp.communicate(timeout=540)
    assert sp.returncode == 0, out[-4000:]

    with open(os.path.join(root, "out_mh.pkl"), "rb") as f:
        r_mh = pickle.load(f)
    with open(os.path.join(root, "out_sp.pkl"), "rb") as f:
        r_sp = pickle.load(f)
    assert len(r_mh) == len(r_sp) == 4
    for a, b in zip(r_mh, r_sp):
        assert a["pos_gen"].shape == b["pos_gen"].shape
        np.testing.assert_allclose(a["pos_gen"], b["pos_gen"], rtol=1e-4, atol=1e-5)


_HYBRID_RUNNER = textwrap.dedent("""
    import pickle, sys
    sys.path[:0] = [{repo!r}, {tests!r}]
    import jax
    jax.config.update("jax_platforms", "cpu")
    {init}
    import numpy as np
    from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, stack_params
    from tsdiff_tpu.diffusion.sampler import SamplingSettings, dynamic_sampling
    from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
    from tsdiff_tpu.models import get_model
    from tsdiff_tpu.parallel import make_hybrid_mesh
    from tsdiff_tpu.parallel.multihost import (
        global_from_full, global_key, replicate_output,
    )
    from tsdiff_tpu.parallel.sharding import batch_spec
    from jax.sharding import NamedSharding, PartitionSpec as P
    from test_condensenc import MODEL_CFG, make_batch

    rng = np.random.default_rng(1)
    batch = make_batch(rng, [5, 7, 6, 8], n_pad=8)
    model = get_model(MODEL_CFG)
    schedule = DiffusionSchedule.from_config(MODEL_CFG)
    init_args = (batch.atom_type, batch.r_feat, batch.p_feat,
                 batch.pos, batch.bond_mat, batch.node_mask)
    stacked = stack_params(
        [model.init(jax.random.key(s), *init_args) for s in range(2)]
    )
    pos_init = jax.random.normal(jax.random.key(3), batch.pos.shape)
    settings = SamplingSettings(sampling_type="ld", n_steps=4)

    # (dp_dcn=2, dp=2, ens=2): in the 2-process run the dp_dcn axis crosses
    # the process boundary — the multi-slice-over-DCN shape
    mesh = make_hybrid_mesh(ens=2, num_slices=2)
    assert mesh.devices.shape == (2, 2, 2)
    batch = global_from_full(jax.tree.map(np.asarray, batch), batch_spec(mesh))
    stacked = global_from_full(
        jax.device_get(stacked), NamedSharding(mesh, P("ens")))
    pos_init = global_from_full(np.asarray(pos_init), batch_spec(mesh))
    key = global_key(jax.random.key(4), mesh)

    res = dynamic_sampling(
        make_ensemble_score_fn(model, stacked, batch),
        schedule, pos_init, batch.node_mask, key, settings,
    )
    pos = np.asarray(replicate_output(res.pos, mesh))
    if jax.process_index() == 0:
        with open({out_pkl!r}, "wb") as f:
            pickle.dump(pos, f)
""")


def test_two_process_hybrid_mesh_sampling(tmp_path):
    """The (dp_dcn, dp, ens) hybrid mesh with the dp_dcn axis crossing a
    REAL process boundary — the closest single-machine analog of data
    parallelism across TPU slices over DCN.  Sampling output must match the
    same hybrid mesh emulated inside one process."""
    root = str(tmp_path)

    def run(out_name, init, env):
        return subprocess.Popen(
            [sys.executable, "-c", _HYBRID_RUNNER.format(
                repo=REPO, tests=os.path.join(REPO, "tests"), init=init,
                out_pkl=os.path.join(root, out_name),
            )],
            env={**os.environ, **env},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )

    port = _free_port()
    procs = [
        run("mh.pkl",
            f"jax.distributed.initialize('127.0.0.1:{port}', 2, {pid})",
            {"XLA_FLAGS": "--xla_force_host_platform_device_count=4"})
        for pid in range(2)
    ]
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    sp = run("sp.pkl", "",
             {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    out, _ = sp.communicate(timeout=540)
    assert sp.returncode == 0, out[-4000:]

    with open(os.path.join(root, "mh.pkl"), "rb") as f:
        pos_mh = pickle.load(f)
    with open(os.path.join(root, "sp.pkl"), "rb") as f:
        pos_sp = pickle.load(f)
    np.testing.assert_allclose(pos_mh, pos_sp, rtol=1e-4, atol=1e-5)


_PROTEIN_RUNNER = textwrap.dedent("""
    import sys
    sys.path[:0] = [{repo!r}]
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tsdiff_tpu.cli import protein_sampling
    protein_sampling.main({argv!r})
""")


def test_two_process_protein_sampling_matches_single_process(tmp_path):
    """Covering-subgraph protein inference over a 2-process mesh matches the
    single-process 8-device run."""
    import jax
    import jax.numpy as jnp

    from tsdiff_tpu.config import Config
    from tsdiff_tpu.core.graph import from_numpy_graphs
    from tsdiff_tpu.models import get_model
    from tsdiff_tpu.train import save_checkpoint
    from tsdiff_tpu.train.trainer import TrainState
    from tsdiff_tpu.cli import preprocessing

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_pdb import CFG_DSM, _protein_chain, pdb_to_graph

    root = str(tmp_path)
    with open(os.path.join(root, "a.pdb"), "w") as f:
        f.write(_protein_chain(5, seed=0))
    preprocessing.main(["--pdb_glob", os.path.join(root, "*.pdb"),
                        "--save_dir", root])

    model = get_model(CFG_DSM)
    g = pdb_to_graph(_protein_chain(5, seed=0))
    batch = from_numpy_graphs([g], max_nodes=32)
    params = model.init(
        jax.random.PRNGKey(0), batch.atom_type, batch.pos, batch.bond_mat,
        batch.node_mask, time_step=jnp.zeros((1,), jnp.int32),
    )
    state = TrainState(params=params, opt_state=None, step=jnp.asarray(0))
    ckpt = os.path.join(root, "0.ckpt")
    save_checkpoint(ckpt, Config(model=CFG_DSM.to_dict()), state)

    def argv(out, extra):
        return [
            ckpt, "--protein_set", os.path.join(root, "proteins.pkl"),
            "--save_dir", os.path.join(root, out), "--n_steps", "4",
            "--step_lr", "1e-6", "--cutoff", "7.0", "--batch_size", "8",
            "--mesh", "8", *extra,
        ]

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             _PROTEIN_RUNNER.format(repo=REPO, argv=argv("out_mh", [
                 "--multihost", "--coordinator", f"127.0.0.1:{port}",
                 "--nprocs", "2", "--procid", str(pid)]))],
            env={**os.environ,
                 "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    sp = subprocess.Popen(
        [sys.executable, "-c",
         _PROTEIN_RUNNER.format(repo=REPO, argv=argv("out_sp", []))],
        env={**os.environ, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    out, _ = sp.communicate(timeout=540)
    assert sp.returncode == 0, out[-4000:]

    with open(os.path.join(root, "out_mh", "proteins_gen.pkl"), "rb") as f:
        r_mh = pickle.load(f)
    with open(os.path.join(root, "out_sp", "proteins_gen.pkl"), "rb") as f:
        r_sp = pickle.load(f)
    assert len(r_mh) == len(r_sp) == 1
    np.testing.assert_allclose(
        r_mh[0]["pos_gen"], r_sp[0]["pos_gen"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        r_mh[0]["coverage_counts"], r_sp[0]["coverage_counts"]
    )


def test_two_process_cluster_matches_single_process(tmp_path):
    """2-process clusters with device_data off AND on, against ONE shared
    single-process 8-device reference (replaces the old 2x parametrization's
    duplicate reference run).  The off cluster must match the off reference
    TIGHTLY (multihost == singlehost parity); the on cluster is bounded
    LOOSELY against the same reference — the resident pipeline assembles
    batches in a slightly different order (measured 0.34% loss delta at
    6 iters), and its TIGHT cross-process parity is already asserted by
    test_two_process_hybrid_train_cli (hybrid mesh, device_data on, vs a
    single-process device_data-on reference).
    Everything runs back-to-back: overlapping the reference with a cluster
    starved Gloo's 30 s rendezvous on a loaded 1-core box (measured)."""
    cfg_path = _tiny_cfg(str(tmp_path))

    mh_losses = {}
    for device_data in ("off", "on"):
        port = _free_port()
        mh_dir = str(tmp_path / f"mh_{device_data}")
        procs = [
            _spawn([
                cfg_path, "--logdir", mh_dir, "--device_data", device_data,
                "--multihost", "--coordinator", f"127.0.0.1:{port}",
                "--nprocs", "2", "--procid", str(pid),
            ])
            for pid in range(2)
        ]
        outs = [p.communicate(timeout=540)[0] for p in procs]
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, \
                f"[{device_data}] proc {pid} failed:\n{out[-4000:]}"
        # only the coordinator wrote checkpoints
        all_ckpts = glob.glob(os.path.join(mh_dir, "*", "checkpoints", "*.ckpt"))
        coord_dirs = [d for d in glob.glob(os.path.join(mh_dir, "*"))
                      if "proc1" not in os.path.basename(d)]
        assert all_ckpts and all(
            os.path.dirname(os.path.dirname(c)) in coord_dirs for c in all_ckpts
        )
        mh_losses[device_data] = _best_val_loss(mh_dir)
        assert np.isfinite(mh_losses[device_data])

    # single-process 8-virtual-device run over the same global mesh shape:
    # identical seeds + identical global batches -> loss parity
    sp_dir = str(tmp_path / "sp")
    sp = _spawn(
        [cfg_path, "--logdir", sp_dir, "--device_data", "off"],
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    out, _ = sp.communicate(timeout=540)
    assert sp.returncode == 0, out[-4000:]
    sp_loss = _best_val_loss(sp_dir)
    np.testing.assert_allclose(mh_losses["off"], sp_loss, rtol=2e-3,
                               err_msg="device_data=off")
    np.testing.assert_allclose(mh_losses["on"], sp_loss, rtol=2e-2,
                               err_msg="device_data=on (loose: cross-pipeline)")
