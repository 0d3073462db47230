"""Legacy dual-encoder model: forward shapes, type decomposition, losses, samplers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsdiff_tpu.chem import NUM_BOND_TYPES
from tsdiff_tpu.config import Config
from tsdiff_tpu.core.graph import from_numpy_graphs
from tsdiff_tpu.diffusion.dual_objective import (
    dsm_annealed_sampling,
    dual_diffusion_loss,
    dual_dsm_loss,
    dual_dynamic_sampling,
    make_dual_eps_fn,
)
from tsdiff_tpu.diffusion.sampler import SamplingSettings
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
from tsdiff_tpu.models import get_model
from tsdiff_tpu.models.dualenc import decompose_legacy_types

from reference_numpy import random_reaction_graph

BASE = dict(
    network="dualenc",
    hidden_dim=16,
    num_convs=2,
    num_convs_local=2,
    cutoff=10.0,
    mlp_act="relu",
    beta_schedule="sigmoid",
    beta_start=1e-7,
    beta_end=2e-3,
    num_diffusion_timesteps=50,
    edge_order=3,
    edge_encoder="mlp",
    smooth_conv=False,
)
CFG_DIFF = Config(dict(BASE, type="diffusion"))
CFG_DIFF_TS = Config(dict(BASE, type="diffusion", TS=True, edge_cat_act="relu"))
CFG_DSM = Config(dict(BASE, type="dsm", sigma_begin=10.0, sigma_end=0.01, num_noise_level=10))


def make_legacy_batch(rng, sizes, n_pad=12, ts=True):
    graphs = []
    for n in sizes:
        if ts:
            bm = random_reaction_graph(rng, n)
        else:
            bm = np.triu((rng.random((n, n)) < 0.3).astype(np.int64), 1)
            bm = (bm + bm.T) * rng.integers(1, 4)
        graphs.append(
            dict(
                atom_type=rng.integers(1, 10, size=n).astype(np.int32),
                r_feat=np.zeros((n, 1), np.float32),
                p_feat=np.zeros((n, 1), np.float32),
                pos=rng.normal(scale=1.5, size=(n, 3)).astype(np.float32),
                bond_mat=bm,
            )
        )
    return from_numpy_graphs(graphs, max_nodes=n_pad)


def test_decompose_legacy_types():
    nb = NUM_BOND_TYPES
    # TS bond code r=1,p=2 -> (1, 2); 2-hop code nb^2+1 -> both sides 23
    t = jnp.asarray([[1 * nb + 2, nb**2 + 1, 0]])
    t1, t2 = decompose_legacy_types(t, ts_mode=True)
    assert t1.tolist() == [[1, nb + 1, 0]]
    assert t2.tolist() == [[2, nb + 1, 0]]
    # non-TS: plain bond code 2 stays 2; 3-hop nb^2+2 -> 24
    t1, t2 = decompose_legacy_types(jnp.asarray([[2, nb**2 + 2]]), ts_mode=False)
    assert t1.tolist() == [[2, nb + 2]]
    assert t2 is None


@pytest.mark.parametrize("cfg", [CFG_DIFF, CFG_DIFF_TS, CFG_DSM], ids=["diff", "diff_ts", "dsm"])
def test_dualenc_forward(cfg):
    rng = np.random.default_rng(0)
    batch = make_legacy_batch(rng, [5, 8], ts=bool(cfg.get("TS", False)))
    model = get_model(cfg)
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(
        jax.random.key(0), batch.atom_type, batch.pos, batch.bond_mat,
        batch.node_mask, time_step=t,
    )
    eg, el, edges, d = model.apply(
        params, batch.atom_type, batch.pos, batch.bond_mat, batch.node_mask,
        time_step=t,
    )
    B, N = batch.atom_type.shape
    assert eg.shape == (B, N, N, 1) and el.shape == (B, N, N, 1)
    assert np.isfinite(np.asarray(eg)).all() and np.isfinite(np.asarray(el)).all()


@pytest.mark.heavy
def test_dual_losses_finite_and_decrease():
    rng = np.random.default_rng(1)
    batch = make_legacy_batch(rng, [5, 6, 7, 8], ts=True)
    model = get_model(CFG_DIFF_TS)
    schedule = DiffusionSchedule.from_config(CFG_DIFF_TS)
    t = jnp.zeros((4,), jnp.int32)
    params = model.init(
        jax.random.key(0), batch.atom_type, batch.pos, batch.bond_mat,
        batch.node_mask, time_step=t,
    )
    loss, aux = dual_diffusion_loss(model, params, schedule, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: dual_diffusion_loss(model, p, schedule, batch, jax.random.key(1))[0]
    )(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))

    # dsm loss
    model_dsm = get_model(CFG_DSM)
    batch2 = make_legacy_batch(np.random.default_rng(2), [5, 6], ts=False)
    t2 = jnp.zeros((2,), jnp.int32)
    params_dsm = model_dsm.init(
        jax.random.key(0), batch2.atom_type, batch2.pos, batch2.bond_mat,
        batch2.node_mask, time_step=t2,
    )
    loss2, _ = dual_dsm_loss(model_dsm, params_dsm, batch2, jax.random.key(3))
    assert np.isfinite(float(loss2))


@pytest.mark.heavy
def test_dual_sampling_diffusion_and_dsm():
    rng = np.random.default_rng(4)
    batch = make_legacy_batch(rng, [5, 6], ts=True)
    schedule = DiffusionSchedule.from_config(CFG_DIFF_TS)
    model = get_model(CFG_DIFF_TS)
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(
        jax.random.key(0), batch.atom_type, batch.pos, batch.bond_mat,
        batch.node_mask, time_step=t,
    )
    eps_fn = make_dual_eps_fn(model, params, batch, w_global=0.2)
    pos, traj, nan = jax.jit(
        lambda k: dual_dynamic_sampling(
            eps_fn, schedule,
            jax.random.normal(jax.random.key(5), batch.pos.shape),
            batch.node_mask, k,
            SamplingSettings(sampling_type="ld", n_steps=5),
        )
    )(jax.random.key(6))
    assert not bool(nan)
    assert np.isfinite(np.asarray(pos)).all()
    assert np.all(np.asarray(pos)[0, 5:] == 0)

    # dsm annealed ladder
    model_dsm = get_model(CFG_DSM)
    batch2 = make_legacy_batch(np.random.default_rng(5), [5], ts=False)
    t2 = jnp.zeros((1,), jnp.int32)
    params_dsm = model_dsm.init(
        jax.random.key(0), batch2.atom_type, batch2.pos, batch2.bond_mat,
        batch2.node_mask, time_step=t2,
    )
    eps_dsm = make_dual_eps_fn(model_dsm, params_dsm, batch2)
    pos2, _, nan2 = dsm_annealed_sampling(
        eps_dsm, model_dsm.sigmas,
        jax.random.normal(jax.random.key(7), batch2.pos.shape),
        batch2.node_mask, jax.random.key(8), n_steps=2,
    )
    assert not bool(nan2)
    assert np.isfinite(np.asarray(pos2)).all()
