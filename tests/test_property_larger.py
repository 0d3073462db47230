"""Property tests at larger sizes + fused-score path through the sampler."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tsdiff_tpu.config import Config
from tsdiff_tpu.core import graph_ops
from tsdiff_tpu.diffusion.ensemble import make_ensemble_score_fn, make_score_fn, stack_params
from tsdiff_tpu.diffusion.sampler import SamplingSettings, dynamic_sampling
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
from tsdiff_tpu.models import get_model

from reference_numpy import condensed_global_edges_np, random_reaction_graph
from test_condensenc import MODEL_CFG, make_batch


def test_graph_extension_oracle_n32():
    """Order-4 condensed extension at the largest production bucket size."""
    rng = np.random.default_rng(42)
    sizes = [25, 32, 29]
    bms = [random_reaction_graph(rng, n) for n in sizes]
    poss = [rng.normal(scale=2.5, size=(n, 3)) for n in sizes]

    bm = np.zeros((3, 32, 32), np.int32)
    pos = np.zeros((3, 32, 3), np.float32)
    mask = np.zeros((3, 32), bool)
    for b, (t, p) in enumerate(zip(bms, poss)):
        n = t.shape[0]
        bm[b, :n, :n] = t
        pos[b, :n] = p
        mask[b, :n] = True

    edges = graph_ops.extend_condensed_graph_edge(
        jnp.asarray(bm), jnp.asarray(pos), jnp.asarray(mask), order=4, cutoff=10.0
    )
    mg, tr, tp = map(np.asarray, (edges.mask_global, edges.type_r, edges.type_p))
    for b, (t, p) in enumerate(zip(bms, poss)):
        want = condensed_global_edges_np(t, p, 4, 10.0)
        got = {
            (int(i), int(j)): (int(tr[b, i, j]), int(tp[b, i, j]))
            for i, j in zip(*np.nonzero(mg[b]))
        }
        assert got == want


@pytest.mark.heavy
def test_fused_score_through_sampler_interpret(monkeypatch):
    """The fully-fused score path runs the whole sampling scan (interpret mode)."""
    import tsdiff_tpu.ops.pallas.condensed_score as cs

    orig = cs.condensed_score_pallas
    monkeypatch.setattr(
        cs, "condensed_score_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )

    rng = np.random.default_rng(7)
    batch = make_batch(rng, [5, 7], n_pad=8)
    cfg = Config(MODEL_CFG.to_dict())
    model_ref = get_model(cfg)
    cfg.fused_score = True
    model = get_model(cfg)
    schedule = DiffusionSchedule.from_config(cfg)
    init_args = (
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    params = [model.init(jax.random.key(s), *init_args) for s in range(2)]
    settings = SamplingSettings(sampling_type="ld", n_steps=4)
    pos_init = jax.random.normal(jax.random.key(1), batch.pos.shape)

    res = dynamic_sampling(
        make_ensemble_score_fn(model, stack_params(params), batch),
        schedule, pos_init, batch.node_mask, jax.random.key(2), settings,
    )
    assert not bool(res.nan_detected)

    # identical run through the XLA path must agree (same params and keys)
    res_ref = dynamic_sampling(
        make_ensemble_score_fn(model_ref, stack_params(params), batch),
        schedule, pos_init, batch.node_mask, jax.random.key(2), settings,
    )
    np.testing.assert_allclose(
        np.asarray(res.pos), np.asarray(res_ref.pos), rtol=1e-4, atol=1e-5
    )


def test_parallel_facade():
    from tsdiff_tpu.parallel import make_mesh, shard_batch, stack_params  # noqa: F401

    mesh = make_mesh(dp=4, ens=2)
    assert mesh.shape == {"dp": 4, "ens": 2}


def test_sampling_deterministic_under_fixed_keys():
    """Identical keys -> bitwise-identical samples (explicit PRNG threading)."""
    rng = np.random.default_rng(11)
    batch = make_batch(rng, [5, 7], n_pad=8)
    model = get_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    schedule = DiffusionSchedule.from_config(MODEL_CFG)
    settings = SamplingSettings(sampling_type="ld", n_steps=5)
    pos_init = jax.random.normal(jax.random.key(1), batch.pos.shape)

    def run():
        return np.asarray(
            dynamic_sampling(
                make_score_fn(model, params, batch), schedule,
                pos_init, batch.node_mask, jax.random.key(9), settings,
            ).pos
        )

    np.testing.assert_array_equal(run(), run())


@pytest.mark.heavy
def test_dimenetpp_padding_invariance():
    from tsdiff_tpu.models.dimenetpp import DimeNetPPEncoder

    rng = np.random.default_rng(12)
    real = 6
    model = DimeNetPPEncoder(
        num_layers=1, hidden_channels=16, out_channels=16, int_emb_size=8,
        basis_emb_size=4, out_emb_channels=16, num_spherical=2, num_radial=3,
        cutoff=10.0,
    )

    outs = []
    for n_pad in (8, 12):
        node = np.zeros((1, n_pad, 16), np.float32)
        pos = np.zeros((1, n_pad, 3), np.float32)
        attr = np.zeros((1, n_pad, n_pad, 16), np.float32)
        m = np.zeros((1, n_pad, n_pad), bool)
        rng2 = np.random.default_rng(5)
        node[0, :real] = rng2.normal(size=(real, 16))
        pos[0, :real] = rng2.normal(scale=1.5, size=(real, 3))
        attr[0, :real, :real] = rng2.normal(size=(real, real, 16))
        mm = rng2.random((real, real)) < 0.6
        mm = np.triu(mm, 1)
        m[0, :real, :real] = mm | mm.T
        node_mask = np.arange(n_pad)[None] < real
        params = model.init(
            jax.random.key(0), jnp.asarray(node), jnp.asarray(pos),
            jnp.asarray(m), jnp.asarray(attr), jnp.asarray(node_mask),
        )
        out = model.apply(
            params, jnp.asarray(node), jnp.asarray(pos),
            jnp.asarray(m), jnp.asarray(attr), jnp.asarray(node_mask),
        )
        outs.append(np.asarray(out)[0, :real])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-5)
