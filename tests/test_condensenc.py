"""CondenseEncoderEpsNetwork: shapes, invariances, loss, differentiability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsdiff_tpu.config import Config
from tsdiff_tpu.core.graph import from_numpy_graphs
from tsdiff_tpu.diffusion.objective import diffusion_loss, sample_antithetic_timesteps
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule
from tsdiff_tpu.models import get_model

from reference_numpy import random_reaction_graph

MODEL_CFG = Config(
    network="condensenc",
    edge_cutoff=10.0,
    edge_order=4,
    pred_edge_order=3,
    encoder=dict(
        name="schnet", edge_emb=False, num_convs=2, cutoff=10.0,
        smooth_conv=False, mlp_act="swish", hidden_dim=32,
    ),
    feat_dim=8,
    hidden_dim=32,
    edge_encoder="mlp",
    mlp_act="swish",
    edge_cat_act="swish",
    beta_schedule="sigmoid",
    beta_start=1e-7,
    beta_end=2e-3,
    num_diffusion_timesteps=100,
)


def make_batch(rng, sizes, n_pad=12, feat_dim=8):
    graphs = []
    for n in sizes:
        graphs.append(
            dict(
                atom_type=rng.integers(1, 10, size=n),
                r_feat=(rng.random((n, feat_dim)) < 0.3).astype(np.float32),
                p_feat=(rng.random((n, feat_dim)) < 0.3).astype(np.float32),
                pos=rng.normal(scale=1.5, size=(n, 3)).astype(np.float32),
                bond_mat=random_reaction_graph(rng, n),
            )
        )
    return from_numpy_graphs(graphs, max_nodes=n_pad)


@pytest.fixture(scope="module")
def model_and_params():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, [5, 8, 11])
    model = get_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0),
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    return model, params, batch


def test_forward_shapes(model_and_params):
    model, params, batch = model_and_params
    edge_inv, edges, d = model.apply(
        params, batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    B, N = batch.atom_type.shape
    assert edge_inv.shape == (B, N, N, 1)
    assert edges.mask_global.shape == (B, N, N)
    assert d.shape == (B, N, N)
    assert np.isfinite(np.asarray(edge_inv)).all()


def test_edge_inv_rotation_invariant(model_and_params):
    """Per-pair distance scores depend only on distances -> rotation invariant."""
    model, params, batch = model_and_params
    rng = np.random.default_rng(1)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    q = q.astype(np.float32)

    ei1, _, _ = model.apply(
        params, batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )
    ei2, _, _ = model.apply(
        params, batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos @ q, batch.bond_mat, batch.node_mask,
    )
    np.testing.assert_allclose(np.asarray(ei1), np.asarray(ei2), rtol=2e-4, atol=2e-5)


def test_antithetic_timesteps():
    t = np.asarray(sample_antithetic_timesteps(jax.random.key(0), 10, 0, 100))
    assert t.shape == (10,)
    assert (t >= 0).all() and (t < 100).all()
    # antithetic pairing: first half and second half sum to t0+t1-1
    sz = 10 // 2 + 1
    paired = t[:10 - sz]
    np.testing.assert_array_equal(paired + t[sz:], 99)


@pytest.mark.heavy
def test_loss_finite_and_differentiable(model_and_params):
    model, params, batch = model_and_params
    schedule = DiffusionSchedule.from_config(MODEL_CFG)

    @jax.jit
    def loss_fn(p, key):
        return diffusion_loss(model, p, schedule, batch, key)[0]

    key = jax.random.key(42)
    loss = loss_fn(params, key)
    assert np.isfinite(float(loss))
    grads = jax.jit(jax.grad(loss_fn))(params, key)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


@pytest.mark.heavy
def test_forward_invariant_to_padding_amount():
    """Same graphs, different pad size -> identical real-region outputs
    (masking exactness: padded atoms must never leak into messages)."""
    sizes = [5, 7]
    model = get_model(MODEL_CFG)

    outs = []
    for n_pad in (8, 16):
        rng = np.random.default_rng(7)
        batch = make_batch(rng, sizes, n_pad=n_pad)
        params = model.init(
            jax.random.key(0),
            batch.atom_type, batch.r_feat, batch.p_feat,
            batch.pos, batch.bond_mat, batch.node_mask,
        )
        edge_inv, edges, _ = model.apply(
            params, batch.atom_type, batch.r_feat, batch.p_feat,
            batch.pos, batch.bond_mat, batch.node_mask,
        )
        ei = np.asarray(edge_inv)[..., 0] * np.asarray(edges.mask_global)
        outs.append([ei[b, :n, :n] for b, n in enumerate(sizes)])
    for a, b in zip(*outs):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
