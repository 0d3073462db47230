"""Optional encoders: EGNN, DimeNet++ (and ComENet when present)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsdiff_tpu.models.dimenetpp import DimeNetPPEncoder
from tsdiff_tpu.models.egnn import EGNNMixed2DEncoder


def _random_inputs(rng, B=2, N=8, H=16, real=6):
    node = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    pos = jnp.asarray(rng.normal(scale=1.5, size=(B, N, 3)), jnp.float32)
    m = rng.random((B, N, N)) < 0.5
    m = np.triu(m, 1)
    m = m | m.transpose(0, 2, 1)
    m[:, real:, :] = False
    m[:, :, real:] = False
    emask = jnp.asarray(m)
    attr = jnp.asarray(rng.normal(size=(B, N, N, H)), jnp.float32)
    node_mask = jnp.asarray(np.arange(N)[None, :] < real)
    return node, pos, emask, attr, node_mask


def test_egnn_forward_and_padding():
    rng = np.random.default_rng(0)
    node, pos, emask, attr, node_mask = _random_inputs(rng)
    model = EGNNMixed2DEncoder(hidden_dim=16, num_convs=2, dropout=0.0)
    params = model.init(jax.random.key(0), node, emask, attr, attr, emask, pos)
    out = model.apply(params, node, emask, attr, attr, emask, pos)
    assert out.shape == node.shape
    assert np.isfinite(np.asarray(out)).all()


def test_egnn_rotation_behavior():
    """Node features are rotation-invariant (built from |dist|^2 and gates)."""
    rng = np.random.default_rng(1)
    node, pos, emask, attr, node_mask = _random_inputs(rng)
    model = EGNNMixed2DEncoder(hidden_dim=16, num_convs=2, dropout=0.0)
    params = model.init(jax.random.key(0), node, emask, attr, attr, emask, pos)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    out1 = model.apply(params, node, emask, attr, attr, emask, pos)
    out2 = model.apply(params, node, emask, attr, attr, emask, pos @ jnp.asarray(q, jnp.float32))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=5e-4, atol=5e-5)


def test_comenet_forward_and_invariance():
    from tsdiff_tpu.models.comenet import ComENetEncoder, comenet_features

    rng = np.random.default_rng(3)
    node, pos, emask, attr, node_mask = _random_inputs(rng)
    type_r = jnp.asarray(rng.integers(0, 26, size=(2, 8, 8)))
    type_p = jnp.asarray(rng.integers(0, 26, size=(2, 8, 8)))
    model = ComENetEncoder(
        cutoff=8.0, num_layers=1, hidden_channels=16, out_channels=16,
        num_radial=2, num_spherical=2, num_output_layers=1,
    )
    params = model.init(jax.random.key(0), node, pos, emask, type_r, type_p, node_mask)
    out = model.apply(params, node, pos, emask, type_r, type_p, node_mask)
    assert out.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
    assert np.all(np.asarray(out)[:, 6:] == 0)

    # frame coordinates are rotation-invariant away from the reference's own
    # branch-point degeneracies: phi is ill-defined when the edge coincides
    # with a reference vector (s in {n0(t), n1(t)} — the reference has the
    # same behavior, its tau-only skip logic is at comenet.py:407-422), and
    # tau collapses to {0, pi} noise when both endpoints pick the same
    # reference atom.  Exclude those edges and angles at the 0/pi fold.
    from tsdiff_tpu.models.comenet import dense_frames

    full = np.zeros((2, 8, 8), dtype=bool)
    full[:, :6, :6] = ~np.eye(6, dtype=bool)
    full_mask = jnp.asarray(full)
    d1, t1, p1, u1 = comenet_features(pos, full_mask, 8.0)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    d2, t2, p2, u2 = comenet_features(pos @ jnp.asarray(q, jnp.float32), full_mask, 8.0)

    dist = np.linalg.norm(
        np.asarray(pos)[:, :, None] - np.asarray(pos)[:, None, :], axis=-1
    )
    n0, n1 = map(np.asarray, dense_frames(jnp.asarray(dist), full_mask, 8.0))
    s_idx = np.arange(8)[None, None, :]
    degen = (n0[:, :, None] == s_idx) | (n1[:, :, None] == s_idx)
    near_fold = (
        (np.minimum(np.asarray(u1), np.pi - np.asarray(u1)) < 1e-2)
        | (np.minimum(np.asarray(p1), np.pi - np.asarray(p1)) < 1e-2)
    )
    m = full & ~degen & ~near_fold
    assert m.sum() > 0
    for name, a, b in (("d", d1, d2), ("theta", t1, t2), ("phi", p1, p2), ("tau", u1, u2)):
        np.testing.assert_allclose(
            np.asarray(a)[m], np.asarray(b)[m], rtol=1e-2, atol=1e-2, err_msg=name
        )


def test_encoder_registry():
    from tsdiff_tpu.config import Config
    from tsdiff_tpu.models import load_encoder

    cfg = Config(
        encoder=dict(
            name="schnet", hidden_dim=16, num_convs=2, cutoff=10.0, smooth_conv=False
        )
    )
    enc = load_encoder(cfg, "encoder")
    assert enc.num_interactions == 2


@pytest.mark.heavy
def test_dimenetpp_forward_and_invariance():
    rng = np.random.default_rng(2)
    node, pos, emask, attr, node_mask = _random_inputs(rng)
    model = DimeNetPPEncoder(
        num_layers=1, hidden_channels=16, out_channels=16, int_emb_size=8,
        basis_emb_size=4, out_emb_channels=16, num_spherical=3, num_radial=4,
        cutoff=10.0,
    )
    params = model.init(jax.random.key(0), node, pos, emask, attr, node_mask)
    out = model.apply(params, node, pos, emask, attr, node_mask)
    assert out.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
    # padded rows zero
    assert np.all(np.asarray(out)[:, 6:] == 0)

    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    out_rot = model.apply(
        params, node, pos @ jnp.asarray(q, jnp.float32), emask, attr, node_mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_rot), rtol=2e-3, atol=2e-4)
