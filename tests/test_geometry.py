"""Geometry kernels: eq_transform oracle match + equivariance invariants."""

import numpy as np
import jax.numpy as jnp

from tsdiff_tpu.core import geometry

from reference_numpy import eq_transform_np


def _random_sym_mask(rng, n, p=0.4):
    m = rng.random((n, n)) < p
    m = np.triu(m, 1)
    return m | m.T


def test_eq_transform_matches_scatter_oracle():
    rng = np.random.default_rng(0)
    n = 9
    pos = rng.normal(size=(n, 3))
    emask = _random_sym_mask(rng, n)
    score = rng.normal(size=(n, n)) * emask

    edges = list(zip(*np.nonzero(emask)))
    score_dict = {(int(i), int(j)): score[i, j] for i, j in edges}
    want = eq_transform_np(score_dict, pos, edges)

    got = geometry.eq_transform(
        jnp.asarray(score[None], dtype=jnp.float32),
        jnp.asarray(pos[None], dtype=jnp.float32),
        jnp.asarray(emask[None]),
    )[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_eq_transform_rotation_equivariance():
    """Score vectors must rotate with the molecule (SE(3) equivariance by
    construction, SURVEY.md section 0)."""
    rng = np.random.default_rng(1)
    n = 8
    pos = rng.normal(size=(1, n, 3)).astype(np.float32)
    emask = _random_sym_mask(rng, n)[None]
    score = (rng.normal(size=(1, n, n)) * emask).astype(np.float32)

    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    q = q.astype(np.float32)

    out = geometry.eq_transform(jnp.asarray(score), jnp.asarray(pos), jnp.asarray(emask))
    out_rot = geometry.eq_transform(
        jnp.asarray(score), jnp.asarray(pos @ q), jnp.asarray(emask)
    )
    np.testing.assert_allclose(np.asarray(out) @ q, np.asarray(out_rot), rtol=1e-4, atol=1e-4)


def test_eq_transform_translation_invariance():
    rng = np.random.default_rng(2)
    n = 6
    pos = rng.normal(size=(1, n, 3)).astype(np.float32)
    emask = _random_sym_mask(rng, n)[None]
    score = (rng.normal(size=(1, n, n)) * emask).astype(np.float32)
    out = geometry.eq_transform(jnp.asarray(score), jnp.asarray(pos), jnp.asarray(emask))
    out_t = geometry.eq_transform(
        jnp.asarray(score), jnp.asarray(pos + 5.0), jnp.asarray(emask)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_t), rtol=1e-4, atol=1e-4)


def test_eq_transform_zero_on_padding():
    rng = np.random.default_rng(3)
    n, real = 8, 5
    pos = rng.normal(size=(1, n, 3)).astype(np.float32)
    emask = np.zeros((1, n, n), dtype=bool)
    m = _random_sym_mask(rng, real)
    emask[0, :real, :real] = m
    score = (rng.normal(size=(1, n, n))).astype(np.float32)
    out = np.asarray(
        geometry.eq_transform(jnp.asarray(score), jnp.asarray(pos), jnp.asarray(emask))
    )
    assert np.all(out[0, real:] == 0.0)
    assert np.isfinite(out).all()


def test_center_pos_masked():
    rng = np.random.default_rng(4)
    pos = rng.normal(size=(2, 6, 3)).astype(np.float32)
    mask = np.ones((2, 6), dtype=bool)
    mask[0, 4:] = False
    out = np.asarray(geometry.center_pos(jnp.asarray(pos), jnp.asarray(mask)))
    np.testing.assert_allclose(out[0, :4].mean(axis=0), 0.0, atol=1e-6)
    np.testing.assert_allclose(out[1].mean(axis=0), 0.0, atol=1e-6)
    assert np.all(out[0, 4:] == 0.0)


def test_clip_norm():
    v = np.array([[[3.0, 4.0, 0.0], [0.1, 0.0, 0.0]]], dtype=np.float32)
    out = np.asarray(geometry.clip_norm(jnp.asarray(v), limit=1.0))
    np.testing.assert_allclose(np.linalg.norm(out[0, 0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], v[0, 1], rtol=1e-6)


def test_pairwise_distance_masked_dummy():
    pos = jnp.asarray(np.random.default_rng(5).normal(size=(1, 4, 3)).astype(np.float32))
    emask = jnp.zeros((1, 4, 4), dtype=bool)
    d = np.asarray(geometry.pairwise_distance(pos, emask))
    np.testing.assert_allclose(d, 1.0)
