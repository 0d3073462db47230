"""Bessel / spherical-harmonic bases: numeric identities + shapes."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import special as sp

from tsdiff_tpu.ops.basis import (
    AngleEmb,
    Jn_zeros,
    TorsionEmb,
    bessel_basis,
    real_sph_harm,
)


def test_jn_zeros_are_zeros():
    z = Jn_zeros(3, 4)
    for n in range(3):
        for k in range(4):
            assert abs(sp.spherical_jn(n, z[n, k])) < 1e-8
    # interlacing: zeros of j_n lie between zeros of j_{n-1}
    assert (z[1] > z[0]).all() and (z[1, :-1] < z[0, 1:]).all()


def test_bessel_basis_orthonormal_on_unit_interval():
    """Normalized basis: integral_0^1 x^2 b_nk(x) b_nk'(x) dx ~ delta_kk' (x sqrt-c factor)."""
    import sympy as sym

    basis = bessel_basis(1, 3)
    x = sym.symbols("x")
    for i in range(3):
        for j in range(3):
            val = float(
                sym.integrate(basis[0][i] * basis[0][j] * x**2, (x, 0, 1))
            )
            assert abs(val - (1.0 if i == j else 0.0)) < 1e-6


def test_real_sph_harm_matches_scipy():
    """Y_l0(theta) equals scipy sph_harm real part at m=0."""
    import sympy as sym

    Y = real_sph_harm(4, zero_m_only=True)
    theta = sym.symbols("theta")
    for l in range(4):
        f = sym.lambdify([theta], Y[l][0], "numpy")
        th = np.linspace(0.1, 3.0, 7)
        if hasattr(sp, "sph_harm_y"):  # scipy >= 1.15
            want = np.real(sp.sph_harm_y(l, 0, th, 0.0))
        else:
            want = np.real(sp.sph_harm(0, l, 0.0, th))
        np.testing.assert_allclose(np.asarray(f(th), dtype=np.float64), want, atol=1e-10)


def test_angle_emb_shapes_and_finite():
    emb = AngleEmb(num_radial=4, num_spherical=3, cutoff=8.0)
    d = jnp.asarray(np.random.default_rng(0).uniform(0.5, 7.5, size=(10,)))
    a = jnp.asarray(np.random.default_rng(1).uniform(0.1, 3.0, size=(10,)))
    out = emb(d, a)
    assert out.shape == (10, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_torsion_emb_shapes_and_finite():
    emb = TorsionEmb(num_radial=3, num_spherical=3, cutoff=8.0)
    d = jnp.asarray(np.random.default_rng(0).uniform(0.5, 7.5, size=(6,)))
    th = jnp.asarray(np.random.default_rng(1).uniform(0.1, 3.0, size=(6,)))
    ph = jnp.asarray(np.random.default_rng(2).uniform(-3.0, 3.0, size=(6,)))
    out = emb(d, th, ph)
    assert out.shape == (6, 3 * 3 * 3)
    assert np.isfinite(np.asarray(out)).all()
