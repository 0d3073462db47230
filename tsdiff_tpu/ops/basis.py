"""Spherical Bessel / real spherical harmonic bases (JAX).

Standard directional-GNN basis machinery (the DimeNet/GemNet/ComENet family;
capability of reference models/geometry.py:94-429): sympy-generated closed
forms of the normalized spherical Bessel functions and real spherical
harmonics, lambdified against jax.numpy.  Host-side generation happens once
at module construction; evaluation is pure jnp and traces into jit.

The sympy generators (``Jn``/``Jn_zeros``/``spherical_bessel_formulas``/
``bessel_basis``/``associated_legendre_polynomials``/``real_sph_harm``) are
the BSD-licensed GemNet ``basis_utils`` (github.com/TUM-DAML/gemnet_pytorch,
Copyright (c) 2021 TUM-DAML; originally from DimeNet, Klicpera et al.) —
the same third-party machinery the reference vendors verbatim at
models/geometry.py:89-332.  The recurrences admit essentially one
implementation; only the lambdify target (jax.numpy) is ours.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
import sympy as sym
from scipy import special as sp
from scipy.optimize import brentq

_JNP_MODULES = {"sin": jnp.sin, "cos": jnp.cos, "sqrt": jnp.sqrt, "pi": np.pi}


def Jn(r, n):
    """Numerical spherical Bessel function of order n."""
    return sp.spherical_jn(n, r)


@lru_cache(maxsize=None)
def Jn_zeros(n: int, k: int) -> np.ndarray:
    """First k zeros of the spherical Bessel functions of orders 0..n-1."""
    zerosj = np.zeros((n, k), dtype=np.float64)
    zerosj[0] = np.arange(1, k + 1) * np.pi
    points = np.arange(1, k + n) * np.pi
    racines = np.zeros(k + n - 1, dtype=np.float64)
    for i in range(1, n):
        for j in range(k + n - 1 - i):
            racines[j] = brentq(Jn, points[j], points[j + 1], (i,))
        points = racines.copy()
        zerosj[i][:k] = racines[:k]
    return zerosj


@lru_cache(maxsize=None)
def spherical_bessel_formulas(n: int):
    """Sympy closed forms of j_0..j_{n-1} via the Rayleigh formula."""
    x = sym.symbols("x")
    j = [sym.sin(x) / x]
    a = sym.sin(x) / x
    for i in range(1, n):
        b = sym.diff(a, x) / x
        j += [sym.simplify(b * (-x) ** i)]
        a = sym.simplify(b)
    return j


@lru_cache(maxsize=None)
def bessel_basis(n: int, k: int):
    """Normalized, zero-rescaled Bessel basis formulas: n orders x k frequencies."""
    zeros = Jn_zeros(n, k)
    f = spherical_bessel_formulas(n)
    x = sym.symbols("x")
    basis = []
    for order in range(n):
        row = []
        for i in range(k):
            norm = 1.0 / math.sqrt(0.5 * Jn(zeros[order, i], order + 1) ** 2)
            row.append(sym.simplify(norm * f[order].subs(x, zeros[order, i] * x)))
        basis.append(row)
    return basis


def sph_harm_prefactor(l: int, m: int) -> float:
    return math.sqrt(
        (2 * l + 1)
        / (4 * np.pi)
        * math.factorial(l - abs(m))
        / math.factorial(l + abs(m))
    )


@lru_cache(maxsize=None)
def associated_legendre_polynomials(L: int, zero_m_only: bool = True):
    """Sympy associated Legendre polynomials P_l^m(z), m >= 0."""
    z = sym.symbols("z")
    P = [[0] * (2 * l + 1) for l in range(L)]
    P[0][0] = 1
    if L > 1:
        if zero_m_only:
            P[1][0] = z
            for l in range(2, L):
                P[l][0] = sym.simplify(
                    ((2 * l - 1) * z * P[l - 1][0] - (l - 1) * P[l - 2][0]) / l
                )
        else:
            for l in range(1, L):
                P[l][l] = sym.simplify(
                    (1 - 2 * l) * (1 - z**2) ** 0.5 * P[l - 1][l - 1]
                )
            for m in range(0, L - 1):
                P[m + 1][m] = sym.simplify((2 * m + 1) * z * P[m][m])
            for l in range(2, L):
                for m in range(l - 1):
                    P[l][m] = sym.simplify(
                        ((2 * l - 1) * z * P[l - 1][m] - (l + m - 1) * P[l - 2][m])
                        / (l - m)
                    )
    return P


@lru_cache(maxsize=None)
def real_sph_harm(L: int, zero_m_only: bool = True):
    """Real spherical harmonics as sympy expressions in (theta[, phi])."""
    theta = sym.symbols("theta")
    z = sym.symbols("z")
    P = associated_legendre_polynomials(L, zero_m_only)
    P = [
        [
            p.subs(z, sym.cos(theta)) if not isinstance(p, int) else p
            for p in row
        ]
        for row in P
    ]
    if zero_m_only:
        Y = [[sym.simplify(sph_harm_prefactor(l, 0) * P[l][0])] for l in range(L)]
        return Y
    phi = sym.symbols("phi")
    Y = [[0] * (2 * l + 1) for l in range(L)]
    for l in range(L):
        Y[l][0] = sym.simplify(sph_harm_prefactor(l, 0) * P[l][0])
    for l in range(1, L):
        for m in range(1, l + 1):
            Y[l][m] = sym.simplify(
                2**0.5 * (-1) ** m * sph_harm_prefactor(l, m) * P[l][m] * sym.cos(m * phi)
            )
            Y[l][-m] = sym.simplify(
                2**0.5 * (-1) ** m * sph_harm_prefactor(l, -m) * P[l][m] * sym.sin(m * phi)
            )
    return Y


def _lambdify(args, expr):
    if isinstance(expr, (int, float)) or expr.is_number:
        const = float(expr)
        return lambda *a: jnp.zeros_like(a[0]) + const
    return sym.lambdify(args, expr, modules=[_JNP_MODULES, "numpy"])


class AngleEmb:
    """Bessel(d) x Y_l0(theta) joint basis (reference geometry.py:335-373)."""

    def __init__(self, num_radial: int, num_spherical: int, cutoff: float = 8.0):
        assert num_radial <= 64
        self.num_radial = num_radial
        self.num_spherical = num_spherical
        self.cutoff = cutoff
        x, theta = sym.symbols("x theta")
        bf = bessel_basis(num_spherical, num_radial)
        Y = real_sph_harm(num_spherical, zero_m_only=True)
        self.bessel_funcs = [
            _lambdify([x], bf[l][n]) for l in range(num_spherical) for n in range(num_radial)
        ]
        self.sph_funcs = [_lambdify([theta], Y[l][0]) for l in range(num_spherical)]

    def __call__(self, dist, angle):
        d = dist / self.cutoff
        rbf = jnp.stack([f(d) for f in self.bessel_funcs], axis=-1)
        sbf = jnp.stack([f(angle) for f in self.sph_funcs], axis=-1)
        n, k = self.num_spherical, self.num_radial
        out = rbf.reshape(*d.shape, n, k) * sbf.reshape(*d.shape, n, 1)
        return out.reshape(*d.shape, n * k)


class TorsionEmb:
    """Bessel(d) x Y_lm(theta, phi) joint basis (reference geometry.py:376-429)."""

    def __init__(self, num_radial: int, num_spherical: int, cutoff: float = 8.0):
        assert num_radial <= 64
        self.num_radial = num_radial
        self.num_spherical = num_spherical
        self.cutoff = cutoff
        x, theta, phi = sym.symbols("x theta phi")
        bf = bessel_basis(num_spherical, num_radial)
        Y = real_sph_harm(num_spherical, zero_m_only=False)
        self.bessel_funcs = [
            _lambdify([x], bf[l][n]) for l in range(num_spherical) for n in range(num_radial)
        ]
        self.sph_funcs = []
        for l in range(num_spherical):
            # python list-index order (0..l, then -l..-1), matching the
            # reference's enumeration of Y_lm[l] (reference geometry.py:395-406)
            for idx in range(len(Y[l])):
                self.sph_funcs.append(_lambdify([theta, phi], Y[l][idx]))
        self.degree_in_order = np.arange(num_spherical) * 2 + 1

    def __call__(self, dist, theta, phi):
        d = dist / self.cutoff
        n, k = self.num_spherical, self.num_radial
        rbf = jnp.stack([f(d) for f in self.bessel_funcs], axis=-1)  # (..., n*k)
        sbf = jnp.stack([f(theta, phi) for f in self.sph_funcs], axis=-1)  # (..., n^2)
        rbf = rbf.reshape(*d.shape, n, k)
        rbf = jnp.repeat(rbf, self.degree_in_order, axis=-2, total_repeat_length=n * n)
        rbf = rbf.reshape(*d.shape, n * n * k)
        sbf = jnp.repeat(sbf, k, axis=-1)
        return rbf * sbf
