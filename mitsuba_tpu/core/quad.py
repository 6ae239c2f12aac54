"""Gaussian quadrature rules.

Reference: include/mitsuba/core/quad.h — `gauss_legendre(n)` and
`gauss_lobatto(n)` node/weight construction (used by spectra
normalization and BSDF furnace checks).

Host-side numpy construction (rules are static data); integration
helpers are jnp for use inside jitted code.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def gauss_legendre(n: int):
    """(nodes, weights) of the n-point Gauss-Legendre rule on [-1, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def gauss_lobatto(n: int):
    """(nodes, weights) of the n-point Gauss-Lobatto rule on [-1, 1]
    (endpoints included; exact to degree 2n-3)."""
    assert n >= 2
    # interior nodes: roots of P'_{n-1}
    c = np.zeros(n)
    c[-1] = 1.0
    dleg = np.polynomial.legendre.Legendre(c).deriv()
    xi = dleg.roots() if n > 2 else np.array([])
    x = np.concatenate([[-1.0], np.sort(np.real(xi)), [1.0]])
    Pn1 = np.polynomial.legendre.Legendre(c)
    w = 2.0 / (n * (n - 1) * Pn1(x) ** 2)
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def integrate(rule, f, a: float, b: float):
    """Integrate f over [a, b] with a (nodes, weights) rule."""
    x, w = rule
    xm = 0.5 * (a + b) + 0.5 * (b - a) * x
    return 0.5 * (b - a) * jnp.sum(w * f(xm))
