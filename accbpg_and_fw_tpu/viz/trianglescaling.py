"""Empirical triangle-scaling-exponent (TSE) estimation and plots
(reference: accbpg/trianglescaling.py:10-79).

The estimator is

    gamma_hat(theta) = log( D((1-t)x + t y, (1-t)x + t z) / D(y, z) ) / log t

evaluated on a theta grid.  The curve computation (``tse_curve``) is a
vmapped, jitted kernel — one device call per (x, y, z) triple instead of
the reference's Python loop over thetas — and the plot functions wrap it
with the reference's figure semantics.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def tse_curve(h, x, y, z, thetas):
    """gamma_hat(theta) for one (x, y, z) triple on a theta grid (vmapped)."""
    x, y, z = jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)
    thetas = jnp.asarray(thetas, x.dtype)
    dyz = h.divergence(y, z)

    def one(c):
        dtheta = h.divergence((1 - c) * x + c * y, (1 - c) * x + c * z)
        return jnp.log(dtheta / dyz) / jnp.log(c)

    return jax.jit(jax.vmap(one))(thetas)


def plotTSE(h, dim=10, nTriples=10, nThetas=100, R=1, onSimplex=True,
            randseed=-1):
    """Plot gamma_hat(theta) curves for random triples
    (reference: trianglescaling.py:10-46)."""
    import matplotlib.pyplot as plt

    if randseed >= 0:
        np.random.seed(randseed)

    plt.figure()
    thetas = np.arange(1.0 / nThetas, 1, 1.0 / nThetas)
    for _ in range(nTriples):
        x = R * np.random.rand(dim)
        y = R * np.random.rand(dim)
        z = R * np.random.rand(dim)
        if onSimplex:
            x, y, z = x / x.sum(), y / y.sum(), z / z.sum()
        plt.plot(thetas, np.asarray(tse_curve(h, x, y, z, thetas)))

    plt.xlim([0, 1])
    plt.tight_layout()


def plotTSE0(h, dim=10, xscale=1, yscale=1, zscale=2, nThetas=1000,
             maxTheta=1):
    """Plot gamma_hat(theta) for the deterministic scaled-ones triple
    (reference: trianglescaling.py:49-79)."""
    import matplotlib.pyplot as plt

    plt.figure()
    x = xscale * np.ones(dim)
    y = yscale * np.ones(dim)
    z = zscale * np.ones(dim)
    thetas = np.arange(1.0 / nThetas, maxTheta, 1.0 / nThetas)
    plt.plot(thetas, np.asarray(tse_curve(h, x, y, z, thetas)))
    plt.xlim([0, maxTheta])
    plt.tight_layout()
