"""Jittable root-finding kernels shared by the Bregman prox maps.

These replace the reference's data-dependent Python loops
(/root/reference/accbpg/functions.py:326-356 bisection+Newton simplex
multiplier, :522-544 Cardano cubic) with fixed-bound ``lax.while_loop``
equivalents that compile once under ``jit`` and run entirely on device.
All reductions are plain ``jnp.sum`` so that under a sharded input XLA
lowers them to ``psum`` collectives automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def solve_cubic(c, beta):
    """Unique real root of ``z**3 - beta*z**2 = c`` for ``c > 0``.

    Closed-form (Cardano).  Used by the SumOf2nd4thPowers prox family
    (reference: functions.py:522-544).  Fully elementwise / scalar — safe
    inside jit and vmap.
    """
    c = jnp.asarray(c)
    beta = jnp.asarray(beta, dtype=c.dtype)
    z = beta / 3.0
    beta3 = beta**3
    delta = c**2 + 4.0 * beta3 * c / 27.0
    sq_delta = jnp.sqrt(delta)
    b = 0.5 * c + beta3 / 27.0
    z = z + jnp.cbrt(b + 0.5 * sq_delta)
    z = z + jnp.cbrt(b - 0.5 * sq_delta)
    # Cardano suffers cancellation when b ~ sq_delta/2; two Newton polish
    # steps restore near-machine accuracy at negligible cost.
    for _ in range(2):
        num = z * z * (z - beta) - c
        den = z * (3.0 * z - 2.0 * beta)
        z = z - num / jnp.where(den == 0, jnp.ones_like(den), den)
    return z


def simplex_inv_multiplier(gg, eps, max_bisect=200, max_newton=100):
    """Solve ``sum_i 1/(gg_i + c) = 1`` for the unique ``c > -min(gg)``.

    This is the KKT multiplier of ``argmin_{x in simplex} <g,x> - L*sum log x``
    whose solution is ``x = 1/(gg + c)`` with ``gg = g/L`` (Burg-entropy
    simplex prox; reference: functions.py:336-356).

    Strategy identical to the reference — bisect down from ``cmin + 1`` until
    the residual is positive, then Newton — but expressed as bounded
    ``lax.while_loop``s so it jits.  Each iteration is one or two full-vector
    reductions; under a sharded ``gg`` these become psums.

    Returns the multiplier ``c`` (scalar).
    """
    gg = jnp.asarray(gg)
    dtype = gg.dtype
    eps = jnp.asarray(eps, dtype)

    cmin = -jnp.min(gg)  # ensures min(gg + c) >= 0 for c >= cmin

    def resid(c):
        return jnp.sum(1.0 / (gg + c)) - 1.0

    # Phase 1: bisection toward cmin until resid(c) >= 0 (reference :337-341).
    def bi_cond(state):
        c, it = state
        return jnp.logical_and(resid(c) < 0, it < max_bisect)

    def bi_body(state):
        c, it = state
        return (0.5 * (cmin + c), it + 1)

    c0 = cmin + jnp.asarray(1.0, dtype)
    c, _ = lax.while_loop(bi_cond, bi_body, (c0, 0))

    # Phase 2: Newton on resid(c); monotone decreasing & convex in c so
    # Newton from resid(c) >= 0 converges from below (reference :344-355).
    def nw_cond(state):
        c, fc, it = state
        return jnp.logical_and(jnp.abs(fc) > eps, it < max_newton)

    def nw_body(state):
        c, fc, it = state
        fpc = jnp.sum(-1.0 / (gg + c) ** 2)
        step = fc / fpc
        c_new = c - step
        # Guard: if the update underflows to no movement, freeze (matches the
        # reference's early break at functions.py:348-349).
        c_new = jnp.where(c_new == c, c, c_new)
        fc_new = jnp.where(c_new == c, jnp.zeros_like(fc), resid(c_new))
        return (c_new, fc_new, it + 1)

    fc0 = resid(c)
    c, _, _ = lax.while_loop(nw_cond, nw_body, (c, fc0, 0))
    return c


def project_simplex_burg(y, eps=1e-8):
    """Map ``y`` to ``x = 1/(y + c)`` with ``sum(x) = 1`` (Burg-Newton map).

    The reference uses this both for the Burg simplex prox and as the
    "simplex projection" of SumOf2nd4thPowersOnSimplex
    (functions.py:590-614).  Shape-preserving; works on matrices by
    flattening.
    """
    shape = y.shape
    y_flat = y.reshape(-1)
    c = simplex_inv_multiplier(y_flat, eps)
    return (1.0 / (y_flat + c)).reshape(shape)


def bisect_monotone(fn, lo, hi, iters=64):
    """Scalar bisection for an increasing function on [lo, hi].

    Returns the (approximate) root of ``fn``; if ``fn`` has no sign change the
    result clamps to an endpoint.  Fixed iteration count => jittable.
    """
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi, dtype=lo.dtype)

    def body(_, state):
        lo_, hi_ = state
        mid = 0.5 * (lo_ + hi_)
        go_right = fn(mid) < 0
        return (jnp.where(go_right, mid, lo_), jnp.where(go_right, hi_, mid))

    lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def newton_scalar(fn, dfn, x0, tol, max_iters=100):
    """Bounded scalar Newton iteration (jittable)."""

    def cond(state):
        x, fx, it = state
        return jnp.logical_and(jnp.abs(fx) > tol, it < max_iters)

    def body(state):
        x, fx, it = state
        x_new = x - fx / dfn(x)
        return (x_new, fn(x_new), it + 1)

    x0 = jnp.asarray(x0)
    x, _, _ = lax.while_loop(cond, body, (x0, fn(x0), 0))
    return x
