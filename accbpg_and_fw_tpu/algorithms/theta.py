"""Newton solve for the ABPG theta-sequence (jittable scalar kernel).

Solves (1-theta')/theta'^gamma = gainratio / theta^gamma for theta', i.e. the
root of phi(t) = t^gamma - ckg*(1-t) with ckg = theta^gamma/gainratio,
starting Newton from theta (reference: accbpg/algorithms.py:75-91).  The
Python while loop becomes a bounded ``lax.while_loop`` so the solve runs on
device inside jitted algorithm steps.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def solve_theta_ds(theta, gamma, gainratio=None, max_iters=64, unroll=12,
                   square_gamma=False):
    """``solve_theta`` in DOUBLE-SINGLE arithmetic (fast_gram="ds" drivers).

    Mirrors the f64 kernel step-for-step — same guarded 12-step unroll +
    bounded while_loop, same |phi| > 1e-6*theta exit — with every scalar a
    DS pair, so the DS driver's theta sequence tracks the f64 driver's to
    ~1e-13 (the exit-test decisions compare at identical thresholds).
    ``theta``/``gainratio``/``gamma`` are DS pairs; powers go through DS
    exp/log."""
    from ..ops import double_single as ds

    if square_gamma:
        # static gamma == 2 (the reference benchmarks' value): t^gamma and
        # t^(gamma-1) become sq/identity — the DS exp/log Newton chains
        # otherwise dominate the gain step's scalar cost in-scan
        pow_g = ds.sq
        pow_gm1 = lambda t: t  # noqa: E731
    else:
        def pow_g(t):
            return ds.exp(ds.mul(gamma, ds.log(t)))

        def pow_gm1(t):
            return ds.exp(ds.mul(gm1, ds.log(t)))

    if gainratio is None:
        gainratio = ds.from_f32(jnp.ones_like(theta[0]))
    gm1 = ds.add_f32(gamma, jnp.float32(-1.0))
    ckg = ds.div(pow_g(theta), gainratio)
    eps = 1e-6 * theta[0]

    def phi(t):
        one_minus = ds.add_f32(ds.neg(t), jnp.float32(1.0))
        return ds.sub(pow_g(t), ds.mul(ckg, one_minus))

    def step(t, ph):
        upd = jnp.abs(ph[0]) > eps
        drv = ds.add(ds.mul(gamma, pow_gm1(t)), ckg)
        t_new = ds.where(upd, ds.sub(t, ds.div(ph, drv)), t)
        ph_new = phi(t_new)
        return t_new, ds.where(upd, ph_new, ph)

    t, ph = theta, phi(theta)
    for _ in range(unroll):
        t, ph = step(t, ph)

    def cond(state):
        t, ph, it = state
        return jnp.logical_and(jnp.abs(ph[0]) > eps, it < max_iters)

    def body(state):
        t, ph, it = state
        t, ph = step(t, ph)
        return t, ph, it + 1

    t, _, _ = lax.while_loop(cond, body, (t, ph, unroll))
    return t


def solve_theta(theta, gamma, gainratio=1.0, max_iters=64, unroll=12):
    theta = jnp.asarray(theta)
    gamma = jnp.asarray(gamma, theta.dtype)
    gainratio = jnp.asarray(gainratio, theta.dtype)
    ckg = theta**gamma / gainratio
    eps = 1e-6 * theta

    def phi(t):
        return t**gamma - ckg * (1.0 - t)

    def step(t, ph):
        upd = jnp.abs(ph) > eps
        drv = gamma * t ** (gamma - 1.0) + ckg
        t_new = jnp.where(upd, t - ph / drv, t)
        return t_new, jnp.where(upd, phi(t_new), ph)

    # Newton typically converges in 3-6 iterations; a fixed guarded unroll
    # keeps the whole solve inside the surrounding fusion (a scalar
    # lax.while_loop inside a scan body serializes the pipeline per
    # iteration).  The bounded while below only runs in the rare
    # not-yet-converged case — its condition is checked once when the
    # unrolled steps already landed.
    t, ph = theta, phi(theta)
    for _ in range(unroll):
        t, ph = step(t, ph)

    def cond(state):
        t, ph, it = state
        return jnp.logical_and(jnp.abs(ph) > eps, it < max_iters)

    def body(state):
        t, ph, it = state
        t, ph = step(t, ph)
        return t, ph, it + 1

    t, _, _ = lax.while_loop(cond, body, (t, ph, unroll))
    return t
