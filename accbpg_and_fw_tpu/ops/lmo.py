"""Linear minimization oracles (LMOs) for the Frank-Wolfe family.

Closure-factory API identical to /root/reference/accbpg/functions_lmo.py
(each ``lmo_*`` returns a jittable function ``g -> s``), re-implemented in
jnp.  Argmin/argmax tie-breaking follows numpy's first-index rule, which
``jnp.argmin``/``jnp.argmax`` also guarantee — important for trace parity
(reference: functions_lmo.py:156-158).  Under a sharded ``g`` the arg-
reductions lower to global collectives automatically inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def lmo_nuclear_norm_ball():
    """Rank-1 vertex of the (unit) nuclear-norm ball: outer(u1, v1) from the
    top singular pair of g (reference: functions_lmo.py:4-13, including its
    positive-sign convention)."""

    def f(g):
        U, S, Vh = jnp.linalg.svd(g, full_matrices=False)
        return jnp.outer(U[:, 0], Vh[0])

    return f


def lmo_l2_ball(radius, center=None):
    """argmin_{||s-center||<=radius} <g,s> = center - radius*g/||g||
    (reference: functions_lmo.py:16-51)."""

    def f(g):
        center_p = jnp.zeros_like(g) if center is None else jnp.broadcast_to(
            jnp.asarray(center, g.dtype), g.shape
        )
        g_norm = jnp.linalg.norm(g)
        s = center_p - radius * g / jnp.maximum(g_norm, 1e-30)
        # degenerate gradient -> stay at the center (reference :41-42)
        return jnp.where(g_norm < 1e-10, center_p, s)

    return f


def lmo_l2_ball_positive_orthant(radius, center=None, epsilon=0.0):
    """LMO for the L2 ball intersected with {x_i >= epsilon}
    (reference: functions_lmo.py:54-102): move radius units along the
    negative-coordinate directions of g only, then floor at epsilon."""

    def f(g):
        center_p = jnp.zeros_like(g) if center is None else jnp.broadcast_to(
            jnp.asarray(center, g.dtype), g.shape
        )
        g_neg = jnp.where(g < 0, g, 0.0)
        neg_norm = jnp.linalg.norm(g_neg)
        direction = jnp.where(neg_norm > 0, -g_neg / jnp.maximum(neg_norm, 1e-30), 0.0)
        s = center_p + radius * direction
        return jnp.maximum(s, epsilon)

    return f


def lmo_linf_ball(radius, center=None):
    """Vertex of the l-inf ball: center - radius*sign(g)
    (reference: functions_lmo.py:106-134)."""

    def f(g):
        center_p = jnp.zeros_like(g) if center is None else jnp.broadcast_to(
            jnp.asarray(center, g.dtype), g.shape
        )
        return center_p - radius * jnp.sign(g)

    return f


def lmo_simplex(radius=1):
    """Simplex vertex at the first argmin coordinate of g, with the
    reference's 1e-15 positivity floor (functions_lmo.py:137-160)."""

    def f(g):
        i = jnp.argmin(g)  # first min index, same tie-break as numpy
        s = jnp.full(g.shape, 1e-15, dtype=g.dtype)
        return s.at[i].set(radius)

    return f


def lmo_matrix_simplex(radius=1.0):
    """Matrix-simplex vertex at the argmin entry of G, 1e-60 floor
    (reference: functions_lmo.py:163-187)."""

    def f(G):
        flat = G.reshape(-1)
        i = jnp.argmin(flat)
        s = jnp.full(flat.shape, 1e-60, dtype=G.dtype).at[i].set(radius)
        return s.reshape(G.shape)

    return f


def lmo_matrix_box(lower, upper):
    """Box LMO: pick upper where G < 0, else lower
    (reference: functions_lmo.py:190-212)."""

    def f(G):
        return jnp.where(G < 0, upper, lower)

    return f
