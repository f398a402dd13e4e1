"""LMO invariants: feasibility, boundary membership, linear optimality."""

import jax.numpy as jnp
import numpy as np

import accbpg_and_fw_tpu as acc


def test_lmo_simplex(rng):
    lmo = acc.lmo_simplex(radius=1.0)
    g = jnp.asarray(rng.normal(size=10))
    s = np.asarray(lmo(g))
    i = int(np.argmin(np.asarray(g)))
    assert s[i] == 1.0
    assert np.all(s > 0)
    assert abs(s.sum() - 1.0) < 1e-8
    # tie-breaking: first min index, like numpy
    g2 = jnp.asarray([3.0, -1.0, -1.0, 0.0])
    s2 = np.asarray(lmo(g2))
    assert s2[1] == 1.0 and s2[2] == 1e-15


def test_lmo_l2_ball(rng):
    lmo = acc.lmo_l2_ball(radius=2.0)
    g = jnp.asarray(rng.normal(size=6))
    s = np.asarray(lmo(g))
    assert abs(np.linalg.norm(s) - 2.0) < 1e-10
    # optimality: <g,s> <= <g,x> for any x in the ball
    x = rng.normal(size=6)
    x = 2.0 * x / max(np.linalg.norm(x), 1.0)
    assert np.dot(np.asarray(g), s) <= np.dot(np.asarray(g), x) + 1e-10
    # zero gradient -> center
    s0 = np.asarray(lmo(jnp.zeros(6)))
    np.testing.assert_allclose(s0, np.zeros(6))


def test_lmo_l2_ball_with_center(rng):
    center = rng.normal(size=5)
    lmo = acc.lmo_l2_ball(radius=1.5, center=center)
    g = jnp.asarray(rng.normal(size=5))
    s = np.asarray(lmo(g))
    assert abs(np.linalg.norm(s - center) - 1.5) < 1e-10


def test_lmo_l2_ball_positive_orthant(rng):
    lmo = acc.lmo_l2_ball_positive_orthant(radius=1.0, epsilon=1e-6)
    g = jnp.asarray(rng.normal(size=8))
    s = np.asarray(lmo(g))
    assert np.all(s >= 1e-6 - 1e-15)
    assert np.linalg.norm(s) <= 1.0 + 1e-6
    # all-positive gradient -> clamp of center
    s2 = np.asarray(lmo(jnp.abs(jnp.asarray(rng.normal(size=8))) + 0.1))
    np.testing.assert_allclose(s2, np.full(8, 1e-6))


def test_lmo_linf_ball(rng):
    lmo = acc.lmo_linf_ball(radius=0.5)
    g = jnp.asarray(rng.normal(size=7))
    s = np.asarray(lmo(g))
    np.testing.assert_allclose(np.abs(s), 0.5)
    np.testing.assert_allclose(s, -0.5 * np.sign(np.asarray(g)))


def test_lmo_matrix_simplex(rng):
    lmo = acc.lmo_matrix_simplex(radius=1.0)
    G = jnp.asarray(rng.normal(size=(4, 5)))
    S = np.asarray(lmo(G))
    idx = np.unravel_index(np.argmin(np.asarray(G)), (4, 5))
    assert S[idx] == 1.0
    assert abs(S.sum() - 1.0) < 1e-10


def test_lmo_matrix_box(rng):
    lower = np.zeros((3, 3))
    upper = np.ones((3, 3)) * 2
    lmo = acc.lmo_matrix_box(lower, upper)
    G = jnp.asarray(rng.normal(size=(3, 3)))
    S = np.asarray(lmo(G))
    np.testing.assert_allclose(S, np.where(np.asarray(G) < 0, 2.0, 0.0))


def test_lmo_nuclear_norm_ball(rng):
    lmo = acc.lmo_nuclear_norm_ball()
    G = jnp.asarray(rng.normal(size=(5, 4)))
    S = np.asarray(lmo(G))
    # rank 1, unit spectral/nuclear norm
    u, sv, vt = np.linalg.svd(S)
    assert abs(sv[0] - 1.0) < 1e-10 and sv[1] < 1e-10
    # matches top singular pair (reference's positive-sign convention)
    U, _, Vh = np.linalg.svd(np.asarray(G), full_matrices=False)
    np.testing.assert_allclose(np.abs(S), np.abs(np.outer(U[:, 0], Vh[0])), atol=1e-8)
