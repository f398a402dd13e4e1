"""DOptimalObjMixed: f64-grade D-opt oracle via exact int8 Ozaki GEMMs.

The mixed oracle must agree with the true-f64 DOptimalObj to the digit
truncation (~1e-12 relative) AND reproduce f64 driver trajectories when
swapped in (the whole point: same convergence, no emulated-f64 matmuls).
Requires x64 (conftest enables it)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import accbpg_and_fw_tpu as acc

pytestmark = pytest.mark.skipif(
    not jax.config.jax_enable_x64, reason="mixed oracle serves f64 parity")


def _instance(m=30, n=800, seed=10):
    np.random.seed(seed)
    V = np.random.randn(m, n)
    f64 = acc.DOptimalObj(H=jnp.asarray(V, jnp.float64))
    fmx = acc.DOptimalObjMixed.from_design(V)
    return V, f64, fmx


def test_value_and_grad_match_f64():
    _, f64, fmx = _instance()
    rng = np.random.default_rng(1)
    for _ in range(3):
        x = np.abs(rng.standard_normal(f64.n))
        x /= x.sum()
        v0, g0 = map(np.asarray, f64.value_and_grad(jnp.asarray(x)))
        v1, g1 = map(np.asarray, fmx.value_and_grad(jnp.asarray(x)))
        assert abs(v1 - v0) <= 1e-11 * max(1.0, abs(v0))
        assert np.abs(g1 - g0).max() <= 1e-10 * np.abs(g0).max()
        assert abs(float(fmx.value(jnp.asarray(x))) - v0) <= 1e-11 * abs(v0)


def test_bpg_trajectory_matches_f64():
    V, f64, fmx = _instance(m=20, n=300, seed=3)
    h = acc.ops.h_oracles.BurgEntropySimplex()
    x0 = jnp.full(V.shape[1], 1.0 / V.shape[1], jnp.float64)
    x_a, F_a, Ls_a, _ = acc.BPG(f64, h, 1.0, x0, maxitrs=300, verbose=False)
    x_b, F_b, Ls_b, _ = acc.BPG(fmx, h, 1.0, x0, maxitrs=300, verbose=False)
    assert len(F_a) == len(F_b)
    np.testing.assert_allclose(np.asarray(F_b), np.asarray(F_a), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_a), atol=1e-8)
    np.testing.assert_array_equal(np.asarray(Ls_a), np.asarray(Ls_b))


def test_factory_mixed_oracle():
    f, h, L, x0 = acc.D_opt_design(15, 200, randseed=4, oracle="mixed")
    assert isinstance(f, acc.DOptimalObjMixed)
    assert x0.dtype == jnp.float64
    f2, _, _, _ = acc.D_opt_design(15, 200, randseed=4)
    v_mixed = float(f.value(jnp.asarray(np.asarray(x0))))
    v_plain = float(acc.DOptimalObj(
        H=jnp.asarray(np.asarray(f2.H), jnp.float64)).value(x0))
    assert abs(v_mixed - v_plain) <= 1e-10 * max(1.0, abs(v_plain))
    with pytest.raises(ValueError):
        acc.D_opt_design(10, 50, oracle="nope")


def test_abpg_gain_trajectory_matches_f64():
    V, f64, fmx = _instance(m=20, n=300, seed=7)
    h = acc.ops.h_oracles.BurgEntropySimplex()
    x0 = jnp.full(V.shape[1], 1.0 / V.shape[1], jnp.float64)
    r_a = acc.ABPG_gain(f64, h, 1.0, x0, gamma=2, maxitrs=200, verbose=False)
    r_b = acc.ABPG_gain(fmx, h, 1.0, x0, gamma=2, maxitrs=200, verbose=False)
    F_a, F_b = np.asarray(r_a[1]), np.asarray(r_b[1])
    assert len(F_a) == len(F_b)
    # the gain line search is a discrete accept/reject: a ~1e-12 oracle
    # perturbation can flip one trial (measured: transient 1e-7 deviation
    # at one iteration) but the trajectories re-converge — assert a loose
    # bound everywhere and tight final agreement
    np.testing.assert_allclose(F_b, F_a, rtol=1e-6)
    assert abs(F_b[-1] - F_a[-1]) <= 1e-9 * abs(F_a[-1])
