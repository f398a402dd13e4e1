"""ABPG_gain fast_gram=True: the stateful linear-Gram D-opt step.

Contract: the fast step realizes the SAME method with different-but-valid
arithmetic (one Gram per trial, Schulz inverse, trace-series logdets).
With the true-f64 oracle the trajectories agree to roundoff until a gain
line-search trial flips; convergence is equivalent either way (the mixed
oracle contract of tests/test_mixed_oracle.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import accbpg_and_fw_tpu as acc

pytestmark = pytest.mark.skipif(
    not jax.config.jax_enable_x64, reason="fast_gram serves f64-grade runs")


def _instance(m=20, n=300, seed=7):
    np.random.seed(seed)
    V = np.random.randn(m, n)
    return V, jnp.full(n, 1.0 / n, jnp.float64)


_FSTAR_CACHE = {}


def _fstar(V, x0):
    key = (V.shape, float(V[0, 0]))
    if key not in _FSTAR_CACHE:
        _, F_s, *_ = acc.D_opt_FW_away(jnp.asarray(V, jnp.float64), x0,
                                       eps=1e-12, maxitrs=50000,
                                       verbose=False)
        _FSTAR_CACHE[key] = float(np.asarray(F_s)[-1])
    return _FSTAR_CACHE[key]


def test_fast_gram_matches_generic_f64():
    V, x0 = _instance()
    f = acc.DOptimalObj(H=jnp.asarray(V, jnp.float64))
    h = acc.ops.h_oracles.BurgEntropySimplex()
    Fstar = _fstar(V, x0)
    r_a = acc.ABPG_gain(f, h, 1.0, x0, gamma=2, maxitrs=400, verbose=False)
    r_b = acc.ABPG_gain(f, h, 1.0, x0, gamma=2, maxitrs=400, verbose=False,
                        fast_gram=True)
    F_a, F_b = np.asarray(r_a[1]), np.asarray(r_b[1])
    assert len(F_a) == len(F_b)
    # identical arithmetic path before any line-search flip
    np.testing.assert_allclose(F_b[:10], F_a[:10], rtol=0, atol=1e-12)
    for k in (50, 100, 200, len(F_a) - 1):
        ga, gb = F_a[k] - Fstar, F_b[k] - Fstar
        assert ga > 0 and gb > 0
        assert gb <= 2.0 * ga + 1e-12 and ga <= 2.0 * gb + 1e-12, (k, ga, gb)


def test_fast_gram_mixed_oracle_converges():
    V, x0 = _instance()
    fmx = acc.DOptimalObjMixed.from_design(V)
    h = acc.ops.h_oracles.BurgEntropySimplex()
    Fstar = _fstar(V, x0)
    r = acc.ABPG_gain(fmx, h, 1.0, x0, gamma=2, maxitrs=400, verbose=False,
                      fast_gram=True)
    F = np.asarray(r[1])
    # measured gap at k=400 for the generic f64 run on this seed: ~1.3e-2
    assert F[-1] - Fstar < 2.5e-2
    assert F[-1] <= F[0]


def test_fast_gram_chunk_refresh_stable():
    """Small chunks force the between_chunks Gram/logdet refresh many
    times; the refreshed run must keep converging identically-well."""
    V, x0 = _instance(m=15, n=200, seed=3)
    f = acc.DOptimalObj(H=jnp.asarray(V, jnp.float64))
    h = acc.ops.h_oracles.BurgEntropySimplex()
    Fstar = _fstar(V, x0)
    r_big = acc.ABPG_gain(f, h, 1.0, x0, gamma=2, maxitrs=300, verbose=False,
                          fast_gram=True, chunk=256)
    r_sml = acc.ABPG_gain(f, h, 1.0, x0, gamma=2, maxitrs=300, verbose=False,
                          fast_gram=True, chunk=32)
    ga = np.asarray(r_big[1])[-1] - Fstar
    gb = np.asarray(r_sml[1])[-1] - Fstar
    assert ga > 0 and gb > 0
    assert gb <= 2.0 * ga + 1e-12 and ga <= 2.0 * gb + 1e-12


def test_fast_gram_restart_and_checkdiv():
    V, x0 = _instance(m=12, n=150, seed=5)
    f = acc.DOptimalObj(H=jnp.asarray(V, jnp.float64))
    h = acc.ops.h_oracles.BurgEntropySimplex()
    for kw in (dict(restart=True, restart_rule='g'),
               dict(restart=True, restart_rule='f'),
               dict(checkdiv=True),
               dict(theta_eq=False)):
        r = acc.ABPG_gain(f, h, 1.0, x0, gamma=2, maxitrs=150, verbose=False,
                          fast_gram=True, **kw)
        F = np.asarray(r[1])
        assert np.isfinite(F).all(), kw
        assert F[-1] <= F[0], kw


def test_fast_gram_bpg_matches_generic():
    V, x0 = _instance()
    f = acc.DOptimalObj(H=jnp.asarray(V, jnp.float64))
    h = acc.ops.h_oracles.BurgEntropySimplex()
    for ls in (True, False):
        r_a = acc.BPG(f, h, 1.0, x0, maxitrs=250, linesearch=ls,
                      verbose=False)
        r_b = acc.BPG(f, h, 1.0, x0, maxitrs=250, linesearch=ls,
                      verbose=False, fast_gram=True)
        F_a, F_b = np.asarray(r_a[1]), np.asarray(r_b[1])
        assert len(F_a) == len(F_b), ls
        np.testing.assert_allclose(F_b[:10], F_a[:10], rtol=0, atol=1e-11)
        # BPG has no chaotic gain schedule — trajectories stay together
        np.testing.assert_allclose(F_b, F_a, rtol=1e-6)
        assert abs(F_b[-1] - F_a[-1]) <= 1e-8 * abs(F_a[-1]), ls


def test_fast_gram_abpg_matches_generic():
    V, x0 = _instance()
    f = acc.DOptimalObj(H=jnp.asarray(V, jnp.float64))
    h = acc.ops.h_oracles.BurgEntropySimplex()
    Fstar = _fstar(V, x0)
    for kw in (dict(), dict(restart=True, restart_rule='g'),
               dict(theta_eq=True)):
        r_a = acc.ABPG(f, h, 1.0, x0, gamma=2, maxitrs=300, verbose=False,
                       **kw)
        r_b = acc.ABPG(f, h, 1.0, x0, gamma=2, maxitrs=300, verbose=False,
                       fast_gram=True, **kw)
        F_a, F_b = np.asarray(r_a[1]), np.asarray(r_b[1])
        assert len(F_a) == len(F_b), kw
        np.testing.assert_allclose(F_b[:10], F_a[:10], rtol=0, atol=1e-11)
        ga, gb = F_a[-1] - Fstar, F_b[-1] - Fstar
        assert gb <= 1.5 * ga + 1e-12 and ga <= 1.5 * gb + 1e-12, (kw, ga, gb)


def test_fast_gram_abpg_expo_and_abda_match_generic():
    V, x0 = _instance(m=15, n=200, seed=4)
    f = acc.DOptimalObj(H=jnp.asarray(V, jnp.float64))
    h = acc.ops.h_oracles.BurgEntropySimplex()
    Fstar = _fstar(V, x0)

    r_a = acc.ABPG_expo(f, h, 1.0, x0, gamma0=3.0, maxitrs=200,
                        verbose=False)
    r_b = acc.ABPG_expo(f, h, 1.0, x0, gamma0=3.0, maxitrs=200,
                        verbose=False, fast_gram=True)
    F_a, F_b = np.asarray(r_a[1]), np.asarray(r_b[1])
    np.testing.assert_allclose(F_b[:10], F_a[:10], rtol=0, atol=1e-11)
    ga, gb = F_a[-1] - Fstar, F_b[-1] - Fstar
    assert gb <= 1.5 * ga + 1e-12 and ga <= 1.5 * gb + 1e-12, (ga, gb)

    r_a = acc.ABDA(f, h, 1.0, x0, gamma=2, maxitrs=200, verbose=False)
    r_b = acc.ABDA(f, h, 1.0, x0, gamma=2, maxitrs=200, verbose=False,
                   fast_gram=True)
    F_a, F_b = np.asarray(r_a[1]), np.asarray(r_b[1])
    np.testing.assert_allclose(F_b[:10], F_a[:10], rtol=0, atol=1e-11)
    # ABDA has no line search at all — trajectories stay together
    np.testing.assert_allclose(F_b, F_a, rtol=1e-6)


def test_fast_gram_checkpoint_resume_bitwise(tmp_path):
    """The between-chunks Gram refresh must not break exact resume: the
    driver saves the POST-refresh carry, so an interrupted fast_gram run
    resumed from its checkpoint replays the uninterrupted trajectory
    bitwise."""
    V, x0 = _instance(m=12, n=150, seed=11)
    f = acc.DOptimalObj(H=jnp.asarray(V, jnp.float64))
    h = acc.ops.h_oracles.BurgEntropySimplex()
    ck = str(tmp_path / "fg.npz")
    r_full = acc.ABPG_gain(f, h, 1.0, x0, gamma=2, maxitrs=200,
                           verbose=False, fast_gram=True, chunk=32)
    acc.ABPG_gain(f, h, 1.0, x0, gamma=2, maxitrs=100, verbose=False,
                  fast_gram=True, chunk=32, checkpoint=ck)
    r_res = acc.ABPG_gain(f, h, 1.0, x0, gamma=2, maxitrs=200,
                          verbose=False, fast_gram=True, chunk=32,
                          checkpoint=ck)
    np.testing.assert_array_equal(np.asarray(r_res[1]),
                                  np.asarray(r_full[1]))
    np.testing.assert_array_equal(np.asarray(r_res[0]),
                                  np.asarray(r_full[0]))


def test_accept_delta_contract():
    """Exact oracles must get a LITERAL 0.0 allowance (adding it is a
    bitwise no-op — golden parity depends on this); noise-declaring
    oracles get accept_tol * (1 + |scale|)."""
    from accbpg_and_fw_tpu.algorithms.bpg import _accept_delta

    f64 = acc.DOptimalObj(H=jnp.ones((3, 9), jnp.float64))
    d = _accept_delta(f64, jnp.asarray(5.0))
    assert isinstance(d, float) and d == 0.0
    fmx = acc.DOptimalObjMixed.from_design(
        np.random.default_rng(0).standard_normal((5, 20)))
    assert float(_accept_delta(fmx, jnp.asarray(-9.0))) == 1e-10 * 10.0


def test_fast_gram_rejects_plain_oracles():
    rng = np.random.default_rng(0)
    A = np.abs(rng.standard_normal((50, 20))) + 0.1
    b = A @ (np.abs(rng.standard_normal(20)) + 0.1)
    fp = acc.PoissonRegression(A=jnp.asarray(A, jnp.float64),
                               b=jnp.asarray(b, jnp.float64))
    h = acc.ops.h_oracles.BurgEntropyL1(lamda=0.01)
    with pytest.raises(ValueError):
        acc.ABPG_gain(fp, h, float(b.sum()), jnp.ones(20, jnp.float64),
                      gamma=2, maxitrs=10, verbose=False, fast_gram=True)
