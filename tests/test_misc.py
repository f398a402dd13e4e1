"""Coverage for diagnostics, TSE estimation, and visualization."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import jax.numpy as jnp

import accbpg_and_fw_tpu as acc
from accbpg_and_fw_tpu import diagnostics


class TestTSE:
    def test_calculate_tse_constant_euclidean(self):
        # For h = (1/2)||x||^2, D((1-a)x+ay, (1-a)x+az) = a^2 D(y,z) exactly,
        # so the empirical TSE is ~2 (reference: functions.py:1107-1152)
        h = acc.SquaredL2Norm()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(10))
        y = jnp.asarray(rng.standard_normal(10))
        z = jnp.asarray(rng.standard_normal(10))
        alpha = 0.3
        lhs_a = (1 - alpha) * x + alpha * y
        lhs_b = (1 - alpha) * x + alpha * z
        gamma = float(acc.calculate_tse_constant(h, lhs_a, lhs_b, y, z, alpha))
        assert gamma == pytest.approx(2.0, abs=1e-3)

    def test_calculate_tse_rejects_bad_alpha(self):
        h = acc.SquaredL2Norm()
        v = jnp.ones(3)
        with pytest.raises(ValueError):
            acc.calculate_tse_constant(h, v, v, v, v, alpha=1.5)

    def test_tse_curve_shapes(self):
        from accbpg_and_fw_tpu.viz import tse_curve

        h = acc.ShannonEntropy()
        rng = np.random.default_rng(0)
        x, y, z = (rng.random(8) for _ in range(3))
        thetas = np.linspace(0.05, 0.95, 19)
        curve = np.asarray(tse_curve(h, x, y, z, thetas))
        assert curve.shape == (19,)
        assert np.isfinite(curve).all()

    def test_plotTSE_runs(self):
        acc.plotTSE(acc.BurgEntropy(), dim=5, nTriples=2, nThetas=20, randseed=1)
        acc.plotTSE0(acc.PowerNeg1(), dim=5, nThetas=20)


class TestViz:
    def test_plot_comparisons(self):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        F1 = np.geomspace(1, 1e-6, 50)
        F2 = np.geomspace(1, 1e-4, 50)
        acc.plot_comparisons(ax, [F1, F2], ["a", "b"], plotdiff=True,
                             yscale="log", xlabel="k", ylabel="F")
        assert len(ax.lines) == 2
        plt.close(fig)


class TestDiagnostics:
    def test_check_domain(self):
        diagnostics.check_domain(acc.BurgEntropy(), np.ones(4))
        with pytest.raises(ValueError, match="positive"):
            diagnostics.check_domain(acc.BurgEntropy(), np.array([1.0, -1.0]))
        with pytest.raises(ValueError, match="simplex"):
            diagnostics.check_domain(acc.BurgEntropySimplex(), np.ones(4))
        diagnostics.check_domain(acc.BurgEntropySimplex(), np.full(4, 0.25))

    def test_debug_mode_roundtrip(self):
        import jax

        with diagnostics.debug_mode():
            assert jax.config.jax_debug_nans
        assert not jax.config.jax_debug_nans

    def test_iteration_rate(self):
        rate, total = diagnostics.iteration_rate(np.linspace(0, 2.0, 101))
        assert rate == pytest.approx(50.0)
        assert total == pytest.approx(2.0)

    def test_divergence_is_valid(self):
        h = acc.SquaredL2Norm()
        assert bool(diagnostics.divergence_is_valid(h, jnp.ones(3), jnp.zeros(3)))


def test_accbpg_compat_alias():
    """Reference user code (`import accbpg`) runs unchanged on this framework."""
    import accbpg

    f, h, L, x0 = accbpg.D_opt_design(10, 30, randseed=1)
    x, F, Ls, T = accbpg.BPG(f, h, L, x0, maxitrs=20, verbose=False)
    assert F[-1] < F[0]
    for name in ("ABPG", "ABPG_gain", "ABDA", "FW_alg_div_step", "D_opt_FW",
                 "D_opt_FW_away", "lmo_simplex", "plot_comparisons",
                 "Poisson_regrL1", "solve_theta"):
        assert hasattr(accbpg, name), name


def test_accbpg_compat_covers_every_reference_export():
    """EXHAUSTIVE drop-in check: every public name the reference's
    ``accbpg/__init__.py`` exports (explicit imports plus ``import *``
    module-level defs) must resolve on our compat package.  Derived by AST
    so it tracks the reference without importing it (its deps may be
    absent here)."""
    import ast
    import os

    init = "/root/reference/accbpg/__init__.py"
    if not os.path.exists(init):
        pytest.skip("reference checkout not mounted")

    names, star_mods = set(), []
    with open(init) as fh:
        tree = ast.parse(fh.read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    star_mods.append(node.module)
                else:
                    names.add(a.asname or a.name)
    for mod in star_mods:
        with open(f"/root/reference/accbpg/{mod}.py") as fh:
            mtree = ast.parse(fh.read())
        for node in mtree.body:
            if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
                if not node.name.startswith("_"):
                    names.add(node.name)
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and not t.id.startswith("_"):
                        names.add(t.id)

    import accbpg

    missing = sorted(n for n in names if not hasattr(accbpg, n))
    assert len(names) >= 70  # the reference exports 72 today
    assert not missing, f"compat layer missing reference exports: {missing}"


def test_custom_plain_class_oracles():
    """The reference's extension point: users subclass RSmoothFunction /
    LegendreFunction as plain Python classes (README.md:59). The drivers
    must accept them (closure-compilation fallback)."""
    import accbpg

    class MyQuadratic(accbpg.RSmoothFunction):
        def __init__(self, A, b):
            self.A = jnp.asarray(A)
            self.b = jnp.asarray(b)

        def value(self, x, key=None):
            r = self.A @ x - self.b
            return 0.5 * jnp.vdot(r, r)

        def value_and_grad(self, x, key=None):
            r = self.A @ x - self.b
            return 0.5 * jnp.vdot(r, r), self.A.T @ r

    class MyEuclidean(accbpg.LegendreFunction):
        def value(self, x):
            return 0.5 * jnp.vdot(x, x)

        def grad(self, x):
            return x

        def divergence(self, x, y):
            d = x - y
            return 0.5 * jnp.vdot(d, d)

        def div_prox_map(self, y, g, L):
            return y - g / L

        def prox_map(self, g, L):
            return -g / L

    rng = np.random.default_rng(0)
    A = rng.standard_normal((20, 8))
    b = rng.standard_normal(20)
    f = MyQuadratic(A, b)
    h = MyEuclidean()
    L = float(np.linalg.norm(A, 2) ** 2)
    x0 = jnp.zeros(8)

    xs, *_ = np.linalg.lstsq(A, b, rcond=None)
    r = A @ xs - b
    F_star = 0.5 * float(np.dot(r, r))

    x, F, Ls, T = accbpg.BPG(f, h, L, x0, maxitrs=500, verbose=False)
    assert F[-1] - F_star < 1e-8
    x2, F2, G2, T2 = accbpg.ABPG(f, h, L, x0, gamma=2, maxitrs=500, verbose=False)
    assert F2[-1] - F_star < 1e-6
