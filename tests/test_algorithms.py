"""Algorithm-driver tests: trajectory parity with the reference's stored
traces (SURVEY.md §4/§6), convergence behavior, early-stop truncation
semantics, and the incremental-state consistency of the D-opt solvers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import accbpg_and_fw_tpu as acc


@pytest.fixture(scope="module")
def dopt_small():
    # the README's own first example, seeded like the reference notebook
    # (ipynb/ex_Dopt_random.ipynb) but smaller for test speed
    return acc.D_opt_design(40, 120, randseed=10)


class TestBPGFamily:
    def test_bpg_dopt_reference_trace(self):
        """D-opt 80x200 seed 10: reference BPG reaches F=1.759e+01 @ k=900
        (ipynb/ex_Dopt_random.ipynb:cell4)."""
        f, h, L, x0 = acc.D_opt_design(80, 200, randseed=10)
        x, F, Ls, T = acc.BPG(f, h, L, x0, maxitrs=900, verbose=False)
        assert abs(F[-1] - 17.59) < 0.05
        assert np.all(np.diff(F) < 1e-8)  # monotone descent (with LS)
        assert float(jnp.sum(x)) == pytest.approx(1.0, abs=1e-6)
        assert float(jnp.min(x)) > 0

    def test_abpg_dopt_reference_trace(self):
        f, h, L, x0 = acc.D_opt_design(80, 200, randseed=10)
        x, F, G, T = acc.ABPG(f, h, L, x0, gamma=2, maxitrs=900, verbose=False)
        assert abs(F[-1] - 17.585) < 0.05

    def test_abpg_gain_beats_bpg(self, dopt_small):
        f, h, L, x0 = dopt_small
        _, Fb, _, _ = acc.BPG(f, h, L, x0, maxitrs=300, verbose=False)
        _, Fg, *_ = acc.ABPG_gain(f, h, L, x0, gamma=2, maxitrs=300, verbose=False)
        assert Fg[-1] <= Fb[-1] + 1e-3

    def test_abpg_restart_rules(self, dopt_small):
        f, h, L, x0 = dopt_small
        for rule in ("f", "g"):
            x, F, G, T = acc.ABPG(f, h, L, x0, gamma=2, maxitrs=150,
                                  restart=True, restart_rule=rule, verbose=False)
            assert np.isfinite(F).all()

    def test_abpg_expo_adapts_gamma(self, dopt_small):
        f, h, L, x0 = dopt_small
        x, F, Gamma, G, T = acc.ABPG_expo(f, h, L, x0, gamma0=3.0, maxitrs=150,
                                          theta_eq=False, verbose=False)
        assert np.isfinite(F).all()
        assert np.all(Gamma <= 3.0) and np.all(Gamma >= 1.0)
        assert np.all(np.diff(Gamma) <= 0)  # gamma only decreases

    def test_poisson_suite_reference_trace(self):
        """Poisson L1 200x100 seed 1 (noise 1e-4): the reference reaches
        F in [1.38e-05, 1.4e-03] across methods @ k=9000
        (ipynb/ex_Poisson_L2.ipynb:cell4); at 3000 iterations the ordering
        BPG(no-LS) > ABPG(gamma=2) must already hold."""
        f, h, L, x0 = acc.Poisson_regrL1(200, 100, noise=0.0001, lamda=0, randseed=1)
        _, F0, _, _ = acc.BPG(f, h, L, x0, maxitrs=3000, linesearch=False, verbose=False)
        _, F2, _, _ = acc.ABPG(f, h, L, x0, gamma=2.0, maxitrs=3000,
                               theta_eq=True, verbose=False)
        _, FD, _, _ = acc.ABDA(f, h, L, x0, gamma=2.0, maxitrs=3000,
                               theta_eq=True, verbose=False)
        assert F2[-1] < F0[-1] < 5e-3
        assert FD[-1] < 5 * F2[-1] + 1e-6

    def test_bpg_linesearch_survives_domain_exit(self):
        """With Burg L1 the prox can leave the positive orthant for small L;
        the NaN-robust acceptance must back off instead of accepting NaN."""
        f, h, L, x0 = acc.Poisson_regrL1(200, 100, noise=0.0001, randseed=1)
        x, F, Ls, T = acc.BPG(f, h, L, x0, maxitrs=500, linesearch=True, verbose=False)
        assert np.isfinite(F).all()
        assert F[-1] < 1e-2

    def test_early_stop_truncation(self, dopt_small):
        f, h, L, x0 = dopt_small
        x, F, Ls, T = acc.BPG(f, h, L, x0, maxitrs=5000, epsilon=1e-6,
                              verbose=False, chunk=64)
        assert len(F) < 5000  # stopped early
        assert len(F) == len(Ls) == len(T)
        assert abs(F[-1] - F[-2]) < 1e-6
        assert np.all(np.diff(T) >= 0)

    def test_solve_theta_newton(self):
        # equality: (1-t')/t'^g = 1/t^g, i.e. phi(t') = t'^g - t^g (1-t') = 0,
        # converged to the reference's tolerance |phi| <= 1e-6 * theta
        # (algorithms.py:84)
        for theta in (1.0, 0.5, 0.1):
            for gamma in (1.5, 2.0, 3.0):
                t = float(acc.solve_theta(jnp.float64(theta), gamma))
                phi = t**gamma - theta**gamma * (1 - t)
                assert abs(phi) <= 1e-6 * theta, (theta, gamma, t, phi)
                assert 0 < t <= theta  # theta sequence decreases


class TestFWFamily:
    @pytest.fixture(scope="class")
    def logreg(self):
        key = jax.random.PRNGKey(0)
        f, h, L, L0, L1, x0, X, y = acc.hard_FW_log_reg_jax(
            key, 200, 40, radius=2.0, domain="l2")
        lmo = acc.lmo_l2_ball(2.0)
        return f, h, float(L), float(L0), float(L1), x0, lmo

    def test_div_step_descends(self, logreg):
        f, h, L, L0, L1, x0, lmo = logreg
        x, F, Ls, T = acc.FW_alg_div_step(f, h, L, x0, 200, gamma=2.0,
                                          lmo=lmo, verbose=False)
        assert F[-1] < F[0]
        assert np.isfinite(F).all()

    def test_descent_step(self, logreg):
        f, h, L, L0, L1, x0, lmo = logreg
        x, F, T, G = acc.FW_alg_descent_step(f, h, x0, 200, lmo, verbose=False)
        assert F[-1] < F[0]
        assert np.all(G == 0)  # reference's placeholder G array

    def test_l0l1_shortest_step(self, logreg):
        f, h, L, L0, L1, x0, lmo = logreg
        x, F, Ls, T = acc.FW_alg_L0_L1_shortest_step(
            f, h, L0 + 1e-3, L1, x0, 200, gamma=2.0, lmo=lmo, verbose=False)
        assert F[-1] < F[0]
        assert np.all(Ls > 0)

    def test_l0l1_log_variants(self, logreg):
        f, h, L, L0, L1, x0, lmo = logreg
        x1, F1, Ls1, LOG1, T1 = acc.FW_l0l1_log_and_linear_step(
            f, h, 1e-3, L1, x0, 200, lmo=lmo, ls_ratio=2.0, verbose=False)
        x2, F2, Ls2, LOG2, T2 = acc.FW_l0l1_log_only(
            f, h, 1e-3, L1, x0, 200, lmo=lmo, ls_ratio=2.0, verbose=False)
        assert F1[-1] < F1[0] and F2[-1] < F2[0]
        assert np.all(np.diff(LOG1) >= 0) and np.all(np.diff(LOG2) >= 0)
        # log_only must take a log step every iteration (>= one per iter)
        assert LOG2[-1] >= len(F2) - 1

    def test_simplex_domain(self):
        key = jax.random.PRNGKey(3)
        f, h, L, L0, L1, x0v, X, y = acc.hard_FW_log_reg_jax(
            key, 150, 30, radius=1.0, domain="simplex", x0_mode="vertex")
        lmo = acc.lmo_simplex(1)
        x, F, Ls, T = acc.FW_alg_div_step(f, h, float(L), x0v, 100,
                                          gamma=2.0, lmo=lmo, verbose=False)
        assert np.isfinite(F).all()
        assert float(jnp.sum(x)) == pytest.approx(1.0, rel=1e-6)


class TestDOpt:
    def test_fw_away_converges_and_state_consistent(self):
        f, h, L, x0 = acc.D_opt_design(30, 300, randseed=10)
        V = np.asarray(f.H)
        x, F, SP, SN, T = acc.D_opt_FW_away(V, x0, eps=1e-7, maxitrs=20000,
                                            verbose=False, chunk=1000)
        assert SP[-1] <= 1e-7 and SN[-1] <= 1e-7
        assert float(jnp.sum(x)) == pytest.approx(1.0, abs=1e-8)
        # incremental logdet must agree with a fresh factorization
        VXVT = (V * np.asarray(x)) @ V.T
        _, fresh = np.linalg.slogdet(VXVT)
        assert abs(F[-1] - (-fresh)) < 1e-6

    def test_fw_plain_slackness_decreases(self):
        f, h, L, x0 = acc.D_opt_design(30, 300, randseed=10)
        V = np.asarray(f.H)
        x, F, SP, SN, T = acc.D_opt_FW(V, x0, eps=1e-3, maxitrs=5000,
                                       verbose=False, chunk=500)
        assert SP[-1] < SP[0]
        assert F[-1] < F[0]

    def test_ky_init_speeds_convergence(self):
        f, h, L, x0 = acc.D_opt_design(20, 500, randseed=7)
        V = np.asarray(f.H)
        np.random.seed(7)
        x0_ky = acc.D_opt_KYinit(V)
        assert float(jnp.sum(x0_ky)) == pytest.approx(1.0, abs=1e-8)
        _, F1, _, _, _ = acc.D_opt_FW_away(V, x0, eps=1e-6, maxitrs=20000,
                                           verbose=False, chunk=1000)
        _, F2, _, _, _ = acc.D_opt_FW_away(V, x0_ky, eps=1e-6, maxitrs=20000,
                                           verbose=False, chunk=1000)
        assert len(F2) <= len(F1) * 2  # KY init should not be much worse

    def test_refresh_matches_no_refresh(self):
        f, h, L, x0 = acc.D_opt_design(20, 100, randseed=3)
        V = np.asarray(f.H)
        x1, F1, *_ = acc.D_opt_FW_away(V, x0, eps=1e-6, maxitrs=3000,
                                       verbose=False)
        x2, F2, *_ = acc.D_opt_FW_away(V, x0, eps=1e-6, maxitrs=3000,
                                       verbose=False, refresh_every=256)
        assert abs(F1[-1] - F2[-1]) < 1e-6


class TestExtras:
    @pytest.fixture(scope="class")
    def simplex_problem(self):
        np.random.seed(7)
        f, hs, L, x0 = acc.Poisson_regr_simplex_acc(80, 40, noise=0.001)
        return f, hs[0], L, jnp.asarray(x0)

    def test_aibm(self, simplex_problem):
        f, h, L, x0 = simplex_problem
        x, F, G, T = acc.AIBM(f, h, L, x0, gamma=2.0, maxitrs=300, verbose=False)
        assert np.isfinite(F).all()
        assert F[-1] < F[0]

    def test_aibm_with_noise_reproducible(self, simplex_problem):
        f, h, L, x0 = simplex_problem
        r1 = acc.AIBM(f, h, L, x0, gamma=2.0, maxitrs=100, noise=1e-4,
                      seed=5, verbose=False)
        r2 = acc.AIBM(f, h, L, x0, gamma=2.0, maxitrs=100, noise=1e-4,
                      seed=5, verbose=False)
        np.testing.assert_array_equal(r1[1], r2[1])

    def test_adapt_fgm_and_universal(self):
        np.random.seed(11)
        f, (poly_h, _), L, x0, radius = acc.svm_digits_ds_divs_ball(
            lamda=0.001, real_ds=True)
        _, F1, G1, _ = acc.AdaptFGM(f, poly_h, L, x0, maxitrs=80, verbose=False)
        _, F2, G2, _ = acc.UniversalGM(f, poly_h, L, x0, maxitrs=80, verbose=False)
        assert np.isfinite(F1).all() and np.isfinite(F2).all()
        assert F1[-1] < F1[1] and F2[-1] < F2[1]

    def test_primal_dual(self):
        np.random.seed(3)
        M = np.random.rand(15, 15)
        M = (M + M.T) / 2
        f, g, h, L, X0 = acc.FrobeniusSymLossExWithLinearCnstrnts(M, 3)
        F, gaps, Ls = acc.PrimalDualSwitchingGradientMethod(
            f, h, L, g, X0, maxitrs=100, epsilon=10.0, verbose=False)
        assert len(gaps) == len(Ls)
        assert np.isfinite(gaps).all()

    def test_primal_dual_exact_dual_grad(self):
        """Opt-in mathematically-correct vector-constraint ascent
        (exact_dual_grad=True, ADVICE r4): must run and produce finite
        gaps; it intentionally deviates from the reference-exact path."""
        np.random.seed(3)
        M = np.random.rand(15, 15)
        M = (M + M.T) / 2
        f, g, h, L, X0 = acc.FrobeniusSymLossExWithLinearCnstrnts(M, 3)
        F, gaps, Ls = acc.PrimalDualSwitchingGradientMethod(
            f, h, L, g, X0, maxitrs=60, epsilon=10.0, verbose=False,
            exact_dual_grad=True)
        assert len(gaps) == len(Ls)
        assert np.isfinite(gaps).all()


class TestDriverMachinery:
    def test_determinism(self, dopt_small):
        f, h, L, x0 = dopt_small
        r1 = acc.BPG(f, h, L, x0, maxitrs=100, verbose=False)
        r2 = acc.BPG(f, h, L, x0, maxitrs=100, verbose=False)
        np.testing.assert_array_equal(r1[1], r2[1])
        np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))

    def test_chunk_size_invariance(self, dopt_small):
        f, h, L, x0 = dopt_small
        r1 = acc.BPG(f, h, L, x0, maxitrs=100, verbose=False, chunk=7)
        r2 = acc.BPG(f, h, L, x0, maxitrs=100, verbose=False, chunk=100)
        np.testing.assert_allclose(r1[1], r2[1], rtol=0, atol=0)

    def test_verbose_output(self, dopt_small, capsys):
        f, h, L, x0 = dopt_small
        acc.BPG(f, h, L, x0, maxitrs=30, verbose=True, verbskip=10)
        out = capsys.readouterr().out
        assert "BPG_LS method" in out
        assert "     0 " in out and "    20 " in out

    def test_scan_full_runs_on_device(self, dopt_small):
        from accbpg_and_fw_tpu.algorithms.driver import scan_full

        f, h, L, x0 = dopt_small

        def step(c, k):
            fx, g = f.value_and_grad(c["x"])
            x1 = h.div_prox_map(c["x"], g, jnp.asarray(L, c["x"].dtype))
            return dict(done=c["done"], x=x1), dict(F=fx, _stop=fx < -1e9)

        carry = dict(done=jnp.asarray(False), x=jnp.asarray(x0))
        carry, hist = scan_full(step, carry, 50)
        assert hist["F"].shape == (50,)
        assert bool(jnp.all(jnp.diff(hist["F"]) < 1e-8))
