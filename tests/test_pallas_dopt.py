"""Fused-iteration Pallas D-opt kernel vs the f64 scan engine.

Runs in the Pallas interpreter on CPU (the kernel logic is identical to the
compiled TPU path; the TPU drive is exercised by bench/verify).  The DS
arithmetic must reproduce the f64 trajectory: same stopping iteration,
iterates to ~1e-12, certified slacks at 1e-8."""

import numpy as np
import pytest

import accbpg_and_fw_tpu as acc
from accbpg_and_fw_tpu.ops.pallas_dopt import _factorize_np, dopt_fw_pallas


def _problem(m=20, n=300, seed=10):
    np.random.seed(seed)
    V = np.random.randn(m, n)
    return V, np.full(n, 1.0 / n)


def test_away_matches_f64_scan():
    V, x0 = _problem()
    x_r, F_r, SP_r, SN_r, T_r = acc.D_opt_FW_away(
        V, x0, eps=1e-8, maxitrs=3000, verbose=False, chunk=500)
    x_p, F_p, SP_p, SN_p, T_p = dopt_fw_pallas(
        V, x0, eps=1e-8, maxitrs=3000, away=True, verbose=False, chunk=512,
        interpret=True)
    assert len(F_p) == len(F_r)  # identical stopping iteration
    np.testing.assert_allclose(x_p, np.asarray(x_r, np.float64), atol=1e-12)
    assert abs(SP_p[-1] - float(SP_r[-1])) < 1e-12
    assert abs(SN_p[-1] - float(SN_r[-1])) < 1e-12


def test_away_certifies_slack_1e8_fresh_f64():
    """The quality bar from CLAUDE.md: certify with a FRESH f64 slack of the
    simplex-normalized iterate, never an incremental history."""
    V, x0 = _problem(m=25, n=400, seed=3)
    x, F, SP, SN, T = dopt_fw_pallas(V, x0, eps=1e-8, maxitrs=20000,
                                     away=True, verbose=False, chunk=1024,
                                     interpret=True)
    xs = x / x.sum()
    _, w, _ = _factorize_np(V, xs)
    m = V.shape[0]
    assert w.max() / m - 1 <= 2e-8
    assert 1 - w[xs > 1e-8].min() / m <= 2e-8


def test_checkpoint_resume(tmp_path):
    """Round-2 verdict item 7: the pallas engine snapshots the iterate at
    launch-block boundaries; resume re-factorizes from x (== inserting a
    refresh at the interruption point) and the continued run certifies
    the same slack target with a refresh-grade-matching objective."""
    V, x0 = _problem(m=18, n=256, seed=4)
    ck = str(tmp_path / "pallas.npz")
    # uninterrupted reference
    x_u, F_u, SP_u, SN_u, _ = dopt_fw_pallas(
        V, x0, eps=1e-8, maxitrs=6000, away=True, verbose=False, chunk=512,
        interpret=True)
    # interrupted: budget below convergence, then resume with full budget
    x_1, F_1, *_ = dopt_fw_pallas(
        V, x0, eps=1e-8, maxitrs=1024, away=True, verbose=False, chunk=512,
        interpret=True, checkpoint=ck)
    assert len(F_1) == 1024
    x_2, F_2, SP_2, SN_2, _ = dopt_fw_pallas(
        V, x0, eps=1e-8, maxitrs=6000, away=True, verbose=False, chunk=512,
        interpret=True, checkpoint=ck)
    # the resumed history CONTAINS the pre-interruption rows
    np.testing.assert_array_equal(F_2[:1024], F_1)
    assert SP_2[-1] <= 1e-8 and SN_2[-1] <= 1e-8
    # fresh-f64 certification of the resumed final iterate
    xs = x_2 / x_2.sum()
    _, w, _ = _factorize_np(V, xs)
    m = V.shape[0]
    assert w.max() / m - 1 <= 2e-8
    assert 1 - w[xs > 1e-8].min() / m <= 2e-8
    # refresh-level agreement with the uninterrupted run
    assert abs(F_2[-1] - F_u[-1]) < 1e-6
    # a THIRD call on the converged checkpoint returns without launching
    x_3, F_3, *_ = dopt_fw_pallas(
        V, x0, eps=1e-8, maxitrs=6000, away=True, verbose=False, chunk=512,
        interpret=True, checkpoint=ck)
    assert len(F_3) == len(F_2)
    np.testing.assert_allclose(x_3, x_2, atol=0)

    # fingerprint guard: a different solve config must refuse to resume
    with pytest.raises(ValueError, match="different solve"):
        dopt_fw_pallas(V, x0, eps=1e-6, maxitrs=100, away=True,
                       verbose=False, chunk=512, interpret=True,
                       checkpoint=ck)


def test_plain_fw_matches_f64_scan():
    V, x0 = _problem(m=15, n=200, seed=7)
    x_r, F_r, SP_r, SN_r, T_r = acc.D_opt_FW(
        V, x0, eps=1e-4, maxitrs=2000, verbose=False, chunk=500)
    x_p, F_p, SP_p, SN_p, T_p = dopt_fw_pallas(
        V, x0, eps=1e-4, maxitrs=2000, away=False, verbose=False, chunk=512,
        interpret=True)
    assert len(F_p) == len(F_r)
    np.testing.assert_allclose(x_p, np.asarray(x_r, np.float64), atol=1e-10)


def test_big_mp_branch_matches_f64_scan():
    """MP >= _BIG_MP switches to slabbed ref-sliced contractions (VMEM);
    the trajectory must still match the f64 scan to fp-noise."""
    from accbpg_and_fw_tpu.ops.pallas_dopt import _BIG_MP, _next_pow2

    m, n = 300, 400
    assert _next_pow2(m) >= _BIG_MP
    np.random.seed(5)
    V = np.random.randn(m, n)
    x0 = np.full(n, 1.0 / n)
    r64 = acc.D_opt_FW_away(V, x0, eps=1e-8, maxitrs=300, verbose=False,
                            chunk=300)
    rp = dopt_fw_pallas(V, x0, eps=1e-8, maxitrs=300, away=True,
                        verbose=False, chunk=256, interpret=True)
    assert len(rp[1]) == len(r64[1])
    np.testing.assert_allclose(rp[0], np.asarray(r64[0], np.float64),
                               atol=1e-13)


def test_maxitrs_budget_respected():
    V, x0 = _problem(m=10, n=200, seed=5)
    x, F, SP, SN, T = dopt_fw_pallas(V, x0, eps=1e-12, maxitrs=700,
                                     away=True, verbose=False, chunk=512,
                                     interpret=True)
    assert len(F) == 700  # 512 + 188: the second launch must clamp at budget
    x_r, F_r, *_ = acc.D_opt_FW_away(V, x0, eps=1e-12, maxitrs=700,
                                     verbose=False, chunk=700)
    np.testing.assert_allclose(x, np.asarray(x_r, np.float64), atol=1e-12)


def test_refresh_every_preserves_trajectory():
    V, x0 = _problem(m=12, n=250, seed=9)
    x1, F1, *_ = dopt_fw_pallas(V, x0, eps=1e-8, maxitrs=2000, away=True,
                                verbose=False, chunk=256, interpret=True)
    x2, F2, *_ = dopt_fw_pallas(V, x0, eps=1e-8, maxitrs=2000, away=True,
                                verbose=False, chunk=256, refresh_every=512,
                                interpret=True)
    # refresh cancels drift; end state must agree at DS accuracy
    assert abs(len(F1) - len(F2)) <= 2
    np.testing.assert_allclose(x1, x2, atol=1e-10)


class TestDoubleSingleScanEngine:
    """u_mode='ds' / precision='ds': double-single XLA scan path — f64
    accuracy from pure f32 (no jax_enable_x64 dependence, vmappable)."""

    def test_single_matches_f64_scan(self):
        V, x0 = _problem(m=20, n=300, seed=10)
        r64 = acc.D_opt_FW_away(V, x0, eps=1e-8, maxitrs=3000,
                                verbose=False, chunk=500)
        rds = acc.D_opt_FW_away(V, x0, eps=1e-8, maxitrs=3000,
                                verbose=False, chunk=500, u_mode="ds")
        assert len(rds[1]) == len(r64[1])
        np.testing.assert_allclose(rds[0], np.asarray(r64[0], np.float64),
                                   atol=1e-12)
        assert abs(rds[2][-1] - float(r64[2][-1])) < 1e-11

    def test_plain_fw_ds(self):
        V, x0 = _problem(m=15, n=200, seed=7)
        r64 = acc.D_opt_FW(V, x0, eps=1e-4, maxitrs=2000, verbose=False,
                           chunk=500)
        rds = acc.D_opt_FW(V, x0, eps=1e-4, maxitrs=2000, verbose=False,
                           chunk=500, u_mode="ds")
        assert len(rds[1]) == len(r64[1])
        # plain FW at loose eps amplifies the 1e-14 path difference
        # chaotically; same stopping iteration + 1e-7 iterates is the
        # meaningful equivalence here
        np.testing.assert_allclose(rds[0], np.asarray(r64[0], np.float64),
                                   atol=1e-6)
        assert abs(rds[2][-1] - float(r64[2][-1])) < 1e-6

    def test_batch_ds_reaches_target_and_certifies(self):
        """Batched DS sweeps: every instance reaches the slack target and a
        FRESH f64 factorization certifies the final iterate.

        Backend caveat (measured, round 2): on the real TPU the batch
        certifies 1e-8 (K=32 of 30x1000: 32/32 at <=1e-8 in 0.94 s,
        BASELINE.md).  Under XLA:CPU the K>=2 vmapped lowering rounds the
        DS chains differently and the incremental state drifts to ~1e-6
        fresh slack, so this CPU test asserts the honest CPU bar; the
        1e-8 bar is exercised on-chip by the verify/bench drives."""
        import jax as _jax

        from accbpg_and_fw_tpu.parallel.batched import dopt_fw_batch

        on_tpu = _jax.default_backend() == "tpu"
        rng = np.random.default_rng(3)
        K, m, n = 3, 30, 300
        Vs = rng.standard_normal((K, m, n))
        x0s = np.full((K, n), 1.0 / n)
        eps = 1e-8 if on_tpu else 1e-7
        bar = 2e-8 if on_tpu else 1e-5
        xb, Fb, SPb, SNb = dopt_fw_batch(Vs, x0s, eps=eps, num_iters=6000,
                                         precision="ds")
        for kk in range(K):
            ok = (np.asarray(SPb[kk]) <= eps) & (np.asarray(SNb[kk]) <= eps)
            assert ok.any(), f"instance {kk} did not reach {eps}"
            xs = xb[kk] / xb[kk].sum()
            _, w, _ = _factorize_np(Vs[kk], xs)
            assert w.max() / m - 1 <= bar
            assert 1 - w[xs > 1e-8].min() / m <= bar


def test_batched_kernel_matches_f64_scan_per_instance():
    """Lockstep batched kernel (K instances in one pallas_call) reproduces
    each instance's f64 scan trajectory: identical stopping iteration,
    iterates to 1e-12, fresh-certified 1e-8 slacks.  Exercises the group
    split (group=2 over K=3) and the frozen-history padding."""
    from accbpg_and_fw_tpu.ops.pallas_dopt import dopt_fw_pallas_batch

    rng = np.random.default_rng(3)
    K, m, n = 3, 20, 300
    Vs = rng.standard_normal((K, m, n))
    x0s = np.full((K, n), 1.0 / n)
    xb, Fb, SPb, SNb = dopt_fw_pallas_batch(
        Vs, x0s, eps=1e-8, maxitrs=4000, interpret=True, group=2)
    for kk in range(K):
        r64 = acc.D_opt_FW_away(Vs[kk], x0s[kk], eps=1e-8, maxitrs=4000,
                                verbose=False, chunk=1000)
        ok = (SPb[kk] <= 1e-8) & (SNb[kk] <= 1e-8)
        assert ok.any()
        assert int(np.argmax(ok)) == len(r64[1]) - 1
        np.testing.assert_allclose(xb[kk], np.asarray(r64[0], np.float64),
                                   atol=1e-12)
        xs = xb[kk] / xb[kk].sum()
        _, w, _ = _factorize_np(Vs[kk], xs)
        assert w.max() / m - 1 <= 2e-8
        assert 1 - w[xs > 1e-8].min() / m <= 2e-8


def test_public_api_pallas_engine():
    """u_mode='pallas' on D_opt_FW(_away) dispatches to the fused kernel
    (interpreter off-TPU) and reproduces the f64 scan trajectory."""
    V, x0 = _problem(m=16, n=250, seed=11)
    r64 = acc.D_opt_FW_away(V, x0, eps=1e-8, maxitrs=2500, verbose=False,
                            chunk=500)
    rp = acc.D_opt_FW_away(V, x0, eps=1e-8, maxitrs=2500, verbose=False,
                           chunk=512, u_mode="pallas")
    assert len(rp[1]) == len(r64[1])
    np.testing.assert_allclose(rp[0], np.asarray(r64[0], np.float64),
                               atol=1e-12)
    # checkpointing through the public API (round-2 verdict item 7 —
    # previously raised; the full resume contract is covered by
    # test_checkpoint_resume)
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ck = os.path.join(d, "p.npz")
        rck = acc.D_opt_FW_away(V, x0, eps=1e-8, maxitrs=256, verbose=False,
                                u_mode="pallas", chunk=256, checkpoint=ck)
        assert os.path.exists(ck)
        assert len(rck[1]) == 256
