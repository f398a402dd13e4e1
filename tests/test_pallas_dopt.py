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


def test_plain_fw_matches_f64_scan():
    V, x0 = _problem(m=15, n=200, seed=7)
    x_r, F_r, SP_r, SN_r, T_r = acc.D_opt_FW(
        V, x0, eps=1e-4, maxitrs=2000, verbose=False, chunk=500)
    x_p, F_p, SP_p, SN_p, T_p = dopt_fw_pallas(
        V, x0, eps=1e-4, maxitrs=2000, away=False, verbose=False, chunk=512,
        interpret=True)
    assert len(F_p) == len(F_r)
    np.testing.assert_allclose(x_p, np.asarray(x_r, np.float64), atol=1e-10)


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
