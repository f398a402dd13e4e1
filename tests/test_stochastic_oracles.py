"""Stochastic (inexact) f-oracle protocol: drivers must thread PRNG keys so
declared oracle noise actually reaches the gradients (round-2 review
finding: the protocol in ops/base.py was implemented by no driver, so the
SymNMF inexact-oracle studies silently ran noiseless).

The reference injects numpy noise inside every func_grad call
(/root/reference/accbpg/functions.py:957-960); here each gradient
evaluation receives a fresh subkey derived from the driver's ``seed``."""

import numpy as np
import pytest

import accbpg_and_fw_tpu as acc


def _differs(a, b):
    """Trajectories differ: different stop iteration or different values."""
    n = min(len(a), len(b))
    return len(a) != len(b) or not np.allclose(a[:n], b[:n])


def _same(a, b):
    return len(a) == len(b) and np.array_equal(a, b)


@pytest.fixture()
def symnmf_problem():
    rng = np.random.default_rng(7)
    B = rng.random((20, 20))
    M = (B + B.T) / 2.0
    np.random.seed(3)
    return M


def _run_bpg(M, noise, seed, linesearch=True):
    np.random.seed(3)  # factory draws X0 from the global numpy RNG
    f, (h, _), L, X0 = acc.FrobeniusSymLossResMeasEx(M, 2, noise=noise)
    _, F, _, _ = acc.BPG(f, h, L, X0, maxitrs=25, verbose=False,
                         linesearch=linesearch, seed=seed)
    return np.asarray(F)


def test_bpg_noise_perturbs_and_is_seed_reproducible(symnmf_problem):
    M = symnmf_problem
    F_clean = _run_bpg(M, 0.0, seed=0)
    F_noisy = _run_bpg(M, 0.5, seed=0)
    F_noisy2 = _run_bpg(M, 0.5, seed=0)
    F_other = _run_bpg(M, 0.5, seed=1)

    assert _differs(F_clean, F_noisy)   # noise reaches the run
    assert _same(F_noisy, F_noisy2)     # reproducible per seed
    assert _differs(F_noisy, F_other)   # seed matters


def test_bpg_no_linesearch_also_noisy(symnmf_problem):
    M = symnmf_problem
    F_clean = _run_bpg(M, 0.0, seed=0, linesearch=False)
    F_noisy = _run_bpg(M, 0.5, seed=0, linesearch=False)
    assert _differs(F_clean, F_noisy)


def test_abpg_gain_noise_threads(symnmf_problem):
    M = symnmf_problem
    np.random.seed(3)
    f, (h, _), L, X0 = acc.FrobeniusSymLossResMeasEx(M, 2, noise=0.5)
    np.random.seed(3)
    f0, (h0, _), L0, X00 = acc.FrobeniusSymLossResMeasEx(M, 2, noise=0.0)
    r_noisy = acc.ABPG_gain(f, h, L, X0, gamma=2, maxitrs=20, verbose=False,
                            seed=0)
    r_clean = acc.ABPG_gain(f0, h0, L0, X00, gamma=2, maxitrs=20,
                            verbose=False, seed=0)
    assert _differs(np.asarray(r_noisy[1]), np.asarray(r_clean[1]))


def test_fw_descent_noise_threads(symnmf_problem):
    M = symnmf_problem
    lmo = acc.lmo_linf_ball(radius=1, center=1)

    def run(noise):
        np.random.seed(3)
        f, (h, _), L, X0 = acc.FrobeniusSymLossResMeasEx(M, 2, noise=noise)
        x, F, T, G = acc.FW_alg_descent_step(f, h, X0, 25, lmo,
                                             verbose=False, seed=0)
        return np.asarray(F)

    assert _differs(run(0.0), run(0.5))


def test_universalgm_oracle_noise_threads(symnmf_problem):
    M = symnmf_problem

    def run(noise):
        np.random.seed(3)
        f, (h, _), L, X0 = acc.FrobeniusSymLossResMeasEx(M, 2, noise=noise)
        _, F, _, _ = acc.UniversalGM(f, h, L, X0, maxitrs=20, verbose=False,
                                     noise_level=0, seed=0)
        return np.asarray(F)

    assert _differs(run(0.0), run(0.5))


def test_deterministic_oracle_unaffected_by_seed():
    """Exact oracles: the seed kwarg must be a no-op (no key in the carry,
    identical executable/trajectory)."""
    f, h, L, x0 = acc.D_opt_design(10, 30, randseed=4)
    r1 = acc.BPG(f, h, L, x0, maxitrs=30, verbose=False, seed=0)
    r2 = acc.BPG(f, h, L, x0, maxitrs=30, verbose=False, seed=5)
    np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r2[1]))
