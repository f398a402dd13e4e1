"""Checkpoint/resume tests: an interrupted run resumed from its .npz
checkpoint must produce bit-identical results to an uninterrupted run
(SURVEY.md §5 — the reference has no checkpointing)."""

import os

import numpy as np

import accbpg_and_fw_tpu as acc


def test_bpg_resume_bitwise(tmp_path):
    f, h, L, x0 = acc.D_opt_design(20, 60, randseed=4)
    ck = str(tmp_path / "bpg.npz")

    # uninterrupted
    x_ref, F_ref, Ls_ref, T_ref = acc.BPG(f, h, L, x0, maxitrs=120,
                                          verbose=False, chunk=40)

    # interrupted: run only the first chunks by truncating maxitrs, with a
    # checkpoint; then resume with the full budget
    acc.BPG(f, h, L, x0, maxitrs=80, verbose=False, chunk=40, checkpoint=ck)
    assert os.path.exists(ck)
    x2, F2, Ls2, T2 = acc.BPG(f, h, L, x0, maxitrs=120, verbose=False,
                              chunk=40, checkpoint=ck)

    np.testing.assert_array_equal(np.asarray(F_ref), F2)
    np.testing.assert_array_equal(np.asarray(Ls_ref), Ls2)
    np.testing.assert_array_equal(np.asarray(x_ref), np.asarray(x2))


def test_dopt_fw_away_resume(tmp_path):
    f, h, L, x0 = acc.D_opt_design(10, 50, randseed=4)
    V = np.asarray(f.H)
    ck = str(tmp_path / "dopt.npz")

    x_ref, F_ref, SP_ref, SN_ref, T_ref = acc.D_opt_FW_away(
        V, x0, eps=1e-9, maxitrs=600, verbose=False, chunk=200)

    acc.D_opt_FW_away(V, x0, eps=1e-9, maxitrs=200, verbose=False,
                      chunk=200, checkpoint=ck)
    x2, F2, SP2, SN2, T2 = acc.D_opt_FW_away(
        V, x0, eps=1e-9, maxitrs=600, verbose=False, chunk=200, checkpoint=ck)

    assert len(F_ref) == len(F2)
    np.testing.assert_array_equal(np.asarray(F_ref), F2)
    np.testing.assert_array_equal(np.asarray(x_ref), np.asarray(x2))


def test_finished_run_checkpoint_returns_same(tmp_path):
    f, h, L, x0 = acc.D_opt_design(10, 30, randseed=4)
    ck = str(tmp_path / "done.npz")
    r1 = acc.BPG(f, h, L, x0, maxitrs=60, verbose=False, chunk=30,
                 checkpoint=ck)
    # calling again with the completed checkpoint must not recompute and
    # must return identical history
    r2 = acc.BPG(f, h, L, x0, maxitrs=60, verbose=False, chunk=30,
                 checkpoint=ck)
    np.testing.assert_array_equal(r1[1], r2[1])


def test_executable_cache_reuse():
    """Same-shape solver calls reuse one compiled chunk executable."""
    from accbpg_and_fw_tpu.algorithms import driver

    f, h, L, x0 = acc.D_opt_design(10, 32, randseed=9)
    acc.BPG(f, h, L, x0, maxitrs=30, verbose=False)
    n_before = len(driver._EXEC_CACHE)
    # different data, same shapes; different maxitrs — must hit the cache
    f2, h2, L2, x02 = acc.D_opt_design(10, 32, randseed=11)
    acc.BPG(f2, h2, L2, x02, maxitrs=45, verbose=False)
    assert len(driver._EXEC_CACHE) == n_before
    # different shapes -> new entry
    f3, h3, L3, x03 = acc.D_opt_design(10, 48, randseed=9)
    acc.BPG(f3, h3, L3, x03, maxitrs=30, verbose=False)
    assert len(driver._EXEC_CACHE) == n_before + 1
