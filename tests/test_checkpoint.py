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


def test_resume_with_larger_budget_non_chunk_multiple(tmp_path):
    """Round-1 advisor finding: a maxitrs that is not a multiple of the chunk
    left budget-masked iterations inside a saved chunk that were never re-run
    on resume; progress is now tracked per iteration, so resume is exact."""
    f, h, L, x0 = acc.D_opt_design(20, 60, randseed=4)
    ck = str(tmp_path / "bpg.npz")

    x_ref, F_ref, Ls_ref, T_ref = acc.BPG(f, h, L, x0, maxitrs=120,
                                          verbose=False, chunk=40)

    # 70 is NOT a multiple of chunk=40 — the old format silently returned
    # the 70-iteration result on resume
    acc.BPG(f, h, L, x0, maxitrs=70, verbose=False, chunk=40, checkpoint=ck)
    x2, F2, Ls2, T2 = acc.BPG(f, h, L, x0, maxitrs=120, verbose=False,
                              chunk=40, checkpoint=ck)

    assert len(F2) == len(F_ref)
    np.testing.assert_array_equal(np.asarray(F_ref), F2)
    np.testing.assert_array_equal(np.asarray(x_ref), np.asarray(x2))


def test_resume_with_different_chunk(tmp_path):
    """Checkpoints are chunk-agnostic: resuming with another chunk size must
    replay the correct global k values (the old whole-chunk format corrupted
    k-dependent schedules)."""
    f, h, L, x0 = acc.D_opt_design(15, 40, randseed=7)
    lmo = acc.lmo_simplex(1)
    ck = str(tmp_path / "fw.npz")

    ref = acc.FW_alg_descent_step(f, h, x0, maxitrs=90, lmo=lmo,
                                  verbose=False, chunk=30)
    acc.FW_alg_descent_step(f, h, x0, maxitrs=45, lmo=lmo, verbose=False,
                            chunk=30, checkpoint=ck)
    out = acc.FW_alg_descent_step(f, h, x0, maxitrs=90, lmo=lmo,
                                  verbose=False, chunk=17, checkpoint=ck)
    # alpha_k = 2/(k+2) depends on the global k — any chunk-offset bug shifts
    # the whole trajectory
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))


def test_resume_refuses_wrong_solver(tmp_path):
    import pytest

    f, h, L, x0 = acc.D_opt_design(10, 30, randseed=4)
    ck = str(tmp_path / "mix.npz")
    acc.BPG(f, h, L, x0, maxitrs=40, verbose=False, chunk=20, checkpoint=ck)
    with pytest.raises(ValueError, match="different solver"):
        acc.ABPG(f, h, L, x0, gamma=2, maxitrs=40, verbose=False, chunk=20,
                 checkpoint=ck)


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


def test_closure_path_respects_budget():
    """Round-2 review finding: the closure (uncached) path had no budget
    masking — a maxitrs that was not a chunk multiple returned a carry that
    had run to the end of the chunk (e.g. 512 iterations for maxitrs=300),
    ahead of the truncated history."""
    import jax.numpy as jnp

    from accbpg_and_fw_tpu.algorithms import driver

    def step(c, k):
        return (dict(done=c["done"], n=c["n"] + 1),
                {"_stop": jnp.asarray(False), "k": k})

    carry0 = dict(done=jnp.asarray(False), n=jnp.asarray(0, jnp.int32))
    carry, hist, T = driver.run_driver(step, carry0, maxitrs=300,
                                       verbose=False, chunk=256)
    assert int(carry["n"]) == 300
    assert len(hist["k"]) == 300
    assert int(hist["k"][-1]) == 299


def test_resume_refuses_different_hyperparameters(tmp_path):
    """The fingerprint covers the full config, not just the driver name:
    resuming a linesearch=True run as linesearch=False must refuse instead
    of silently continuing under different semantics."""
    import pytest

    f, h, L, x0 = acc.D_opt_design(10, 30, randseed=4)
    ck = str(tmp_path / "hp.npz")
    acc.BPG(f, h, L, x0, maxitrs=40, verbose=False, chunk=20, checkpoint=ck,
            linesearch=True)
    with pytest.raises(ValueError, match="different solver"):
        acc.BPG(f, h, L, x0, maxitrs=60, verbose=False, chunk=20,
                checkpoint=ck, linesearch=False)


def test_sharded_resume_bitwise(tmp_path):
    """Resuming a mesh-sharded run must restore the carry WITH its
    shardings (the chunk executable was compiled against sharded avals)."""
    import jax

    from accbpg_and_fw_tpu.parallel import data_mesh, shard_dopt_problem

    mesh = data_mesh(jax.devices()[:8])
    f, h, L, x0 = acc.D_opt_design(12, 64, randseed=4)
    f_sh, x_sh = shard_dopt_problem(f, x0, mesh)
    ck = str(tmp_path / "sharded.npz")

    r_ref = acc.BPG(f_sh, h, L, x_sh, maxitrs=120, verbose=False, chunk=40)
    acc.BPG(f_sh, h, L, x_sh, maxitrs=80, verbose=False, chunk=40,
            checkpoint=ck)
    r2 = acc.BPG(f_sh, h, L, x_sh, maxitrs=120, verbose=False, chunk=40,
                 checkpoint=ck)
    np.testing.assert_array_equal(np.asarray(r_ref[1]), np.asarray(r2[1]))
    np.testing.assert_array_equal(np.asarray(r_ref[0]), np.asarray(r2[0]))


def test_resume_refuses_different_problem_shape(tmp_path):
    import pytest

    f, h, L, x0 = acc.D_opt_design(10, 30, randseed=4)
    ck = str(tmp_path / "shape.npz")
    acc.BPG(f, h, L, x0, maxitrs=40, verbose=False, chunk=20, checkpoint=ck)
    f2, h2, L2, x02 = acc.D_opt_design(10, 40, randseed=4)
    with pytest.raises(ValueError, match="shape"):
        acc.BPG(f2, h2, L2, x02, maxitrs=40, verbose=False, chunk=20,
                checkpoint=ck)
