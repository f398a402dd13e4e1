"""Smoke tests: every example script runs end-to-end at tiny sizes."""

import sys

import numpy as np
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_dopt_random_example():
    import ex_Dopt_random

    out = ex_Dopt_random.start(m=15, n=40, maxitrs=60, verbose=False)
    assert all(len(F) > 0 for F in out.values())


def test_lr_l2l1linf_example():
    import ex_LR_L2L1Linf

    F1, F2 = ex_LR_L2L1Linf.test_L2L1Linf(m=40, n=60, maxitrs=40,
                                          verbose=False)
    assert F1[-1] < F1[0] and F2[-1] < F2[0]


def test_fw_l0l1_example():
    import ex_fw_l0l1

    out = ex_fw_l0l1.start(domain="l2", n_samples=80, n_features=20,
                           maxitrs=40, verbose=False)
    assert all(F[-1] < F[0] for F in out.values())


def test_fw_l0l1_data_regimes():
    """The good-data / ill-conditioned study sweeps (reference notebooks
    ex_L0_L1_and_FW_good_data.ipynb / ..._ill_cond_data.ipynb) at smoke
    scale: every step rule must make progress in both regimes."""
    import ex_fw_l0l1

    for name in ("good", "illcond"):
        panels = ex_fw_l0l1.run_regime(name, maxitrs=30, save=False,
                                       configs=[(60, 24)])
        (_, out), = panels
        assert set(out) == {"FW-L0L1 log+lin", "FW-L0L1 log", "FW-classic",
                            "FW-L0L1 shortest"}
        import numpy as np

        for k, F in out.items():
            assert np.isfinite(np.asarray(F)).all(), (name, k)
            assert float(F[-1]) <= float(F[0]), (name, k)


def test_symnmf_example():
    import ex_SymNMF

    out = ex_SymNMF.start(n=30, r=2, maxitrs=40, verbose=False)
    assert all(len(F) > 0 for F in out.values())


def test_primal_dual_example():
    import ex_primal_dual

    F, gaps, Ls = ex_primal_dual.start(n=12, r=2, maxitrs=40, verbose=False)
    assert len(gaps) > 0


def test_multichip_example():
    import ex_multichip

    F1, F2, Fa = ex_multichip.start(m=10, n=64, maxitrs=40, verbose=False)
    assert abs(float(F1[-1]) - float(F2[-1])) < 1e-9


def test_dopt_sweep_example():
    import ex_Dopt_sweep

    out = ex_Dopt_sweep.start(m=8, n_list=(40, 60), K=2, eps=1e-5,
                              num_iters=500, verbose=False)
    for n, r in out.items():
        assert all(i >= 0 for i in r["iters"]), (n, r)
        assert r["geomean"] > 0


def test_dopt_sweep_full_example():
    import numpy as np

    import ex_Dopt_sweep

    iters, times = ex_Dopt_sweep.start_full(
        m=8, n_list=(40,), K=2, eps_list=(1e-2,), num_iters=600,
        verbose=False)
    # FW-away converges well inside the budget; every method records a
    # finite time at the coarse gap
    assert iters["FW-away"][1e-2].max() <= 600
    for lab in ("FW", "FW-away", "BPG-LS", "ABPG-g"):
        assert np.isfinite(times[lab][1e-2]).all(), lab


def test_ky_vs_kha_example(tmp_path):
    import ex_Dopt_KYvsKha

    rows = ex_Dopt_KYvsKha.start(m=8, n=80, eps=1e-5, maxitrs=3000,
                                 seeds=(4,), plot=True, verbose=False,
                                 chunk=500)
    assert rows and all(r["ky_iters"] > 0 for r in rows)


def test_fw_rs_example():
    import ex_fw_rs

    out = ex_fw_rs.start(maxitrs=30, plot=False, verbose=False,
                         panels=("dopt",))
    assert all(F[-1] <= F[0] for F in out["dopt"].values())


def test_aibm_poisson_example():
    import ex_aibm_poisson

    out = ex_aibm_poisson.start(m=60, n=30, maxitrs=40, gammas=(2.0,),
                                plot=False, verbose=False)
    assert all(len(F) > 0 for F in out[2.0].values())


def test_universal_fw_example():
    import ex_universal_fw

    out = ex_universal_fw.start(n=40, r=1, maxitrs=30,
                                noise_levels=(0.1,), plot=False,
                                verbose=False)
    assert all(len(F) > 0 for F in out[0.1].values())


def test_params_free_symnmf_example():
    import ex_params_free_symnmf

    out = ex_params_free_symnmf.start(n=24, r=2, maxitrs=40, plot=False,
                                      verbose=False)
    assert all(F[-1] <= F[0] for F in out.values())


def test_dopt_libsvm_example():
    import ex_Dopt_LIBSVM

    out = ex_Dopt_LIBSVM.start(maxitrs=40, plot=False, verbose=False)
    assert all(F[-1] <= F[0] + 1e-9 for F in out.values())


def test_dopt_sweep_figure():
    import ex_Dopt_sweep

    out = ex_Dopt_sweep.start(m=8, n_list=(40, 60), K=2,
                              eps_list=(1e-3, 1e-4), num_iters=600,
                              plot=True, verbose=False)
    for n, r in out.items():
        assert r["per_eps"][1e-3]["geomean"] <= r["per_eps"][1e-4]["geomean"] \
            or np.isnan(r["per_eps"][1e-4]["geomean"])



def test_dopt_sweep_full_reduced():
    import ex_Dopt_sweep_full

    res = ex_Dopt_sweep_full.run_study(60, [8, 12], K=2, Nmax=800,
                                       verbose=False)
    for name, rows in res["methods"].items():
        for m, r in rows.items():
            # the away method reaches at least the loosest target within
            # the reduced budget; plain FW may cap (reference convention)
            v = r["iters_to_eps"]["0.001"]
            assert np.isfinite(v) and v >= 1
        if name == "FW-away":
            assert all(r["iters_to_eps"]["1e-06"] <= 801
                       for r in rows.values())


def test_fw_l0l1_a9a_smoke():
    import os

    import ex_fw_l0l1_a9a

    if not any(p and os.path.exists(p)
               for p in ex_fw_l0l1_a9a._A9A_CANDIDATES):
        import pytest

        pytest.skip("a9a dataset not available")
    out = ex_fw_l0l1_a9a.start(maxitrs=12, plot=False, verbose=False)
    for curves in out.values():
        for F in curves.values():
            assert F[-1] <= F[0] + 1e-9
