"""Poisson linear inverse problems and KL-divergence regression.

Equivalent of the reference's ipynb/ex_Poisson_L2.ipynb and
ipynb/ex_KL_regr_L1.ipynb: BPG and ABPG/ABDA with different TSE gamma on
seeded random instances (trajectories match the reference's stored traces).
"""

import accbpg_and_fw_tpu as acc


def poisson(m=200, n=100, maxitrs=10000, verbose=True):
    f, h, L, x0 = acc.Poisson_regrL1(m, n, noise=0.0001, lamda=0, randseed=1)
    vk = max(1, maxitrs // 10)
    out = {}
    _, out["BPG"], _, _ = acc.BPG(f, h, L, x0, maxitrs=maxitrs,
                                  linesearch=False, verbose=verbose, verbskip=vk)
    for gm in (1.0, 1.5, 2.0):
        _, out[f"ABPG g={gm}"], _, _ = acc.ABPG(f, h, L, x0, gamma=gm,
                                                maxitrs=maxitrs, theta_eq=True,
                                                verbose=verbose, verbskip=vk)
    _, out["ABDA"], _, _ = acc.ABDA(f, h, L, x0, gamma=2.0, maxitrs=maxitrs,
                                    theta_eq=True, verbose=verbose, verbskip=vk)
    for k, F in out.items():
        print(f"{k:>10}: F = {float(F[-1]):.6e}")
    return out


def kl_regression(m=1000, n=100, maxitrs=4000, verbose=True):
    f, h, L, x0 = acc.KL_nonneg_regr(m, n, noise=0.01, lamdaL1=0, randseed=1)
    vk = max(1, maxitrs // 10)
    out = {}
    _, out["BPG"], _, _ = acc.BPG(f, h, L, x0, maxitrs=maxitrs,
                                  linesearch=True, verbose=verbose, verbskip=vk)
    _, out["ABPG"], _, _ = acc.ABPG(f, h, L, x0, gamma=2.0, maxitrs=maxitrs,
                                    verbose=verbose, verbskip=vk)
    _, out["ABPG-RS"], _, _ = acc.ABPG(f, h, L, x0, gamma=2.0, maxitrs=maxitrs,
                                       restart=True, verbose=verbose, verbskip=vk)
    _, out["ABPG-g"], _, _, _, _ = acc.ABPG_gain(f, h, L, x0, gamma=2.0,
                                                 maxitrs=maxitrs,
                                                 verbose=verbose, verbskip=vk)
    for k, F in out.items():
        print(f"{k:>10}: F = {float(F[-1]):.6e}")
    return out


if __name__ == "__main__":
    poisson()
    kl_regression()
