"""Symmetric NMF via relatively-smooth optimization.

Equivalent of the reference's parameters_free_fw / universal_method_FW
SymNMF experiments: minimize 0.5||M - XX'||_F^2 with the (2nd+4th power)
kernel, comparing BPG(+/-LS), UniversalGM, AIBM, with optional keyed
gradient noise (the inexact-oracle mode).
"""

import numpy as np

import accbpg_and_fw_tpu as acc


def start(n=100, r=4, maxitrs=300, noise=0.0, seed=0, verbose=True):
    rng = np.random.default_rng(seed)
    x = rng.random(n)
    M = np.outer(x, x)  # rank-1 similarity target, as the reference's demo
    np.random.seed(seed)

    f, (h, h_euclid), L, X0 = acc.FrobeniusSymLossResMeasEx(M, r, noise=noise)
    vk = max(1, maxitrs // 5)

    out = {}
    _, out["BPG"], _, _ = acc.BPG(f, h, L, X0, maxitrs=maxitrs,
                                  linesearch=False, verbose=verbose, verbskip=vk)
    _, out["BPG LS"], _, _ = acc.BPG(f, h, L, X0, maxitrs=maxitrs,
                                     linesearch=True, ls_ratio=1.5,
                                     verbose=verbose, verbskip=vk)
    _, out["UniversalGM"], _, _ = acc.UniversalGM(f, h, L, X0, maxitrs=maxitrs,
                                                  verbose=verbose, verbskip=vk)
    _, out["AIBM"], _, _ = acc.AIBM(f, h, L, X0, gamma=2.0, maxitrs=maxitrs,
                                    verbose=verbose, verbskip=vk)
    for k, F in out.items():
        print(f"{k:>12}: F = {float(F[-1]):.6e}")
    return out


if __name__ == "__main__":
    start()
    print("\n=== with gradient noise (inexact oracle) ===")
    start(noise=0.1)
