"""Inexact-oracle methods on SVM over an L2 ball with the PolyDiv kernel.

Equivalent of the reference's aibm/ex_SVM.py: AIBM and AdaptFGM on the
digits (or synthetic) hinge-loss SVM with the data-dependent polynomial
divergence kernel (arXiv:1710.04718)."""

import numpy as np

import accbpg_and_fw_tpu as acc


def start(maxitrs=200, lamda=0.001, real_ds=True, noise=0, seed=11,
          verbose=True):
    np.random.seed(seed)
    f, (poly_h, sq_h), L, x0, radius = acc.svm_digits_ds_divs_ball(
        lamda=lamda, real_ds=real_ds)
    vk = max(1, maxitrs // 5)

    out = {}
    _, out["AIBM"], _, _ = acc.AIBM(f, poly_h, L, x0, gamma=2.0,
                                    maxitrs=maxitrs, noise=noise,
                                    verbose=verbose, verbskip=vk)
    _, out["AdaptFGM"], _, _ = acc.AdaptFGM(f, poly_h, L, x0, maxitrs=maxitrs,
                                            noise=noise, verbose=verbose,
                                            verbskip=vk)
    _, out["UniversalGM"], _, _ = acc.UniversalGM(f, poly_h, L, x0,
                                                  maxitrs=maxitrs,
                                                  noise_level=noise,
                                                  verbose=verbose, verbskip=vk)
    for k, F in out.items():
        print(f"{k:>12}: F = {float(F[-1]):.6e}")
    return out


if __name__ == "__main__":
    start()
