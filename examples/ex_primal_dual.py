"""Primal-dual switching gradient method on linearly-constrained SymNMF.

Equivalent of the reference's
primal_dual_method/ex_Primal_Dual_Switching_Subtasks.py: minimize the
Frobenius SymNMF loss subject to a linear constraint X A <= b (elementwise),
alternating productive objective steps and unproductive constraint steps
with a duality-gap stopping rule.
"""

import numpy as np

import accbpg_and_fw_tpu as acc


def start(n=30, r=4, maxitrs=300, epsilon=10.0, seed=3, verbose=True):
    np.random.seed(seed)
    M = np.random.rand(n, n)
    M = (M + M.T) / 2

    f, g, h, L, X0 = acc.FrobeniusSymLossExWithLinearCnstrnts(M, r)
    F, gaps, Ls = acc.PrimalDualSwitchingGradientMethod(
        f, h, L, g, X0, maxitrs=maxitrs, epsilon=epsilon, verbose=verbose,
        verbskip=max(1, maxitrs // 10))

    print(f"productive steps: {len(F)} / {len(gaps)}")
    if len(F):
        print(f"final productive F = {float(F[-1]):.6e}")
    print(f"final duality gap  = {float(gaps[-1]):.6e}")
    return F, gaps, Ls


if __name__ == "__main__":
    start()
