"""Logistic regression with L1 regularization and an L-inf box.

Equivalent of the reference's accbpg/ex_LR_L2L1Linf.py:57-78:

    minimize_x  (1/m) sum_i log(1 + exp(-b_i a_i'x))   s.t. ||x||_inf <= B

with Psi = lamda ||x||_1, 1-relatively-smooth w.r.t. (1/2)||x||^2.
"""

import numpy as np

import jax.numpy as jnp

import accbpg_and_fw_tpu as acc


def test_L2L1Linf(m=100, n=200, maxitrs=100, seed=0, verbose=True):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    b = np.sign(rng.random(m))

    f = acc.LogisticRegression(X=jnp.asarray(A), y=jnp.asarray(b))
    h = acc.L2L1Linf(lamda=1.0 / m, B=1)

    L = 0.25
    x0 = jnp.zeros(n)

    x1, F1, G1, _ = acc.BPG(f, h, L, x0, maxitrs, verbose=verbose, verbskip=10)
    x2, F2, G2, _, _, _ = acc.ABPG_gain(f, h, L, x0, gamma=2, maxitrs=maxitrs,
                                        restart=False, verbose=verbose,
                                        verbskip=10)
    print(f"BPG:       F = {float(F1[-1]):.6e}")
    print(f"ABPG_gain: F = {float(F2[-1]):.6e}")
    return F1, F2


if __name__ == "__main__":
    test_L2L1Linf()
