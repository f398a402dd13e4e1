"""D-optimal design on a random instance — the README main example.

Equivalent of the reference's ipynb/ex_Dopt_random.ipynb and
frank_wolfe_wtih_rs/ex_Dopt_design.py: BPG(+LS), ABPG, ABPG_expo, ABPG_gain,
Bregman Frank-Wolfe and the Wolfe-Atwood solver on one seeded instance.

Run:  python examples/ex_Dopt_random.py [--m 80] [--n 200] [--maxitrs 1000] [--plot]
"""

import argparse

import numpy as np

import accbpg_and_fw_tpu as acc


def start(m=80, n=200, maxitrs=1000, seed=10, plot=False, verbose=True):
    f, h, L, x0 = acc.D_opt_design(m, n, randseed=seed)
    vk = max(1, maxitrs // 10)

    x00, F00, G00, T00 = acc.BPG(f, h, L, x0, maxitrs=maxitrs,
                                 linesearch=True, ls_ratio=2,
                                 verbose=verbose, verbskip=vk)
    x20, F20, G20, T20 = acc.ABPG(f, h, L, x0, gamma=2.0, maxitrs=maxitrs,
                                  theta_eq=True, verbose=verbose, verbskip=vk)
    xfw, Ffw, Gfw, Tfw = acc.FW_alg_div_step(f, h, L, x0, maxitrs=maxitrs,
                                             gamma=2.0, lmo=acc.lmo_simplex(),
                                             ls_ratio=2, verbose=verbose,
                                             verbskip=vk)
    x2e, F2e, Gm2e, G2e, T2e = acc.ABPG_expo(f, h, L, x0, gamma0=3,
                                             maxitrs=maxitrs, theta_eq=True,
                                             Gmargin=100, verbose=verbose,
                                             verbskip=vk)
    x2g, F2g, Gn2g, Gd2g, Ga2g, T2g = acc.ABPG_gain(f, h, L, x0, gamma=2,
                                                    maxitrs=maxitrs, G0=0.1,
                                                    theta_eq=True,
                                                    verbose=verbose,
                                                    verbskip=vk)
    xaw, Faw, SP, SN, Taw = acc.D_opt_FW_away(np.asarray(f.H), x0, eps=1e-8,
                                              maxitrs=20 * maxitrs,
                                              verbose=verbose,
                                              verbskip=vk * 10, chunk=1000)

    results = {
        "BPG": F00, "ABPG": F20, "FW": Ffw, "ABPG_expo": F2e,
        "ABPG_gain": F2g, "FW_away": Faw,
    }
    for name, F in results.items():
        print(f"{name:>10}: F = {float(F[-1]):.6e}  ({len(F)} iters)")

    if plot:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        acc.plot_comparisons(
            ax, [F00, F20, Ffw, F2e, F2g], list(results)[:5], plotdiff=True,
            yscale="log", xlabel=r"Iteration $k$", ylabel=r"$F(x_k)-F_\star$")
        plt.tight_layout()
        plt.savefig("dopt_random.png", dpi=120)
        print("saved dopt_random.png")
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=80)
    p.add_argument("--n", type=int, default=200)
    p.add_argument("--maxitrs", type=int, default=1000)
    p.add_argument("--plot", action="store_true")
    a = p.parse_args()
    start(a.m, a.n, a.maxitrs, plot=a.plot)
