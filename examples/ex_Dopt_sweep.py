"""Iteration-complexity sweeps for D-optimal design — vmapped.

Default eps=1e-4 suits float32 (the default device dtype); enable x64 for
tighter targets (f64 batches match reference-numpy iteration counts).

Equivalent of the reference's ipynb/ABPGvsFW studies (ex_Dopt_FW_m80 /
_n1000 / _n2000: K = 3-10 seeded repeats per (m, n) config, iterations to
reach complementary slackness eps, geometric means) — but the K repeats
solve as ONE vmapped computation (parallel.batched.dopt_fw_batch), so a
whole repeat-batch costs barely more than one instance.
"""

import numpy as np

import accbpg_and_fw_tpu as acc
from accbpg_and_fw_tpu.parallel.batched import dopt_fw_batch


def iters_to_eps(SP, SN, eps):
    """First iteration where both slacks are <= eps (or -1)."""
    ok = (SP <= eps) & (SN <= eps)
    return int(np.argmax(ok)) if ok.any() else -1


def start(m=30, n_list=(200, 400, 800), K=4, eps=1e-4, num_iters=4000,
          seed=0, verbose=True, eps_list=None, plot=False):
    """``eps_list``: run the full eps sweep the reference's figure studies
    plot (iterations-to-eps vs n, one curve per eps); defaults to [eps]."""
    rng = np.random.default_rng(seed)
    eps_list = list(eps_list) if eps_list else [eps]
    eps_run = min(eps_list)
    results = {}
    for n in n_list:
        Vs = rng.standard_normal((K, m, n))
        x0s = np.full((K, n), 1.0 / n)
        xb, Fb, SPb, SNb = dopt_fw_batch(Vs, x0s, eps=eps_run,
                                         num_iters=num_iters, away=True)
        per_eps = {}
        for e in eps_list:
            iters = [iters_to_eps(np.asarray(SPb[k]), np.asarray(SNb[k]), e)
                     for k in range(K)]
            solved = [i for i in iters if i >= 0]
            gmean = (float(np.exp(np.mean(np.log(np.maximum(solved, 1)))))
                     if solved else float("nan"))
            per_eps[e] = {"iters": iters, "geomean": gmean}
        results[n] = dict(per_eps[eps_list[0]])
        results[n]["per_eps"] = per_eps
        if verbose:
            for e, r in per_eps.items():
                print(f"m={m} n={n} eps={e:g}: iters = {r['iters']}  "
                      f"geomean = {r['geomean']:.1f}")

    if plot:
        from _galleryutil import get_axes, save_fig

        fig, ax = get_axes(1, 1)
        ns = sorted(results)
        for e in eps_list:
            ax.loglog(ns, [results[n]["per_eps"][e]["geomean"] for n in ns],
                      marker="o", label=rf"$\epsilon$ = {e:g}")
        ax.set_xlabel("$n$")
        ax.set_ylabel("iterations to slack (geomean)")
        ax.set_title(f"FW-away iteration complexity, m={m}, K={K} repeats")
        ax.legend()
        save_fig(fig, f"dopt_sweep_m{m}.png")
    return results


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=30)
    p.add_argument("--n-list", type=int, nargs="+", default=(200, 400, 800))
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--eps-list", type=float, nargs="+",
                   default=(1e-3, 1e-4))
    p.add_argument("--num-iters", type=int, default=4000)
    p.add_argument("--plot", action="store_true")
    a = p.parse_args()
    start(m=a.m, n_list=tuple(a.n_list), K=a.K, eps_list=a.eps_list,
          num_iters=a.num_iters, plot=a.plot)
