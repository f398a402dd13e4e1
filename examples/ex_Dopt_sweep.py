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
          seed=0, verbose=True):
    rng = np.random.default_rng(seed)
    results = {}
    for n in n_list:
        Vs = rng.standard_normal((K, m, n))
        x0s = np.full((K, n), 1.0 / n)
        xb, Fb, SPb, SNb = dopt_fw_batch(Vs, x0s, eps=eps,
                                         num_iters=num_iters, away=True)
        iters = [iters_to_eps(np.asarray(SPb[k]), np.asarray(SNb[k]), eps)
                 for k in range(K)]
        solved = [i for i in iters if i >= 0]
        gmean = float(np.exp(np.mean(np.log(solved)))) if solved else float("nan")
        results[n] = {"iters": iters, "geomean": gmean}
        if verbose:
            print(f"m={m} n={n}: iters-to-{eps:g} = {iters}  geomean = {gmean:.1f}")
    return results


if __name__ == "__main__":
    start()
