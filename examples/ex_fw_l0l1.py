"""(L0,L1)-smooth Frank-Wolfe on hard logistic regression.

Equivalent of the reference's L0_L1_smoothness experiments: generate a hard
correlated-design logistic regression constrained to an l1/l2/linf ball or
the simplex (hard_FW_log_reg_jax) and compare the (L0,L1) step rules against
the classic divergence/descent steps.
"""

import jax

import accbpg_and_fw_tpu as acc

_LMOS = {
    "l1": lambda r: acc.lmo_l2_ball(r),  # reference uses l2 LMO for l1 gen too
    "l2": lambda r: acc.lmo_l2_ball(r),
    "linf": lambda r: acc.lmo_linf_ball(r),
    "simplex": lambda r: acc.lmo_simplex(r),
}


def start(domain="l2", n_samples=500, n_features=100, radius=2.0,
          maxitrs=500, seed=0, verbose=True):
    key = jax.random.PRNGKey(seed)
    f, h, L, L0, L1, x0, X, y = acc.hard_FW_log_reg_jax(
        key, n_samples, n_features, radius=radius, domain=domain)
    lmo = _LMOS[domain](radius)
    vk = max(1, maxitrs // 10)
    L, L0, L1 = float(L), max(float(L0), 1e-9), float(L1)

    out = {}
    _, out["FW div"], _, _ = acc.FW_alg_div_step(
        f, h, L, x0, maxitrs, gamma=2.0, lmo=lmo, verbose=verbose, verbskip=vk)
    _, out["FW 2/(k+2)"], _, _ = acc.FW_alg_descent_step(
        f, h, x0, maxitrs, lmo, verbose=verbose, verbskip=vk)
    _, out["FW L0L1 short"], _, _ = acc.FW_alg_L0_L1_shortest_step(
        f, h, L0, L1, x0, maxitrs, gamma=2.0, lmo=lmo, verbose=verbose,
        verbskip=vk)
    _, out["FW L0L1 log+lin"], _, logs1, _ = acc.FW_l0l1_log_and_linear_step(
        f, h, 1e-3, L1, x0, maxitrs, lmo=lmo, ls_ratio=2.0, verbose=verbose,
        verbskip=vk)
    _, out["FW L0L1 log"], _, logs2, _ = acc.FW_l0l1_log_only(
        f, h, 1e-3, L1, x0, maxitrs, lmo=lmo, ls_ratio=2.0, verbose=verbose,
        verbskip=vk)

    for k, F in out.items():
        print(f"{k:>16}: F = {float(F[-1]):.6e} ({len(F)} iters)")
    return out


if __name__ == "__main__":
    for domain in ("l2", "linf", "simplex"):
        print(f"\n=== domain {domain} ===")
        start(domain=domain)
