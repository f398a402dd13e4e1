"""Batched (vmapped) multi-problem solving.

The reference's iteration-complexity studies run K = 3-10 repeats over grids
of (m, n) configs as sequential Python loops (SURVEY.md §6, e.g.
ipynb/ABPGvsFW/ex_Dopt_FW_m80.ipynb:cell3).  The TPU-native equivalent: vmap
the whole solve over the instance batch, so K independent solves compile to
ONE scan whose per-iteration work is batched GEMMs on the MXU instead of K
sequential GEMV streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..algorithms.d_opt import _dopt_factorize, _make_dopt_step
from ..algorithms.driver import scan_full


def vmap_solver(solve_one, *batched_args):
    """jit(vmap(...)) a single-instance solver over leading batch axes."""
    return jax.jit(jax.vmap(solve_one))(*batched_args)


def dopt_fw_batch(Vs, x0s, eps, num_iters, away=True):
    """Solve a batch of D-optimal design instances in one computation.

    Vs: (K, m, n) stacked design matrices; x0s: (K, n) initial points.
    Runs ``num_iters`` Frank-Wolfe(-away) iterations for every instance
    (instances that converge earlier freeze via their done flag) and returns
    ``(x, F, SP, SN)`` with leading batch axis K.

    Note: under vmap the toward/away ``lax.cond`` lowers to a select (both
    branches execute); that doubles the per-iteration FLOPs but turns K
    independent O(mn) GEMVs into one (K, m, n) batched contraction — a large
    net win on the MXU for sweep workloads.
    """
    Vs = jnp.asarray(Vs)
    x0s = jnp.asarray(x0s, Vs.dtype)

    def solve_one(V, x0):
        step = _make_dopt_step(V, eps, away=away)
        H, w, logdet = _dopt_factorize(V, x0)
        carry = dict(done=jnp.asarray(False), x=x0, w=w, H=H, logdet=logdet)
        carry, hist = scan_full(step, carry, num_iters)
        return carry["x"], hist["F"], hist["SP"], hist["SN"]

    return vmap_solver(solve_one, Vs, x0s)
