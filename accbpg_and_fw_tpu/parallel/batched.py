"""Batched (vmapped) multi-problem solving.

The reference's iteration-complexity studies run K = 3-10 repeats over grids
of (m, n) configs as sequential Python loops (SURVEY.md §6, e.g.
ipynb/ABPGvsFW/ex_Dopt_FW_m80.ipynb:cell3).  The TPU-native equivalent: vmap
the whole solve over the instance batch, so K independent solves compile to
ONE scan whose per-iteration work is batched GEMMs on the MXU instead of K
sequential GEMV streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..algorithms.d_opt import (
    _dopt_factorize,
    _make_dopt_step,
    _warn_if_downcast,
)
from ..algorithms.driver import _wrap_step


def vmap_solver(solve_one, *batched_args):
    """jit(vmap(...)) a single-instance solver over leading batch axes."""
    return jax.jit(jax.vmap(solve_one))(*batched_args)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _batch_solve(away, refresh_every, num_iters, Vs, x0s, eps):
    """Module-level jitted batch solve — cached across calls with matching
    shapes and static options (a closure form would recompile per call)."""

    def solve_one(V, x0):
        step = _make_dopt_step(V, eps, away=away)
        wrapped = _wrap_step(step)
        H, w, logdet = _dopt_factorize(V, x0)
        carry = dict(done=jnp.asarray(False), x=x0, w=w, H=H, logdet=logdet)

        if not refresh_every or refresh_every >= num_iters:
            carry, hist = lax.scan(wrapped, carry,
                                   jnp.arange(num_iters, dtype=jnp.int32))
            return carry["x"], hist["F"], hist["SP"], hist["SN"]

        R = int(refresh_every)
        nblocks = -(-num_iters // R)

        def block(c, _):
            Hn, wn, ldn = _dopt_factorize(V, c["x"])
            c = dict(done=c["done"], x=c["x"], w=wn, H=Hn, logdet=ldn)
            return lax.scan(wrapped, c, jnp.arange(R, dtype=jnp.int32))

        carry, hists = lax.scan(block, carry, None, length=nblocks)
        hist = jax.tree_util.tree_map(
            lambda a: a.reshape((nblocks * R,) + a.shape[2:])[:num_iters],
            hists,
        )
        return carry["x"], hist["F"], hist["SP"], hist["SN"]

    return jax.vmap(solve_one)(Vs, x0s)


def dopt_fw_batch(Vs, x0s, eps, num_iters, away=True, refresh_every=0):
    """Solve a batch of D-optimal design instances in one computation.

    Vs: (K, m, n) stacked design matrices; x0s: (K, n) initial points.
    Runs ``num_iters`` Frank-Wolfe(-away) iterations for every instance
    (instances that converge earlier freeze via their done flag) and returns
    ``(x, F, SP, SN)`` with leading batch axis K.  Compiled executables are
    cached across calls with matching shapes/static options.

    ``refresh_every``: refactorize (H, w, logdet) from the current iterate
    every R iterations inside the scan — cancels rank-1 rounding drift for
    float32 runs (f32 incremental state stalls around slack ~1e-4; f64
    needs no refresh: measured m=30 f64-on-TPU batches converge to 1e-8
    with iteration counts matching the reference numpy).  O(m^2 n) per
    refresh, amortized over R iterations.

    Precision guidance (measured, one v5e chip, K=32 instances of 30x1000):
    f32 batch is ~4x faster than sequential reference numpy and supports
    slack targets down to ~1e-4; f64 batch certifies 1e-8 with
    numpy-matching iteration counts but loses to host numpy at this tiny m
    (emulated f64 + both-branch vmap cost) — prefer f64 batches for m in
    the hundreds and above, or run tiny-m f64 sweeps on CPU.

    Note: under vmap the toward/away ``lax.cond`` lowers to a select (both
    branches execute); that doubles the per-iteration FLOPs but turns K
    independent O(mn) GEMVs into one (K, m, n) batched contraction — a large
    net win on the MXU for sweep workloads.
    """
    Vs_in = Vs
    Vs = jnp.asarray(Vs)
    _warn_if_downcast(Vs_in, Vs)
    x0s = jnp.asarray(x0s, Vs.dtype)
    eps = jnp.asarray(eps, Vs.dtype)
    return _batch_solve(bool(away), int(refresh_every), int(num_iters),
                        Vs, x0s, eps)
