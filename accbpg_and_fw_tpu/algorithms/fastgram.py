"""Shared machinery for the stateful linear-Gram D-opt fast paths.

The D-opt Gram G(x) = V diag(x) V^T (reference: functions.py:27-82) is
LINEAR in x, so a driver whose iterates are convex combinations of carried
points can:

* combine carried m x m Grams instead of paying the O(m^2 n) contraction;
* replace the per-evaluation m x m factorization with a warm-started
  Newton-Schulz inverse (matmul-only — no sequential emulated-f64
  Cholesky on TPU);
* advance log-determinants through the exact identity
  ``logdet G' = logdet G + logdet(M G') - logdet(M G)`` for any M,
  evaluated by an 8-term trace series when M approximates an inverse well
  enough that ``||I - M G||_F <= 0.03`` (truncation ~6e-13), falling back
  to the oracle's full factorization otherwise (small-operand lax.cond —
  fine inside scan, see CLAUDE.md).

Oracles opt in by exposing the protocol ``gram`` / ``logdet_full`` /
``inv_seed`` / ``grad_from_inv`` (DOptimalObj, DOptimalObjMixed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

SERIES_TAU2 = 0.03 ** 2  # ||E||_F^2 gate for the 8-term logdet series
WARM_TAU2 = 0.05 ** 2    # gate for warm-starting Schulz from a carried M

_PROTOCOL = ("gram", "logdet_full", "inv_seed", "grad_from_inv")


def supports_fast_gram(f):
    return all(hasattr(f, a) for a in _PROTOCOL)


def require_fast_gram(f):
    if not supports_fast_gram(f):
        raise ValueError(
            "fast_gram=True needs a linear-Gram oracle exposing "
            "gram/logdet_full/inv_seed/grad_from_inv "
            "(DOptimalObj or DOptimalObjMixed)")


def schulz(M, G, steps=4):
    """Newton-Schulz inverse polish: M <- 2M - M G M (matmul-only; the
    error ||I - G M|| SQUARES per step, so 4 steps take a 5e-2 warm start
    or a 1e-3 f32-Cholesky seed to below 1e-12)."""
    for _ in range(steps):
        M = 2.0 * M - M @ (G @ M)
    return M


def inv_at(f, G, M_prev):
    """Inverse of the m x m Gram G, warm-started from a carried inverse of
    a nearby Gram when quadratic Schulz convergence is certain, reseeded
    from the oracle's f32 factorization otherwise."""
    eye = jnp.eye(G.shape[0], dtype=G.dtype)
    E0 = eye - M_prev @ G
    warm_ok = jnp.sum(E0 * E0) <= WARM_TAU2
    M0 = lax.cond(warm_ok, lambda: M_prev, lambda: f.inv_seed(G))
    return schulz(M0, G)


def series_logdet(E):
    """log det(I - E) via 8 trace terms and 3 m x m matmuls.

    tr(E^j) for j = 5..8 come free as elementwise contractions of the
    computed powers (tr(AB) = sum(A * B^T)).  Truncation error is
    <= m ||E||^9 / (9 (1 - ||E||)) ~ 6e-13 at the gate ||E||_F <= 0.03.
    """
    E2 = E @ E
    E3 = E @ E2
    E4 = E2 @ E2
    t1 = jnp.trace(E)
    t2 = jnp.trace(E2)
    t3 = jnp.trace(E3)
    t4 = jnp.trace(E4)
    t5 = jnp.sum(E2 * E3.T)
    t6 = jnp.sum(E3 * E3.T)
    t7 = jnp.sum(E3 * E4.T)
    t8 = jnp.sum(E4 * E4.T)
    return -(t1 + t2 / 2 + t3 / 3 + t4 / 4 + t5 / 5 + t6 / 6 + t7 / 7
             + t8 / 8)


def anchored_logdet_shift(f, ld_anchor, sign, M, G_series, G_target):
    """(logdet(G_target), shift) from a known anchor logdet.

    ``sign=+1``: target = the G entering the series, anchor = the point M
    inverts:      ld_target = ld_anchor + logdet(M G_series).
    ``sign=-1``: target = the point M inverts, anchor = the series G:
                  ld_target = ld_anchor - logdet(M G_series).
    Falls back to the oracle's full factorization of G_target when the
    series residual is too large.

    The SHIFT (ld_target - ld_anchor) is returned separately because it is
    the series value itself — absolutely accurate to ~1e-16 even when the
    logdets are O(1).  Descent acceptances must test the shift directly:
    comparing two separately-computed O(1) objective values loses the
    difference to cancellation once the descent margin shrinks below the
    oracle's value noise (observed: the gain line search of the mixed
    oracle on XLA:CPU failing persistently, G inflating to ~3e7 and the
    run stalling into a spurious dzz-converged stop at 4380/9000
    iterations).  In the fallback branch the shift comes from a
    subtraction, but there ||E|| > 0.03 so the shift is large and the
    cancellation is harmless.
    """
    E = jnp.eye(G_series.shape[0], dtype=G_series.dtype) - M @ G_series
    ok = jnp.sum(E * E) <= SERIES_TAU2
    s = lax.cond(ok,
                 lambda: sign * series_logdet(E),
                 lambda: f.logdet_full(G_target) - ld_anchor)
    return ld_anchor + s, s


def anchored_logdet(f, ld_anchor, sign, M, G_series, G_target):
    """logdet(G_target) from a known anchor (see anchored_logdet_shift)."""
    return anchored_logdet_shift(f, ld_anchor, sign, M, G_series,
                                 G_target)[0]


@jax.jit
def init_state(f, x0):
    """Pre-scan Gram / inverse / logdet at the starting point.

    Jitted (module-level cache): called eagerly, the ``lax.cond`` inside
    the mixed oracle's factorization closes over CONCRETE arrays, so every
    call builds a fresh jaxpr and compiles a fresh ``jit(cond)``
    executable.  On TPU each of those is a remote compile (seconds) —
    measured 297 s for a 9000-iteration BPG fast_gram solve whose refresh
    paid 2 such compiles per chunk.  Under jit the cond compiles once per
    (oracle-structure, shape) and is cached for the whole process.
    """
    G0 = f.gram(x0)
    return dict(G0=G0, M0=schulz(f.inv_seed(G0), G0),
                ld0=f.logdet_full(G0))


@functools.partial(jax.jit, static_argnames=("with_z",))
def refresh_state(f, carry, with_z=True):
    """between_chunks recontraction of the carried Grams / inverse /
    logdet from the exact iterates, so combination/series roundoff cannot
    accumulate past one chunk (~1e-16/step worst-case drift).  Jitted for
    the same per-call-recompile reason as ``init_state``."""
    Gx = f.gram(carry["x"])
    out = {**carry, "Gx": Gx, "fx": -f.logdet_full(Gx),
           "Minv": schulz(f.inv_seed(Gx), Gx)}
    if with_z:
        out["Gz"] = f.gram(carry["z"])
    return out
