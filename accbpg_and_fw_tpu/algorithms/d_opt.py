"""D-optimal design Frank-Wolfe solvers with O(mn) rank-1 iterations.

TPU-native re-designs of /root/reference/accbpg/D_opt_alg.py: the classic
Khachiyan Frank-Wolfe (``D_opt_FW``) and the Wolfe-Atwood away-step variant
(``D_opt_FW_away``) for

    minimize  -log det(V diag(x) V^T)   s.t.  x in unit simplex.

Design differences from the reference (same math, faster/stabler on TPU):

* the whole iteration is a jitted scan step — argmax/argmin, the rank-1
  H/w updates, and the step-size arithmetic all stay on device (the
  reference re-enters Python per iteration, D_opt_alg.py:51-82);
* the determinant is tracked in LOG space (log1p-accumulated), so
  F(x) = -logdet(VXVT) is cheap and accurate; the reference's away version
  recomputes np.linalg.det(H) — an O(m^3) per-iteration cost — because its
  linear-space running det drifts (D_opt_alg.py:136-138);
* optional ``refresh_every``: re-factorize H, w and logdet from scratch at
  the first chunk boundary after every R iterations, canceling rank-1
  rounding drift (needed for float32 runs; the reference never refreshes);
  the factorization is Cholesky-based so it (and the whole solver) also
  runs in float64 on TPU, where LU has no f64 lowering;
* the away-branch logdet update uses w[j] (the reference uses w[i] at
  D_opt_alg.py:177 — a known bug that its F[k] hides by recomputing det(H)).

Sharding: V column-shards over a mesh (P(None, 'data')); x and w inherit the
column sharding; H (m-by-m) and all scalars replicate.  The per-iteration
collectives are then the w-argmax/argmin and the psum inside HVi @ V.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .driver import run_driver


def _dopt_factorize(V, x):
    """Fresh O(m^2 n + m^3) state: (H, w, logdet) for VXVT = V diag(x) V^T.

    Cholesky-based (VXVT is SPD): logdet = 2 sum log diag(R), H = R^-T R^-1,
    and w = colnorms^2 of R^-1 V.  Unlike LU (slogdet/inv), Cholesky and
    triangular solves have float64 TPU lowerings, so the solver runs in f64
    on-device end to end.
    """
    from jax.scipy.linalg import solve_triangular

    VXVT = (V * x) @ V.T
    R = jnp.linalg.cholesky(VXVT)  # lower
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(R)))
    Rinv = solve_triangular(R, jnp.eye(V.shape[0], dtype=V.dtype), lower=True)
    H = Rinv.T @ Rinv
    W = Rinv @ V
    w = jnp.sum(W * W, axis=0)
    return H, w, logdet


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda u, v: jnp.where(pred, u, v), a, b)


class _DOptCfg:
    """Hashable static config for the cached D-opt step."""

    __slots__ = ("away", "mixed")

    def __init__(self, away, mixed):
        self.away = bool(away)
        self.mixed = bool(mixed)

    def __hash__(self):
        return hash((self.away, self.mixed))

    def __eq__(self, other):
        return (isinstance(other, _DOptCfg) and self.away == other.away
                and self.mixed == other.mixed)

    def __repr__(self):
        # stable across processes: keys the driver's persistent AOT cache
        return f"_DOptCfg(away={self.away}, mixed={self.mixed})"


def _dopt_u(cfg, prob, hv):
    if cfg.mixed:
        from ..ops.mixed_precision import ozaki_gemv

        # Per-pair dot_generals (not ozaki_gemv_packed): the 21 independent
        # small contractions overlap with the VPU-side H update in the same
        # step, which measures ~25% faster end-to-end than the single big
        # packed matmul despite the packed form's lower isolated cost.
        return ozaki_gemv(hv, prob["V_digits"], prob["sV"], levels_a=7,
                          max_diag=6).astype(prob["V"].dtype)
    return hv @ prob["V"]


def _dopt_step(cfg, prob, c, k):
    V, eps = prob["V"], prob["eps"]
    m, n = V.shape
    dt = V.dtype
    m_f = jnp.asarray(float(m), dt)

    def toward_update(state, i, wi):
        x, w, H, logdet = state
        t = (wi / m_f - 1.0) / (wi - 1.0)
        Vi = lax.dynamic_index_in_dim(V, i, axis=1, keepdims=False)
        HVi = H @ Vi
        c_ = t / (1.0 - t + t * wi)  # == t / (1 + t*(wi-1))
        H_new = (H - c_ * jnp.outer(HVi, HVi)) / (1.0 - t)
        u = _dopt_u(cfg, prob, HVi)
        # Force u_i == w_i: the exact line search sets the new w_i to exactly
        # m only when the recomputed v_i^T H v_i agrees with the incrementally
        # tracked w_i.  At float64 CPU precision they agree to ~1e-15 (no-op);
        # on TPU the ~1e-12 matmul discrepancy otherwise leaves a residual
        # slack of order m*delta that sustains a permanent ~1e-6 limit cycle
        # (observed: SN frozen at 2.7e-6 for 40k iterations at m=1000).
        u = u.at[i].set(wi)
        w_new = (w - c_ * u * u) / (1.0 - t)
        x_new = (x * (1.0 - t)).at[i].add(t)
        logdet_new = logdet + (m_f - 1.0) * jnp.log1p(-t) + jnp.log1p(t * (wi - 1.0))
        return (x_new, w_new, H_new, logdet_new)

    def away_update(state, j, wj):
        x, w, H, logdet = state
        xj = x[j]
        t = jnp.minimum((1.0 - wj / m_f) / (wj - 1.0), xj / (1.0 - xj))
        Vj = lax.dynamic_index_in_dim(V, j, axis=1, keepdims=False)
        HVj = H @ Vj
        c_ = t / (1.0 + t - t * wj)
        H_new = (H + c_ * jnp.outer(HVj, HVj)) / (1.0 + t)
        u = _dopt_u(cfg, prob, HVj)
        u = u.at[j].set(wj)  # consistency pin; see toward_update
        w_new = (w + c_ * u * u) / (1.0 + t)
        x_new = (x * (1.0 + t)).at[j].add(-t)
        logdet_new = logdet + (m_f - 1.0) * jnp.log1p(t) + jnp.log1p(t - t * wj)
        return (x_new, w_new, H_new, logdet_new)

    x, w, H, logdet = c["x"], c["w"], c["H"], c["logdet"]
    Fk = -logdet
    i = jnp.argmax(w)
    wi = w[i]

    if cfg.away:
        ww = w - wi  # shift so max is 0; masked entries dominate at 0
        j = jnp.argmin(ww * (x > 1.0e-8))
        wj = w[j]
        eps_neg = 1.0 - wj / m_f
    else:
        wmin = jnp.min(jnp.where(x > 0, w, jnp.inf))
        eps_neg = 1.0 - wmin / m_f

    eps_pos = wi / m_f - 1.0
    stop = (eps_pos <= eps) & (eps_neg <= eps)

    state = (x, w, H, logdet)
    if cfg.away:
        new_state = lax.cond(
            eps_pos >= eps_neg,
            lambda s: toward_update(s, i, wi),
            lambda s: away_update(s, j, wj),
            state,
        )
    else:
        new_state = toward_update(state, i, wi)

    # the reference breaks BEFORE applying the update (D_opt_alg.py:72-73)
    x_n, w_n, H_n, logdet_n = _tree_where(stop, state, new_state)
    c2 = dict(done=c["done"], x=x_n, w=w_n, H=H_n, logdet=logdet_n)
    return c2, dict(F=Fk, SP=eps_pos, SN=eps_neg, _stop=stop)


def _dopt_problem(V, eps, u_mode):
    """Resolve u_mode and build the traced problem pytree + static cfg."""
    dt = V.dtype
    if u_mode == "auto":
        u_mode = ("mixed" if dt == jnp.float64
                  and jax.default_backend() == "tpu" else "exact")
    prob = dict(V=V, eps=jnp.asarray(eps, dt))
    if u_mode == "mixed":
        from ..ops.mixed_precision import digit_split_matrix

        V_digits, sV = digit_split_matrix(V, levels=7)
        prob["V_digits"] = V_digits
        prob["sV"] = sV
    return prob, _DOptCfg(away=False, mixed=(u_mode == "mixed"))


def _make_dopt_step(V, eps, *, away, u_mode="auto"):
    """Closure-style step (compat for batched/scaling/dry-run callers):
    ``u_mode`` selects how the O(mn) rank-1 w-update contraction
    u = (H v)^T V is computed:

    * "exact": native dtype dot (bit-matches the reference trajectory on
      CPU; ~25x slower than f32 on TPU for f64 inputs, which have no
      hardware matmul path);
    * "mixed": Ozaki-style int8 digit contraction with exact int32
      accumulation (ops/mixed_precision.py) — ~3e-12 relative error at
      ~1/9 the TPU-f64 cost;
    * "auto": "mixed" exactly when running f64 on a TPU backend.
    """
    prob, cfg = _dopt_problem(V, eps, u_mode)
    cfg = _DOptCfg(away=away, mixed=cfg.mixed)

    def step(c, k):
        return _dopt_step(cfg, prob, c, k)

    return step


def _warn_if_downcast(V_in, V_dev):
    import numpy as np

    if (getattr(V_in, "dtype", None) == np.float64
            and V_dev.dtype == jnp.float32):
        import warnings

        warnings.warn(
            "float64 design matrix silently downcast to float32 because "
            "jax_enable_x64 is off; tight slack tolerances (<1e-4) are "
            "unreachable in float32. Enable x64 "
            "(jax.config.update('jax_enable_x64', True)) for "
            "reference-accuracy solves.",
            stacklevel=3,
        )


def _run_dopt(V, x0, eps, maxitrs, verbose, verbskip, chunk, away,
              refresh_every, header, checkpoint=None, u_mode="auto"):
    V_in = V
    V = jnp.asarray(V)
    _warn_if_downcast(V_in, V)
    x0 = jnp.asarray(x0, V.dtype)
    H, w, logdet = _dopt_factorize(V, x0)
    prob, cfg = _dopt_problem(V, eps, u_mode)
    cfg = _DOptCfg(away=away, mixed=cfg.mixed)
    carry = dict(done=jnp.asarray(False), x=x0, w=w, H=H, logdet=logdet)

    between = None
    if refresh_every:
        # Refactorize at chunk boundaries (instead of a lax.cond inside the
        # scan, which forces both-branch buffer materialization per
        # iteration on TPU).  One extra O(m^2 n) dispatch per crossed
        # refresh boundary, zero per-iteration cost.
        @jax.jit
        def _refresh(c):
            Hn, wn, ldn = _dopt_factorize(V, c["x"])
            return dict(done=c["done"], x=c["x"], w=wn, H=Hn, logdet=ldn)

        last_refresh = [0]

        def between(c, k_next):
            if k_next - last_refresh[0] >= refresh_every:
                last_refresh[0] = k_next
                return _refresh(c)
            return c

    def row(k, r, t):
        print("{0:6d}  {1:10.3e}  {2:10.3e}  {3:10.3e}  {4:6.1f}".format(
            k, r["F"], r["SP"], r["SN"], t))

    carry, hist, T = run_driver(_dopt_step, carry, maxitrs, verbose=verbose,
                                verbskip=verbskip, header=header,
                                print_row=row, chunk=chunk, checkpoint=checkpoint,
                                between_chunks=between, problem=prob, cfg=cfg)
    return carry["x"], hist["F"], hist["SP"], hist["SN"], T


def D_opt_FW(V, x0, eps, maxitrs, verbose=True, verbskip=1, chunk=None,
             refresh_every=0, checkpoint=None, u_mode="auto"):
    """Khachiyan Frank-Wolfe for D-optimal design on the simplex with rank-1
    Sherman-Morrison updates of H = (V diag(x) V^T)^{-1} and w = -gradient
    (reference: D_opt_alg.py:9-88).  Returns ``(x, F, SP, SN, T)``.
    """
    header = ("\nSolving D-opt design problem using Frank-Wolfe method\n"
              "     k      F(x)     pos_slack   neg_slack    time")
    return _run_dopt(V, x0, eps, maxitrs, verbose, verbskip, chunk,
                     away=False, refresh_every=refresh_every, header=header,
                     checkpoint=checkpoint, u_mode=u_mode)


def D_opt_FW_away(V, x0, eps, maxitrs, verbose=True, verbskip=1, chunk=None,
                  refresh_every=0, checkpoint=None, u_mode="auto"):
    """Wolfe-Atwood method: Frank-Wolfe with away steps for D-optimal design
    (linearly convergent; reference: D_opt_alg.py:91-185).
    Returns ``(x, F, SP, SN, T)``.
    """
    header = ("\nSolving D-opt design problem using Frank-Wolfe method with away steps\n"
              "     k      F(x)     pos_slack   neg_slack    time")
    return _run_dopt(V, x0, eps, maxitrs, verbose, verbskip, chunk,
                     away=True, refresh_every=refresh_every, header=header,
                     checkpoint=checkpoint, u_mode=u_mode)
