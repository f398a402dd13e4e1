"""Whole-iteration fused Pallas kernel for D-optimal design Frank-Wolfe.

THE latency problem this solves: every XLA op dispatch / reduction barrier
on TPU costs ~27 us, so the scan-based D-opt drivers (algorithms/d_opt.py)
are latency-bound below ~10^7-element problems — the reference's own
flagship 30x1000 demo (0.4 s in numpy, ipynb/ABPGvsFW/ex_Dopt_ABPGvsFW.ipynb)
ran FASTER in host numpy than on the TPU.  Here the ENTIRE Wolfe-Atwood
iteration — argmax/argmin over w, the rank-1 H and w updates, the step-size
arithmetic, the history writes — runs inside ONE Pallas kernel with all
state resident in VMEM, for a whole chunk of iterations per kernel launch.
Per-iteration cost drops from ~6 dispatch barriers to pure VPU arithmetic.

Numerical precision: certifying slack 1e-8 needs ~1e-12-accurate w and x —
beyond float32, and Mosaic has no f64.  All state (V, x, w, H, logdet) is
kept in DOUBLE-SINGLE form (ops/double_single.py): pairs of f32 planes with
~49-bit effective significand, every update an error-free-transformation
composite.  Measured trajectory agreement vs the f64 scan path is at the
1e-12 level (tests/test_pallas_dopt.py).

Semantics match /root/reference/accbpg/D_opt_alg.py:91-185 (Wolfe-Atwood
away-step FW) and :9-88 (Khachiyan FW), with this repo's documented
deviations (algorithms/d_opt.py): log-space determinant tracking, the
u[i] = w[i] consistency pin, and the away-branch logdet using w[j].

Only single-instance, single-chip, n-in-VMEM problems.  Large-m problems
(MP >= _BIG_MP) compile via slabbed contractions that slice the V refs
per block (a wholesale ref load alone is 40 MB at 1000x5000; v5e VMEM is
128 MB) — but measured 1.9 ms/iteration there vs 225 us for the XLA DS
scan: Mosaic lowers each DS op as its own full-array VMEM pass (no
elementwise-chain fusion), so large-array double-single chains belong to
XLA, which fuses the 17-op two_prod composites into single-pass loops.
This kernel's domain is the LATENCY-bound small/medium regime; the host
driver warns if you route a large problem here.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import double_single as ds

_BIG_F32 = 3.0e38
_LANE = 128
# iterations per inner fori block: the early-stop flag crosses from the
# vector unit to the scalar unit (a full vector-pipeline drain, ~10 us)
# once per block, amortized to ~0.16 us/iteration
_INNER = 64
# batch kernel: iterations per inner block = history-flush granularity.
# Histories live in (B, 1, _ROLL) rolling carry buffers and flush to the
# big (B, 1, K) output refs once per block at a _ROLL-aligned lane offset
# (Mosaic requires 128-aligned dynamic lane offsets; carrying the full
# K-sized buffers through the loops blew the 16 MB scoped-VMEM budget).
_ROLL = 128

# development aid: names of kernel-body stages to skip when profiling
# ("select", "scalars", "extract", "contract", "updates", "hist");
# clear _build_chunk_fn.cache_clear() after changing.  Never set in
# production paths.
_ABLATE: frozenset = frozenset()


def _next_pow2(v: int) -> int:
    p = 8
    while p < v:
        p *= 2
    return p


def _recip_f32(y, interpret):
    """One f32 reciprocal.  Scalar f32 divides cost ~0.7 us each in the
    Mosaic scalar pipeline (measured); sharing ONE reciprocal across the
    three quotient digits of a DS division cuts the per-iteration divide
    count from 21 to ~5.  (pl.reciprocal would remove it entirely but has
    no scalar lowering in this jax version.)"""
    return 1.0 / y


def _ds_div_fast(x, y, interpret):
    """DS / DS long division sharing one f32 reciprocal (see _recip_f32).
    The quotient digits self-correct, so a 1-ulp reciprocal is enough."""
    r = _recip_f32(y[0], interpret)
    q1 = x[0] * r
    rem = ds.sub(x, ds.mul_f32(y, q1))
    q2 = rem[0] * r
    rem = ds.sub(rem, ds.mul_f32(y, q2))
    q3 = rem[0] * r
    q1, q2 = ds.quick_two_sum(q1, q2)
    return ds.add((q1, q2), (q3, jnp.zeros_like(q3)))


def _ds_allreduce_sub(x, MP, interpret):
    """Butterfly all-reduce of a DS array along the SUBLANE axis (axis 0):
    after log2(MP) roll+add rounds every row holds the column sum.

    Full-tile cyclic rolls + elementwise DS adds only — no sub-tile sublane
    slicing, which Mosaic lowers as expensive relayouts (the first kernel
    version spent most of its 164 us/iteration there)."""
    import jax.numpy as jnp_  # noqa: F401

    hi, lo = x
    s = MP // 2
    while s >= 1:
        if interpret:
            rhi = jnp.roll(hi, s, axis=0)
            rlo = jnp.roll(lo, s, axis=0)
        else:
            from jax.experimental.pallas import tpu as pltpu

            rhi = pltpu.roll(hi, s, 0)
            rlo = pltpu.roll(lo, s, 0)
        hi, lo = ds.add_sloppy((hi, lo), (rhi, rlo))
        s //= 2
    return hi, lo


# sublane extent above which the kernel body switches from full-size
# butterfly all-reduces to slabbed halving contractions: at MP=1024,
# NP=5120 the butterfly path's full (MP, NP) two_prod temporaries need
# 223.7 MB of VMEM (v5e physical: 128 MB — probed via compile error);
# slabs keep the peak near ~100 MB and do 2N work instead of N log N.
_BIG_MP = 512


def _ds_rowdot2(col, M2, MP, interpret, slab=64):
    """DS contraction ``sum_r col[r] * M2[r, :]`` -> (1, X) for 2D arrays.

    Row-blocked (``slab`` sublanes at a time, halved via tile-aligned
    slices down to one 8-row f32 tile, 3-round butterfly to finish) so the
    peak VMEM holds one slab of two_prod temporaries instead of the full
    (MP, X) DS product.  With ``col = Vi`` and ``M2 = H`` (symmetric) this
    yields the (H Vi)^T row; with ``col = HVi`` and ``M2 = V`` it yields
    u = (H Vv)^T V."""
    ch, cl = col
    Mh, Ml = M2
    acc = None
    for r0 in range(0, MP, slab):
        hi, lo = ds.mul((ch[r0:r0 + slab], cl[r0:r0 + slab]),
                        (Mh[r0:r0 + slab], Ml[r0:r0 + slab]))
        size = min(slab, MP - r0)
        while size > 8:
            h = size // 2
            hi, lo = ds.add_sloppy((hi[:h, :], lo[:h, :]),
                                   (hi[h:size, :], lo[h:size, :]))
            size = h
        acc = (hi, lo) if acc is None else ds.add_sloppy(acc, (hi, lo))
    hi, lo = acc
    s = 4
    while s >= 1:
        if interpret:
            rhi = jnp.roll(hi, s, axis=0)
            rlo = jnp.roll(lo, s, axis=0)
        else:
            from jax.experimental.pallas import tpu as pltpu

            rhi = pltpu.roll(hi, s, 0)
            rlo = pltpu.roll(lo, s, 0)
        hi, lo = ds.add_sloppy((hi, lo), (rhi, rlo))
        s //= 2
    return hi[0:1, :], lo[0:1, :]


def _fw_kernel_body(m, MP, NP, K, away, interpret,
                    scal_ref, Vh_ref, Vl_ref,
                    xh_ref, xl_ref, wh_ref, wl_ref, Hh_ref, Hl_ref,
                    xh_o, xl_o, wh_o, wl_o, Hh_o, Hl_o, misc_o,
                    TAU_ref, TWV_ref, SP_ref, SN_ref):
    eps = scal_ref[0]
    xtol = scal_ref[1]
    kmax = scal_ref[2].astype(jnp.int32)  # dynamic budget this launch (<= K)

    if MP >= _BIG_MP:
        # do NOT load V wholesale: a full `ref[:]` load materializes a
        # V-sized value (40 MB at 1000x5000) on the VMEM stack; the slabbed
        # contraction/extract paths slice the refs per 64/128-row block
        V = (Vh_ref, Vl_ref)
    else:
        V = (Vh_ref[:], Vl_ref[:])
    Vh, Vl = V
    lane = lax.broadcasted_iota(jnp.int32, (1, NP), 1)
    laneK = lax.broadcasted_iota(jnp.int32, (1, K), 1)
    rr = lax.broadcasted_iota(jnp.int32, (MP, MP), 0)
    cc = lax.broadcasted_iota(jnp.int32, (MP, MP), 1)
    diag = rr == cc
    m_f = jnp.float32(m)
    # static double-single representation of 1/m (multiply, never divide)
    inv_m_hi = np.float32(1.0 / m)
    inv_m_lo = np.float32(1.0 / m - float(inv_m_hi))
    inv_m = (jnp.float32(inv_m_hi), jnp.float32(inv_m_lo))

    A = _ABLATE

    def body(state):
        (k, done, xh, xl, wh, wl, Hh, Hl, TAUb, TWVb, SPb, SNb) = state
        x = (xh, xl)
        w = (wh, wl)
        H = (Hh, Hl)
        kf32 = k.astype(jnp.float32)

        # EVERY reduction keeps dims (1, 1) and every "scalar" stays a
        # (1, 1) vector value: moving a value from the vector unit to the
        # scalar unit stalls until the whole in-flight vector pipeline
        # drains (~10 us with the deep DS chains here; measured — the
        # scalar-crossing version of this kernel ran 186 us/iteration, this
        # one ~8 us).  The ONLY per-launch crossing is the final misc write.
        if "select" in A:
            imask = lane == (k % jnp.int32(NP))
            jmask = imask
            wi = (jnp.full((1, 1), m_f) + 1.0e-7 * kf32,
                  jnp.zeros((1, 1), jnp.float32))
            wj = (jnp.full((1, 1), m_f) - 1.0e-7 * kf32,
                  jnp.zeros((1, 1), jnp.float32))
        else:
            # toward candidate: DS argmax of w (hi plane, lo tie-break),
            # first-index tie resolution via an iota-min, all vectorial
            wmax_hi = jnp.max(wh, keepdims=True)
            cand = wh == wmax_hi
            wmax_lo = jnp.max(jnp.where(cand, wl, -_BIG_F32), keepdims=True)
            cand2 = cand & (wl == wmax_lo)
            imin = jnp.min(jnp.where(cand2, lane, NP + 1), keepdims=True)
            imask = lane == imin
            wi = (wmax_hi, wmax_lo)

            if away:
                # away candidate: argmin over support of ww = w - wi
                # (reference tie-break: first min index of ww * (x > 1e-8),
                # D_opt_alg.py:146-148; masked entries sit at 0 = max(ww))
                mask = xh > xtol
                wwh, wwl = ds.sub(w, wi)
                mwh = jnp.where(mask, wwh, 0.0)
                mwl = jnp.where(mask, wwl, 0.0)
                mmin_hi = jnp.min(mwh, keepdims=True)
                candj = mwh == mmin_hi
                mmin_lo = jnp.min(jnp.where(candj, mwl, _BIG_F32),
                                  keepdims=True)
                candj2 = candj & (mwl == mmin_lo)
                jmin = jnp.min(jnp.where(candj2, lane, NP + 1), keepdims=True)
                jmask = lane == jmin
                # w_j = ww_j + w_i arithmetically (2^-49 DS rounding only)
                wj = ds.add((mmin_hi, mmin_lo), wi)
            else:
                # plain FW: min over support for SN; always step toward
                mask = xh > 0.0
                wmin_hi = jnp.min(jnp.where(mask, wh, _BIG_F32),
                                  keepdims=True)
                candj = mask & (wh == wmin_hi)
                wmin_lo = jnp.min(jnp.where(candj, wl, _BIG_F32),
                                  keepdims=True)
                wj = (wmin_hi, wmin_lo)
                jmask = imask  # unused

        # ---- slacks (multiply by the static DS 1/m; never divide) --------
        sp_ds = ds.mul(ds.add_f32(wi, -m_f), inv_m)          # wi/m - 1
        sn_ds = ds.mul(ds.add_f32(ds.neg(wj), m_f), inv_m)   # 1 - wj/m
        sp = sp_ds[0] + sp_ds[1]
        sn = sn_ds[0] + sn_ds[1]

        stop = (sp <= eps) & (sn <= eps)      # (1, 1) bool
        in_budget = k < kmax                  # scalar; broadcast is cheap

        # ---- unified toward/away step ------------------------------------
        # toward: tau = +t_t;  away: tau = -t_a.  Then for v in {i, j}:
        #   c      = tau / (1 + tau*(w_v - 1))
        #   H     <- (H - c * HVv HVv^T) / (1 - tau)
        #   w     <- (w - c * (HVv^T V)^2) / (1 - tau)
        #   x     <- x*(1 - tau), x_v += tau
        #   logdet += (m-1)*log1p(-tau) + log1p(tau*(w_v - 1))   [on host]
        # which reproduces both branches of D_opt_alg.py:162-179 exactly.
        t_t = _ds_div_fast(sp_ds, ds.add_f32(wi, -1.0), interpret)
        if "scalars" in A:
            vmask = imask
            wv = wi
            tau = (jnp.full((1, 1), 1.0e-7) + 1.0e-12 * kf32,
                   jnp.zeros((1, 1), jnp.float32))
            drop = sp < -1.0  # (1, 1) all-False
        elif away:
            xj = (jnp.sum(jnp.where(jmask, xh, 0.0), keepdims=True),
                  jnp.sum(jnp.where(jmask, xl, 0.0), keepdims=True))
            a1 = _ds_div_fast(sn_ds, ds.add_f32(wj, -1.0), interpret)
            a2 = _ds_div_fast(xj, ds.add_f32(ds.neg(xj), 1.0), interpret)
            # select-min lands on a2 if a1 is inf/nan (w_j == 1 divide)
            use_a1 = ds.lt(a1, a2)
            t_a = ds.where(use_a1, a1, a2)
            toward = sp >= sn                  # (1, 1) bool
            # boolean-select via logic ops (Mosaic cannot select_n on i1)
            vmask = (toward & imask) | (jnp.logical_not(toward) & jmask)
            wv = ds.where(toward, wi, wj)
            tau = ds.where(toward, t_t, ds.neg(t_a))
            # boundary away step drops coordinate j: zero it EXACTLY (the
            # DS residual otherwise parks ghost coords at the 1e-8 support
            # threshold; see _dopt_step_ds and the batch kernel)
            drop = jnp.logical_not(toward) & jnp.logical_not(use_a1)
        else:
            vmask = imask
            wv = wi
            tau = t_t
            drop = sp < -1.0  # (1, 1) all-False

        wv_m1 = ds.add_f32(wv, -1.0)
        c_ = _ds_div_fast(tau, ds.add_f32(ds.mul(tau, wv_m1), 1.0), interpret)
        one_m_tau = ds.add_f32(ds.neg(tau), 1.0)
        one_ds = (jnp.ones((1, 1), jnp.float32), jnp.zeros((1, 1), jnp.float32))
        r_tau = _ds_div_fast(one_ds, one_m_tau, interpret)

        if "extract" in A:
            Vi = (Vh[:, 0:1] + 1.0e-9 * kf32, Vl[:, 0:1])
        elif MP >= _BIG_MP:
            # slabbed masked column extract: the full-size wheres would
            # materialize two V-sized planes (~40 MB at 1000x5000)
            parts_h, parts_l = [], []
            for r0 in range(0, MP, 128):
                parts_h.append(jnp.sum(
                    jnp.where(vmask, Vh[r0:r0 + 128, :], 0.0),
                    axis=1, keepdims=True))
                parts_l.append(jnp.sum(
                    jnp.where(vmask, Vl[r0:r0 + 128, :], 0.0),
                    axis=1, keepdims=True))
            Vi = (jnp.concatenate(parts_h, 0), jnp.concatenate(parts_l, 0))
        else:
            # V[:, v] as a (MP, 1) DS column via a masked lane-reduction —
            # a dynamic pl.ds read would need the index on the scalar unit
            Vi = (jnp.sum(jnp.where(vmask, Vh, 0.0), axis=1, keepdims=True),
                  jnp.sum(jnp.where(vmask, Vl, 0.0), axis=1, keepdims=True))
        if MP >= _BIG_MP:
            # large m: slabbed halving contractions (2N work, slab-sized
            # temporaries) — the butterfly's full-size temps bust VMEM here
            HVi_row = _ds_rowdot2(Vi, H, MP, interpret)
            # column form: sublane-broadcast the row and extract the
            # diagonal with a lane reduction
            HVi_col = (jnp.sum(jnp.where(diag, HVi_row[0], 0.0), axis=1,
                               keepdims=True),
                       jnp.sum(jnp.where(diag, HVi_row[1], 0.0), axis=1,
                               keepdims=True))
        else:
            # R: every row holds (H Vv)^T — butterfly all-reduce over
            # sublanes of H[r,c] * Vi[r] (H symmetric: Vi^T H == (H Vi)^T)
            R = _ds_allreduce_sub(ds.mul(H, Vi), MP, interpret)
            HVi_row = (R[0][0:1, :], R[1][0:1, :])
            # column form via the diagonal mask (R[r, r] == HVi[r])
            HVi_col = (jnp.sum(jnp.where(diag, R[0], 0.0), axis=1,
                               keepdims=True),
                       jnp.sum(jnp.where(diag, R[1], 0.0), axis=1,
                               keepdims=True))

        # u = (H Vv)^T V, pinned so u[v] == w[v] exactly (d_opt.py:108-114)
        if "contract" in A:
            u = ds.mul_f32(w, jnp.float32(0.5))
        elif MP >= _BIG_MP:
            u = _ds_rowdot2(HVi_col, V, MP, interpret)
            u = ds.where(vmask, wv, u)
        else:
            u_full = _ds_allreduce_sub(ds.mul(HVi_col, V), MP, interpret)
            u = (u_full[0][0:1, :], u_full[1][0:1, :])
            u = ds.where(vmask, wv, u)

        w_new = ds.mul(ds.sub(w, ds.mul(c_, ds.sq(u))), r_tau)
        if MP >= _BIG_MP:
            # slabbed rank-1 H update (same association as the small path:
            # (H - c * col row) * r_tau, per 256-sublane block)
            parts_h, parts_l = [], []
            for r0 in range(0, MP, 256):
                col_s = (HVi_col[0][r0:r0 + 256, :],
                         HVi_col[1][r0:r0 + 256, :])
                H_s = (Hh[r0:r0 + 256, :], Hl[r0:r0 + 256, :])
                outer_s = ds.mul(col_s, HVi_row)
                s_h, s_l = ds.mul(ds.sub(H_s, ds.mul(c_, outer_s)), r_tau)
                parts_h.append(s_h)
                parts_l.append(s_l)
            H_new = (jnp.concatenate(parts_h, 0),
                     jnp.concatenate(parts_l, 0))
        else:
            outer = ds.mul(HVi_col, HVi_row)
            H_new = ds.mul(ds.sub(H, ds.mul(c_, outer)), r_tau)
        xs = ds.mul(x, one_m_tau)
        zero = jnp.zeros_like(sp)
        stepped = ds.where(drop, (zero, zero), ds.add(xs, tau))
        x_new = ds.where(vmask, stepped, xs)

        # logdet tracking happens on HOST from the recorded (tau, twv) rows
        tau_f = tau[0] + tau[1]
        twv = ds.mul(tau, wv_m1)
        twv_f = twv[0] + twv[1]

        # freeze when the stop criterion fired (the reference breaks BEFORE
        # applying the update, D_opt_alg.py:159-160) or the budget ran out;
        # done stays a (1, 1) f32 vector (Mosaic cannot carry i1 vectors)
        # and only crosses to the scalar unit once per _INNER block
        run = jnp.logical_not(stop) & (done < 0.5) & in_budget

        if "hist" not in A:
            krow = (laneK == k) & in_budget
            SPb = jnp.where(krow, sp, SPb)
            SNb = jnp.where(krow, sn, SNb)
            # frozen iterations record tau = twv = 0 (=> logdet increment 0)
            TAUb = jnp.where(krow & run, tau_f, TAUb)
            TWVb = jnp.where(krow & run, twv_f, TWVb)

        def sel(new, old):
            return jnp.where(run, new, old)

        # only in-budget checks may set done (a launch reports convergence
        # exactly as the old kcap-bounded loop did)
        done_new = jnp.maximum(done, jnp.where(stop & in_budget, 1.0, 0.0))
        return (k + 1, done_new,
                sel(x_new[0], xh), sel(x_new[1], xl),
                sel(w_new[0], wh), sel(w_new[1], wl),
                sel(H_new[0], Hh), sel(H_new[1], Hl),
                TAUb, TWVb, SPb, SNb)

    # Loop structure: an inner fori block of _INNER iterations runs purely on
    # the vector units (the per-iteration stop only freezes state through
    # where-selects); ONCE per block the done flag crosses to the scalar unit
    # (vector-pipeline drain, ~10 us) so the outer while can EXIT EARLY.
    # The outer condition itself reads scalars only.
    def outer_body(ostate):
        k0, done_s = ostate[0], ostate[1]
        state = (k0, jnp.full((1, 1), done_s)) + tuple(ostate[2:])
        state = lax.fori_loop(0, _INNER, lambda i, s: body(s), state)
        done_s2 = state[1][0, 0]  # the one vector->scalar crossing per block
        return (state[0], done_s2) + tuple(state[2:])

    def outer_cond(ostate):
        return (ostate[0] < kmax) & (ostate[1] < 0.5)

    zero_hist = jnp.zeros((1, K), jnp.float32)
    init = (jnp.int32(0), scal_ref[3],  # prior done flag (scalar read)
            xh_ref[:], xl_ref[:], wh_ref[:], wl_ref[:],
            Hh_ref[:], Hl_ref[:],
            zero_hist, zero_hist, zero_hist, zero_hist)
    out = lax.while_loop(outer_cond, outer_body, init)
    (k, done_s, xh, xl, wh, wl, Hh, Hl, TAUb, TWVb, SPb, SNb) = out

    xh_o[:] = xh
    xl_o[:] = xl
    wh_o[:] = wh
    wl_o[:] = wl
    Hh_o[:] = Hh
    Hl_o[:] = Hl
    misc_o[0] = done_s
    # rows that count toward the budget; the host finds the stopping row
    misc_o[1] = jnp.minimum(k, kmax).astype(jnp.float32)
    TAU_ref[:] = TAUb
    TWV_ref[:] = TWVb
    SP_ref[:] = SPb
    SN_ref[:] = SNb


@functools.lru_cache(maxsize=64)
def _build_chunk_fn(m, MP, NP, K, away, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_fw_kernel_body, m, MP, NP, K, away, interpret)
    f32 = jnp.float32
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, NP), f32),   # xh
            jax.ShapeDtypeStruct((1, NP), f32),   # xl
            jax.ShapeDtypeStruct((1, NP), f32),   # wh
            jax.ShapeDtypeStruct((1, NP), f32),   # wl
            jax.ShapeDtypeStruct((MP, MP), f32),  # Hh
            jax.ShapeDtypeStruct((MP, MP), f32),  # Hl
            jax.ShapeDtypeStruct((2,), f32),      # misc: done, niter
            jax.ShapeDtypeStruct((1, K), f32),    # TAU (logdet args, host log1p)
            jax.ShapeDtypeStruct((1, K), f32),    # TWV
            jax.ShapeDtypeStruct((1, K), f32),    # SP
            jax.ShapeDtypeStruct((1, K), f32),    # SN
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal (eps, xtol, kmax,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Vh      prior done)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Vl
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xh
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xl
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wh
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wl
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Hh
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Hl
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        # the 16 MB scoped-vmem default is a compiler knob; granting
        # headroom lets this kernel serve m*n into the millions (the V
        # planes + full-size DS temporaries are the footprint)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def _pad2(a, shape):
    out = np.zeros(shape, np.float64)
    out[tuple(slice(0, s) for s in a.shape)] = a
    return out


def _split64(a):
    hi = np.asarray(a, np.float32)
    lo = np.asarray(a - hi.astype(np.float64), np.float32)
    return hi, lo


def _factorize_np(V64, x64):
    """Fresh (H, w, logdet) in host float64 (cf. d_opt._dopt_factorize)."""
    m = V64.shape[0]
    VXVT = (V64 * x64) @ V64.T
    L = np.linalg.cholesky(VXVT)
    logdet = 2.0 * np.sum(np.log(np.diag(L)))
    Linv = np.linalg.solve(L, np.eye(m))
    H = Linv.T @ Linv
    W = Linv @ V64
    w = np.einsum("ij,ij->j", W, W)
    return H, w, logdet


_CKPT_VERSION = 1


def _pallas_ckpt_save(path, fp, x64, k_done, parts, t_spent):
    import os

    F_parts, SP_parts, SN_parts, T_parts = parts
    payload = dict(
        __v=np.asarray(_CKPT_VERSION), __fp=np.asarray(fp),
        __k=np.asarray(k_done), __t=np.asarray(t_spent), x=x64,
        F=(np.concatenate(F_parts) if F_parts else np.zeros(0)),
        SP=(np.concatenate(SP_parts) if SP_parts else np.zeros(0)),
        SN=(np.concatenate(SN_parts) if SN_parts else np.zeros(0)),
        T=(np.concatenate(T_parts) if T_parts else np.zeros(0)),
    )
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def _pallas_ckpt_load(path, fp):
    import os

    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        if int(z["__v"]) != _CKPT_VERSION:
            raise ValueError(f"pallas checkpoint {path!r}: incompatible "
                             "version; delete it to start fresh")
        if str(z["__fp"]) != fp:
            raise ValueError(
                f"pallas checkpoint {path!r} was saved by a different solve "
                f"({z['__fp']}); refusing to resume as {fp}")
        return (z["x"].copy(), int(z["__k"]), float(z["__t"]),
                [z["F"].copy()], [z["SP"].copy()], [z["SN"].copy()],
                [z["T"].copy()])


def dopt_fw_pallas(V, x0, eps, maxitrs, away=True, verbose=True, verbskip=1,
                   chunk=None, refresh_every=0, interpret=False,
                   checkpoint=None):
    """D-opt Frank-Wolfe(-away) with the whole iteration fused in one Pallas
    kernel (double-single precision).  Same contract as D_opt_FW_away:
    returns ``(x, F, SP, SN, T)`` truncated at the stopping iteration.

    ``refresh_every``: re-factorize (H, w, logdet) in host float64 every R
    iterations (at chunk boundaries) — belt-and-braces against DS drift on
    very long runs; the DS updates alone hold ~1e-12.
    ``interpret``: run the kernel in the Pallas interpreter (CPU testing).

    ``checkpoint``: path of an ``.npz`` snapshot saved at every
    launch-block boundary (the iterate x + histories + progress; the
    device-resident H/w/logdet are REBUILT from x by a fresh host-f64
    factorization on resume).  Resume therefore equals inserting a
    ``refresh_every`` boundary at the interruption point: the continued
    trajectory matches the uninterrupted one at the refresh level
    (~1e-12 DS drift reset), not bitwise — use ``u_mode="ds"`` when
    bitwise-exact resume matters (driver.py checkpoints).
    """
    V64 = np.asarray(V, np.float64)
    m, n = V64.shape
    x64 = np.asarray(x0, np.float64)
    if chunk is None:
        chunk = 8192
    if _next_pow2(max(m, 8)) >= _BIG_MP and not interpret:
        import warnings

        warnings.warn(
            f"u_mode='pallas' with m={m}: the fused kernel is for the "
            "latency-bound small/medium regime; at this size the XLA "
            "double-single scan (u_mode='ds') is ~8x faster (module "
            "docstring). Proceeding anyway.")
    MP = _next_pow2(max(m, 8))
    NP = -(-n // _LANE) * _LANE
    K = -(-int(chunk) // _INNER) * _INNER  # round up to the block size

    # Everything device-resident: through the axon tunnel every host<->device
    # round trip costs ~30 ms — more than the COMPUTE of an entire 5000-
    # iteration 30x1000 solve (~12 ms at ~2.2 us/iteration).  The launch loop
    # keeps (x, w, H) on device, feeds outputs straight back in, and fetches
    # per launch a single device_get of (misc, histories, x planes).
    Vp = _pad2(V64, (MP, NP))
    Vh, Vl = (jnp.asarray(a) for a in _split64(Vp))
    H, w, logdet = _factorize_np(V64, x64)
    xs = _split64(_pad2(x64[None, :], (1, NP)))
    wsp = _split64(_pad2(w[None, :], (1, NP)))
    Hsp = _split64(_pad2(H, (MP, MP)))
    state = {
        "x": tuple(jnp.asarray(a) for a in xs),
        "w": tuple(jnp.asarray(a) for a in wsp),
        "H": tuple(jnp.asarray(a) for a in Hsp),
        "ld": logdet,
        "done": 0.0,
    }

    fn = _build_chunk_fn(m, MP, NP, K, bool(away), bool(interpret))

    if verbose:
        name = ("Frank-Wolfe method with away steps" if away
                else "Frank-Wolfe method")
        print(f"\nSolving D-opt design problem using {name} "
              "(fused pallas kernel)")
        print("     k      F(x)     pos_slack   neg_slack    time")

    F_parts, SP_parts, SN_parts, T_parts = [], [], [], []
    k_done = 0
    t_prev = 0.0
    ckpt_fp = (f"dopt_fw_pallas|m={m}|n={n}|away={bool(away)}"
               f"|eps={float(eps)!r}")
    if checkpoint is not None:
        loaded = _pallas_ckpt_load(checkpoint, ckpt_fp)
        if loaded is not None:
            (x64c, k_done, t_prev, F_parts, SP_parts, SN_parts,
             T_parts) = loaded
            if x64c.shape != (n,):
                raise ValueError(
                    f"pallas checkpoint {checkpoint!r}: iterate length "
                    f"{x64c.shape} does not match n={n}")
            # resume = refresh at the interruption point: rebuild the
            # device state from a fresh host-f64 factorization of x
            H, w, logdet = _factorize_np(V64, x64c)
            xs = _split64(_pad2(x64c[None, :], (1, NP)))
            state = {
                "x": tuple(jnp.asarray(a) for a in xs),
                "w": tuple(jnp.asarray(a) for a in _split64(
                    _pad2(w[None, :], (1, NP)))),
                "H": tuple(jnp.asarray(a) for a in _split64(
                    _pad2(H, (MP, MP)))),
                "ld": logdet,
                "done": 0.0,
            }
            if (SP_parts[0].size
                    and SP_parts[0][-1] <= np.float32(eps)
                    and SN_parts[0][-1] <= np.float32(eps)):
                k_done = maxitrs  # saved run already converged: no launch
    t0 = time.time() - t_prev
    since_refresh = 0
    scal_dev = None
    scal_val = None
    xh, xl = xs  # final-x fallback when maxitrs == 0
    while k_done < maxitrs:
        scal = (np.float32(eps), np.float32(1.0e-8),
                np.float32(min(K, maxitrs - k_done)), np.float32(0.0))
        if scal != scal_val:  # reuse the device copy across launches
            scal_dev = jnp.asarray(np.array(scal, np.float32))
            scal_val = scal
        out = fn(scal_dev, Vh, Vl,
                 state["x"][0], state["x"][1], state["w"][0], state["w"][1],
                 state["H"][0], state["H"][1])
        (xh_d, xl_d, wh_d, wl_d, Hh_d, Hl_d,
         misc_d, TAU_d, TWV_d, SP_d, SN_d) = out
        # ONE round trip for everything the host needs; H/w stay on device
        (misc, TAUb, TWVb, SPb, SNb, xh, xl) = jax.device_get(
            (misc_d, TAU_d, TWV_d, SP_d, SN_d, xh_d, xl_d))
        t_b = time.time() - t0
        launched = int(misc[1])
        # the loop no longer early-exits on the stop flag (that would read
        # vector state in the condition); frozen rows repeat the stopping
        # slacks, so truncate at the FIRST row meeting the criterion
        nv = launched
        if misc[0] > 0.5 and launched:
            # compare in f32 like the kernel did: if np.float32(eps) rounds
            # UP from the f64 eps, the kernel can stop with a recorded f32
            # slack in (eps, f32(eps)] that an f64 comparison would miss,
            # leaving the frozen repeat rows untruncated
            eps32 = np.float32(eps)
            hit = np.flatnonzero((SPb[0, :launched] <= eps32)
                                 & (SNb[0, :launched] <= eps32))
            if hit.size:
                nv = int(hit[0]) + 1
        t_a = T_parts[-1][-1] if T_parts and len(T_parts[-1]) else 0.0
        # F history reconstructed on host: the kernel records the logdet
        # increment arguments (tau, tau*(w_v-1)) per iteration and the host
        # pays the log1p cost once per chunk instead of ~1.3 us per scalar
        # log in-kernel.  F[k] is the objective BEFORE iteration k's update.
        tau_rows = TAUb[0, :nv].astype(np.float64)
        twv_rows = TWVb[0, :nv].astype(np.float64)
        incs = (m - 1.0) * np.log1p(-tau_rows) + np.log1p(twv_rows)
        ld_rows = state["ld"] + np.concatenate([[0.0], np.cumsum(incs)[:-1]])
        state["ld"] = state["ld"] + float(np.sum(incs))
        F_parts.append(-ld_rows)
        SP_parts.append(SPb[0, :nv])
        SN_parts.append(SNb[0, :nv])
        T_parts.append(t_a + (t_b - t_a) * (np.arange(nv) + 1) / max(nv, 1))

        if verbose:
            for jrow in range(nv):
                kk = k_done + jrow
                if kk % verbskip == 0:
                    print("{0:6d}  {1:10.3e}  {2:10.3e}  {3:10.3e}  {4:6.1f}"
                          .format(kk, F_parts[-1][jrow], SP_parts[-1][jrow],
                                  SN_parts[-1][jrow], T_parts[-1][jrow]))

        state["x"] = (xh_d, xl_d)
        state["w"] = (wh_d, wl_d)
        state["H"] = (Hh_d, Hl_d)
        state["done"] = float(misc[0])
        k_done += nv
        since_refresh += nv
        if checkpoint is not None:
            x64c = (xh[0, :n].astype(np.float64)
                    + xl[0, :n].astype(np.float64))
            _pallas_ckpt_save(checkpoint, ckpt_fp, x64c, k_done,
                              (F_parts, SP_parts, SN_parts, T_parts),
                              time.time() - t0)
        if misc[0] > 0.5 or nv == 0:
            break
        if refresh_every and since_refresh >= refresh_every:
            x64c = (xh[0, :n].astype(np.float64)
                    + xl[0, :n].astype(np.float64))
            H, w, logdet = _factorize_np(V64, x64c)
            state["w"] = tuple(
                jnp.asarray(a) for a in _split64(_pad2(w[None, :], (1, NP))))
            state["H"] = tuple(
                jnp.asarray(a) for a in _split64(_pad2(H, (MP, MP))))
            state["ld"] = logdet
            since_refresh = 0

    # the final x planes were already fetched in the last launch round trip
    x_out = xh[0, :n].astype(np.float64) + xl[0, :n].astype(np.float64)
    F = np.concatenate(F_parts) if F_parts else np.zeros(0)
    SP = np.concatenate(SP_parts) if SP_parts else np.zeros(0)
    SN = np.concatenate(SN_parts) if SN_parts else np.zeros(0)
    T = np.concatenate(T_parts) if T_parts else np.zeros(0)
    return x_out, F, SP, SN, T


# --------------------------------------------------------------------------
# Batched-instance kernel: K sweep instances advance in LOCKSTEP inside one
# kernel, sharing every per-iteration op.  The single-instance kernel is
# op-count-bound (~10.7 us/iteration regardless of n), so running B
# instances as a leading array dimension amortizes that floor ~B ways —
# this is the TPU equivalent of the reference's sequential repeat loops
# (SURVEY.md §6, ipynb/ABPGvsFW/ex_Dopt_FW_m80.ipynb:cell3) at sweep
# scales (m ~ 30-80, n ~ 200-2000).
#
# Layout: V (B, MP, NP), H (B, MP, MP), x/w (B, 1, NP), every "scalar" a
# (B, 1, 1) vector value.  Selection reduces over lanes (axis 2); the
# HVi / u contractions reduce over the padded-m axis 1 — halving static
# slices while the extent exceeds one 8-row f32 tile (contiguous
# tile-aligned slices are views: ~2N work vs the butterfly's N log N),
# then a 3-round butterfly on the final 8 rows.  Per-instance freeze via
# (B, 1, 1) done flags; the ONLY vector->scalar crossing is min(done)
# once per _INNER block for the early exit.
# --------------------------------------------------------------------------


def _ds_allreduce_ax1(x, MP, interpret):
    """Butterfly all-reduce of a (B, MP, X) DS array along axis 1."""
    hi, lo = x
    s = MP // 2
    while s >= 1:
        if interpret:
            rhi = jnp.roll(hi, s, axis=1)
            rlo = jnp.roll(lo, s, axis=1)
        else:
            from jax.experimental.pallas import tpu as pltpu

            rhi = pltpu.roll(hi, s, 1)
            rlo = pltpu.roll(lo, s, 1)
        hi, lo = ds.add_sloppy((hi, lo), (rhi, rlo))
        s //= 2
    return hi, lo


def _ds_rowdot(col, V, MP, interpret):
    """DS contraction ``sum_r col[:, r] * V[:, r, :]`` -> (B, 1, NP).

    Row-blocked: 8-row slabs are multiplied and folded sequentially so the
    peak VMEM footprint is one slab of two_prod temporaries, not the full
    (B, MP, NP) DS product (which blew the 16 MB scoped-vmem budget at
    group >= 11); a 3-round butterfly finishes the last 8 rows."""
    ch, cl = col
    Vh, Vl = V
    acc = None
    for r0 in range(0, MP, 8):
        blk = ds.mul((ch[:, r0:r0 + 8, :], cl[:, r0:r0 + 8, :]),
                     (Vh[:, r0:r0 + 8, :], Vl[:, r0:r0 + 8, :]))
        acc = blk if acc is None else ds.add_sloppy(acc, blk)
    hi, lo = acc
    s = 4
    while s >= 1:
        if interpret:
            rhi = jnp.roll(hi, s, axis=1)
            rlo = jnp.roll(lo, s, axis=1)
        else:
            from jax.experimental.pallas import tpu as pltpu

            rhi = pltpu.roll(hi, s, 1)
            rlo = pltpu.roll(lo, s, 1)
        hi, lo = ds.add_sloppy((hi, lo), (rhi, rlo))
        s //= 2
    return hi[:, 0:1, :], lo[:, 0:1, :]


def _fw_kernel_body_b(m, MP, NP, K, B, away, interpret,
                      scal_ref, Vh_ref, Vl_ref,
                      xh_ref, xl_ref, wh_ref, wl_ref, Hh_ref, Hl_ref,
                      dh_ref,
                      xh_o, xl_o, wh_o, wl_o, Hh_o, Hl_o, dh_o, misc_o,
                      TAU_ref, TWV_ref, SP_ref, SN_ref):
    eps = scal_ref[0]
    xtol = scal_ref[1]
    kmax = scal_ref[2].astype(jnp.int32)

    Vh = Vh_ref[:]
    Vl = Vl_ref[:]
    V = (Vh, Vl)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, NP), 2)
    laneR = lax.broadcasted_iota(jnp.int32, (1, 1, _ROLL), 2)
    rr = lax.broadcasted_iota(jnp.int32, (1, MP, MP), 1)
    cc = lax.broadcasted_iota(jnp.int32, (1, MP, MP), 2)
    diag = rr == cc
    m_f = jnp.float32(m)
    inv_m_hi = np.float32(1.0 / m)
    inv_m_lo = np.float32(1.0 / m - float(inv_m_hi))
    inv_m = (jnp.float32(inv_m_hi), jnp.float32(inv_m_lo))

    def body(state):
        (k, done, xh, xl, wh, wl, Hh, Hl, TAUb, TWVb, SPb, SNb) = state
        x = (xh, xl)
        w = (wh, wl)
        H = (Hh, Hl)

        # toward candidate per instance: DS argmax over lanes
        wmax_hi = jnp.max(wh, axis=2, keepdims=True)
        cand = wh == wmax_hi
        wmax_lo = jnp.max(jnp.where(cand, wl, -_BIG_F32), axis=2,
                          keepdims=True)
        cand2 = cand & (wl == wmax_lo)
        imin = jnp.min(jnp.where(cand2, lane, NP + 1), axis=2, keepdims=True)
        imask = lane == imin
        wi = (wmax_hi, wmax_lo)

        if away:
            mask = xh > xtol
            wwh, wwl = ds.sub(w, wi)
            mwh = jnp.where(mask, wwh, 0.0)
            mwl = jnp.where(mask, wwl, 0.0)
            mmin_hi = jnp.min(mwh, axis=2, keepdims=True)
            candj = mwh == mmin_hi
            mmin_lo = jnp.min(jnp.where(candj, mwl, _BIG_F32), axis=2,
                              keepdims=True)
            candj2 = candj & (mwl == mmin_lo)
            jmin = jnp.min(jnp.where(candj2, lane, NP + 1), axis=2,
                           keepdims=True)
            jmask = lane == jmin
            wj = ds.add((mmin_hi, mmin_lo), wi)
        else:
            mask = xh > 0.0
            wmin_hi = jnp.min(jnp.where(mask, wh, _BIG_F32), axis=2,
                              keepdims=True)
            candj = mask & (wh == wmin_hi)
            wmin_lo = jnp.min(jnp.where(candj, wl, _BIG_F32), axis=2,
                              keepdims=True)
            wj = (wmin_hi, wmin_lo)
            jmask = imask

        sp_ds = ds.mul(ds.add_f32(wi, -m_f), inv_m)
        sn_ds = ds.mul(ds.add_f32(ds.neg(wj), m_f), inv_m)
        sp = sp_ds[0] + sp_ds[1]
        sn = sn_ds[0] + sn_ds[1]
        stop = (sp <= eps) & (sn <= eps)      # (B, 1, 1)
        in_budget = k < kmax

        t_t = _ds_div_fast(sp_ds, ds.add_f32(wi, -1.0), interpret)
        if away:
            xj = (jnp.sum(jnp.where(jmask, xh, 0.0), axis=2, keepdims=True),
                  jnp.sum(jnp.where(jmask, xl, 0.0), axis=2, keepdims=True))
            a1 = _ds_div_fast(sn_ds, ds.add_f32(wj, -1.0), interpret)
            a2 = _ds_div_fast(xj, ds.add_f32(ds.neg(xj), 1.0), interpret)
            use_a1 = ds.lt(a1, a2)
            t_a = ds.where(use_a1, a1, a2)
            toward = sp >= sn
            vmask = (toward & imask) | (jnp.logical_not(toward) & jmask)
            wv = ds.where(toward, wi, wj)
            tau = ds.where(toward, t_t, ds.neg(t_a))
            # boundary away step drops coordinate j: zero it EXACTLY (the
            # DS residual otherwise parks ghost coords at the 1e-8 support
            # threshold; see _dopt_step_ds)
            drop = jnp.logical_not(toward) & jnp.logical_not(use_a1)
        else:
            vmask = imask
            wv = wi
            tau = t_t
            drop = sp < -1.0  # (B, 1, 1) all-False

        wv_m1 = ds.add_f32(wv, -1.0)
        c_ = _ds_div_fast(tau, ds.add_f32(ds.mul(tau, wv_m1), 1.0), interpret)
        one_m_tau = ds.add_f32(ds.neg(tau), 1.0)
        one_ds = (jnp.ones_like(sp), jnp.zeros_like(sp))
        r_tau = _ds_div_fast(one_ds, one_m_tau, interpret)

        Vi = (jnp.sum(jnp.where(vmask, Vh, 0.0), axis=2, keepdims=True),
              jnp.sum(jnp.where(vmask, Vl, 0.0), axis=2, keepdims=True))
        # R[b, r, c] = sum_r' H[b, r', c] Vi[b, r'] = (H Vi)[b, c] in every
        # row (H symmetric); row/col forms without a transpose
        R = _ds_allreduce_ax1(ds.mul(H, Vi), MP, interpret)
        HVi_row = (R[0][:, 0:1, :], R[1][:, 0:1, :])
        HVi_col = (jnp.sum(jnp.where(diag, R[0], 0.0), axis=2, keepdims=True),
                   jnp.sum(jnp.where(diag, R[1], 0.0), axis=2, keepdims=True))

        u = _ds_rowdot(HVi_col, V, MP, interpret)
        u = ds.where(vmask, wv, u)  # consistency pin u[v] == w[v]

        w_new = ds.mul(ds.sub(w, ds.mul(c_, ds.sq(u))), r_tau)
        # Mosaic can't broadcast a 3D (B,1,1) into both sublanes AND lanes
        # in one op, and chained vector.broadcasts refold at the MLIR level,
        # so no (B,1,1) scalar may meet an (B,MP,MP) operand.  Reassociate
        # H_new = H*r_tau - (c*r_tau)*(HVi_col x HVi_row): the rank-1 term
        # folds its scalars into the (B,MP,1) column factor; r_tau reaches
        # H as a lane-replicated (B,1,MP) row built by an unfoldable add
        # with an exact-zero row (x*0 is not folded for floats).
        zrow = H[0][:, 0:1, :] * 0.0                      # (B, 1, MP)
        r_row = (r_tau[0] + zrow, r_tau[1] + zrow)
        a_col = ds.mul(ds.mul(c_, r_tau), HVi_col)        # (B, MP, 1)
        H_new = ds.sub(ds.mul(H, r_row), ds.mul(a_col, HVi_row))
        xs = ds.mul(x, one_m_tau)
        zero = jnp.zeros_like(sp)
        stepped = ds.where(drop, (zero, zero), ds.add(xs, tau))
        x_new = ds.where(vmask, stepped, xs)

        tau_f = tau[0] + tau[1]
        twv = ds.mul(tau, wv_m1)
        twv_f = twv[0] + twv[1]

        run = jnp.logical_not(stop) & (done < 0.5) & in_budget  # (B, 1, 1)

        krow = (laneR == (k % _ROLL)) & in_budget
        SPb = jnp.where(krow, sp, SPb)
        SNb = jnp.where(krow, sn, SNb)
        TAUb = jnp.where(krow & run, tau_f, TAUb)
        TWVb = jnp.where(krow & run, twv_f, TWVb)

        def sel(new, old):
            return jnp.where(run, new, old)

        run_row = jnp.where(run, 1.0, 0.0) + zrow         # (B, 1, MP)

        def selH(new, old):
            return jnp.where(run_row > 0.5, new, old)

        done_new = jnp.maximum(done, jnp.where(stop & in_budget, 1.0, 0.0))
        return (k + 1, done_new,
                sel(x_new[0], xh), sel(x_new[1], xl),
                sel(w_new[0], wh), sel(w_new[1], wl),
                selH(H_new[0], Hh), selH(H_new[1], Hl),
                TAUb, TWVb, SPb, SNb)

    def outer_body(ostate):
        from jax.experimental import pallas as pl

        (k0, _ad, done, xh, xl, wh, wl, Hh, Hl) = ostate
        zr = jnp.zeros((B, 1, _ROLL), jnp.float32)
        state = (k0, done, xh, xl, wh, wl, Hh, Hl, zr, zr, zr, zr)
        state = lax.fori_loop(0, _ROLL, lambda i, s: body(s), state)
        (k, done, xh, xl, wh, wl, Hh, Hl, TAUr, TWVr, SPr, SNr) = state
        off = k0 if interpret else pl.multiple_of(k0, _ROLL)
        TAU_ref[:, :, pl.ds(off, _ROLL)] = TAUr
        TWV_ref[:, :, pl.ds(off, _ROLL)] = TWVr
        SP_ref[:, :, pl.ds(off, _ROLL)] = SPr
        SN_ref[:, :, pl.ds(off, _ROLL)] = SNr
        all_done = jnp.min(done)  # one vector->scalar crossing per block
        return (k, all_done, done, xh, xl, wh, wl, Hh, Hl)

    def outer_cond(ostate):
        return (ostate[0] < kmax) & (ostate[1] < 0.5)

    done0 = dh_ref[:]
    init = (jnp.int32(0), jnp.min(done0), done0,
            xh_ref[:], xl_ref[:], wh_ref[:], wl_ref[:],
            Hh_ref[:], Hl_ref[:])
    out = lax.while_loop(outer_cond, outer_body, init)
    (k, _alld, done_vec, xh, xl, wh, wl, Hh, Hl) = out

    xh_o[:] = xh
    xl_o[:] = xl
    wh_o[:] = wh
    wl_o[:] = wl
    Hh_o[:] = Hh
    Hl_o[:] = Hl
    dh_o[:] = done_vec
    misc_o[0] = jnp.minimum(k, kmax).astype(jnp.float32)


@functools.lru_cache(maxsize=64)
def _build_chunk_fn_b(m, MP, NP, K, B, away, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_fw_kernel_body_b, m, MP, NP, K, B, away,
                               interpret)
    f32 = jnp.float32
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, NP), f32),   # xh
            jax.ShapeDtypeStruct((B, 1, NP), f32),   # xl
            jax.ShapeDtypeStruct((B, 1, NP), f32),   # wh
            jax.ShapeDtypeStruct((B, 1, NP), f32),   # wl
            jax.ShapeDtypeStruct((B, MP, MP), f32),  # Hh
            jax.ShapeDtypeStruct((B, MP, MP), f32),  # Hl
            jax.ShapeDtypeStruct((B, 1, 1), f32),    # done flags
            jax.ShapeDtypeStruct((1,), f32),         # misc: niter
            jax.ShapeDtypeStruct((B, 1, K), f32),    # TAU
            jax.ShapeDtypeStruct((B, 1, K), f32),    # TWV
            jax.ShapeDtypeStruct((B, 1, K), f32),    # SP
            jax.ShapeDtypeStruct((B, 1, K), f32),    # SN
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]  # eps, xtol, kmax
        + [vm] * 9,
        out_specs=(vm, vm, vm, vm, vm, vm, vm,
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   vm, vm, vm, vm),
        # the default 16 MB scoped-vmem cap is a compiler knob, not the
        # physical limit; the (B,1,NP) values pad their singleton sublane
        # 8x on the stack, so grant headroom up to the hardware's VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def dopt_fw_pallas_batch(Vs, x0s, eps, maxitrs, away=True, verbose=False,
                         chunk=None, refresh_every=0, interpret=False,
                         group=None):
    """Batch of D-opt FW(-away) instances in lockstep inside the fused
    Pallas kernel (double-single precision).  TPU-native equivalent of the
    reference's sequential sweep loops; same return contract as
    ``parallel.batched.dopt_fw_batch``: ``(x, F, SP, SN)`` with leading
    batch axis (instances that stop early freeze and their history rows
    repeat the stopping values).

    ``group``: instances per kernel launch — bounded by the ~16 MB scoped
    VMEM (the V planes plus the (B, MP, NP) DS reduce intermediates cost
    ~4.5 MP*NP doubles per instance; measured: 16 instances of 30x1000 hit
    17.2 MB).  Default auto-sizes to fit; groups run sequentially.
    """
    Vs64 = np.asarray(Vs, np.float64)
    Kinst, m, n = Vs64.shape
    x0s64 = np.asarray(x0s, np.float64)
    if chunk is None:
        chunk = 4096
    MP = _next_pow2(max(m, 8))
    NP = -(-n // _LANE) * _LANE
    KB = -(-int(chunk) // _ROLL) * _ROLL
    if group is None:
        # measured on v5e (30x1000): B=16 is the throughput sweet spot
        # (0.407 s vs 2x0.43 at B=8 and 1.22 s at B=32 for the same 16/32
        # instances — per-op cost grows with B once ops stop being
        # overhead-bound); VMEM caps the rest (~90 MB budget under the
        # raised compiler limit).
        per_inst = (4.5 * MP * NP + 8 * MP * MP + 8 * NP) * 8.0
        group = max(1, min(Kinst, 16, int(90e6 // per_inst)))

    xs_out = np.zeros((Kinst, n))
    F_groups, SP_groups, SN_groups = [], [], []
    for g0 in range(0, Kinst, group):
        gi = list(range(g0, min(g0 + group, Kinst)))
        B = len(gi)
        Vp = np.zeros((B, MP, NP))
        ld0 = np.zeros(B)
        xh = np.zeros((B, 1, NP), np.float32)
        xl = np.zeros_like(xh)
        wh = np.zeros_like(xh)
        wl = np.zeros_like(xh)
        Hh = np.zeros((B, MP, MP), np.float32)
        Hl = np.zeros_like(Hh)
        for b, kk in enumerate(gi):
            Vp[b, :m, :n] = Vs64[kk]
            H, w, logdet = _factorize_np(Vs64[kk], x0s64[kk])
            ld0[b] = logdet
            xh[b, 0, :n], xl[b, 0, :n] = _split64(x0s64[kk])
            wh[b, 0, :n], wl[b, 0, :n] = _split64(w)
            Hh[b, :m, :m], Hl[b, :m, :m] = _split64(H)
        Vh_d, Vl_d = (jnp.asarray(a) for a in _split64(Vp))
        state = {
            "x": (jnp.asarray(xh), jnp.asarray(xl)),
            "w": (jnp.asarray(wh), jnp.asarray(wl)),
            "H": (jnp.asarray(Hh), jnp.asarray(Hl)),
            "done": jnp.zeros((B, 1, 1), jnp.float32),
            "ld": ld0.copy(),
        }
        fn = _build_chunk_fn_b(m, MP, NP, KB, B, bool(away), bool(interpret))

        F_parts, SP_parts, SN_parts = [], [], []
        k_done = 0
        since_refresh = 0
        xh_h, xl_h = xh, xl
        while k_done < maxitrs:
            scal = jnp.asarray(np.array(
                [eps, 1.0e-8, min(KB, maxitrs - k_done)], np.float32))
            out = fn(scal, Vh_d, Vl_d,
                     state["x"][0], state["x"][1],
                     state["w"][0], state["w"][1],
                     state["H"][0], state["H"][1], state["done"])
            (xh_d, xl_d, wh_d, wl_d, Hh_d, Hl_d, dn_d, misc_d,
             TAU_d, TWV_d, SP_d, SN_d) = out
            (misc, dn, TAUb, TWVb, SPb, SNb, xh_h, xl_h) = jax.device_get(
                (misc_d, dn_d, TAU_d, TWV_d, SP_d, SN_d, xh_d, xl_d))
            nv = int(misc[0])
            if nv == 0:
                break
            tau_rows = TAUb[:, 0, :nv].astype(np.float64)
            twv_rows = TWVb[:, 0, :nv].astype(np.float64)
            incs = (m - 1.0) * np.log1p(-tau_rows) + np.log1p(twv_rows)
            csum = np.cumsum(incs, axis=1)
            ld_rows = state["ld"][:, None] + np.concatenate(
                [np.zeros((B, 1)), csum[:, :-1]], axis=1)
            state["ld"] = state["ld"] + csum[:, -1]
            F_parts.append(-ld_rows)
            SP_parts.append(SPb[:, 0, :nv])
            SN_parts.append(SNb[:, 0, :nv])

            state["x"] = (xh_d, xl_d)
            state["w"] = (wh_d, wl_d)
            state["H"] = (Hh_d, Hl_d)
            state["done"] = dn_d
            k_done += nv
            since_refresh += nv
            if verbose:
                ndone = int((dn[:, 0, 0] > 0.5).sum())
                print(f"[pallas-batch] instances {gi[0]}-{gi[-1]}: "
                      f"k={k_done}, converged {ndone}/{B}, "
                      f"max slack {float(SPb[:, 0, nv - 1].max()):.3e}")
            if dn.min() > 0.5:
                break
            if refresh_every and since_refresh >= refresh_every:
                x_now = (xh_h[:, 0, :n].astype(np.float64)
                         + xl_h[:, 0, :n].astype(np.float64))
                wh2 = np.zeros_like(wh)
                wl2 = np.zeros_like(wl)
                Hh2 = np.zeros_like(Hh)
                Hl2 = np.zeros_like(Hl)
                for b, kk in enumerate(gi):
                    Hn, wn, ldn = _factorize_np(Vs64[kk], x_now[b])
                    wh2[b, 0, :n], wl2[b, 0, :n] = _split64(wn)
                    Hh2[b, :m, :m], Hl2[b, :m, :m] = _split64(Hn)
                    state["ld"][b] = ldn
                state["w"] = (jnp.asarray(wh2), jnp.asarray(wl2))
                state["H"] = (jnp.asarray(Hh2), jnp.asarray(Hl2))
                since_refresh = 0

        xs_out[gi] = (xh_h[:, 0, :n].astype(np.float64)
                      + xl_h[:, 0, :n].astype(np.float64))
        F_groups.append(np.concatenate(F_parts, axis=1) if F_parts
                        else np.zeros((B, 0)))
        SP_groups.append(np.concatenate(SP_parts, axis=1) if SP_parts
                         else np.zeros((B, 0)))
        SN_groups.append(np.concatenate(SN_parts, axis=1) if SN_parts
                         else np.zeros((B, 0)))

    # groups may stop at different row counts; pad with frozen repeats
    T = max(g.shape[1] for g in F_groups)

    def _pad(groups):
        out = []
        for g in groups:
            if g.shape[1] < T:
                pad = np.repeat(g[:, -1:], T - g.shape[1], axis=1)
                g = np.concatenate([g, pad], axis=1)
            out.append(g)
        return np.concatenate(out, axis=0)

    return xs_out, _pad(F_groups), _pad(SP_groups), _pad(SN_groups)
