"""Lazy-H fused Pallas kernel for LARGE-m D-optimal design Frank-Wolfe.

The big-m regime (m >= ~512) defeats both prior engines:

* the XLA double-single scan (algorithms/d_opt.py ``_dopt_step_ds``) is
  HBM-bound — every iteration streams the packed int8 design planes
  (35 MB at 1000x5000) plus several m^2 double-single passes for the
  rank-1 H update, measured 146-157 us/iteration;
* the dense Pallas kernel (ops/pallas_dopt.py) keeps V in VMEM but lowers
  every DS op over the m^2 H planes as its own full-array VMEM pass
  (measured 1.9 ms/iteration at 1000x5000 — see its module docstring).

This kernel removes BOTH walls with two structural changes:

1. **Lazy H factorization.**  Instead of materializing the rank-1 update
   H <- (H - c g g^T) / (1 - tau) each iteration, the kernel carries

       H_k = alpha_k * H0  +  C diag(beta) C^T

   where H0 is FROZEN for a launch block: each iteration appends g = H v
   as a row of C (a masked row write) and rescales the SCALARS alpha and
   beta by 1/(1-tau).  No m^2 work per iteration.  Between launches a
   small XLA jit folds the rank block back: H0' = alpha H0 + C diag(b) C^T
   (exact int8 Ozaki gram + DS combine), and re-packs H0' into int8 digit
   planes.  A toward step has tau <= 1/m (tau = (w_i - m)/(m (w_i - 1))),
   so alpha grows at most (1 - 1/m)^-KR per block; away steps shrink it by
   prod(1 - x_j) >= exp(-sum x_j) — both orders of magnitude inside f32
   range for any real block.

2. **All O(mn) and O(m^2) contractions on the int8 MXU from VMEM.**  The
   packed digit planes of V (pack_digit_planes layout, 8 levels) and of H0
   stay VMEM-resident across every iteration of a launch; u = (Hv)^T V and
   H0 v are single int8 matmuls with exact int32 accumulation and an exact
   diagonal DS combine (the ozaki_gemv_packed_ds construction, inlined in
   Mosaic).  Measured: the (8,1024)x(1024,40960) u contraction that costs
   ~81 us/iteration from HBM in the XLA scan runs at ~2.2 us from VMEM.

Numerical contract: identical in kind to ``u_mode="ds"`` — double-single
state, ~1e-12-relative u, final quality certified by a FRESH f64
factorization (never by incremental histories).  The effective design
matrix is the 48-bit packed-digit representation of V (the same planes the
u-update contracts), a ~1e-14 relative perturbation of V64.

Reference semantics: /root/reference/accbpg/D_opt_alg.py:91-185 (away) and
:9-88 (plain FW), with the documented deviations of algorithms/d_opt.py
(log-space determinant, u[v] = w[v] consistency pin).

VMEM budget at 1000x5000 (v5e, 128 MB): V planes 40 MB + H0 planes 8.4 MB
+ rank buffers ~2.5 MB + vectors/histories < 1 MB, slabbed matmul
temporaries ~10 MB — comfortably under the 110 MB compiler grant.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import double_single as ds
from . import mixed_precision as mp
from .pallas_dopt import (_BIG_F32, _INNER, _ds_div_fast, _factorize_np,
                          _next_pow2, _pad2, _pallas_ckpt_load,
                          _pallas_ckpt_save, _split64)

_LANE = 128
LEV = 8           # int8 digit levels for V and H0 (48 bits ~ DS precision)
_MAX_DIAG = 5     # digit diagonals kept in the combines.  Round-5 A/B
                  # ladder (bench at 1000x5000, certified -5.4e-12 at every
                  # step): 9 -> 0.931 s, 7 -> 0.875, 6 -> 0.813, 5 -> 0.755
                  # (= 427x, 36.4 us/iter); dropped terms at 5 are
                  # <= 64^-8 ~ 3.5e-15 relative, i.e. AT the DS significand
                  # (2^-49) — iteration counts and slacks unchanged to 5
                  # digits.  4 (2.2e-13) FAILS the 1e-9 cross-engine parity
                  # tests: do not go lower.
_KR = 256         # iterations per launch block == rank-buffer capacity

# development aid (cf. pallas_dopt._ABLATE): kernel-body stages to skip when
# profiling ("extract", "h0v", "corr", "udot", "wupd", "append", "select").
# Clear _build_lazy_chunk_fn.cache_clear() after changing.  Never set in
# production paths.
_ABLATE: frozenset = frozenset()
# Vi-extraction strategy (round 5, VERDICT r4 #5): False = the one-hot
# slab dot (reads all of V_packed, ~13 us at 42 MB); True = scalar-crossing
# dynamic 128-lane windows + one tiny selection dot (reads LEV*MP*128
# bytes).  A module flag, not a kwarg: the AOT cache keys on the package
# source digest, so flipping it can never serve a stale executable; builder
# lru_caches must be cleared by dev scripts that flip it at runtime.
# Measured A/B at 1000x5000 (interleaved min-of-10): one degraded-tunnel
# session gave a TIE (171.6 vs 172.9 us/iter), a second gave window
# -15% (181.0 vs 213.8) — noise-bound but sign-consistent with the 40x
# smaller read; trajectories are BIT-IDENTICAL both modes (on-chip
# iteration counts and slacks match to the last digit).  Window is the
# default since round 5.
_EXTRACT_WINDOW = True
# matmul slab width (lanes) for the big packed-V dots: full-ref operands
# would materialize a 40 MB stack value per dot (probed OOM at 110 MB)
_SLAB = 10240


def _combine_diag(P, width, sB, sA, max_diag=_MAX_DIAG):
    """Exact diagonal combine of an int8-digit product (the
    ozaki_gemv_packed_ds construction, Mosaic-friendly form).

    P: (LEV, LEV*width) int32 — P[la, lb*width + j] = <a-digits la, B-digits
    lb> for output j.  Returns DS (1, width) = sA * sB * sum_d 64^-(d+2) *
    diag_d.  Leading diagonals (d < 3) accumulate exactly through
    int32->DS conversion; the geometrically vanishing tail (<= 64^-5
    relative) folds in plain f32 — identical error structure to
    mixed_precision.ozaki_mm_ds.  int32 diagonal sums stay exact for
    m * 65^2 * LEV < 2^31 (m <= ~63k)."""
    out_hi = jnp.zeros((1, width), jnp.float32)
    out_lo = jnp.zeros((1, width), jnp.float32)
    tail = jnp.zeros((1, width), jnp.float32)
    for d in range(min(max_diag, 2 * LEV - 2) + 1):
        acc = None
        for la in range(max(0, d - LEV + 1), min(d, LEV - 1) + 1):
            lb = d - la
            t = P[la:la + 1, lb * width:(lb + 1) * width]
            acc = t if acc is None else acc + t
        scale = jnp.float32(64.0 ** -(d + 2))
        if d < 3:
            hi = acc.astype(jnp.float32)
            lo = (acc - hi.astype(jnp.int32)).astype(jnp.float32)
            out_hi, out_lo = ds.add((out_hi, out_lo),
                                    (hi * scale, lo * scale))
        else:
            tail = tail + acc.astype(jnp.float32) * scale
    out = ds.add((out_hi, out_lo), (tail, jnp.zeros_like(tail)))
    # sA and sB are exact powers of two: plain per-plane scaling is exact
    s = sA * sB
    return (out[0] * s, out[1] * s)


def _digit_rows(x, inv_s):
    """Digit-split a DS (1, m) row into (LEV, m) int8 planes under the
    exact power-of-two scale 1/s (digit_split_vector_ds, inlined)."""
    rh = x[0] * inv_s
    rl = x[1] * inv_s
    planes = []
    for _ in range(LEV):
        d = jnp.round(rh * 64.0)
        planes.append(d.astype(jnp.int8))
        nh = rh * 64.0 - d
        rh, rl = ds.two_sum(nh, rl * 64.0)
    return jnp.concatenate(planes, axis=0)


def _lazy_kernel_body(m, MP, NP, KR, away, interpret,
                      scal_ref, vp_ref, sv_ref, hp_ref, sh_ref,
                      xh_ref, xl_ref, wh_ref, wl_ref,
                      xh_o, xl_o, wh_o, wl_o, CTh_o, CTl_o, bh_o, bl_o,
                      misc_o, TAU_ref, TAUl_ref, TWV_ref, TWVl_ref,
                      SP_ref, SN_ref):
    f32 = jnp.float32
    m_f = f32(m)
    eps = scal_ref[0]
    xtol = scal_ref[1]
    kmax = scal_ref[2].astype(jnp.int32)

    A = _ABLATE
    lane = lax.broadcasted_iota(jnp.int32, (1, NP), 1)
    laneK = lax.broadcasted_iota(jnp.int32, (1, KR), 1)
    subK = lax.broadcasted_iota(jnp.int32, (KR, 1), 0)
    # packed-lane slab layout for the big V dots (variable last slab)
    slabs = []
    s0 = 0
    while s0 < LEV * NP:
        slabs.append((s0, min(_SLAB, LEV * NP - s0)))
        s0 += _SLAB
    # static DS 1/m (exact split of the python double)
    inv_m_hi = np.float32(1.0 / m)
    inv_m = (jnp.full((1, 1), inv_m_hi),
             jnp.full((1, 1), np.float32(1.0 / m - float(inv_m_hi))))

    def body(state):
        (k, done, xh, xl, wh, wl, CTh, CTl, bh, bl, alh, all_,
         TAUb, TAUlb, TWVb, TWVlb, SPb, SNb) = state
        x = (xh, xl)
        w = (wh, wl)

        # ---- toward candidate: DS argmax of w (hi, lo tie-break) ----------
        wmax_hi = jnp.max(wh, keepdims=True)
        cand = wh == wmax_hi
        wmax_lo = jnp.max(jnp.where(cand, wl, -_BIG_F32), keepdims=True)
        cand2 = cand & (wl == wmax_lo)
        imin = jnp.min(jnp.where(cand2, lane, NP + 1), keepdims=True)
        imask = lane == imin
        wi = (wmax_hi, wmax_lo)

        if away:
            # away pivot: the reference's argmin(w - wi) over the support
            # equals argmin(w) — subtracting the scalar wi is a monotone
            # shift under the lexicographic (hi, lo) = total-value order —
            # so select w[j]'s STORED pair directly (round 5: drops a full
            # (1, NP) DS subtraction per iteration, and wj becomes the
            # exact carried value instead of a sub/add round trip)
            mask = xh > xtol
            mwh = jnp.where(mask, wh, _BIG_F32)
            wmin_hi = jnp.min(mwh, keepdims=True)
            candj = mask & (wh == wmin_hi)
            wmin_lo = jnp.min(jnp.where(candj, wl, _BIG_F32), keepdims=True)
            candj2 = candj & (wl == wmin_lo)
            jmin = jnp.min(jnp.where(candj2, lane, NP + 1), keepdims=True)
            jmask = lane == jmin
            wj = (wmin_hi, wmin_lo)
        else:
            mask = xh > 0.0
            wmin_hi = jnp.min(jnp.where(mask, wh, _BIG_F32), keepdims=True)
            candj = mask & (wh == wmin_hi)
            wmin_lo = jnp.min(jnp.where(candj, wl, _BIG_F32), keepdims=True)
            wj = (wmin_hi, wmin_lo)
            jmask = imask  # unused

        sp_ds = ds.mul(ds.add_f32(wi, -m_f), inv_m)
        sn_ds = ds.mul(ds.add_f32(ds.neg(wj), m_f), inv_m)
        sp = sp_ds[0] + sp_ds[1]
        sn = sn_ds[0] + sn_ds[1]
        stop = (sp <= eps) & (sn <= eps)
        in_budget = k < kmax

        # scalar DS divisions batched LANE-WISE (round 5): every (1, 1)
        # primitive runs on a full 8x128 tile anyway, so packing the
        # independent divisions into one (1, k) call divides their ~25-
        # primitive long-division cost by k.  Lane values are identical
        # to the separate calls (same arithmetic per lane) — trajectories
        # are bit-unchanged.
        def _cat(*vals):
            return (jnp.concatenate([v[0] for v in vals], axis=1),
                    jnp.concatenate([v[1] for v in vals], axis=1))

        def _lane(q, i):
            return (q[0][:, i:i + 1], q[1][:, i:i + 1])

        if away:
            xj = (jnp.sum(jnp.where(jmask, xh, 0.0), keepdims=True),
                  jnp.sum(jnp.where(jmask, xl, 0.0), keepdims=True))
            q1 = _ds_div_fast(
                _cat(sp_ds, sn_ds, xj),
                _cat(ds.add_f32(wi, -1.0), ds.add_f32(wj, -1.0),
                     ds.add_f32(ds.neg(xj), 1.0)), interpret)
            t_t, a1, a2 = _lane(q1, 0), _lane(q1, 1), _lane(q1, 2)
            use_a1 = ds.lt(a1, a2)
            t_a = ds.where(use_a1, a1, a2)
            toward = sp >= sn
            vmask = (toward & imask) | (jnp.logical_not(toward) & jmask)
            wv = ds.where(toward, wi, wj)
            tau = ds.where(toward, t_t, ds.neg(t_a))
            drop = jnp.logical_not(toward) & jnp.logical_not(use_a1)
        else:
            t_t = _ds_div_fast(sp_ds, ds.add_f32(wi, -1.0), interpret)
            vmask = imask
            wv = wi
            tau = t_t
            drop = sp < -1.0  # all-False

        wv_m1 = ds.add_f32(wv, -1.0)
        one_ds = (jnp.ones((1, 1), f32), jnp.zeros((1, 1), f32))
        q2 = _ds_div_fast(
            _cat(tau, one_ds),
            _cat(ds.add_f32(ds.mul(tau, wv_m1), 1.0),
                 ds.add_f32(ds.neg(tau), 1.0)), interpret)
        c_, r_tau = _lane(q2, 0), _lane(q2, 1)
        one_m_tau = ds.add_f32(ds.neg(tau), 1.0)

        # ---- Vi digits via one-hot int8 matmul ---------------------------
        # column v of V, as its LEV packed digit rows: OH[p, l] = 1 iff
        # packed lane p == l*NP + v; (LEV*NP, 8) x (MP, LEV*NP)^T contracted
        # per slab (a full-ref operand would be a 40 MB stack value)
        vq = imin if not away else jnp.min(jnp.where(vmask, lane, NP + 1),
                                           keepdims=True)
        if "extract" in A:
            # loop-invariant digits (hoisted by Mosaic — times the kernel
            # with the extraction dots absent)
            Vi_d = lax.broadcasted_iota(jnp.int32, (8, MP), 1) % 63
        elif _EXTRACT_WINDOW:
            # scalar-crossing route: one 128-lane dynamic window per digit
            # level (128-aligned, the Mosaic DMA/slice rule), concatenated,
            # then ONE tiny selection dot — reads LEV*MP*128 bytes instead
            # of all of V_packed
            from jax.experimental import pallas as pl

            vqs = vq[0, 0]                       # vector -> scalar crossing
            v8 = (vqs // 128) * 128
            off = vqs - v8
            wins = [vp_ref[:, pl.ds(l * NP + v8, 128)] for l in range(LEV)]
            W8 = jnp.concatenate(wins, axis=1)   # (MP, LEV*128) int8
            pidx = lax.broadcasted_iota(jnp.int32, (LEV, LEV * 128), 1)
            lidx = lax.broadcasted_iota(jnp.int32, (LEV, LEV * 128), 0)
            oh = (pidx == lidx * 128 + off).astype(jnp.int8)
            Vi_d = lax.dot_general(oh, W8, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        else:
            Vi_d = jnp.zeros((8, MP), jnp.int32)
            for s0, sw in slabs:
                p = lax.broadcasted_iota(jnp.int32, (sw, 8), 0) + s0
                lev_i = lax.broadcasted_iota(jnp.int32, (sw, 8), 1)
                ohs = (p == lev_i * NP + vq).astype(jnp.int8)
                Vi_d = Vi_d + lax.dot_general(
                    ohs, vp_ref[:, s0:s0 + sw], (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
        # dequantize: Vi = sV[v] * sum_l d_l 64^-(l+1) as TWO exact int32
        # Horner halves (round 5; replaces a 8-step DS Horner of ~40
        # primitives).  Each half sums 4 rounded base-64 digits
        # (|d| <= 33): |sum| <= 33*(64^3+64^2+64+1) ~ 2^23.1, exact in
        # int32 AND in its f32 convert; the two power-of-two scaled
        # halves then combine by one two_sum into the exact DS value.
        sv_v = jnp.sum(jnp.where(vmask, sv_ref[:], 0.0), keepdims=True)
        hi_i = Vi_d[0:1, :]
        for l in range(1, 4):
            hi_i = hi_i * 64 + Vi_d[l:l + 1, :]
        lo_i = Vi_d[4:5, :]
        for l in range(5, LEV):
            lo_i = lo_i * 64 + Vi_d[l:l + 1, :]
        acc = ds.two_sum(hi_i.astype(f32) * f32(64.0 ** -4),
                         lo_i.astype(f32) * f32(64.0 ** -8))
        Vi = (acc[0] * sv_v, acc[1] * sv_v)  # sV is a power of two: exact

        # ---- H0 v via the packed-H0 int8 GEMV ----------------------------
        if "h0v" in A:
            H0Vi = Vi
        else:
            Vi8 = Vi_d.astype(jnp.int8)  # digits, |d| <= 65
            PH = lax.dot_general(Vi8, hp_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
            H0Vi = _combine_diag(PH, MP, sh_ref[:], sv_v)  # (1, MP) DS

        # ---- rank-buffer correction: C diag(beta) C^T Vi -----------------
        if "corr" in A:
            HVi = ds.mul((alh, all_), H0Vi)
        else:
            ph, pl_ = ds.mul((CTh, CTl), Vi)
            ctv = ds.sum_along((ph, pl_), 1, keepdims=True, sloppy=True)
            z = ds.mul((bh, bl), ctv)
            qh, ql = ds.mul((CTh, CTl), z)
            size = KR
            while size > 1:
                half = size // 2
                qh, ql = ds.add_sloppy((qh[:half], ql[:half]),
                                       (qh[half:size], ql[half:size]))
                size = half
            HVi = ds.add(ds.mul((alh, all_), H0Vi), (qh, ql))  # (1, MP)

        # ---- u = (H v)^T V via the packed-V int8 GEMV --------------------
        if "udot" in A:
            u = (jnp.zeros((1, NP), f32) + wv[0]
                 + HVi[0][0:1, 0:1] * f32(1e-30),
                 jnp.zeros((1, NP), f32))
        else:
            mx = jnp.max(jnp.abs(HVi[0]), keepdims=True) + f32(1e-30)
            sA = jnp.exp2(jnp.ceil(jnp.log2(mx)))
            A8 = _digit_rows(HVi, 1.0 / sA)  # (LEV, MP) int8
            PU_parts = []
            for s0, sw in slabs:
                PU_parts.append(lax.dot_general(
                    A8, vp_ref[:, s0:s0 + sw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32))
            PU = (PU_parts[0] if len(PU_parts) == 1
                  else jnp.concatenate(PU_parts, axis=1))
            u = _combine_diag(PU, NP, sv_ref[:], sA)
        # consistency pin u[v] = w[v] (exact line-search property)
        u = ds.where(vmask, wv, u)

        if "wupd" in A:
            w_new = u
        else:
            w_new = ds.mul(ds.sub(w, ds.mul(c_, ds.sq(u))), r_tau)

        # ---- lazy rank-1: append g, rescale the scalars ------------------
        run = jnp.logical_not(stop) & (done < 0.5) & in_budget
        if "append" in A:
            b_new = (bh, bl)
            al_new = (alh, all_)
        else:
            rowmask = (subK == k) & run
            CTh = jnp.where(rowmask, HVi[0], CTh)
            CTl = jnp.where(rowmask, HVi[1], CTl)
            b_app = (jnp.where(rowmask, -c_[0], bh),
                     jnp.where(rowmask, -c_[1], bl))
            b_new = ds.mul(b_app, r_tau)
            al_new = ds.mul((alh, all_), r_tau)

        xs = ds.mul(x, one_m_tau)
        zero = jnp.zeros_like(sp)
        stepped = ds.where(drop, (zero, zero), ds.add(xs, tau))
        x_new = ds.where(vmask, stepped, xs)

        # tau and twv recorded as DS PAIRS: the host reconstructs logdet
        # increments in f64 from hi+lo, matching the DS scan's F history
        # to ~1e-12 instead of the old f32-rounded ~1e-4 (VERDICT r4 #9)
        twv = ds.mul(tau, wv_m1)

        krow = (laneK == k) & in_budget
        SPb = jnp.where(krow, sp, SPb)
        SNb = jnp.where(krow, sn, SNb)
        TAUb = jnp.where(krow & run, tau[0], TAUb)
        TAUlb = jnp.where(krow & run, tau[1], TAUlb)
        TWVb = jnp.where(krow & run, twv[0], TWVb)
        TWVlb = jnp.where(krow & run, twv[1], TWVlb)

        def sel(new, old):
            return jnp.where(run, new, old)

        done_new = jnp.maximum(done, jnp.where(stop & in_budget, 1.0, 0.0))
        return (k + 1, done_new,
                sel(x_new[0], xh), sel(x_new[1], xl),
                sel(w_new[0], wh), sel(w_new[1], wl),
                CTh, CTl,
                sel(b_new[0], bh), sel(b_new[1], bl),
                sel(al_new[0], alh), sel(al_new[1], all_),
                TAUb, TAUlb, TWVb, TWVlb, SPb, SNb)

    def outer_body(ostate):
        k0, done_s = ostate[0], ostate[1]
        state = (k0, jnp.full((1, 1), done_s)) + tuple(ostate[2:])
        state = lax.fori_loop(0, _INNER, lambda i, s: body(s), state)
        done_s2 = state[1][0, 0]  # one vector->scalar crossing per block
        return (state[0], done_s2) + tuple(state[2:])

    def outer_cond(ostate):
        return (ostate[0] < kmax) & (ostate[1] < 0.5)

    f32 = jnp.float32
    zero_hist = jnp.zeros((1, KR), f32)
    init = (jnp.int32(0), scal_ref[3],
            xh_ref[:], xl_ref[:], wh_ref[:], wl_ref[:],
            jnp.zeros((KR, MP), f32), jnp.zeros((KR, MP), f32),
            jnp.zeros((KR, 1), f32), jnp.zeros((KR, 1), f32),
            jnp.ones((1, 1), f32), jnp.zeros((1, 1), f32),
            zero_hist, zero_hist, zero_hist, zero_hist, zero_hist,
            zero_hist)
    out = lax.while_loop(outer_cond, outer_body, init)
    (k, done_s, xh, xl, wh, wl, CTh, CTl, bh, bl, alh, all_,
     TAUb, TAUlb, TWVb, TWVlb, SPb, SNb) = out

    xh_o[:] = xh
    xl_o[:] = xl
    wh_o[:] = wh
    wl_o[:] = wl
    CTh_o[:] = CTh
    CTl_o[:] = CTl
    bh_o[:] = bh
    bl_o[:] = bl
    misc_o[0] = done_s
    misc_o[1] = jnp.minimum(k, kmax).astype(jnp.float32)
    misc_o[2] = alh[0, 0]
    misc_o[3] = all_[0, 0]
    TAU_ref[:] = TAUb
    TAUl_ref[:] = TAUlb
    TWV_ref[:] = TWVb
    TWVl_ref[:] = TWVlb
    SP_ref[:] = SPb
    SN_ref[:] = SNb


@functools.lru_cache(maxsize=16)
def _build_lazy_chunk_fn(m, MP, NP, KR, away, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_lazy_kernel_body, m, MP, NP, KR, away,
                               interpret)
    f32 = jnp.float32
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, NP), f32),    # xh
            jax.ShapeDtypeStruct((1, NP), f32),    # xl
            jax.ShapeDtypeStruct((1, NP), f32),    # wh
            jax.ShapeDtypeStruct((1, NP), f32),    # wl
            jax.ShapeDtypeStruct((KR, MP), f32),   # CTh (g rows)
            jax.ShapeDtypeStruct((KR, MP), f32),   # CTl
            jax.ShapeDtypeStruct((KR, 1), f32),    # beta hi
            jax.ShapeDtypeStruct((KR, 1), f32),    # beta lo
            jax.ShapeDtypeStruct((4,), f32),       # misc: done, niter, alpha
            jax.ShapeDtypeStruct((1, KR), f32),    # TAU hi
            jax.ShapeDtypeStruct((1, KR), f32),    # TAU lo
            jax.ShapeDtypeStruct((1, KR), f32),    # TWV hi
            jax.ShapeDtypeStruct((1, KR), f32),    # TWV lo
            jax.ShapeDtypeStruct((1, KR), f32),    # SP
            jax.ShapeDtypeStruct((1, KR), f32),    # SN
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal
            pl.BlockSpec(memory_space=pltpu.VMEM),   # V packed digits
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sV
            pl.BlockSpec(memory_space=pltpu.VMEM),   # H0 packed digits
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sH0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xh
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xl
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wh
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wl
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 8
        + (pl.BlockSpec(memory_space=pltpu.SMEM),)
        + (pl.BlockSpec(memory_space=pltpu.VMEM),) * 6,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return jax.jit(call)


@functools.partial(jax.jit, static_argnames=("lev",))
def _lazy_refresh(H0h, H0l, CTh, CTl, bh, bl, al, lev=LEV):
    """Fold the launch block's rank buffer back into H0 and re-pack:

        H0' = alpha * H0 + C diag(beta) C^T

    C diag(b) C^T through the exact int8 Ozaki gram with DS combine
    (zero rows — frozen/unused slots — contribute exactly zero), the
    alpha scaling and add in DS, then fresh int8 digit planes of H0' for
    the next launch's MXU GEMV."""
    Ch, Cl = CTh.T, CTl.T                      # (MP, KR)
    Cbh, Cbl = ds.mul((Ch, Cl), (bh.T, bl.T))
    dA, sA = mp.digit_split_rows_ds(Cbh, Cbl, 7)
    dW, sW = mp.digit_split_rows_ds(Ch, Cl, 7)
    Gh, Gl = mp.ozaki_gram_ds(dA, sA, dW, sW)
    al_ds = (al[0], al[1])
    Hh, Hl = ds.add(ds.mul(al_ds, (H0h, H0l)), (Gh, Gl))
    dH, sH = mp.digit_split_matrix_ds(Hh, Hl, lev)
    return Hh, Hl, mp.pack_digit_planes(dH), sH.reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("lev",))
def _fresh_w(H0h, H0l, V_packed, sV, Vh, Vl, lev=LEV):
    """Device-side fresh w = diag(V^T H0 V) from the CARRIED folded H0
    (round 5): after a fold, H0 IS the current inverse (alpha reset to 1,
    rank buffer empty), so w_j = v_j^T H0 v_j recomputed against the
    packed design planes resets the w-recurrence drift (~m*2^-49 per
    block chain) WITHOUT the host-f64 refactorization that cost ~0.5 s
    per instance at 1000x2000 (measured: host-refresh sweeps spent 4x
    their kernel time in numpy Cholesky).  One int8 MXU GEMM
    (``ozaki_mm_ds``) + a DS elementwise contract; residual drift is the H0
    fold's own ~1e-12 per block, far below 1e-8 slack bars."""
    HV = mp.ozaki_mm_ds(H0h, H0l, V_packed, sV, levels_b=lev, levels_m=lev)
    wf = ds.sum_along(ds.mul((Vh, Vl), HV), 0, keepdims=True)
    return wf


@functools.partial(jax.jit, static_argnames=("lev",))
def _pack_h0(H0h, H0l, lev=LEV):
    dH, sH = mp.digit_split_matrix_ds(H0h, H0l, lev)
    return mp.pack_digit_planes(dH), sH.reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("lev",))
def _pack_v(Vh, Vl, lev=LEV):
    """Device-side packing of the design planes (the host numpy digit
    split measured 1.5-4.4 s at 1024x5120 — more than an entire 20k-
    iteration solve on this kernel).  The effective design matrix becomes
    the 48-bit double-single representation of V64 — the same ~1e-14
    relative perturbation class as the host split."""
    dV, sV = mp.digit_split_matrix_ds(Vh, Vl, lev)
    return mp.pack_digit_planes(dV), sV.reshape(1, -1)


@functools.lru_cache(maxsize=16)
def _build_multi_block(m, MP, NP, KR, away, interpret, nblocks):
    """One jitted dispatch running ``nblocks`` (kernel -> H0 refresh)
    rounds as a lax.scan: through the axon tunnel each dispatch costs
    ~2-4 ms, which at 3 dispatches per 256-iteration block dominated the
    kernel ~30x."""
    import sys

    # jax's MLIR lowering recurses through the nested
    # scan/pallas/while/fori structure; with x64 enabled the default
    # 1000-frame limit overflows at production block counts
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    call = _build_lazy_chunk_fn(m, MP, NP, KR, away, interpret)

    def multi(scal_base, rem0, V_packed, sV, H0h, H0l, H0p, sH0,
              xh, xl, wh, wl):
        def blk(carry, _):
            (xh, xl, wh, wl, H0h, H0l, H0p, sH0, done, rem) = carry
            # per-block budget threaded through the carry: blocks past the
            # budget (or past convergence) get kmax=0 and freeze
            kmax = jnp.minimum(jnp.float32(KR), rem)
            scal = scal_base.at[2].set(kmax).at[3].set(done)
            (xh2, xl2, wh2, wl2, CTh, CTl, bh, bl, misc,
             TAU, TAUl, TWV, TWVl, SP, SN) = call(scal, V_packed, sV,
                                                  H0p, sH0, xh, xl, wh, wl)
            H0h2, H0l2, H0p2, sH02 = _lazy_refresh(H0h, H0l, CTh, CTl,
                                                   bh, bl, misc[2:4])
            done2 = jnp.maximum(done, misc[0])
            rem2 = jnp.maximum(rem - misc[1], 0.0)
            return ((xh2, xl2, wh2, wl2, H0h2, H0l2, H0p2, sH02, done2,
                     rem2), (misc, TAU, TAUl, TWV, TWVl, SP, SN))

        init = (xh, xl, wh, wl, H0h, H0l, H0p, sH0, jnp.float32(0.0),
                jnp.float32(rem0))
        carry, hists = lax.scan(blk, init, None, length=nblocks)
        return carry, hists

    return jax.jit(multi)


@functools.lru_cache(maxsize=16)
def _get_multi_executable(m, MP, NP, KR, away, nblocks):
    """AOT-compiled multi-block executable with the driver's persistent
    disk cache (algorithms/driver.py): a fresh process deserializes in
    ~0.1 s instead of paying the 1-10 minute remote Mosaic compile of the
    scan-of-kernel program.  Falls back to the plain jit on any failure
    (caller handles None)."""
    import hashlib
    import os

    from ..algorithms import driver as drv

    if jax.default_backend() != "tpu" or len(jax.devices()) != 1:
        return None
    adir = drv._aot_dir()
    if not adir:
        return None
    f32 = jnp.float32
    avals = (
        jax.ShapeDtypeStruct((4,), f32),            # scal_base
        jax.ShapeDtypeStruct((), f32),              # rem0
        jax.ShapeDtypeStruct((MP, LEV * NP), jnp.int8),
        jax.ShapeDtypeStruct((1, NP), f32),         # sV
        jax.ShapeDtypeStruct((MP, MP), f32),        # H0h
        jax.ShapeDtypeStruct((MP, MP), f32),        # H0l
        jax.ShapeDtypeStruct((MP, LEV * MP), jnp.int8),
        jax.ShapeDtypeStruct((1, MP), f32),         # sH0
        jax.ShapeDtypeStruct((1, NP), f32),         # xh
        jax.ShapeDtypeStruct((1, NP), f32),         # xl
        jax.ShapeDtypeStruct((1, NP), f32),         # wh
        jax.ShapeDtypeStruct((1, NP), f32),         # wl
    )
    try:
        dev = jax.devices()[0]
        ident = "|".join(map(str, (
            jax.__version__, getattr(dev, "device_kind", dev),
            drv._package_source_digest(), "pallas_lazy_multi",
            m, MP, NP, KR, away, nblocks, LEV, _MAX_DIAG, _SLAB)))
        path = os.path.join(
            adir, hashlib.sha256(ident.encode()).hexdigest() + ".jaxexe")
    except Exception:
        return None
    if os.path.exists(path):
        try:
            return drv._aot_load(path)
        except Exception:
            pass
    multi = _build_multi_block(m, MP, NP, KR, away, False, nblocks)
    try:
        exe = multi.lower(*avals).compile()
        drv._aot_save(path, exe)
        return exe
    except Exception:
        return None


def dopt_fw_pallas_lazy(V, x0, eps, maxitrs, away=True, verbose=True,
                        verbskip=1, chunk=None, refresh_every=0,
                        interpret=False, checkpoint=None, group=None):
    """Large-m D-opt FW(-away) via the lazy-H fused Pallas kernel.  Same
    contract as ``D_opt_FW_away`` — see ``_impl`` below.  The engine is
    all-f32/int8 (host numpy does the f64 work); tracing it under global
    x64 both changes nothing numerically and overflows Python's recursion
    limit in jax's lowering at production block counts, so x64 is locally
    disabled for the TPU path.  The CPU/interpret path KEEPS x64: the
    XLA:CPU error-free transforms are f64-backed there
    (double_single.F64_FALLBACK, the round-3 miscompile workaround)."""
    import contextlib

    on_tpu = jax.default_backend() == "tpu" and not interpret
    ctx = jax.enable_x64(False) if on_tpu else contextlib.nullcontext()
    with ctx:
        return _dopt_fw_pallas_lazy_impl(
            V, x0, eps, maxitrs, away=away, verbose=verbose,
            verbskip=verbskip, chunk=chunk, refresh_every=refresh_every,
            interpret=interpret, checkpoint=checkpoint, group=group)


def _dopt_fw_pallas_lazy_impl(V, x0, eps, maxitrs, away=True, verbose=True,
                              verbskip=1, chunk=None, refresh_every=0,
                              interpret=False, checkpoint=None, group=None):
    """Same
    contract as ``D_opt_FW_away``: returns ``(x, F, SP, SN, T)`` truncated
    at the stopping iteration.

    ``group``: launches dispatched per host round trip — the kernel + its
    refresh jit chain device-side without synchronization; one device_get
    fetches the group's histories.  Convergence inside a group costs at
    most group-1 frozen (no-op) launches.

    ``refresh_every``: additional full host-f64 refactorization cadence
    (belt-and-braces against DS drift; the per-launch H0 folds alone hold
    ~1e-12).  NOTE: the kernel runs in launch blocks of ``_KR`` (=256)
    iterations, so the effective cadence is rounded UP to the next block
    boundary — ``refresh_every=100`` refactorizes every ~256 iterations,
    not every 100.  ``checkpoint``: .npz snapshot at group boundaries; resume
    re-factorizes from the saved iterate (see dopt_fw_pallas)."""
    V64 = np.asarray(V, np.float64)
    m, n = V64.shape
    x64 = np.asarray(x0, np.float64)
    KR = _KR
    MP = _next_pow2(max(m, 8))
    NP = -(-n // _LANE) * _LANE

    # design planes packed ON DEVICE from the DS split (host numpy split
    # costs seconds at this size; see _pack_v)
    Vp = _pad2(V64, (MP, NP))
    Vh, Vl = (jnp.asarray(a) for a in _split64(Vp))
    V_packed, sV_dev = _pack_v(Vh, Vl)

    def fresh_state(x64c):
        H, w, logdet = _factorize_np(V64, x64c)
        H0h, H0l = (jnp.asarray(a) for a in _split64(_pad2(H, (MP, MP))))
        H0p, sH0 = _pack_h0(H0h, H0l)
        return {
            "x": tuple(jnp.asarray(a) for a in
                       _split64(_pad2(x64c[None, :], (1, NP)))),
            "w": tuple(jnp.asarray(a) for a in
                       _split64(_pad2(w[None, :], (1, NP)))),
            "H0": (H0h, H0l), "H0p": H0p, "sH0": sH0,
            "ld": logdet,
        }

    if verbose:
        name = ("Frank-Wolfe method with away steps" if away
                else "Frank-Wolfe method")
        print(f"\nSolving D-opt design problem using {name} "
              "(lazy-H fused pallas kernel)")
        print("     k      F(x)     pos_slack   neg_slack    time")

    F_parts, SP_parts, SN_parts, T_parts = [], [], [], []
    k_done = 0
    t_prev = 0.0
    ckpt_fp = (f"dopt_fw_pallas_lazy|m={m}|n={n}|away={bool(away)}"
               f"|eps={float(eps)!r}")
    x64c = x64
    if checkpoint is not None:
        loaded = _pallas_ckpt_load(checkpoint, ckpt_fp)
        if loaded is not None:
            (x64c, k_done, t_prev, F_parts, SP_parts, SN_parts,
             T_parts) = loaded
            if x64c.shape != (n,):
                raise ValueError(
                    f"pallas checkpoint {checkpoint!r}: iterate length "
                    f"{x64c.shape} does not match n={n}")
            if (SP_parts[0].size
                    and SP_parts[0][-1] <= np.float32(eps)
                    and SN_parts[0][-1] <= np.float32(eps)):
                k_done = maxitrs
    state = fresh_state(x64c)
    t0 = time.time() - t_prev
    since_refresh = 0
    eps32 = np.float32(eps)
    xh_h = np.asarray(state["x"][0])
    xl_h = np.asarray(state["x"][1])
    stopped = False

    scal_base = jnp.asarray(np.array(
        (eps32, np.float32(1.0e-8), np.float32(KR), np.float32(0.0)),
        np.float32))
    if group is None:
        # one dispatch for the whole budget: each host sync through the
        # axon tunnel costs ~250 ms — more than the COMPUTE of 20k
        # iterations.  Block counts round up to a power of two so only
        # O(log) executables ever compile; excess blocks freeze (kmax=0)
        # at ~0.5 ms each.
        nb_group = _next_pow2(max(1, -(-maxitrs // KR)))
        nb_group = min(nb_group, 256)
        if refresh_every:
            # host refactorization cadence needs a sync at that boundary
            # (ceil: refresh_every < KR still syncs every block)
            nb_group = min(nb_group,
                           _next_pow2(max(1, -(-refresh_every // KR))))
        if checkpoint is not None:
            nb_group = min(nb_group, 32)  # snapshot cadence
    else:
        nb_group = max(1, int(group))
    multi = None
    if not interpret:
        multi = _get_multi_executable(m, MP, NP, KR, bool(away), nb_group)
    if multi is None:
        multi = _build_multi_block(m, MP, NP, KR, bool(away),
                                   bool(interpret), nb_group)
    # the wall-time basis starts AFTER the executable is fetched/compiled:
    # a cold remote Mosaic compile (minutes) is not solve time (the bench
    # contract excludes compilation, like the reference's BLAS warmup)
    t0 = time.time() - t_prev

    while k_done < maxitrs and not stopped:
        carry, hists = multi(scal_base, jnp.float32(maxitrs - k_done),
                             V_packed, sV_dev,
                             state["H0"][0], state["H0"][1],
                             state["H0p"], state["sH0"],
                             state["x"][0], state["x"][1],
                             state["w"][0], state["w"][1])
        (xh_d, xl_d, wh_d, wl_d, H0h, H0l, H0p, sH0, done_d,
         rem_d) = carry
        state["x"] = (xh_d, xl_d)
        state["w"] = (wh_d, wl_d)
        state["H0"] = (H0h, H0l)
        state["H0p"] = H0p
        state["sH0"] = sH0
        (miscs, TAUs, TAUls, TWVs, TWVls, SPs, SNs, xh_h,
         xl_h) = jax.device_get(hists + (xh_d, xl_d))
        t_b = time.time() - t0
        t_a = T_parts[-1][-1] if T_parts and len(T_parts[-1]) else 0.0
        rows_before = k_done
        for b in range(nb_group):
            misc = miscs[b]
            launched = int(misc[1])
            nv = launched
            if misc[0] > 0.5 and launched:
                hit = np.flatnonzero((SPs[b, 0, :launched] <= eps32)
                                     & (SNs[b, 0, :launched] <= eps32))
                if hit.size:
                    nv = int(hit[0]) + 1
            if nv == 0:
                if misc[0] > 0.5:
                    stopped = True
                break
            tau_rows = (TAUs[b, 0, :nv].astype(np.float64)
                        + TAUls[b, 0, :nv].astype(np.float64))
            twv_rows = (TWVs[b, 0, :nv].astype(np.float64)
                        + TWVls[b, 0, :nv].astype(np.float64))
            incs = (m - 1.0) * np.log1p(-tau_rows) + np.log1p(twv_rows)
            ld_rows = state["ld"] + np.concatenate(
                [[0.0], np.cumsum(incs)[:-1]])
            state["ld"] = state["ld"] + float(np.sum(incs))
            F_parts.append(-ld_rows)
            SP_parts.append(SPs[b, 0, :nv])
            SN_parts.append(SNs[b, 0, :nv])
            k_done += nv
            since_refresh += nv
            if misc[0] > 0.5:
                stopped = True
                break
        # wall time interpolated across the group's accepted rows
        new_rows = k_done - rows_before
        if new_rows:
            T_parts.append(t_a + (t_b - t_a)
                           * (np.arange(new_rows) + 1) / new_rows)
            # keep T aligned with F parts granularity: merge the group's F
            # parts into row-aligned printing below
        if verbose and new_rows:
            kk0 = rows_before
            Fcat = np.concatenate(F_parts)
            SPcat = np.concatenate(SP_parts)
            SNcat = np.concatenate(SN_parts)
            Tcat = np.concatenate(T_parts)
            for kk in range(kk0, k_done):
                if kk % verbskip == 0:
                    print("{0:6d}  {1:10.3e}  {2:10.3e}  {3:10.3e}  {4:6.1f}"
                          .format(kk, Fcat[kk], SPcat[kk], SNcat[kk],
                                  Tcat[kk]))
        if checkpoint is not None:
            x64c = (xh_h[0, :n].astype(np.float64)
                    + xl_h[0, :n].astype(np.float64))
            _pallas_ckpt_save(checkpoint, ckpt_fp, x64c, k_done,
                              (F_parts, SP_parts, SN_parts, T_parts),
                              time.time() - t0)
        if (not stopped and refresh_every
                and since_refresh >= refresh_every):
            x64c = (xh_h[0, :n].astype(np.float64)
                    + xl_h[0, :n].astype(np.float64))
            # fresh_state resets ld to the exact logdet of the refreshed
            # iterate — the correct basis for subsequent F rows
            state = fresh_state(x64c)
            since_refresh = 0

    x_out = xh_h[0, :n].astype(np.float64) + xl_h[0, :n].astype(np.float64)
    F = np.concatenate(F_parts) if F_parts else np.zeros(0)
    SP = np.concatenate(SP_parts) if SP_parts else np.zeros(0)
    SN = np.concatenate(SN_parts) if SN_parts else np.zeros(0)
    T = np.concatenate(T_parts) if T_parts else np.zeros(0)
    ncut = min(len(F), len(SP), len(SN))
    Tfull = np.zeros(ncut)
    Tfull[:min(ncut, len(T))] = T[:ncut]
    return x_out, F[:ncut], SP[:ncut], SN[:ncut], Tfull


# ---------------------------------------------------------------------------
# Batched (K-instance) lazy engine — the sweep-study regime
# ---------------------------------------------------------------------------
# The reference's iteration-complexity sweeps (ipynb/ABPGvsFW/
# ex_Dopt_FW_n1000.ipynb:cell3 etc.) solve K independent instances of the
# SAME (m, n).  Sequential lazy solves pay one kernel dispatch + device_get
# per instance per group; here the instance axis becomes a pallas GRID
# dimension: one dispatch runs every instance's launch block (grid steps
# execute sequentially on the single TensorCore — the win is amortized
# dispatch/compile and batched XLA refresh folds, not MXU sharing, since
# each instance owns a distinct design matrix).  The kernel BODY is the
# unmodified `_lazy_kernel_body`; BlockSpecs with a None leading dim hand
# each grid step its own instance's blocks.


@functools.lru_cache(maxsize=8)
def _build_lazy_chunk_fn_batch(K, m, MP, NP, KR, away, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32

    def kernel(scal_all, vp, sv, hp, sh, xh, xl, wh, wl,
               xh_o, xl_o, wh_o, wl_o, CTh_o, CTl_o, bh_o, bl_o,
               misc_all, TAU_o, TAUl_o, TWV_o, TWVl_o, SP_o, SN_o):
        # SMEM operands stay whole (Mosaic rejects 2D SMEM blocks with a
        # squeezed leading dim); index the grid step's row via .at views
        pid = pl.program_id(0)
        _lazy_kernel_body(m, MP, NP, KR, away, interpret,
                          scal_all.at[pid], vp, sv, hp, sh, xh, xl, wh, wl,
                          xh_o, xl_o, wh_o, wl_o, CTh_o, CTl_o, bh_o, bl_o,
                          misc_all.at[pid], TAU_o, TAUl_o, TWV_o, TWVl_o,
                          SP_o, SN_o)

    def vspec(*shape):
        nzero = len(shape)
        return pl.BlockSpec((None,) + shape,
                            lambda k, _n=nzero: (k,) + (0,) * _n,
                            memory_space=pltpu.VMEM)

    def sspec(width):
        del width
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    call = pl.pallas_call(
        kernel,
        grid=(K,),
        out_shape=(
            jax.ShapeDtypeStruct((K, 1, NP), f32),    # xh
            jax.ShapeDtypeStruct((K, 1, NP), f32),    # xl
            jax.ShapeDtypeStruct((K, 1, NP), f32),    # wh
            jax.ShapeDtypeStruct((K, 1, NP), f32),    # wl
            jax.ShapeDtypeStruct((K, KR, MP), f32),   # CTh (g rows)
            jax.ShapeDtypeStruct((K, KR, MP), f32),   # CTl
            jax.ShapeDtypeStruct((K, KR, 1), f32),    # beta hi
            jax.ShapeDtypeStruct((K, KR, 1), f32),    # beta lo
            jax.ShapeDtypeStruct((K, 128), f32),      # misc (row padded to the 128 SMEM tile)
            jax.ShapeDtypeStruct((K, 1, KR), f32),    # TAU hi
            jax.ShapeDtypeStruct((K, 1, KR), f32),    # TAU lo
            jax.ShapeDtypeStruct((K, 1, KR), f32),    # TWV hi
            jax.ShapeDtypeStruct((K, 1, KR), f32),    # TWV lo
            jax.ShapeDtypeStruct((K, 1, KR), f32),    # SP
            jax.ShapeDtypeStruct((K, 1, KR), f32),    # SN
        ),
        in_specs=[
            sspec(4),                 # scal (K, 4)
            vspec(MP, LEV * NP),      # V packed digits (K, MP, LEV*NP)
            vspec(1, NP),             # sV
            vspec(MP, LEV * MP),      # H0 packed digits
            vspec(1, MP),             # sH0
            vspec(1, NP),             # xh
            vspec(1, NP),             # xl
            vspec(1, NP),             # wh
            vspec(1, NP),             # wl
        ],
        out_specs=(vspec(1, NP),) * 4 + (vspec(KR, MP),) * 2
        + (vspec(KR, 1),) * 2 + (sspec(4),) + (vspec(1, KR),) * 6,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return jax.jit(call)


@functools.lru_cache(maxsize=8)
def _build_multi_block_batch(K, m, MP, NP, KR, away, interpret, nblocks):
    """Batched analog of ``_build_multi_block``: one jitted dispatch runs
    ``nblocks`` (grid-over-instances kernel -> vmapped H0 refresh) rounds.
    Per-instance budgets/done flags thread through the carry as (K,)
    vectors; instances that converge freeze (kmax=0 grid steps exit the
    kernel's while_loop immediately)."""
    import sys

    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    call = _build_lazy_chunk_fn_batch(K, m, MP, NP, KR, away, interpret)
    refresh_b = jax.vmap(functools.partial(_lazy_refresh, lev=LEV))

    def multi(scal_base, rem0, V_packed, sV, H0h, H0l, H0p, sH0,
              xh, xl, wh, wl):
        def blk(carry, _):
            (xh, xl, wh, wl, H0h, H0l, H0p, sH0, done, rem) = carry
            kmax = jnp.minimum(jnp.float32(KR), rem)           # (K,)
            scal = scal_base.at[:, 2].set(kmax).at[:, 3].set(done)
            (xh2, xl2, wh2, wl2, CTh, CTl, bh, bl, misc,
             TAU, TAUl, TWV, TWVl, SP, SN) = call(
                scal, V_packed, sV, H0p, sH0, xh, xl, wh, wl)
            H0h2, H0l2, H0p2, sH02 = refresh_b(H0h, H0l, CTh, CTl,
                                               bh, bl, misc[:, 2:4])
            done2 = jnp.maximum(done, misc[:, 0])
            rem2 = jnp.maximum(rem - misc[:, 1], 0.0)
            return ((xh2, xl2, wh2, wl2, H0h2, H0l2, H0p2, sH02, done2,
                     rem2), (misc, TAU, TAUl, TWV, TWVl, SP, SN))

        init = (xh, xl, wh, wl, H0h, H0l, H0p, sH0,
                jnp.zeros((K,), jnp.float32), rem0)
        carry, hists = lax.scan(blk, init, None, length=nblocks)
        return carry, hists

    return jax.jit(multi)


@functools.lru_cache(maxsize=8)
def _get_multi_executable_batch(K, m, MP, NP, KR, away, nblocks):
    """AOT-compiled batched multi-block executable with the persistent
    disk cache (same machinery as ``_get_multi_executable``)."""
    import hashlib
    import os

    from ..algorithms import driver as drv

    if jax.default_backend() != "tpu" or len(jax.devices()) != 1:
        return None
    adir = drv._aot_dir()
    if not adir:
        return None
    f32 = jnp.float32
    avals = (
        jax.ShapeDtypeStruct((K, 128), f32),        # scal_base (row padded to the 128 SMEM tile)
        jax.ShapeDtypeStruct((K,), f32),            # rem0
        jax.ShapeDtypeStruct((K, MP, LEV * NP), jnp.int8),
        jax.ShapeDtypeStruct((K, 1, NP), f32),      # sV
        jax.ShapeDtypeStruct((K, MP, MP), f32),     # H0h
        jax.ShapeDtypeStruct((K, MP, MP), f32),     # H0l
        jax.ShapeDtypeStruct((K, MP, LEV * MP), jnp.int8),
        jax.ShapeDtypeStruct((K, 1, MP), f32),      # sH0
        jax.ShapeDtypeStruct((K, 1, NP), f32),      # xh
        jax.ShapeDtypeStruct((K, 1, NP), f32),      # xl
        jax.ShapeDtypeStruct((K, 1, NP), f32),      # wh
        jax.ShapeDtypeStruct((K, 1, NP), f32),      # wl
    )
    try:
        dev = jax.devices()[0]
        ident = "|".join(map(str, (
            jax.__version__, getattr(dev, "device_kind", dev),
            drv._package_source_digest(), "pallas_lazy_multi_batch",
            K, m, MP, NP, KR, away, nblocks, LEV, _MAX_DIAG, _SLAB)))
        path = os.path.join(
            adir, hashlib.sha256(ident.encode()).hexdigest() + ".jaxexe")
    except Exception:
        return None
    if os.path.exists(path):
        try:
            return drv._aot_load(path)
        except Exception:
            pass
    multi = _build_multi_block_batch(K, m, MP, NP, KR, away, False, nblocks)
    try:
        exe = multi.lower(*avals).compile()
        drv._aot_save(path, exe)
        return exe
    except Exception:
        return None


def dopt_fw_pallas_lazy_batch(Vs, x0s, eps, num_iters, away=True,
                              interpret=False, group=None, verbose=False,
                              refresh_every=0):
    """Solve K same-shape D-opt instances on the lazy-H fused kernel.

    Vs: (K, m, n) stacked designs; x0s: (K, n).  Returns ``(x, F, SP, SN)``
    with leading batch axis (the ``dopt_fw_batch`` contract): dense
    (K, T) histories where T <= num_iters; instances that converge before
    row T hold their converged values in the trailing rows (frozen), and
    T is the largest per-instance stopping row (or the budget).

    Same numerical contract as ``dopt_fw_pallas_lazy`` per instance:
    double-single state, packed int8 MXU contractions, per-block H0 folds;
    certify final quality by a fresh f64 factorization (the fresh-slack
    bars in tests), never by incremental histories.

    ``group``: launch blocks (of _KR=256 iterations) per dispatch; default
    covers min(budget, 32 blocks) per dispatch and re-dispatches until all
    instances converge or the budget is spent.

    ``refresh_every``: periodic DEVICE-SIDE w refresh (cadence rounded UP
    to _KR-block granularity): w = diag(V^T H0 V) is recomputed against
    the carried folded H0 by one int8 MXU GEMM + DS contract
    (``_fresh_w``), vmapped over instances.  REQUIRED for deep targets at
    large m: the carried w drifts ~m*2^-49 above the true slack (same
    plateau as the DS scan — measured SN stuck at 9.5e-8 > eps=1e-8 for
    1000x2000 KY-init runs without refresh, while the fresh slack was
    far below the bar).  UNLIKE the single-instance engine's
    ``refresh_every`` (a full host-f64 refactorization that also
    re-anchors H0 and the logdet basis), this resets ONLY w: the H0 fold
    drift (~1e-12 per 256-iteration block) and the incremental F basis
    remain — both orders of magnitude below 1e-8 slack bars over any
    real budget, and the host path measured 4x the whole sweep's kernel
    time (~0.5 s per instance per refresh at 1000x2000)."""
    import contextlib

    on_tpu = jax.default_backend() == "tpu" and not interpret
    ctx = jax.enable_x64(False) if on_tpu else contextlib.nullcontext()
    with ctx:
        return _dopt_fw_pallas_lazy_batch_impl(
            Vs, x0s, eps, num_iters, away=away, interpret=interpret,
            group=group, verbose=verbose, refresh_every=refresh_every)


def _dopt_fw_pallas_lazy_batch_impl(Vs, x0s, eps, num_iters, away=True,
                                    interpret=False, group=None,
                                    verbose=False, refresh_every=0):
    Vs64 = np.asarray(Vs, np.float64)
    K, m, n = Vs64.shape
    x0s64 = np.asarray(x0s, np.float64)
    KR = _KR
    MP = _next_pow2(max(m, 8))
    NP = -(-n // _LANE) * _LANE
    eps32 = np.float32(eps)

    # per-instance packing (device-side, vmapped over the batch axis)
    Vp_s = np.stack([_pad2(Vs64[k], (MP, NP)) for k in range(K)])
    Vh_s, Vl_s = (jnp.asarray(a) for a in _split64(Vp_s))
    V_packed, sV_dev = jax.vmap(functools.partial(_pack_v, lev=LEV))(
        Vh_s, Vl_s)

    # host f64 factorization per instance (also the refresh path)
    def fresh_state_np(x_all64):
        H_l, w_l, ld_l = [], [], []
        for k in range(K):
            H, w, logdet = _factorize_np(Vs64[k], x_all64[k])
            H_l.append(_pad2(H, (MP, MP)))
            w_l.append(_pad2(w[None, :], (1, NP)))
            ld_l.append(logdet)
        H0h, H0l = (jnp.asarray(a) for a in _split64(np.stack(H_l)))
        H0p, sH0 = jax.vmap(functools.partial(_pack_h0, lev=LEV))(H0h, H0l)
        wh, wl = (jnp.asarray(a) for a in _split64(np.stack(w_l)))
        x_pad = np.stack([_pad2(x_all64[k][None, :], (1, NP))
                          for k in range(K)])
        xh, xl = (jnp.asarray(a) for a in _split64(x_pad))
        return (H0h, H0l, H0p, sH0, xh, xl, wh, wl), np.asarray(
            ld_l, np.float64)

    (H0h, H0l, H0p, sH0, xh, xl, wh, wl), ld = fresh_state_np(x0s64)

    scal_base = np.zeros((K, 128), np.float32)  # 128-tile-aligned SMEM rows
    scal_base[:, 0] = eps32
    scal_base[:, 1] = np.float32(1.0e-8)
    scal_base = jnp.asarray(scal_base)

    if group is None:
        nb_group = min(_next_pow2(max(1, -(-num_iters // KR))), 32)
        if refresh_every:
            nb_group = min(nb_group,
                           _next_pow2(max(1, -(-refresh_every // KR))))
    else:
        nb_group = max(1, int(group))
    multi = None
    if not interpret:
        multi = _get_multi_executable_batch(K, m, MP, NP, KR, bool(away),
                                            nb_group)
    if multi is None:
        multi = _build_multi_block_batch(K, m, MP, NP, KR, bool(away),
                                         bool(interpret), nb_group)

    F_rows = [[] for _ in range(K)]
    SP_rows = [[] for _ in range(K)]
    SN_rows = [[] for _ in range(K)]
    stopped = np.zeros(K, bool)
    emitted = np.zeros(K, np.int64)
    since_refresh = 0
    state = (H0h, H0l, H0p, sH0, xh, xl, wh, wl)  # multi's arg order
    while (~stopped).any() and (emitted[~stopped] < num_iters).any():
        # fold host-side stopped flags into the budgets: converged
        # instances re-enter with kmax=0 and freeze for free (the
        # in-dispatch done carry resets to 0 every multi call)
        rem0 = jnp.asarray(np.where(
            stopped, 0.0,
            np.maximum(num_iters - emitted, 0.0)).astype(np.float32))
        carry, hists = multi(scal_base, rem0, V_packed, sV_dev, *state)
        (xh2, xl2, wh2, wl2, H0h2, H0l2, H0p2, sH02, done_d,
         rem_d) = carry
        state = (H0h2, H0l2, H0p2, sH02, xh2, xl2, wh2, wl2)
        (miscs, TAUs, TAUls, TWVs, TWVls, SPs, SNs) = jax.device_get(hists)
        # hists leading axes: (nblocks, K, ...)
        for b in range(nb_group):
            for k in range(K):
                if stopped[k]:
                    continue
                misc = miscs[b, k]
                launched = int(misc[1])
                nv = min(launched, int(num_iters - emitted[k]))
                if launched and misc[0] > 0.5:
                    hit = np.flatnonzero(
                        (SPs[b, k, 0, :launched] <= eps32)
                        & (SNs[b, k, 0, :launched] <= eps32))
                    if hit.size:
                        nv = min(nv, int(hit[0]) + 1)
                if nv > 0:
                    tau_rows = (TAUs[b, k, 0, :nv].astype(np.float64)
                                + TAUls[b, k, 0, :nv].astype(np.float64))
                    twv_rows = (TWVs[b, k, 0, :nv].astype(np.float64)
                                + TWVls[b, k, 0, :nv].astype(np.float64))
                    incs = ((m - 1.0) * np.log1p(-tau_rows)
                            + np.log1p(twv_rows))
                    ld_rows = ld[k] + np.concatenate(
                        [[0.0], np.cumsum(incs)[:-1]])
                    ld[k] += float(np.sum(incs))
                    F_rows[k].append(-ld_rows)
                    SP_rows[k].append(SPs[b, k, 0, :nv])
                    SN_rows[k].append(SNs[b, k, 0, :nv])
                    emitted[k] += nv
                if misc[0] > 0.5 or emitted[k] >= num_iters:
                    stopped[k] = True
        if verbose:
            print(f"# lazy batch: emitted={emitted.tolist()} "
                  f"stopped={int(stopped.sum())}/{K}")
        since_refresh += int(nb_group) * KR
        if (refresh_every and since_refresh >= refresh_every
                and (~stopped).any()):
            # DEVICE-SIDE w refresh (round 5): recompute w = diag(V^T H0 V)
            # against the carried folded H0 (one int8 GEMM + DS contract,
            # vmapped over instances) — resets the w-recurrence drift that
            # overstates the carried slack ~2x near deep targets, at
            # ~1 ms/instance instead of the ~0.5 s/instance host-f64
            # refactorization (which dominated 4x over kernel time)
            wf = jax.vmap(functools.partial(_fresh_w, lev=LEV))(
                state[0], state[1], V_packed, sV_dev, Vh_s, Vl_s)
            state = state[:6] + (wf[0], wf[1])
            since_refresh = 0

    xh_h, xl_h = jax.device_get((state[4], state[5]))
    x = (xh_h[:, 0, :n].astype(np.float64)
         + xl_h[:, 0, :n].astype(np.float64))
    T = int(emitted.max()) if emitted.size else 0
    F = np.zeros((K, T))
    SP = np.zeros((K, T))
    SN = np.zeros((K, T))
    for k in range(K):
        Fk = (np.concatenate(F_rows[k]) if F_rows[k]
              else np.zeros(0))
        SPk = (np.concatenate(SP_rows[k]).astype(np.float64)
               if SP_rows[k] else np.zeros(0))
        SNk = (np.concatenate(SN_rows[k]).astype(np.float64)
               if SN_rows[k] else np.zeros(0))
        nk = len(Fk)
        F[k, :nk] = Fk
        SP[k, :nk] = SPk
        SN[k, :nk] = SNk
        if nk and nk < T:  # frozen: repeat converged values
            F[k, nk:] = Fk[-1]
            SP[k, nk:] = SPk[-1]
            SN[k, nk:] = SNk[-1]
    return x, F, SP, SN
