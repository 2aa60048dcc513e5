"""Fused Pallas kernel for one Mehrotra predictor-corrector iteration.

The PD engine's TPU fast path (ops/pd.py is the XLA form): ONE kernel
per iteration computes, with zero emulated-f64 ops on the critical path,

  * the primal/dual residuals rp = Cz + s − d, rd = q + Cᵀλ (+Pz) and
    the complementarity gap (chunked dd passes over C, as in
    ops/pallas_newton.py);
  * the f32 Gram H = CᵀWC (+P), W = diag(λ/s), Jacobi equilibration and
    the blocked in-VMEM Cholesky with the jitter-retry ladder;
  * the PREDICTOR solve (dd-refined, matrix-free residuals against the
    true dd operator), its step-to-boundary ratios and μ_aff;
  * Mehrotra's σ = (μ_aff/μ)³ and the CORRECTOR solve reusing the same
    factorization, with the ds_aff·dλ_aff complementarity correction;
  * the γ-damped updates of (z, s, λ) and the post-step gap/residual
    norms (rp and — for LP — rd contract EXACTLY by (1−α) per step, so
    the post-step norms are free; QP adds one P·dz matvec).

The XLA side (ops/pd.py pd_solve with use_pallas) is a thin
lax.while_loop carrying (z, s, λ) in f64 and reading the SMEM stats row
for the convergence test — identical semantics to the XLA engine.

Reuses ops/pallas_newton.py's building blocks: CH-chunked foreach over
the VMEM-resident or HBM-streamed C pair, `_equilibrate`,
`_factor_jittered`, `_chol_invert_ref`, and the dd arithmetic of
ops/dd.py.  Same VMEM envelope and gates (`kernel_mode`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dd
from .pallas_chol import BLK
from .pallas_newton import (CH, ReducedConsts, _STREAM_MAX_ROWS,
                            _c_in_specs, _chol_invert_ref,
                            _common_scratch,
                            _dd_pmatvec_row, _dd_recip, _equilibrate,
                            _factor_jittered, _make_foreach, _pad, _padk,
                            _pad2, _refined_solve, _w_solve, pick_ch)

_GAMMA = 0.99995


def pd_supported(k: int, r: int, has_P: bool) -> bool:
    """All-VMEM envelope for the PD step kernel.  Differs from the
    Newton kernel's (pallas_newton.supported) in the kp-proportional
    budget: the PD kernel carries ~26·kp words of per-row state
    (vec/vec2 scratch at 8 columns each, the (s, λ) dd pairs in and
    out, the d pair) vs the Newton kernel's 10·kp."""
    rp = _pad(r)
    ch = pick_ch(rp)
    kp = _padk(k, ch)
    words = (2 * kp * rp                      # Chi/Clo inputs
             + (4 + (2 if has_P else 0)) * rp * rp
             + 14 * ch * rp                   # slab dd temporaries
             + 26 * kp)                       # per-row state (see above)
    return words * 4 <= 110 * 1024 * 1024 and rp <= 1536


def pd_supported_streaming(k: int, r: int, has_P: bool) -> bool:
    """HBM-streaming envelope for the PD step kernel (C pair in HBM)."""
    rp = _pad(r)
    ch = pick_ch(rp)
    kp = _padk(k, ch)
    words = ((4 + (2 if has_P else 0)) * rp * rp
             + 4 * ch * rp                    # double-buffered C window
             + 14 * ch * rp
             + 26 * kp)
    return (words * 4 <= 110 * 1024 * 1024 and rp <= 1536
            and kp <= _STREAM_MAX_ROWS)


def pd_kernel_mode(k: int, r: int, has_P: bool):
    """'resident', 'stream', or None for the PD step kernel."""
    if pd_supported(k, r, has_P):
        return "resident"
    if pd_supported_streaming(k, r, has_P):
        return "stream"
    return None


def _pd_step_core(foreach_c, dhi_ref, dlo_ref, qhi, qlo, zhi, zlo,
                  s_ref, lam_ref, tPhi, tPlo,
                  l_ref, dinv_ref, x_ref, vec_ref, vec2_ref,
                  *, nb: int, nck: int, refine: int, has_P: bool, r: int,
                  rp: int, k: int, kcnt: float,
                  stall_rel2: float = 1e-12, CH: int = CH):
    """One PD iteration; returns (z', s'λ' written to refs by caller)…
    see module docstring.  vec_ref columns: [0:2) rp, [2:4) w, [4:6) 1/s,
    [6:8) λ (copied for chunk access).  vec2_ref: [0:2) ds, [2:4) dλ,
    [4:6) s (copy), [6:8) scratch."""
    zer = jnp.zeros((1, rp), jnp.float32)
    zer11 = jnp.zeros((1, 1), jnp.float32)

    def rowmask(ic):
        i0 = ic * CH
        rows = i0 + lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
        return (rows < k).astype(jnp.float32)

    # ---- pass 1: rp, w = λ/s, 1/s, Cᵀλ, gap = Σsλ, ‖rp‖∞ ----------------
    def p1_body(ic, ch, cl, acc):
        (ah, al, gh_, gl_, rpmax) = acc
        i0 = pl.multiple_of(ic * CH, CH)
        sh_c = vec2_ref[pl.ds(i0, CH), 4:5]
        sl_c = vec2_ref[pl.ds(i0, CH), 5:6]
        lh_c = vec_ref[pl.ds(i0, CH), 6:7]
        ll_c = vec_ref[pl.ds(i0, CH), 7:8]
        mh, ml = dd.dd_matvec_cols(ch, cl, zhi, zlo)
        # rp = C z + s − d
        rph, rpl = dd.dd_add(mh, ml, sh_c, sl_c)
        rph, rpl = dd.dd_add(rph, rpl, -dhi_ref[pl.ds(i0, CH), :],
                             -dlo_ref[pl.ds(i0, CH), :])
        vec_ref[pl.ds(i0, CH), 0:1] = rph
        vec_ref[pl.ds(i0, CH), 1:2] = rpl
        ish, isl = _dd_recip(sh_c, sl_c)
        vec_ref[pl.ds(i0, CH), 4:5] = ish
        vec_ref[pl.ds(i0, CH), 5:6] = isl
        wh, wl = dd.dd_mul(lh_c, ll_c, ish, isl)
        vec_ref[pl.ds(i0, CH), 2:3] = wh
        vec_ref[pl.ds(i0, CH), 3:4] = wl
        # Cᵀλ accumulation
        ph, pl2 = dd.dd_mul(ch, cl, lh_c, ll_c)
        rh_c, rl_c = dd.dd_reduce(ph, pl2, axis=0)
        ah, al = dd.dd_add(ah, al, rh_c, rl_c)
        # gap accumulation Σ s λ (padded rows: λ = 0)
        slh, sll = dd.dd_mul(sh_c, sl_c, lh_c, ll_c)
        gh2, gl2 = dd.dd_reduce(slh, sll, axis=0)
        gh_, gl_ = dd.dd_add(gh_, gl_, gh2[:, 0:1], gl2[:, 0:1])
        rpmax = jnp.maximum(rpmax,
                            jnp.max(jnp.abs(rph) * rowmask(ic))[None, None])
        return ah, al, gh_, gl_, rpmax

    ctlh, ctll, gaph, gapl, rpn = foreach_c(
        p1_body, (zer, zer, zer11, zer11, zer11))

    # rd = q + Cᵀλ (+ P z)
    rdh, rdl = dd.dd_add(qhi, qlo, ctlh, ctll)
    if has_P:
        pzh, pzl = _dd_pmatvec_row(tPhi, tPlo, zhi, zlo)
        rdh, rdl = dd.dd_add(rdh, rdl, pzh, pzl)
    cols = lax.broadcasted_iota(jnp.int32, (1, rp), 1)
    colmask = (cols < r).astype(jnp.float32)
    rdn = jnp.max(jnp.abs(rdh) * colmask)[None, None]
    gap = gaph + gapl                      # f32 is plenty for the test
    mu_c = gap / kcnt

    def foreach_rows(body, init):
        """Chunked loop over the k-vector scratch columns (no C reads —
        cheaper than foreach_c in streaming mode)."""
        return lax.fori_loop(0, nck, body, init)

    # ---- pass 2: f32 Gram H = CᵀWC (+P), factor ------------------------
    def p2_body(ic, ch, cl, H):
        del cl
        i0 = pl.multiple_of(ic * CH, CH)
        w32c = vec_ref[pl.ds(i0, CH), 2:3]
        return H + lax.dot_general(
            ch * w32c, ch, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    H32 = foreach_c(p2_body, jnp.zeros((rp, rp), jnp.float32),
                    need_lo=False)
    if has_P:
        H32 = H32 + tPhi
    Hs, dsc_r, eye = _equilibrate(H32, r, rp)
    # NOT the round-5 LDL/NS hybrid: measured on hardware
    # (round5o_raw.log) the Mehrotra iteration REGRESSED with it
    # (qp1000_pd 0.018 -> 0.082 s, lp1000_pd 0.019 -> 0.053 s) — the
    # pd engine's tight direction grade pays more in extra
    # refinement/iterations under LDL-grade tiles than the factor
    # saves.  The blocked Cholesky + triangular inverse stays.
    _factor_jittered(l_ref, dinv_ref, Hs, eye, nb)
    _chol_invert_ref(l_ref, dinv_ref, nb)   # l_ref now holds W = L^-1

    def _precond_solve(rhs_row):
        return _w_solve(l_ref, rhs_row)

    def _apply_h(xh, xl):
        """True-operator dd matvec H x = Cᵀ(w ⊙ (C x)) (+ P x)."""
        def body(ic, ch, cl, acc):
            ah, al = acc
            i0 = pl.multiple_of(ic * CH, CH)
            yh, yl = dd.dd_matvec_cols(ch, cl, xh, xl)
            wyh, wyl = dd.dd_mul(vec_ref[pl.ds(i0, CH), 2:3],
                                 vec_ref[pl.ds(i0, CH), 3:4], yh, yl)
            ph, pl2 = dd.dd_mul(ch, cl, wyh, wyl)
            rh_c, rl_c = dd.dd_reduce(ph, pl2, axis=0)
            return dd.dd_add(ah, al, rh_c, rl_c)

        hxh, hxl = foreach_c(body, (zer, zer))
        if has_P:
            pxh, pxl = _dd_pmatvec_row(tPhi, tPlo, xh, xl)
            hxh, hxl = dd.dd_add(hxh, hxl, pxh, pxl)
        return hxh, hxl

    def _solve_refined(bh, bl):
        """dd-refined solve H x = b with the shared factor, with the
        barrier kernel's cond-gated PCG stall escalation
        (pallas_newton._refined_solve): plain refinement diverges once
        κ(Hs)·eps32 > 1, which late Mehrotra systems (μ → gap_tol)
        reach routinely — without the escalation the measured true dual
        residual floors at ~1e-2 and then blows up while the
        (1−α)-contraction bookkeeping keeps shrinking.  Also returns
        the FINAL true-operator residual norms (rn2, bn2) in the
        equilibrated metric for the driver's solve-quality gate."""
        xh, xl, _, _, rn2, bn2 = _refined_solve(
            _precond_solve, _apply_h, Hs, dsc_r, -bh, -bl, refine, rp,
            stall_rel2=stall_rel2)
        return xh, xl, rn2[None, None], bn2[None, None]

    # ---- rhs builder + direction: t = (rc − λ·rp)/s per row ------------
    def _direction(sig_mu, use_corr):
        """Newton direction for rc = s∘λ − σμ·mask (+ ds_aff∘dλ_aff when
        use_corr): computes rhs, solves, writes ds/dλ into vec2[0:4),
        returns (dz, step ratios αp, αd, and Σ(s+αds)(λ+αdλ) pieces)."""
        def rhs_body(ic, ch, cl, acc):
            ah, al = acc
            i0 = pl.multiple_of(ic * CH, CH)
            m = rowmask(ic)
            lh_c = vec_ref[pl.ds(i0, CH), 6:7]
            ll_c = vec_ref[pl.ds(i0, CH), 7:8]
            sh_c = vec2_ref[pl.ds(i0, CH), 4:5]
            sl_c = vec2_ref[pl.ds(i0, CH), 5:6]
            ish = vec_ref[pl.ds(i0, CH), 4:5]
            isl = vec_ref[pl.ds(i0, CH), 5:6]
            rph = vec_ref[pl.ds(i0, CH), 0:1]
            rpl = vec_ref[pl.ds(i0, CH), 1:2]
            # rc = s λ − σμ·mask (+ corr)
            rch, rcl = dd.dd_mul(sh_c, sl_c, lh_c, ll_c)
            rch, rcl = dd.dd_add(rch, rcl, -sig_mu * m,
                                 jnp.zeros_like(rch))
            if use_corr:
                dsh = vec2_ref[pl.ds(i0, CH), 0:1]
                dsl = vec2_ref[pl.ds(i0, CH), 1:2]
                dlh = vec2_ref[pl.ds(i0, CH), 2:3]
                dll = vec2_ref[pl.ds(i0, CH), 3:4]
                crh, crl = dd.dd_mul(dsh, dsl, dlh, dll)
                rch, rcl = dd.dd_add(rch, rcl, crh, crl)
            # t = (rc − λ rp)/s
            lrh, lrl = dd.dd_mul(lh_c, ll_c, rph, rpl)
            th, tl = dd.dd_add(rch, rcl, -lrh, -lrl)
            th, tl = dd.dd_mul(th, tl, ish, isl)
            # store rc for the dλ computation of THIS direction
            vec2_ref[pl.ds(i0, CH), 6:7] = rch
            vec2_ref[pl.ds(i0, CH), 7:8] = rcl
            ph, pl2 = dd.dd_mul(ch, cl, th, tl)
            rh_c, rl_c = dd.dd_reduce(ph, pl2, axis=0)
            return dd.dd_add(ah, al, rh_c, rl_c)

        cth, ctl = foreach_c(rhs_body, (zer, zer))
        bh, bl = dd.dd_add(-rdh, -rdl, cth, ctl)
        dzh, dzl, srn2, sbn2 = _solve_refined(bh, bl)

        # ds = −rp − C dz; dλ = (−rc − λ ds)/s; step ratios
        def ds_body(ic, ch, cl, acc):
            ap_r, ad_r = acc
            i0 = pl.multiple_of(ic * CH, CH)
            m = rowmask(ic)
            yh, yl = dd.dd_matvec_cols(ch, cl, dzh, dzl)
            rph = vec_ref[pl.ds(i0, CH), 0:1]
            rpl = vec_ref[pl.ds(i0, CH), 1:2]
            dsh, dsl = dd.dd_add(-rph, -rpl, -yh, -yl)
            dsh = dsh * m          # padded rows: exact fixed point
            dsl = dsl * m
            vec2_ref[pl.ds(i0, CH), 0:1] = dsh
            vec2_ref[pl.ds(i0, CH), 1:2] = dsl
            lh_c = vec_ref[pl.ds(i0, CH), 6:7]
            ll_c = vec_ref[pl.ds(i0, CH), 7:8]
            rch = vec2_ref[pl.ds(i0, CH), 6:7]
            rcl = vec2_ref[pl.ds(i0, CH), 7:8]
            ldh, ldl = dd.dd_mul(lh_c, ll_c, dsh, dsl)
            nh, nl = dd.dd_add(-rch, -rcl, -ldh, -ldl)
            dlh, dll = dd.dd_mul(nh, nl,
                                 vec_ref[pl.ds(i0, CH), 4:5],
                                 vec_ref[pl.ds(i0, CH), 5:6])
            dlh = dlh * m
            dll = dll * m
            vec2_ref[pl.ds(i0, CH), 2:3] = dlh
            vec2_ref[pl.ds(i0, CH), 3:4] = dll
            sh_c = vec2_ref[pl.ds(i0, CH), 4:5]
            ratio_p = jnp.where((dsh < 0) & (m > 0),
                                -sh_c / jnp.where(dsh < 0, dsh, -1.0),
                                jnp.float32(jnp.inf))
            ratio_d = jnp.where((dlh < 0) & (m > 0),
                                -vec_ref[pl.ds(i0, CH), 6:7]
                                / jnp.where(dlh < 0, dlh, -1.0),
                                jnp.float32(jnp.inf))
            return (jnp.minimum(ap_r, jnp.min(ratio_p)[None, None]),
                    jnp.minimum(ad_r, jnp.min(ratio_d)[None, None]))

        inf11 = jnp.full((1, 1), jnp.inf, jnp.float32)
        ap_r, ad_r = foreach_c(ds_body, (inf11, inf11))
        return (dzh, dzl, jnp.minimum(1.0, ap_r), jnp.minimum(1.0, ad_r),
                srn2, sbn2)

    # ---- predictor (σ = 0) ---------------------------------------------
    dzh_a, dzl_a, ap_a, ad_a, _, _ = _direction(
        jnp.zeros((), jnp.float32), use_corr=False)

    # μ_aff = Σ (s + αp ds)(λ + αd dλ) / kcnt
    def mu_body(ic, acc):
        i0 = pl.multiple_of(ic * CH, CH)
        sh_c = vec2_ref[pl.ds(i0, CH), 4:5]
        lh_c = vec_ref[pl.ds(i0, CH), 6:7]
        s2 = sh_c + ap_a * vec2_ref[pl.ds(i0, CH), 0:1]
        l2 = lh_c + ad_a * vec2_ref[pl.ds(i0, CH), 2:3]
        return acc + jnp.sum(s2 * l2)[None, None]

    mu_aff = foreach_rows(mu_body, zer11) / kcnt
    ratio = jnp.maximum(mu_aff, 0.0) / jnp.maximum(mu_c, 1e-30)
    sigma = jnp.clip(ratio * ratio * ratio, 0.0, 1.0)

    # ---- corrector (same factor) ----------------------------------------
    dzh, dzl, ap, ad, srn2, sbn2 = _direction((sigma * mu_c)[0, 0],
                                              use_corr=True)
    ap = jnp.minimum(1.0, _GAMMA * ap)
    ad = jnp.minimum(1.0, _GAMMA * ad)

    # ---- updates (dd-exact scalar steps via dd_mul_f32) -------------------
    sdzh, sdzl = dd.dd_mul_f32(dzh, dzl, ap[0, 0])
    znh, znl = dd.dd_add(zhi, zlo, sdzh, sdzl)

    def upd_body(ic, acc):
        gh_, gl_ = acc
        i0 = pl.multiple_of(ic * CH, CH)
        sh_c = vec2_ref[pl.ds(i0, CH), 4:5]
        sl_c = vec2_ref[pl.ds(i0, CH), 5:6]
        lh_c = vec_ref[pl.ds(i0, CH), 6:7]
        ll_c = vec_ref[pl.ds(i0, CH), 7:8]
        dsh, dsl = dd.dd_mul_f32(vec2_ref[pl.ds(i0, CH), 0:1],
                                 vec2_ref[pl.ds(i0, CH), 1:2], ap[0, 0])
        dlh, dll = dd.dd_mul_f32(vec2_ref[pl.ds(i0, CH), 2:3],
                                 vec2_ref[pl.ds(i0, CH), 3:4], ad[0, 0])
        s2h, s2l = dd.dd_add(sh_c, sl_c, dsh, dsl)
        l2h, l2l = dd.dd_add(lh_c, ll_c, dlh, dll)
        s_ref[pl.ds(i0, CH), 0:1] = s2h
        s_ref[pl.ds(i0, CH), 1:2] = s2l
        lam_ref[pl.ds(i0, CH), 0:1] = l2h
        lam_ref[pl.ds(i0, CH), 1:2] = l2l
        gh2, gl2 = dd.dd_mul(s2h, s2l, l2h, l2l)
        gh3, gl3 = dd.dd_reduce(gh2, gl2, axis=0)
        return dd.dd_add(gh_, gl_, gh3[:, 0:1], gl3[:, 0:1])

    g2h, g2l = foreach_rows(upd_body, (zer11, zer11))
    gap2 = g2h + g2l

    # post-step residual norms: rp and (LP) rd contract exactly by (1−α);
    # QP adds the (αp−αd) P dz cross-term
    rpn2 = (1.0 - ap) * rpn
    rdn2 = (1.0 - ad) * rdn
    if has_P:
        pdh, pdl = _dd_pmatvec_row(tPhi, tPlo, dzh, dzl)
        rdn2 = rdn2 + jnp.abs(ap - ad) * jnp.max(jnp.abs(pdh) * colmask)

    return dict(znh=znh, znl=znl, gap2=gap2, rpn2=rpn2, rdn2=rdn2,
                ap=ap, ad=ad, sigma=sigma, srn2=srn2, sbn2=sbn2,
                gap_pre=gap, rpn_pre=rpn, rdn_pre=rdn)


def _pd_step_kernel(Chi_ref, Clo_ref, dhi_ref, dlo_ref, qhi_ref, qlo_ref,
                    zhi_ref, zlo_ref, sin_ref, lamin_ref, tPhi_ref,
                    tPlo_ref,
                    znh_ref, znl_ref, sout_ref, lamout_ref, stats_ref,
                    *scratch, nb: int, nck: int, refine: int, has_P: bool,
                    r: int, rp: int, k: int, kcnt: float, stream: bool,
                    stall_rel2: float = 1e-12, CH: int = CH):
    foreach_c, scratch = _make_foreach(Chi_ref, Clo_ref, scratch, nck,
                                       stream, CH)
    l_ref, dinv_ref, x_ref, vec_ref, vec2_ref = scratch
    # copy the (s, λ) state into the working columns
    vec2_ref[:, 4:6] = sin_ref[:]
    vec_ref[:, 6:8] = lamin_ref[:]
    out = _pd_step_core(
        foreach_c, dhi_ref, dlo_ref, qhi_ref[:], qlo_ref[:],
        zhi_ref[:], zlo_ref[:], sout_ref, lamout_ref,
        tPhi_ref[:], tPlo_ref[:],
        l_ref, dinv_ref, x_ref, vec_ref, vec2_ref,
        nb=nb, nck=nck, refine=refine, has_P=has_P, r=r, rp=rp, k=k,
        kcnt=kcnt, stall_rel2=stall_rel2, CH=CH)
    znh_ref[:] = out["znh"]
    znl_ref[:] = out["znl"]
    stats_ref[0, 0] = out["gap2"][0, 0]
    stats_ref[0, 1] = out["rpn2"][0, 0]
    stats_ref[0, 2] = out["rdn2"][0, 0]
    stats_ref[0, 3] = out["ap"][0, 0]
    stats_ref[0, 4] = out["ad"][0, 0]
    stats_ref[0, 5] = out["sigma"][0, 0]
    # corrector solve quality (equilibrated residual² and rhs²): the
    # driver's convergence test requires srn2 ≤ 1e-8·sbn2, so a stalled
    # refinement can never certify a convergence the direction didn't earn
    stats_ref[0, 6] = out["srn2"][0, 0]
    stats_ref[0, 7] = out["sbn2"][0, 0]
    # EXACT (gap, ‖rp‖∞, ‖rd‖∞) of the PRE-step iterate, recomputed by
    # pass 1 from the carried dd state: the driver's second exit test —
    # when a stalled late-stage refinement keeps solve_ok false forever,
    # these still certify the converged iterate (at most one extra
    # iteration late) instead of burning to pd_max_iters.
    stats_ref[0, 8] = out["gap_pre"][0, 0]
    stats_ref[0, 9] = out["rpn_pre"][0, 0]
    stats_ref[0, 10] = out["rdn_pre"][0, 0]
    stats_ref[0, 11] = 0.0


def pd_step_prepared(consts: ReducedConsts, q, z, s, lam, tP=None, *,
                     refine: int = 3, interpret: bool = False,
                     stream: bool = False, dir_tol: float = 1e-6):
    """One fused PD iteration from pre-split constants.

    Args: q/z f64 (r,); s/lam f64 (k,) strictly positive (padded rows —
    consts pads to kp — enter as s=1, λ=0 and are exact fixed points).
    Returns (z', s', lam', stats) with stats (f32, 12) =
    [gap', rp'∞, rd'∞, αp, αd, σ, srn2, sbn2, gap, rp∞, rd∞, 0] — primed
    entries are post-step (rp'/rd' by (1−α)-contraction bookkeeping),
    unprimed the exact pre-step values recomputed from the carried
    state.  Call under jit; see ops/pd.py for the while_loop driver.
    """
    k, r = consts.k, consts.r
    rp = _pad(r)
    nb = rp // BLK
    ch = pick_ch(rp)
    kp = consts.Chi.shape[0]
    nck = kp // ch
    f64 = q.dtype

    qhi, qlo = dd.split_f64(_pad2(q[None, :], 1, rp))
    zhi, zlo = dd.split_f64(_pad2(z[None, :], 1, rp))
    scol = jnp.ones((kp, 1), f64).at[:k, 0].set(s)
    lcol = jnp.zeros((kp, 1), f64).at[:k, 0].set(lam)
    sh, sl = dd.split_f64(scol)
    lh, ll = dd.split_f64(lcol)
    sin = jnp.concatenate([sh, sl], axis=1)
    lamin = jnp.concatenate([lh, ll], axis=1)
    if tP is not None:
        tPhi, tPlo = dd.split_f64(_pad2(tP, rp, rp))
    else:
        tPhi = tPlo = jnp.zeros((BLK, BLK), jnp.float32)

    kernel = functools.partial(
        _pd_step_kernel, nb=nb, nck=nck, refine=refine,
        has_P=tP is not None, r=r, rp=rp, k=k, kcnt=float(k),
        stream=stream, stall_rel2=float(dir_tol) ** 2, CH=ch)
    with jax.enable_x64(False):
        znh, znl, sout, lamout, stats = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((kp, 2), jnp.float32),
                jax.ShapeDtypeStruct((kp, 2), jnp.float32),
                jax.ShapeDtypeStruct((1, 12), jnp.float32),
            ),
            in_specs=_c_in_specs(stream)
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4
            + (pl.BlockSpec(memory_space=pltpu.SMEM),),
            # vec2 must sit BEFORE the streaming window/sems: _make_foreach
            # strips the trailing 3 scratch entries in stream mode
            scratch_shapes=(_common_scratch(kp, rp, False)
                            + [pltpu.VMEM((kp, 8), jnp.float32)]
                            + _common_scratch(kp, rp, stream, ch)[4:]),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )(consts.Chi, consts.Clo, consts.dhi, consts.dlo, qhi, qlo,
          zhi, zlo, sin, lamin, tPhi, tPlo)

    z2 = dd.join_f64(znh, znl)[0, :r].astype(f64)
    s2 = dd.join_f64(sout[:, 0:1], sout[:, 1:2])[:k, 0].astype(f64)
    lam2 = dd.join_f64(lamout[:, 0:1], lamout[:, 1:2])[:k, 0].astype(f64)
    return z2, s2, lam2, stats[0]
