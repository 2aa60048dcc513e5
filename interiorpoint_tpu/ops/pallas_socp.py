"""Fused Newton-step Pallas kernel for pure-cone SOCP barrier subproblems.

The SOCP analogue of ops/pallas_newton.py: ONE kernel per Newton step
computes cone slacks, barrier gradient, the f32 Hessian preconditioner,
a blocked f32 Cholesky, dd-refined direction, Newton decrement and the
closed-form backtracking line search — float64 never appears on the TPU
critical path.  It replaces the XLA chain of dd cone contractions +
emulated-f64 Hessian assembly + mixed factor/solve (ops/socp.py +
ops/kkt.py: profiled 7.6 ms/Newton-step at n=1000 on v5e) with pure
f32/dd VPU+MXU work.

Math (reference oracle: FunctionManager.py:933-994, 1055-1158; our XLA
port: ops/socp.py).  The problem is the reduced/unbounded SOCP

    min_z t*(q.z [+ z.P z/2]) - sum_k log(s_k(z)),
    s_k = rhs_k^2 - |lhs_k|^2,  lhs_k = A_k z + b_k,  rhs_k = c_k.z + d_k,

with the squared-cone slack formulation and the rhs entries domain-only,
exactly as the reference.  Per Newton step the kernel computes (w_k =
2/(s_k + eps)):

    g   = t*(q [+ P z]) + A_flat^T (w_row*lhs) - c^T (w*rhs)        (dd)
    H32 = [t*P +] sum_k w_k (A_k^T A_k + c_k c_k^T)                 (f32)
          + sum_k (w_k G_k)(w_k G_k)^T,   G_k = A_k^T lhs_k - rhs_k c_k
    dx  : H dx = -g via f32 factor + dd matrix-free refinement
    line search: closed-form candidate sweep (see _socp_step_kernel)

Note the +c_k c_k^T curvature sign — the reference's deliberate
Gauss-Newton PSD approximation (FunctionManager.py:1132-1136), kept for
parity (ops/socp.py module docstring).

Per-cone bookkeeping: cones are contiguous M-row blocks of the stacked
(K*M, r) matrix.  All per-cone segment reductions go through a 0/1
membership matrix E (rows x cones): products with E are exact in f32, so
masked dd reductions stay dd-accurate, and per-cone weights scatter to
rows as the exact one-nonzero matmul w_row = E @ w.

Precision contract (mirrors the LP/QP kernel): gradient, cone slacks,
refinement residuals, decrement and line-search coefficients are dd
(~4e-15); the Hessian's G-Gram block uses the f32 G32 both as
preconditioner and inside the dd residual — the refined direction solves
the SPD operator {exact curvature + Gram(G32)} whose distance to the
oracle Hessian (~1e-7 relative) matches the XLA path's _split_gram error
(ops/socp.py:82-93).  Newton convergence only needs g exact and H SPD.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dd
from .barrier import SOCP_SLACK_EPS
from .pallas_chol import BLK
from .pallas_newton import (
    CH, _chol_invert_ref, _dd_pmatvec_row, _dd_recip,
    _dot, _dot_tn,
    _equilibrate, _factor_jittered, _make_foreach_resident, _pad, _pad2,
    _padk, _phi_stable, _refined_solve, _row_to_col, _w_solve,
    pick_ch,
)

# Cone-count padding: per-cone quantities live in (Kp, .) tensors.
KP = BLK


def _socp_core(foreach_a, E_ref, bhi_ref, blo_ref, chi_ref, clo_ref,
               dhi_ref, dlo_ref, tqhi, tqlo, zhi, zlo, tPhi, tPlo,
               l_ref, dinv_ref, x_ref, vec_ref,
               *, nb: int, refine: int, has_P: bool, r: int, rp: int,
               stall_rel2: float = 1e-12, CH: int = CH):
    """Slacks -> gradient -> f32 factor -> dd-refined Newton direction.

    Every pass over the stacked cone matrix A_flat is CHUNKED through
    ``foreach_a`` (CH-row slabs).  Per-row dd state persists in
    ``vec_ref`` columns: [0:2)=lhs, [2:4)=w_row.  Returns the direction
    plus everything the line search needs.
    """
    zer = jnp.zeros((1, rp), jnp.float32)
    zerk = jnp.zeros((1, KP), jnp.float32)

    # ---- pass 1: lhs = A z + b (dd, into vec_ref) and per-cone
    # ssq_k = sum_m lhs^2 via the masked dd reduction --------------------
    def p1_body(ic, ah, al, acc):
        sh, sl = acc
        i0 = pl.multiple_of(ic * CH, CH)
        mh, ml = dd.dd_matvec_cols(ah, al, zhi, zlo)
        lh, ll = dd.dd_add(mh, ml, bhi_ref[pl.ds(i0, CH), :],
                           blo_ref[pl.ds(i0, CH), :])
        vec_ref[pl.ds(i0, CH), 0:1] = lh
        vec_ref[pl.ds(i0, CH), 1:2] = ll
        l2h, l2l = dd.dd_mul(lh, ll, lh, ll)
        E_s = E_ref[pl.ds(i0, CH), :]                     # (CH, KP) 0/1
        rh_c, rl_c = dd.dd_reduce(l2h * E_s, l2l * E_s, axis=0)
        return dd.dd_add(sh, sl, rh_c, rl_c)

    ssqh, ssql = foreach_a(p1_body, (zerk, zerk))
    ssqh_c, ssql_c = _row_to_col(ssqh), _row_to_col(ssql)  # (KP, 1)

    # rhs = c z + d, slack s = rhs^2 - ssq, w = 2/(s + eps)   (all dd)
    chi_m, clo_m = chi_ref[:], clo_ref[:]
    rh0, rl0 = dd.dd_matvec_cols(chi_m, clo_m, zhi, zlo)
    rhsh, rhsl = dd.dd_add(rh0, rl0, dhi_ref[:], dlo_ref[:])   # (KP, 1)
    r2h, r2l = dd.dd_mul(rhsh, rhsl, rhsh, rhsl)
    sh_c, sl_c = dd.dd_add(r2h, r2l, -ssqh_c, -ssql_c)
    seh, sel = dd.dd_add(sh_c, sl_c,
                         jnp.full_like(sh_c, SOCP_SLACK_EPS),
                         jnp.zeros_like(sh_c))
    ish, isl = _dd_recip(seh, sel)
    wh_c, wl_c = dd.dd_mul_f32(ish, isl, 2.0)                  # (KP, 1)
    w32_c = wh_c

    # ---- pass 2: gradient cone term A_flat^T (w_row * lhs) (dd), with the
    # per-row weight scatter w_row = E @ w (exact: one nonzero per row) ---
    def p2_body(ic, ah, al, acc):
        gh_a, gl_a = acc
        i0 = pl.multiple_of(ic * CH, CH)
        E_s = E_ref[pl.ds(i0, CH), :]
        wrh = _dot(E_s, wh_c)
        wrl = _dot(E_s, wl_c)
        vec_ref[pl.ds(i0, CH), 2:3] = wrh
        vec_ref[pl.ds(i0, CH), 3:4] = wrl
        yh, yl = dd.dd_mul(wrh, wrl, vec_ref[pl.ds(i0, CH), 0:1],
                           vec_ref[pl.ds(i0, CH), 1:2])
        ph, pl2 = dd.dd_mul(ah, al, yh, yl)
        rh_c, rl_c = dd.dd_reduce(ph, pl2, axis=0)
        return dd.dd_add(gh_a, gl_a, rh_c, rl_c)

    gAh, gAl = foreach_a(p2_body, (zer, zer))

    # gradient c term  c^T (w * rhs)  (dd, small)
    wrh_s, wrl_s = dd.dd_mul(wh_c, wl_c, rhsh, rhsl)
    ph, pl2 = dd.dd_mul(chi_m, clo_m, wrh_s, wrl_s)
    gch, gcl = dd.dd_reduce(ph, pl2, axis=0)

    gh, gl = dd.dd_add(tqhi, tqlo, gAh, gAl)
    gh, gl = dd.dd_add(gh, gl, -gch, -gcl)
    if has_P:
        pzh, pzl = _dd_pmatvec_row(tPhi, tPlo, zhi, zlo)
        gh, gl = dd.dd_add(gh, gl, pzh, pzl)

    # ---- pass 3: f32 preconditioner pieces: the A-curvature Gram and the
    # per-cone G32 = E^T (lhs*A) - rhs*c (both MXU) -----------------------
    def p3_body(ic, ah, al, acc):
        del al
        G, H = acc
        i0 = pl.multiple_of(ic * CH, CH)
        lhs32 = vec_ref[pl.ds(i0, CH), 0:1]
        wr32 = vec_ref[pl.ds(i0, CH), 2:3]
        E_s = E_ref[pl.ds(i0, CH), :]
        G = G + _dot_tn(E_s, ah * lhs32)
        H = H + _dot_tn(ah * wr32, ah)
        return G, H

    G32, H32 = foreach_a(
        p3_body, (jnp.zeros((KP, rp), jnp.float32),
                  jnp.zeros((rp, rp), jnp.float32)), need_lo=False)
    G32 = G32 - rhsh * chi_m                    # (KP, rp); rhs32 = rhsh
    Gw32 = w32_c * G32
    # c-curvature (+c c^T Gauss-Newton sign) and the G-Gram block
    H32 = H32 + _dot_tn(chi_m * w32_c, chi_m) + _dot_tn(Gw32, Gw32)
    if has_P:
        H32 = H32 + tPhi

    Hs, dsc_r, eye = _equilibrate(H32, r, rp)
    _factor_jittered(l_ref, dinv_ref, Hs, eye, nb)
    _chol_invert_ref(l_ref, dinv_ref, nb)   # l_ref now holds W = L^-1

    def _precond_solve(rhs_row):
        return _w_solve(l_ref, rhs_row)

    def _dd_apply(xh, xl):
        """True-operator dd matvec H x against {exact curvature +
        Gram(G32) [+ tP]} (see the module docstring's precision contract).
        """
        def body(ic, ah, al, acc):
            hh, hl = acc
            i0 = pl.multiple_of(ic * CH, CH)
            yh_c, yl_c = dd.dd_matvec_cols(ah, al, xh, xl)
            wyh, wyl = dd.dd_mul(vec_ref[pl.ds(i0, CH), 2:3],
                                 vec_ref[pl.ds(i0, CH), 3:4], yh_c, yl_c)
            ph2, pl3 = dd.dd_mul(ah, al, wyh, wyl)
            rh_c, rl_c = dd.dd_reduce(ph2, pl3, axis=0)
            return dd.dd_add(hh, hl, rh_c, rl_c)

        hxh, hxl = foreach_a(body, (zer, zer))
        # c-curvature term  c^T (w * (c x))
        ych, ycl = dd.dd_matvec_cols(chi_m, clo_m, xh, xl)
        wych, wycl = dd.dd_mul(wh_c, wl_c, ych, ycl)
        ph2, pl3 = dd.dd_mul(chi_m, clo_m, wych, wycl)
        ch_t, cl_t = dd.dd_reduce(ph2, pl3, axis=0)
        hxh, hxl = dd.dd_add(hxh, hxl, ch_t, cl_t)
        # G-Gram term  Gw32^T (Gw32 x)  (G32 values exact in dd)
        zg = jnp.zeros_like(Gw32)
        ygh, ygl = dd.dd_matvec_cols(Gw32, zg, xh, xl)
        ph2, pl3 = dd.dd_mul(Gw32, zg, ygh, ygl)
        gh_t, gl_t = dd.dd_reduce(ph2, pl3, axis=0)
        hxh, hxl = dd.dd_add(hxh, hxl, gh_t, gl_t)
        if has_P:
            pxh, pxl = _dd_pmatvec_row(tPhi, tPlo, xh, xl)
            hxh, hxl = dd.dd_add(hxh, hxl, pxh, pxl)
        return hxh, hxl

    # refinement + dd-PCG stall escalation, shared with the LP/QP kernel
    xh, xl, rh, rl, rn2, bn2 = _refined_solve(
        _precond_solve, _dd_apply, Hs, dsc_r, gh, gl, refine, rp,
        stall_rel2=stall_rel2)

    return dict(xh=xh, xl=xl, gh=gh, gl=gl, rn2=rn2, bn2=bn2,
                seh=seh, sel=sel, rhsh=rhsh, rhsl=rhsl,
                ish=ish, isl=isl, chi_m=chi_m, clo_m=clo_m)


def _socp_step_kernel(Ahi_ref, Alo_ref, bhi_ref, blo_ref, E_ref,
                      chi_ref, clo_ref, dhi_ref, dlo_ref, tqhi_ref,
                      tqlo_ref, zhi_ref, zlo_ref, tPhi_ref, tPlo_ref,
                      sig_ref, xnh_ref, xnl_ref, dxh_ref, dxl_ref,
                      stats_ref, l_ref, dinv_ref, x_ref, vec_ref,
                      *, nb: int, nck: int, refine: int, has_P: bool,
                      r: int, rp: int, alpha: float,
                      stall_rel2: float = 1e-12, CH: int = CH):
    """Full SOCP Newton step: direction + closed-form line search.

    Line search: the cone slack along the step is quadratic in sigma,
    s_k(sig) = s_k * (1 + u_k),  u_k = sig*a_k + sig^2*b_k,
    a_k = p1_k/s_k, b_k = p2_k/s_k (ops/socp.py _cands), so the Armijo
    test  Delta(sig) <= alpha*sig*g.dx  rearranges exactly to

      sig*(1-alpha)*g.dx + sig^2*(q2 - sum_k b_k)
        + sum_k phi(-u_k) <= 0,   phi(y) = -log1p(-y) - y,

    every term well-scaled in f32 (same derivation as the LP kernel's
    _phi_stable comment; sum_k b_k arises from phi2 = sig*a_k -
    log1p(u_k) = phi(-u_k) - sig^2*b_k).  Domain: 1 + u_k > 0 per cone
    and 1 + sig*v_k > 0 for the rhs entries, v_k = (c_k.dx)/rhs_k
    (reference two-phase search: NewtonSolver.py:157-206; XLA sweep:
    ops/socp.py ls_objs).
    """
    foreach_a = _make_foreach_resident(Ahi_ref, Alo_ref, nck, CH)
    zhi, zlo = zhi_ref[:], zlo_ref[:]
    tPhi, tPlo = tPhi_ref[:], tPlo_ref[:]
    out = _socp_core(
        foreach_a, E_ref, bhi_ref, blo_ref, chi_ref, clo_ref, dhi_ref,
        dlo_ref, tqhi_ref[:], tqlo_ref[:], zhi, zlo, tPhi, tPlo,
        l_ref, dinv_ref, x_ref, vec_ref,
        nb=nb, refine=refine, has_P=has_P, r=r, rp=rp,
        stall_rel2=stall_rel2, CH=CH)
    xh, xl = out["xh"], out["xl"]
    gh, gl = out["gh"], out["gl"]
    chi_m, clo_m = out["chi_m"], out["clo_m"]
    sig = sig_ref[:]                                   # (1, J) f32
    J = sig.shape[1]

    # g.dx (dd) and optional q2 = t/2 dx.P dx
    gxh, gxl = dd.dd_mul(gh, gl, xh, xl)
    gxh, gxl = dd.dd_reduce(gxh, gxl, axis=1)          # (1, 1)
    gdx32 = gxh[0, 0]
    if has_P:
        pdh, pdl = _dd_pmatvec_row(tPhi, tPlo, xh, xl)
        qh, ql = dd.dd_mul(pdh, pdl, xh, xl)
        qh, _ = dd.dd_reduce(qh, ql, axis=1)
        q2 = 0.5 * qh[0, 0]
    else:
        q2 = jnp.zeros((), jnp.float32)

    # ---- per-cone line-search coefficients (one more pass over A) ------
    # ip1_k = sum_m lhs*adx, ip2_k = sum_m adx^2  (masked dd reductions)
    def ls_body(ic, ah, al, acc):
        i1h, i1l, i2h, i2l = acc
        i0 = pl.multiple_of(ic * CH, CH)
        adh, adl = dd.dd_matvec_cols(ah, al, xh, xl)   # (CH, 1)
        lh, ll = (vec_ref[pl.ds(i0, CH), 0:1],
                  vec_ref[pl.ds(i0, CH), 1:2])
        q1h, q1l = dd.dd_mul(lh, ll, adh, adl)
        q2h, q2l = dd.dd_mul(adh, adl, adh, adl)
        E_s = E_ref[pl.ds(i0, CH), :]
        r1h, r1l = dd.dd_reduce(q1h * E_s, q1l * E_s, axis=0)
        r2h, r2l = dd.dd_reduce(q2h * E_s, q2l * E_s, axis=0)
        i1h, i1l = dd.dd_add(i1h, i1l, r1h, r1l)
        i2h, i2l = dd.dd_add(i2h, i2l, r2h, r2l)
        return i1h, i1l, i2h, i2l

    zerk = jnp.zeros((1, KP), jnp.float32)
    ip1h, ip1l, ip2h, ip2l = foreach_a(
        ls_body, (zerk, zerk, zerk, zerk))
    ip1h_c, ip1l_c = _row_to_col(ip1h), _row_to_col(ip1l)
    ip2h_c, ip2l_c = _row_to_col(ip2h), _row_to_col(ip2l)

    cdh, cdl = dd.dd_matvec_cols(chi_m, clo_m, xh, xl)      # (KP, 1)
    rch, rcl = dd.dd_mul(out["rhsh"], out["rhsl"], cdh, cdl)
    p1h, p1l = dd.dd_add(rch, rcl, -ip1h_c, -ip1l_c)
    p1h, p1l = dd.dd_mul_f32(p1h, p1l, 2.0)
    c2h, c2l = dd.dd_mul(cdh, cdl, cdh, cdl)
    p2h, p2l = dd.dd_add(c2h, c2l, -ip2h_c, -ip2l_c)

    # a = p1/s, b = p2/s, v = cdx/rhs  (dd ratio -> f32: all O(1)-scaled)
    ah_c, _ = dd.dd_mul(p1h, p1l, out["ish"], out["isl"])
    # ish = 1/(s+eps) from the core; reuse for both ratios
    bh_c, _ = dd.dd_mul(p2h, p2l, out["ish"], out["isl"])
    irh, irl = _dd_recip(out["rhsh"], out["rhsl"])
    vh_c, _ = dd.dd_mul(cdh, cdl, irh, irl)
    a32, b32, v32 = ah_c, bh_c, vh_c                       # (KP, 1)

    # candidate sweep (KP, J): u = sig*a + sig^2*b
    u = a32 * sig + b32 * (sig * sig)
    # all(1+x > eps) as an f32 min-reduction: Mosaic lowers boolean
    # all-reductions to an f64 minimumf multi_reduction it cannot
    # compile on v5e ("Unsupported element type for the selected
    # reduction"); min(x) > eps-1 is the same predicate in pure f32.
    dom_cone = jnp.min(u, axis=0, keepdims=True) > (1e-6 - 1.0)
    dom_rhs = jnp.min(v32 * sig, axis=0, keepdims=True) > (1e-6 - 1.0)
    phisum = jnp.sum(_phi_stable(-u), axis=0, keepdims=True)   # (1, J)
    sumb = jnp.sum(b32)
    armijo = (sig * ((1.0 - alpha) * gdx32)
              + sig * sig * (q2 - sumb) + phisum) <= 0.0
    accept = dom_cone & dom_rhs & armijo & jnp.isfinite(phisum)
    sigma = jnp.max(jnp.where(accept, sig, jnp.zeros_like(sig)))
    any_acc = sigma > 0.0

    sdh, sdl = dd.dd_mul_f32(xh, xl, sigma)
    xnh, xnl = dd.dd_add(zhi, zlo, sdh, sdl)
    xnh_ref[:] = xnh
    xnl_ref[:] = xnl
    dxh_ref[:] = xh
    dxl_ref[:] = xl

    stats_ref[0, 0] = -0.5 * gxh[0, 0]
    stats_ref[0, 1] = -0.5 * gxl[0, 0]
    stats_ref[0, 2] = sigma
    stats_ref[0, 3] = any_acc.astype(jnp.float32)
    stats_ref[0, 4] = out["rn2"]
    stats_ref[0, 5] = gdx32
    stats_ref[0, 6] = out["bn2"]
    stats_ref[0, 7] = q2


def supported(K: int, M: int, r: int, has_P: bool) -> bool:
    """Whether the VMEM-resident SOCP kernel covers (K, M, r) on v5e.

    Liveness: the A_flat dd pair + E + H/L/G32 blocks + [tP pair] + slab
    temporaries + vec_ref.  Cones beyond KP(=128) or rp > 1536 (factor
    envelope, as the LP kernel) fall back to the XLA dd oracle path.
    """
    if K > KP:
        return False
    rp = _pad(r)
    ch = pick_ch(rp)
    kmp = _padk(K * M, ch)
    words = (2 * kmp * rp                    # Ahi/Alo
             + kmp * KP                      # E
             + (4 + (2 if has_P else 0)) * rp * rp   # Hs, L, [tP pair]
             + 2 * KP * rp                   # G32, Gw32
             + 14 * ch * rp                  # slab dd temporaries
             + 10 * kmp)                     # vec_ref and (kmp, 1) columns
    return words * 4 <= 110 * 1024 * 1024 and rp <= 1536


class SOCPConsts(typing.NamedTuple):
    """Pre-split cone constants (hoisted out of the Newton while_loop)."""
    Ahi: jax.Array   # (KMp, rp)
    Alo: jax.Array
    bhi: jax.Array   # (KMp, 1)
    blo: jax.Array
    E: jax.Array     # (KMp, KP) 0/1 cone membership
    chi: jax.Array   # (KP, rp)
    clo: jax.Array
    dhi: jax.Array   # (KP, 1); padded cones rhs = 1 (slack 1, zero grads)
    dlo: jax.Array
    K: int
    M: int
    r: int


def prep_socp_consts(prob) -> SOCPConsts:
    """Flatten/pad/split the stacked cone tensors once per solve."""
    K, M, r = prob.A.shape
    km = K * M
    rp = _pad(r)
    kmp = _padk(km, pick_ch(rp))
    Ahi, Alo = dd.split_f64(_pad2(prob.A.reshape(km, r), kmp, rp))
    bhi, blo = dd.split_f64(_pad2(prob.b.reshape(km, 1), kmp, 1))
    row = jnp.arange(kmp)
    E = ((row[:, None] // M == jnp.arange(KP)[None, :])
         & (row[:, None] < km)).astype(jnp.float32)
    chi, clo = dd.split_f64(_pad2(prob.c, KP, rp))
    dcol = _pad2(prob.d[:, None], KP, 1).at[K:, :].set(1.0)
    dhi, dlo = dd.split_f64(dcol)
    return SOCPConsts(Ahi=Ahi, Alo=Alo, bhi=bhi, blo=blo, E=E,
                      chi=chi, clo=clo, dhi=dhi, dlo=dlo, K=K, M=M, r=r)


def socp_newton_step_prepared(consts: SOCPConsts, tq, z, tP, sigmas, *,
                              alpha: float, refine: int = 3,
                              interpret: bool = False,
                              dir_tol: float = 1e-6):
    """One full SOCP Newton iteration (direction + line search) as ONE
    kernel.  Mirrors pallas_newton.reduced_newton_step_prepared.

    Args:
      consts: pre-split cone tensors from prep_socp_consts.
      tq: (r,) f64 t-scaled linear cost t*q (zeros when q is None).
      z: (r,) f64 current iterate (strictly cone-interior).
      tP: optional (r, r) f64 t-scaled quadratic term.
      sigmas: (J,) candidate steps beta**k; alpha: Armijo parameter.

    Returns:
      (x_new, nd, sigma, any_acc, dir_ok, dx): accepted iterate (f64),
      Newton decrement, accepted step, any-candidate flag,
      direction-trust flag, and the (undamped) Newton direction.
    """
    r = consts.r
    rp = _pad(r)
    nb = rp // BLK
    ch = pick_ch(rp)
    kmp = consts.Ahi.shape[0]
    nck = kmp // ch
    f64 = tq.dtype

    tqhi, tqlo = dd.split_f64(_pad2(tq[None, :], 1, rp))
    zhi, zlo = dd.split_f64(_pad2(z[None, :], 1, rp))
    if tP is not None:
        tPhi, tPlo = dd.split_f64(_pad2(tP, rp, rp))
    else:
        tPhi = tPlo = jnp.zeros((BLK, BLK), jnp.float32)
    J = sigmas.shape[0]
    Jp = max(BLK, -(-J // BLK) * BLK)
    sig32 = jnp.zeros((1, Jp), jnp.float32).at[0, :J].set(
        sigmas.astype(jnp.float32))

    kernel = functools.partial(
        _socp_step_kernel, nb=nb, nck=nck, refine=refine,
        has_P=tP is not None, r=r, rp=rp, alpha=float(alpha),
        stall_rel2=float(dir_tol) ** 2, CH=ch)
    with jax.enable_x64(False):
        xnh, xnl, dxh, dxl, stats = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, 8), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 16,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4
            + (pl.BlockSpec(memory_space=pltpu.SMEM),),
            scratch_shapes=[
                pltpu.VMEM((rp, rp), jnp.float32),
                pltpu.VMEM((rp, BLK), jnp.float32),
                pltpu.VMEM((1, rp), jnp.float32),
                pltpu.VMEM((kmp, 8), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )(consts.Ahi, consts.Alo, consts.bhi, consts.blo, consts.E,
          consts.chi, consts.clo, consts.dhi, consts.dlo, tqhi, tqlo,
          zhi, zlo, tPhi, tPlo, sig32)

    x_new = dd.join_f64(xnh, xnl)[0, :r].astype(f64)
    dx = dd.join_f64(dxh, dxl)[0, :r].astype(f64)
    nd = stats[0, 0].astype(f64) + stats[0, 1].astype(f64)
    sigma = stats[0, 2]
    any_acc = stats[0, 3] > 0.5
    dir_ok = stats[0, 4] <= 1e-4 * stats[0, 6] + 1e-30
    return x_new, nd, sigma, any_acc, dir_ok, dx
