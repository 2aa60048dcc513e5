"""Pure-XLA Newton step for shapes beyond the fused-kernel envelopes
(rp > 1536): the mega-kernel's ALGORITHM without any Mosaic kernel.

Why not Pallas here: a round-4 split-pipeline Pallas variant (Gram
pass + XLA factor + refine/sweep pass) passed interpret-mode parity,
but the v5e Mosaic compile of its refine/sweep kernel crashed the
remote compile helper at exactly these shapes (round-4:
benchmarks/results/xl_compile_check.log — the gram/gradient kernel
compiled in 14 s, the refine/sweep kernel died after up to an hour of
register-spill grinding).  It was deleted in round 5 (git history:
ops/pallas_xl.py) because this pure-XLA step made it redundant at
every shape it targeted.  At rp ≥ 1664 every pass is throughput-bound
(100s of µs of MXU/HBM work), so XLA's ~µs-scale op overheads — the
reason the small-shape mega-kernels exist — are noise, and XLA's own
tiling handles the (k, rp) operands that break Mosaic's register
allocator.

What this keeps from the fused kernels (ops/pallas_newton.py), i.e.
why it is ~an order faster than the pre-round-2 staged XLA path at
these shapes:

* double-float (two-f32) slacks/gradient/residuals — no emulated-f64
  on the hot path (XLA fuses the dd elementwise work into the
  reductions, so no (k, rp) dd temporaries materialize);
* f32 HIGHEST Gram on the MXU, Jacobi equilibration, jitter-laddered
  f32 XLA cholesky + full triangular inverse W = L⁻¹ as
  PRECONDITIONER ONLY (_factor_w_xla below);
* the shared dd refinement + ε-gated dd-PCG escalation
  (pallas_newton._refined_solve — pure jnp, runs under XLA unchanged);
* the closed-form cancellation-free line-search sweep in f32
  (_phi_stable), replacing the reference-style f64 log sweep whose
  emulated logs dominated the old path
  (reference per-step equivalent: NewtonSolverInfeasibleStart.py:396-490).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import dd
from .pallas_newton import (_dd_recip, _phi_stable, _refined_solve,
                            ReducedConsts, _pad, _pad2)

_HI = jax.lax.Precision.HIGHEST
# 3-pass f32 (bf16x3) for the PRECONDITIONER Gram only: H32 feeds the
# equilibrate -> f32 factor -> W chain, whose output the dd refinement
# corrects against the true operator regardless, so its ~1e-6 relative
# assembly error is invisible next to the factor's own kappa*eps32 —
# and the 6-pass HIGHEST Gram is the dominant throughput cost of the
# XL step (round5l probe).  Residuals/gradients stay dd/HIGHEST.
_HI3 = jax.lax.Precision.HIGH


def _equilibrate_xla(H32, r: int, rp: int):
    """XLA mirror of pallas_newton._equilibrate (identity on padded
    columns + Jacobi scaling).  f32 in, f32 out."""
    idx = jnp.arange(rp)
    pad = (idx >= r).astype(jnp.float32)
    H32 = H32 + jnp.diag(pad)
    dg = jnp.diagonal(H32)
    dsc = lax.rsqrt(jnp.maximum(dg, 1e-30))
    return H32 * dsc[:, None] * dsc[None, :], dsc


def _factor_w_xla(Hs, rp: int):
    """Jitter-laddered XLA f32 cholesky + full triangular inverse
    W = L⁻¹ (solve_triangular against I: one throughput-bound batched
    solve).  Mirrors pallas_newton._factor_jittered's ladder; as there,
    jitter only degrades the preconditioner, never the answer."""
    from jax.scipy.linalg import solve_triangular
    eye = jnp.eye(rp, dtype=jnp.float32)

    def cond(c):
        i, W, bad = c
        return bad & (i < 4)

    def body(c):
        i, _, _ = c
        delta = jnp.where(
            i == 0, 0.0,
            jnp.where(i == 1, 1e-6, jnp.where(i == 2, 3e-3, 1.0))
        ).astype(jnp.float32)
        L = jnp.linalg.cholesky(Hs + delta * eye)
        W = solve_triangular(L, eye, lower=True)
        ok = jnp.isfinite(jnp.sum(W))
        return i + 1, W, ~ok

    _, W, _ = lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), jnp.zeros((rp, rp), jnp.float32),
         jnp.ones((), bool)))
    return W


_dd_rowvec_matvec = dd.dd_matvec_cols             # M x -> (k, 1) dd


def _dd_colreduce(Mhi, Mlo, vh, vl):
    """dd (1, rp) result of Mᵀ v for dd M (k, rp), dd v (k, 1)."""
    ph, pl_ = dd.dd_mul(Mhi, Mlo, vh, vl)
    return dd.dd_reduce(ph, pl_, axis=0)          # (1, rp) dd


def reduced_newton_step_xla(consts: ReducedConsts, tc, z, tP, sigmas, *,
                            alpha: float, refine: int = 3,
                            dir_tol: float = 1e-6):
    """One full Newton iteration (direction + line search), pure XLA.

    Same contract as pallas_newton.reduced_newton_step_prepared:
    returns (x_new, nd, sigma, any_acc, dir_ok).
    """
    k, r = consts.k, consts.r
    rp = _pad(r)
    f64 = tc.dtype
    Chi, Clo = consts.Chi, consts.Clo
    dhi, dlo = consts.dhi, consts.dlo

    tchi, tclo = dd.split_f64(_pad2(tc[None, :], 1, rp))
    zhi, zlo = dd.split_f64(_pad2(z[None, :], 1, rp))
    has_P = tP is not None
    if has_P:
        tPhi, tPlo = dd.split_f64(_pad2(tP, rp, rp))

    # ---- slacks, weights, gradient ------------------------------------
    mh, ml = _dd_rowvec_matvec(Chi, Clo, zhi, zlo)
    sh, sl = dd.dd_add(dhi, dlo, -mh, -ml)        # (kp, 1) dd slacks
    ish, isl = _dd_recip(sh, sl)
    wh, wl = dd.dd_mul(ish, isl, ish, isl)
    bth, btl = _dd_colreduce(Chi, Clo, ish, isl)  # Cᵀ(1/s)
    gh, gl = dd.dd_add(tchi, tclo, bth, btl)

    def _dd_pmatvec(xh, xl):
        """(P x)ᵀ as a (1, rp) dd row: broadcast x as a COLUMN against
        P's rows and reduce axis 0 — Σ_a P[a,b] x[a] = (Px)[b] by
        symmetry (the pallas kernels' _dd_pmatvec_row, XLA-native)."""
        ph, pl_ = dd.dd_mul(tPhi, tPlo, xh.T, xl.T)
        return dd.dd_reduce(ph, pl_, axis=0)      # (1, rp)

    if has_P:
        pzh, pzl = _dd_pmatvec(zhi, zlo)
        gh, gl = dd.dd_add(gh, gl, pzh, pzl)

    # ---- f32 Gram + factor (preconditioner only) ----------------------
    H32 = jnp.dot((Chi * wh).T, Chi, precision=_HI3,
                  preferred_element_type=jnp.float32)
    if has_P:
        H32 = H32 + tPhi
    Hs, dsc = _equilibrate_xla(H32, r, rp)
    W = _factor_w_xla(Hs, rp)
    dsc_r = dsc[None, :]

    def _precond_solve(rhs_row):
        return jnp.dot(jnp.dot(rhs_row, W.T, precision=_HI,
                               preferred_element_type=jnp.float32),
                       W, precision=_HI, preferred_element_type=jnp.float32)

    def _dd_apply(xh, xl):
        yh, yl = _dd_rowvec_matvec(Chi, Clo, xh, xl)
        wyh, wyl = dd.dd_mul(wh, wl, yh, yl)
        hh, hl = _dd_colreduce(Chi, Clo, wyh, wyl)
        if has_P:
            ph, pl_ = _dd_pmatvec(xh, xl)
            hh, hl = dd.dd_add(hh, hl, ph, pl_)
        return hh, hl

    xh, xl, rh, rl, rn2, bn2 = _refined_solve(
        _precond_solve, _dd_apply, None, dsc_r, gh, gl, refine, rp,
        stall_rel2=float(dir_tol) ** 2)

    # ---- closed-form backtracking line search -------------------------
    gxh, gxl = dd.dd_mul(gh, gl, xh, xl)
    gxh, gxl = dd.dd_reduce(gxh, gxl, axis=1)
    gdx32 = gxh[0, 0]
    if has_P:
        pdh, pdl = _dd_pmatvec(xh, xl)
        qh, ql = dd.dd_mul(pdh, pdl, xh, xl)
        qh, _ = dd.dd_reduce(qh, ql, axis=1)
        q2 = 0.5 * qh[0, 0]
    else:
        q2 = jnp.zeros((), jnp.float32)

    cdh, cdl = _dd_rowvec_matvec(Chi, Clo, xh, xl)   # C dx (kp, 1)
    uh, _ = dd.dd_mul(cdh, cdl, ish, isl)
    u32 = uh                                          # (kp, 1) f32
    sig = sigmas.astype(jnp.float32)[None, :]         # (1, J)
    y = u32 * sig                                     # (kp, J)
    phisum = jnp.sum(_phi_stable(y), axis=0, keepdims=True)
    umax = jnp.max(u32)
    domain = (sig * umax) < (1.0 - 1e-6)
    armijo = (sig * ((1.0 - alpha) * gdx32) + sig * sig * q2
              + phisum) <= 0.0
    accept = domain & armijo & jnp.isfinite(phisum)
    sigma = jnp.max(jnp.where(accept, sig, jnp.zeros_like(sig)))
    any_acc = sigma > 0.0

    sdh, sdl = dd.dd_mul_f32(xh, xl, sigma)
    xnh, xnl = dd.dd_add(zhi, zlo, sdh, sdl)
    x_new = dd.join_f64(xnh, xnl)[0, :r].astype(f64)
    nd = (-0.5 * gxh[0, 0]).astype(f64) + (-0.5 * gxl[0, 0]).astype(f64)
    dir_ok = rn2 <= 1e-4 * bn2 + 1e-30
    return x_new, nd, sigma, any_acc, dir_ok


def xla_step_supported(k: int, r: int, has_P: bool) -> bool:
    """The pure-XLA step has no VMEM envelope; bound it by HBM: the C
    dd pair + Gram/factor blocks must fit comfortably in 16 GB."""
    rp = _pad(r)
    kp = max(256, -(-k // 256) * 256)
    bytes_ = (2 * kp * rp + 3 * rp * rp
              + (2 * rp * rp if has_P else 0)) * 4
    return bytes_ <= 8 * 1024 ** 3


# ---------------------------------------------------------------------------
# SOCP (stacked-cone) pure-XLA step.  Cones are contiguous M-row blocks
# of the flattened (K·M, rp) matrix, so every per-cone reduction is a
# static reshape to (K, M, ·) — no membership matrix at all.
# ---------------------------------------------------------------------------

from .barrier import SOCP_SLACK_EPS  # noqa: E402
from .pallas_socp import SOCPConsts  # noqa: E402


def socp_newton_step_xla(consts: SOCPConsts, tq, z, tP, sigmas, *,
                         alpha: float, refine: int = 3,
                         dir_tol: float = 1e-6):
    """One full SOCP Newton iteration (direction + cone line search),
    pure XLA.  Same contract as
    pallas_socp.socp_newton_step_prepared: returns
    (x_new, nd, sigma, any_acc, dir_ok, dx).  Math identical to the
    fused SOCP kernel (ops/pallas_socp.py module docstring), including
    the Gauss-Newton +ccᵀ curvature and the Gram(G32) operator
    approximation."""
    K, M, r = consts.K, consts.M, consts.r
    km = K * M
    rp = _pad(r)
    f64 = tq.dtype
    Ahi, Alo = consts.Ahi, consts.Alo
    chi_m, clo_m = consts.chi[:K], consts.clo[:K]      # (K, rp)
    dhi, dlo = consts.dhi[:K], consts.dlo[:K]          # (K, 1)

    tqhi, tqlo = dd.split_f64(_pad2(tq[None, :], 1, rp))
    zhi, zlo = dd.split_f64(_pad2(z[None, :], 1, rp))
    has_P = tP is not None
    if has_P:
        tPhi, tPlo = dd.split_f64(_pad2(tP, rp, rp))

    def _per_cone(vh, vl):
        """dd (kmp, 1) row quantity -> per-cone dd sums (K, 1)."""
        rh, rl = (vh[:km].reshape(K, M), vl[:km].reshape(K, M))
        return dd.dd_reduce(rh, rl, axis=1)

    # ---- cone slacks, weights -----------------------------------------
    mh, ml = dd.dd_matvec_cols(Ahi, Alo, zhi, zlo)
    lh, ll = dd.dd_add(mh, ml, consts.bhi, consts.blo)     # lhs (kmp, 1)
    l2h, l2l = dd.dd_mul(lh, ll, lh, ll)
    ssqh, ssql = _per_cone(l2h, l2l)                       # (K, 1)
    rh0, rl0 = dd.dd_matvec_cols(chi_m, clo_m, zhi, zlo)
    rhsh, rhsl = dd.dd_add(rh0, rl0, dhi, dlo)             # (K, 1)
    r2h, r2l = dd.dd_mul(rhsh, rhsl, rhsh, rhsl)
    sh, sl = dd.dd_add(r2h, r2l, -ssqh, -ssql)
    seh, sel = dd.dd_add(sh, sl, jnp.full_like(sh, SOCP_SLACK_EPS),
                         jnp.zeros_like(sh))
    ish, isl = _dd_recip(seh, sel)
    wh, wl = dd.dd_mul_f32(ish, isl, 2.0)                  # (K, 1)

    # per-row weight scatter (exact: one cone per row)
    wrow_h = jnp.zeros_like(lh).at[:km].set(
        jnp.repeat(wh, M, axis=0))
    wrow_l = jnp.zeros_like(ll).at[:km].set(
        jnp.repeat(wl, M, axis=0))

    # ---- gradient ------------------------------------------------------
    yh, yl = dd.dd_mul(wrow_h, wrow_l, lh, ll)
    gAh, gAl = _dd_colreduce(Ahi, Alo, yh, yl)
    wrh_s, wrl_s = dd.dd_mul(wh, wl, rhsh, rhsl)
    gch, gcl = _dd_colreduce(chi_m, clo_m, wrh_s, wrl_s)
    gh, gl = dd.dd_add(tqhi, tqlo, gAh, gAl)
    gh, gl = dd.dd_add(gh, gl, -gch, -gcl)

    def _dd_pmatvec(xh, xl):
        ph, pl_ = dd.dd_mul(tPhi, tPlo, xh.T, xl.T)
        return dd.dd_reduce(ph, pl_, axis=0)

    if has_P:
        pzh, pzl = _dd_pmatvec(zhi, zlo)
        gh, gl = dd.dd_add(gh, gl, pzh, pzl)

    # ---- f32 preconditioner pieces ------------------------------------
    A32 = Ahi
    G32 = (jnp.einsum("kmr,km->kr", A32[:km].reshape(K, M, rp),
                      lh[:km, 0].reshape(K, M), precision=_HI)
           - rhsh * chi_m)                                 # (K, rp)
    w32 = wh
    Gw32 = w32 * G32
    H32 = (jnp.dot((A32 * wrow_h).T, A32, precision=_HI3,
                   preferred_element_type=jnp.float32)
           + jnp.dot((chi_m * w32).T, chi_m, precision=_HI,
                     preferred_element_type=jnp.float32)
           + jnp.dot(Gw32.T, Gw32, precision=_HI,
                     preferred_element_type=jnp.float32))
    if has_P:
        H32 = H32 + tPhi
    Hs, dsc = _equilibrate_xla(H32, r, rp)
    W = _factor_w_xla(Hs, rp)
    dsc_r = dsc[None, :]

    def _precond_solve(rhs_row):
        return jnp.dot(jnp.dot(rhs_row, W.T, precision=_HI,
                               preferred_element_type=jnp.float32),
                       W, precision=_HI, preferred_element_type=jnp.float32)

    zg = jnp.zeros_like(Gw32)

    def _dd_apply(xh, xl):
        ah, al = dd.dd_matvec_cols(Ahi, Alo, xh, xl)
        wah, wal = dd.dd_mul(wrow_h, wrow_l, ah, al)
        hh, hl = _dd_colreduce(Ahi, Alo, wah, wal)
        ych, ycl = dd.dd_matvec_cols(chi_m, clo_m, xh, xl)
        wych, wycl = dd.dd_mul(wh, wl, ych, ycl)
        ch_t, cl_t = _dd_colreduce(chi_m, clo_m, wych, wycl)
        hh, hl = dd.dd_add(hh, hl, ch_t, cl_t)
        ygh, ygl = dd.dd_matvec_cols(Gw32, zg, xh, xl)
        gh_t, gl_t = _dd_colreduce(Gw32, zg, ygh, ygl)
        hh, hl = dd.dd_add(hh, hl, gh_t, gl_t)
        if has_P:
            ph, pl_ = _dd_pmatvec(xh, xl)
            hh, hl = dd.dd_add(hh, hl, ph, pl_)
        return hh, hl

    xh, xl, rhh, rll, rn2, bn2 = _refined_solve(
        _precond_solve, _dd_apply, None, dsc_r, gh, gl, refine, rp,
        stall_rel2=float(dir_tol) ** 2)

    # ---- cone line search (ops/pallas_socp.py _socp_step_kernel) ------
    gxh, gxl = dd.dd_mul(gh, gl, xh, xl)
    gxh, gxl = dd.dd_reduce(gxh, gxl, axis=1)
    gdx32 = gxh[0, 0]
    if has_P:
        pdh, pdl = _dd_pmatvec(xh, xl)
        qh, ql = dd.dd_mul(pdh, pdl, xh, xl)
        qh, _ = dd.dd_reduce(qh, ql, axis=1)
        q2 = 0.5 * qh[0, 0]
    else:
        q2 = jnp.zeros((), jnp.float32)

    adh, adl = dd.dd_matvec_cols(Ahi, Alo, xh, xl)         # A dx
    q1h, q1l = dd.dd_mul(lh, ll, adh, adl)
    ip1h, ip1l = _per_cone(q1h, q1l)
    q2h_, q2l_ = dd.dd_mul(adh, adl, adh, adl)
    ip2h, ip2l = _per_cone(q2h_, q2l_)
    cdh, cdl = dd.dd_matvec_cols(chi_m, clo_m, xh, xl)     # (K, 1)
    rch, rcl = dd.dd_mul(rhsh, rhsl, cdh, cdl)
    p1h, p1l = dd.dd_add(rch, rcl, -ip1h, -ip1l)
    p1h, p1l = dd.dd_mul_f32(p1h, p1l, 2.0)
    c2h, c2l = dd.dd_mul(cdh, cdl, cdh, cdl)
    p2h, p2l = dd.dd_add(c2h, c2l, -ip2h, -ip2l)

    a32, _ = dd.dd_mul(p1h, p1l, ish, isl)
    b32, _ = dd.dd_mul(p2h, p2l, ish, isl)
    irh, irl = _dd_recip(rhsh, rhsl)
    v32, _ = dd.dd_mul(cdh, cdl, irh, irl)

    sig = sigmas.astype(jnp.float32)[None, :]              # (1, J)
    u = a32 * sig + b32 * (sig * sig)                      # (K, J)
    dom_cone = jnp.min(u, axis=0, keepdims=True) > (1e-6 - 1.0)
    dom_rhs = jnp.min(v32 * sig, axis=0, keepdims=True) > (1e-6 - 1.0)
    phisum = jnp.sum(_phi_stable(-u), axis=0, keepdims=True)
    sumb = jnp.sum(b32)
    armijo = (sig * ((1.0 - alpha) * gdx32)
              + sig * sig * (q2 - sumb) + phisum) <= 0.0
    accept = dom_cone & dom_rhs & armijo & jnp.isfinite(phisum)
    sigma = jnp.max(jnp.where(accept, sig, jnp.zeros_like(sig)))
    any_acc = sigma > 0.0

    sdh, sdl = dd.dd_mul_f32(xh, xl, sigma)
    xnh, xnl = dd.dd_add(zhi, zlo, sdh, sdl)
    x_new = dd.join_f64(xnh, xnl)[0, :r].astype(f64)
    dx = dd.join_f64(xh, xl)[0, :r].astype(f64)
    nd = (-0.5 * gxh[0, 0]).astype(f64) + (-0.5 * gxl[0, 0]).astype(f64)
    dir_ok = rn2 <= 1e-4 * bn2 + 1e-30
    return x_new, nd, sigma, any_acc, dir_ok, dx


def xla_socp_step_supported(K: int, M: int, r: int, has_P: bool) -> bool:
    """HBM envelope for the stacked-cone pure-XLA step."""
    rp = _pad(r)
    kmp = max(256, -(-(K * M) // 256) * 256)
    bytes_ = (2 * kmp * rp + 3 * rp * rp + K * rp
              + (2 * rp * rp if has_P else 0)) * 4
    return bytes_ <= 8 * 1024 ** 3
