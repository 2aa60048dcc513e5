"""XL regime for the fused barrier Newton step: LP/QP shapes beyond the
single-kernel VMEM envelope (rp > 1536), split into a three-stage
pipeline per step.

The resident/stream kernels (ops/pallas_newton.py) hold the Gram H32,
the factor, AND a dozen slab temporaries live in one kernel — their
joint VMEM liveness caps the fused regime at rp ≤ 1536 (round-3 VERDICT
weak #8: SOCP n=3000 and LP/QP beyond n≈7500 fell back to the staged
XLA path).  The latency probe (scripts/tpu_latency_probe.py) showed the
split costs nothing: an on-device pallas_call launch is ~0.17 us and
XLA's native f32 cholesky beats the in-kernel blocked factor 3-4x at
these sizes.  So beyond the mega-kernel envelope, one Newton step is:

  A. ``_xl_grad_gram_kernel`` (Pallas, C streamed from HBM): slacks,
     weights, 1/s into the per-row ``vec`` state, the barrier
     gradient's cone term, and the f32 Gram H32 = Cᵀdiag(w)C — one pass
     over C.  Only H32 (rp²) + one slab window live in VMEM.
  B. XLA glue: pad-identity + Jacobi equilibration of H32, the
     jitter-ladder f32 ``jnp.linalg.cholesky``, and the full triangular
     inverse W = L⁻¹ via ``solve_triangular`` (one throughput-bound
     batched solve; W makes every preconditioner application two MXU
     matvecs with no substitution chain).
  C. ``_xl_step_kernel`` (Pallas, C streamed, W resident): dd-refined
     direction against the true operator (pallas_newton._refined_solve
     — the factor is preconditioner-only, so the split changes no
     semantics) + the closed-form backtracking line search.

Same accuracy contract as the mega-kernel: float64 never on the TPU
critical path, every correction measured against the dd operator.
Reference scope anchor: the same per-step work as
NewtonSolverInfeasibleStart.py:396-490 at the reference's largest
benchmark scales (testSolver.py:1305-1333).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dd
from .pallas_chol import BLK
from .pallas_newton import (
    _dd_pmatvec_row, _dd_recip, _dot_tn, _make_foreach_stream, _pad, _pad2,
    _padk, _phi_stable, _refined_solve, _w_solve, pick_ch,
    ReducedConsts, _STREAM_MAX_ROWS,
)

# XL factor cap: kernel C keeps W (rp²) + slab temporaries resident.
# With a quadratic term, tP is kept HI-HALF ONLY in kernel C (f32): the
# refined direction then solves the operator {CᵀWC + f32(tP)} whose
# ~1e-8 relative distance from the exact Hessian is the same class as
# the SOCP kernel's Gram(G32) approximation (ops/pallas_socp.py
# precision contract) — the GRADIENT's tP·z term stays dd-exact,
# computed in the XLA glue and fed in.  This halves the tP footprint
# and lets has_P shapes reach the same rp ≤ 3072 cap (at a narrower
# slab chunk).
XL_MAX_RP = 3072


# Mosaic register-allocator spill slots in the refine/sweep kernel
# scale like ~70 WORDS of ch*rp (measured by the chipless AOT compiler:
# 133.7 MB of spill slots at ch=256, rp=1920 — 5x the hand-counted dd
# temporaries).  The chunk is picked so resident blocks + spills fit
# the 128 MB VMEM with margin.
_XL_SPILL_WORDS = 72
_XL_VMEM_BUDGET = 118 * 1024 * 1024

# Hardware gate: the xl kernels pass interpret-mode parity and the
# envelope model, but the v5e Mosaic compile of the refine/sweep kernel
# CRASHES the remote compile helper at the target shapes (subprocess
# exit 1 after up to ~1 h of grinding; round-4 logs
# benchmarks/results/xl_compile_check.log).  Until that is root-caused,
# engine selection treats xl as unavailable (the staged XLA path keeps
# those shapes correct); set IPTPU_ENABLE_XL=1 to opt in.
XL_ENABLED = os.environ.get("IPTPU_ENABLE_XL", "0") == "1"


def _xl_ch(rp: int, has_P: bool) -> int:
    """Slab chunk for the xl kernels: largest power-of-two slab whose
    projected spill footprint + resident blocks fits VMEM."""
    resident = (1 + (1 if has_P else 0)) * rp * rp * 4
    for ch in (512, 256, 128, 64, 32):
        if resident + _XL_SPILL_WORDS * ch * rp * 4 <= _XL_VMEM_BUDGET:
            return ch
    return 32


def xl_supported(k: int, r: int, has_P: bool) -> bool:
    """Whether the split-pipeline regime covers (k, r) on v5e (the
    spill-aware model of _xl_ch; validated by the chipless AOT
    compiler, scripts/tpu_xl_compile_check.py)."""
    if not XL_ENABLED:
        return False
    rp = _pad(r)
    ch = _xl_ch(rp, has_P)
    kp = _padk(k, pick_ch(rp))
    if rp > XL_MAX_RP:
        return False
    resident_c = (1 + (1 if has_P else 0)) * rp * rp
    words_a = rp * rp + _XL_SPILL_WORDS * ch * rp + 12 * kp
    words_c = resident_c + _XL_SPILL_WORDS * ch * rp + 12 * kp
    return (max(words_a, words_c) * 4 <= _XL_VMEM_BUDGET
            and kp <= _STREAM_MAX_ROWS)


def _xl_grad_gram_kernel(Chi_ref, Clo_ref, dhi_ref, dlo_ref, zhi_ref,
                         zlo_ref, bgh_ref, bgl_ref, h32_ref, vec_ref,
                         *scratch, nck: int, rp: int, CH: int):
    """Stage A: one streamed pass over C -> vec (s, w, 1/s), the
    gradient's cone term Cᵀ(1/s), and the f32 Gram (pass-1 of
    pallas_newton._direction_core, with H32 written to the output)."""
    bufh_ref, bufl_ref, sem_ref = scratch
    foreach_c = _make_foreach_stream(Chi_ref, Clo_ref, bufh_ref, bufl_ref,
                                     sem_ref, nck, CH)
    zhi, zlo = zhi_ref[:], zlo_ref[:]

    def p1_body(ic, ch, cl, acc):
        ah, al, H = acc
        i0 = pl.multiple_of(ic * CH, CH)
        mh, ml = dd.dd_matvec_cols(ch, cl, zhi, zlo)
        sh_c, sl_c = dd.dd_add(dhi_ref[pl.ds(i0, CH), :],
                               dlo_ref[pl.ds(i0, CH), :], -mh, -ml)
        ish_c, isl_c = _dd_recip(sh_c, sl_c)
        wh_c, wl_c = dd.dd_mul(ish_c, isl_c, ish_c, isl_c)
        vec_ref[pl.ds(i0, CH), 0:1] = sh_c
        vec_ref[pl.ds(i0, CH), 1:2] = sl_c
        vec_ref[pl.ds(i0, CH), 2:3] = wh_c
        vec_ref[pl.ds(i0, CH), 3:4] = wl_c
        vec_ref[pl.ds(i0, CH), 4:5] = ish_c
        vec_ref[pl.ds(i0, CH), 5:6] = isl_c
        ph, pl2 = dd.dd_mul(ch, cl, ish_c, isl_c)
        rh_c, rl_c = dd.dd_reduce(ph, pl2, axis=0)
        ah, al = dd.dd_add(ah, al, rh_c, rl_c)
        return ah, al, H + _dot_tn(ch * wh_c, ch)

    zer = jnp.zeros((1, rp), jnp.float32)
    bth, btl, H32 = foreach_c(
        p1_body, (zer, zer, jnp.zeros((rp, rp), jnp.float32)))
    bgh_ref[:] = bth
    bgl_ref[:] = btl
    h32_ref[:] = H32


def _pmatvec_hi(tPhi, xh, xl):
    """(P x)ᵀ as a (1, rp) dd pair from the HI half of tP only: two MXU
    row-dots (x's dd halves) two-summed.  The ~1e-8 relative error of
    representing tP in f32 perturbs the refined OPERATOR (and the
    line-search q2), not the gradient — same contract as the SOCP
    kernel's Gram(G32) block (ops/pallas_socp.py docstring)."""
    y1 = _dot(xh, tPhi)
    y2 = _dot(xl, tPhi)
    return dd.dd_add(y1, jnp.zeros_like(y1), y2, jnp.zeros_like(y2))


def _xl_step_kernel(Chi_ref, Clo_ref, vec_ref, tchi_ref, tclo_ref,
                    zhi_ref, zlo_ref, tPhi_ref, gph_ref, gpl_ref,
                    bgh_ref, bgl_ref, w_ref, dsc_ref, sig_ref,
                    xnh_ref, xnl_ref, stats_ref,
                    *scratch, nck: int, refine: int, has_P: bool,
                    rp: int, alpha: float, stall_rel2: float, CH: int):
    """Stage C: dd-refined direction (W = L⁻¹ preconditioner from the
    XLA factor) + closed-form backtracking line search.  Mirrors the
    second half of pallas_newton._newton_step_kernel; per-row state
    comes in via ``vec`` (stage A), the final C·dx lands in the
    ``vdx`` scratch side channel, and the gradient's dd-exact tP·z
    term comes in via ``gph/gpl`` (computed in the XLA glue — tP lives
    here hi-half only, see _pmatvec_hi)."""
    vdx_ref, bufh_ref, bufl_ref, sem_ref = scratch
    foreach_c = _make_foreach_stream(Chi_ref, Clo_ref, bufh_ref, bufl_ref,
                                     sem_ref, nck, CH)
    zhi, zlo = zhi_ref[:], zlo_ref[:]
    tPhi = tPhi_ref[:]
    dsc_r = dsc_ref[:]

    gh, gl = dd.dd_add(tchi_ref[:], tclo_ref[:], bgh_ref[:], bgl_ref[:])
    if has_P:
        gh, gl = dd.dd_add(gh, gl, gph_ref[:], gpl_ref[:])

    def _precond_solve(rhs_row):
        return _w_solve(w_ref, rhs_row)

    def _dd_apply(xh, xl):
        """True-operator dd matvec (streamed); stores per-row C·x into
        the vdx side channel (same trick as _direction_core)."""
        def body(ic, ch, cl, acc):
            ah, al = acc
            i0 = pl.multiple_of(ic * CH, CH)
            yh_c, yl_c = dd.dd_matvec_cols(ch, cl, xh, xl)
            vdx_ref[pl.ds(i0, CH), 0:1] = yh_c
            vdx_ref[pl.ds(i0, CH), 1:2] = yl_c
            wyh, wyl = dd.dd_mul(vec_ref[pl.ds(i0, CH), 2:3],
                                 vec_ref[pl.ds(i0, CH), 3:4], yh_c, yl_c)
            ph, pl2 = dd.dd_mul(ch, cl, wyh, wyl)
            rh_c, rl_c = dd.dd_reduce(ph, pl2, axis=0)
            return dd.dd_add(ah, al, rh_c, rl_c)

        zer = jnp.zeros((1, rp), jnp.float32)
        hxh, hxl = foreach_c(body, (zer, zer))
        if has_P:
            pxh, pxl = _pmatvec_hi(tPhi, xh, xl)
            hxh, hxl = dd.dd_add(hxh, hxl, pxh, pxl)
        return hxh, hxl

    xh, xl, rh, rl, rn2, bn2 = _refined_solve(
        _precond_solve, _dd_apply, None, dsc_r, gh, gl, refine, rp,
        stall_rel2=stall_rel2)

    sig = sig_ref[:]
    J = sig.shape[1]

    gxh, gxl = dd.dd_mul(gh, gl, xh, xl)
    gxh, gxl = dd.dd_reduce(gxh, gxl, axis=1)
    gdx32 = gxh[0, 0]
    if has_P:
        pdh, pdl = _pmatvec_hi(tPhi, xh, xl)
        qh, ql = dd.dd_mul(pdh, pdl, xh, xl)
        qh, _ = dd.dd_reduce(qh, ql, axis=1)
        q2 = 0.5 * qh[0, 0]
    else:
        q2 = jnp.zeros((), jnp.float32)

    def sw_body(ic, acc):
        phis, um = acc
        i0 = pl.multiple_of(ic * CH, CH)
        uh_c, _ = dd.dd_mul(vdx_ref[pl.ds(i0, CH), 0:1],
                            vdx_ref[pl.ds(i0, CH), 1:2],
                            vec_ref[pl.ds(i0, CH), 4:5],
                            vec_ref[pl.ds(i0, CH), 5:6])
        y = uh_c * sig                                # (CH, J)
        phis = phis + jnp.sum(_phi_stable(y), axis=0, keepdims=True)
        return phis, jnp.maximum(um, jnp.max(uh_c))

    phisum, umax = lax.fori_loop(
        0, nck, sw_body,
        (jnp.zeros((1, J), jnp.float32), jnp.float32(-jnp.inf)))
    domain = (sig * umax) < (1.0 - 1e-6)
    armijo = (sig * ((1.0 - alpha) * gdx32) + sig * sig * q2
              + phisum[0:1, :]) <= 0.0
    accept = domain & armijo & jnp.isfinite(phisum[0:1, :])
    sigma = jnp.max(jnp.where(accept, sig, jnp.zeros_like(sig)))
    any_acc = sigma > 0.0

    sdh, sdl = dd.dd_mul_f32(xh, xl, sigma)
    xnh, xnl = dd.dd_add(zhi, zlo, sdh, sdl)
    xnh_ref[:] = xnh
    xnl_ref[:] = xnl
    stats_ref[0, 0] = -0.5 * gxh[0, 0]
    stats_ref[0, 1] = -0.5 * gxl[0, 0]
    stats_ref[0, 2] = sigma
    stats_ref[0, 3] = any_acc.astype(jnp.float32)
    stats_ref[0, 4] = rn2
    stats_ref[0, 5] = gdx32
    stats_ref[0, 6] = bn2
    stats_ref[0, 7] = q2


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


def reduced_newton_step_xl_prepared(consts: ReducedConsts, tc, z, tP,
                                    sigmas, *, alpha: float,
                                    refine: int = 3,
                                    interpret: bool = False,
                                    dir_tol: float = 1e-6):
    """One full Newton iteration in the XL regime (module docstring).

    Same contract as pallas_newton.reduced_newton_step_prepared:
    returns (x_new, nd, sigma, any_acc, dir_ok)."""
    k, r = consts.k, consts.r
    rp = _pad(r)
    ch = _xl_ch(rp, tP is not None)
    kp = consts.Chi.shape[0]
    nck = kp // ch
    f64 = tc.dtype

    tchi, tclo = dd.split_f64(_pad2(tc[None, :], 1, rp))
    zhi, zlo = dd.split_f64(_pad2(z[None, :], 1, rp))
    if tP is not None:
        tPhi, tPlo = dd.split_f64(_pad2(tP, rp, rp))
    else:
        tPhi = tPlo = jnp.zeros((BLK, BLK), jnp.float32)
    J = sigmas.shape[0]
    Jp = max(BLK, -(-J // BLK) * BLK)
    sig32 = jnp.zeros((1, Jp), jnp.float32).at[0, :J].set(
        sigmas.astype(jnp.float32))

    kernel_a = functools.partial(_xl_grad_gram_kernel, nck=nck, rp=rp,
                                 CH=ch)
    kernel_c = functools.partial(
        _xl_step_kernel, nck=nck, refine=refine, has_P=tP is not None,
        rp=rp, alpha=float(alpha), stall_rel2=float(dir_tol) ** 2, CH=ch)

    with jax.enable_x64(False):
        bgh, bgl, H32, vec = pl.pallas_call(
            kernel_a,
            out_shape=(
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((rp, rp), jnp.float32),
                jax.ShapeDtypeStruct((kp, 8), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4,
            scratch_shapes=[
                pltpu.VMEM((2, ch, rp), jnp.float32),
                pltpu.VMEM((2, ch, rp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )(consts.Chi, consts.Clo, consts.dhi, consts.dlo, zhi, zlo)

        if tP is not None:
            H32 = H32 + tPhi
            # gradient tP·z term, dd-exact, in XLA (the kernel keeps tP
            # hi-half only — see _pmatvec_hi)
            gph, gpl = _dd_pmatvec_row(tPhi, tPlo, zhi, zlo)
        else:
            gph = gpl = jnp.zeros((1, rp), jnp.float32)
        Hs, dsc = _equilibrate_xla(H32, r, rp)
        W = _factor_w_xla(Hs, rp)

        xnh, xnl, stats = pl.pallas_call(
            kernel_c,
            out_shape=(
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, 8), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2
            + (pl.BlockSpec(memory_space=pltpu.SMEM),),
            scratch_shapes=[
                pltpu.VMEM((kp, 2), jnp.float32),
                pltpu.VMEM((2, ch, rp), jnp.float32),
                pltpu.VMEM((2, ch, rp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )(consts.Chi, consts.Clo, vec, tchi, tclo, zhi, zlo, tPhi,
          gph, gpl, bgh, bgl, W, dsc[None, :], sig32)

    x_new = dd.join_f64(xnh, xnl)[0, :r].astype(f64)
    nd = (stats[0, 0].astype(f64) + stats[0, 1].astype(f64))
    sigma = stats[0, 2]
    any_acc = stats[0, 3] > 0.5
    dir_ok = stats[0, 4] <= 1e-4 * stats[0, 6] + 1e-30
    return x_new, nd, sigma, any_acc, dir_ok


# ---------------------------------------------------------------------------
# SOCP XL: the same split pipeline for the stacked-cone barrier step
# (ops/pallas_socp.py beyond its rp ≤ 1536 envelope — SOCP n=3000-class).
# Differences from the resident SOCP kernel, beyond streaming A from HBM:
# cone membership is computed in-kernel from a per-row cone-index column
# (no (KMp, KP) E matrix in VMEM), and the line-search pass reads the
# A·dx side channel instead of re-streaming A.
# ---------------------------------------------------------------------------

from .barrier import SOCP_SLACK_EPS  # noqa: E402  (after jax imports)
from .pallas_newton import _dot, _row_to_col  # noqa: E402
from .pallas_socp import KP, SOCPConsts  # noqa: E402


def xl_socp_supported(K: int, M: int, r: int, has_P: bool) -> bool:
    """Split-pipeline envelope for the stacked-cone step (tP hi-half
    only, as the LP/QP xl kernel — see the XL_MAX_RP comment)."""
    if not XL_ENABLED or K > KP:
        return False
    rp = _pad(r)
    ch = _xl_ch(rp, has_P)
    kmp = _padk(K * M, pick_ch(rp))
    if rp > XL_MAX_RP:
        return False
    # spill-aware model (see _xl_ch) + the SOCP-specific residents
    words_a = (rp * rp + 2 * KP * rp + _XL_SPILL_WORDS * ch * rp
               + 10 * kmp)
    words_c = ((1 + (1 if has_P else 0)) * rp * rp + 4 * KP * rp
               + _XL_SPILL_WORDS * ch * rp + 10 * kmp)
    return (max(words_a, words_c) * 4 <= _XL_VMEM_BUDGET
            and kmp <= _STREAM_MAX_ROWS)


def _cone_mask(i0, CH: int, M: int, km: int):
    """In-kernel (CH, KP) 0/1 cone-membership slab for rows i0..i0+CH:
    row i belongs to cone i//M; padding rows (≥ K·M) match nothing.
    Built from iota arithmetic — no E matrix in VMEM."""
    rg = lax.broadcasted_iota(jnp.int32, (CH, KP), 0) + i0
    col = lax.broadcasted_iota(jnp.int32, (CH, KP), 1)
    cone = lax.div(rg, M)
    return jnp.where((cone == col) & (rg < km),
                     jnp.ones((), jnp.float32), jnp.zeros((), jnp.float32))


def _xl_socp_gram_kernel(Ahi_ref, Alo_ref, bhi_ref, blo_ref, chi_ref,
                         clo_ref, dhi_ref, dlo_ref, zhi_ref, zlo_ref,
                         bgh_ref, bgl_ref, h32_ref, gw_ref, vec_ref,
                         csc_ref, *scratch, nck: int, rp: int, M: int,
                         km: int, CH: int):
    """Stage A (SOCP): two streamed passes over A_flat ->
    lhs/w_row per-row state, cone scalars, the gradient's cone−c term,
    G32/Gw32, and the f32 Gram (pallas_socp._socp_core passes 1-3 with
    p2 and p3 fused into one pass)."""
    bufh_ref, bufl_ref, sem_ref = scratch
    foreach_a = _make_foreach_stream(Ahi_ref, Alo_ref, bufh_ref, bufl_ref,
                                     sem_ref, nck, CH)
    zhi, zlo = zhi_ref[:], zlo_ref[:]
    zer = jnp.zeros((1, rp), jnp.float32)
    zerk = jnp.zeros((1, KP), jnp.float32)

    # pass 1: lhs (into vec) + per-cone ssq
    def p1_body(ic, ah, al, acc):
        sh, sl = acc
        i0 = pl.multiple_of(ic * CH, CH)
        mh, ml = dd.dd_matvec_cols(ah, al, zhi, zlo)
        lh, ll = dd.dd_add(mh, ml, bhi_ref[pl.ds(i0, CH), :],
                           blo_ref[pl.ds(i0, CH), :])
        vec_ref[pl.ds(i0, CH), 0:1] = lh
        vec_ref[pl.ds(i0, CH), 1:2] = ll
        l2h, l2l = dd.dd_mul(lh, ll, lh, ll)
        E_s = _cone_mask(i0, CH, M, km)
        rh_c, rl_c = dd.dd_reduce(l2h * E_s, l2l * E_s, axis=0)
        return dd.dd_add(sh, sl, rh_c, rl_c)

    ssqh, ssql = foreach_a(p1_body, (zerk, zerk))
    ssqh_c, ssql_c = _row_to_col(ssqh), _row_to_col(ssql)

    chi_m, clo_m = chi_ref[:], clo_ref[:]
    rh0, rl0 = dd.dd_matvec_cols(chi_m, clo_m, zhi, zlo)
    rhsh, rhsl = dd.dd_add(rh0, rl0, dhi_ref[:], dlo_ref[:])
    r2h, r2l = dd.dd_mul(rhsh, rhsl, rhsh, rhsl)
    sh_c, sl_c = dd.dd_add(r2h, r2l, -ssqh_c, -ssql_c)
    seh, sel = dd.dd_add(sh_c, sl_c,
                         jnp.full_like(sh_c, SOCP_SLACK_EPS),
                         jnp.zeros_like(sh_c))
    ish, isl = _dd_recip(seh, sel)
    wh_c, wl_c = dd.dd_mul_f32(ish, isl, 2.0)
    w32_c = wh_c

    # pass 2 (= resident p2+p3 fused): w_row scatter + gradient cone
    # term + G and Gram accumulation
    def p2_body(ic, ah, al, acc):
        gh_a, gl_a, G, H = acc
        i0 = pl.multiple_of(ic * CH, CH)
        E_s = _cone_mask(i0, CH, M, km)
        wrh = _dot(E_s, wh_c)
        wrl = _dot(E_s, wl_c)
        vec_ref[pl.ds(i0, CH), 2:3] = wrh
        vec_ref[pl.ds(i0, CH), 3:4] = wrl
        lh = vec_ref[pl.ds(i0, CH), 0:1]
        ll = vec_ref[pl.ds(i0, CH), 1:2]
        yh, yl = dd.dd_mul(wrh, wrl, lh, ll)
        ph, pl2 = dd.dd_mul(ah, al, yh, yl)
        rh_c, rl_c = dd.dd_reduce(ph, pl2, axis=0)
        gh_a, gl_a = dd.dd_add(gh_a, gl_a, rh_c, rl_c)
        G = G + _dot_tn(E_s, ah * lh)
        H = H + _dot_tn(ah * wrh, ah)
        return gh_a, gl_a, G, H

    gAh, gAl, G32, H32 = foreach_a(
        p2_body, (zer, zer, jnp.zeros((KP, rp), jnp.float32),
                  jnp.zeros((rp, rp), jnp.float32)))

    G32 = G32 - rhsh * chi_m
    Gw32 = w32_c * G32
    H32 = H32 + _dot_tn(chi_m * w32_c, chi_m) + _dot_tn(Gw32, Gw32)

    # gradient c term
    wrh_s, wrl_s = dd.dd_mul(wh_c, wl_c, rhsh, rhsl)
    ph, pl2 = dd.dd_mul(chi_m, clo_m, wrh_s, wrl_s)
    gch, gcl = dd.dd_reduce(ph, pl2, axis=0)
    gh, gl = dd.dd_add(gAh, gAl, -gch, -gcl)

    bgh_ref[:] = gh
    bgl_ref[:] = gl
    h32_ref[:] = H32
    gw_ref[:] = Gw32
    csc_ref[:, 0:1] = seh
    csc_ref[:, 1:2] = sel
    csc_ref[:, 2:3] = rhsh
    csc_ref[:, 3:4] = rhsl
    csc_ref[:, 4:5] = ish
    csc_ref[:, 5:6] = isl
    csc_ref[:, 6:7] = wh_c
    csc_ref[:, 7:8] = wl_c


def _xl_socp_step_kernel(Ahi_ref, Alo_ref, chi_ref, clo_ref, vec_ref,
                         csc_ref, gw_ref, tqhi_ref, tqlo_ref, zhi_ref,
                         zlo_ref, tPhi_ref, gph_ref, gpl_ref,
                         bgh_ref, bgl_ref,
                         w_ref, dsc_ref, sig_ref,
                         xnh_ref, xnl_ref, dxh_ref, dxl_ref, stats_ref,
                         *scratch, nck: int, refine: int, has_P: bool,
                         rp: int, M: int, km: int, alpha: float,
                         stall_rel2: float, CH: int):
    """Stage C (SOCP): dd-refined direction + cone line search.  The
    line-search coefficients read the A·dx side channel written by the
    final refinement pass — no extra pass over A (the resident kernel
    pays one)."""
    vdx_ref, bufh_ref, bufl_ref, sem_ref = scratch
    foreach_a = _make_foreach_stream(Ahi_ref, Alo_ref, bufh_ref, bufl_ref,
                                     sem_ref, nck, CH)
    zhi, zlo = zhi_ref[:], zlo_ref[:]
    tPhi = tPhi_ref[:]
    dsc_r = dsc_ref[:]
    chi_m, clo_m = chi_ref[:], clo_ref[:]
    Gw32 = gw_ref[:]
    seh, sel = csc_ref[:, 0:1], csc_ref[:, 1:2]
    rhsh, rhsl = csc_ref[:, 2:3], csc_ref[:, 3:4]
    ish, isl = csc_ref[:, 4:5], csc_ref[:, 5:6]
    wh_c, wl_c = csc_ref[:, 6:7], csc_ref[:, 7:8]

    gh, gl = dd.dd_add(tqhi_ref[:], tqlo_ref[:], bgh_ref[:], bgl_ref[:])
    if has_P:
        gh, gl = dd.dd_add(gh, gl, gph_ref[:], gpl_ref[:])

    def _precond_solve(rhs_row):
        return _w_solve(w_ref, rhs_row)

    zer = jnp.zeros((1, rp), jnp.float32)

    def _dd_apply(xh, xl):
        def body(ic, ah, al, acc):
            hh, hl = acc
            i0 = pl.multiple_of(ic * CH, CH)
            yh_c, yl_c = dd.dd_matvec_cols(ah, al, xh, xl)
            vdx_ref[pl.ds(i0, CH), 0:1] = yh_c
            vdx_ref[pl.ds(i0, CH), 1:2] = yl_c
            wyh, wyl = dd.dd_mul(vec_ref[pl.ds(i0, CH), 2:3],
                                 vec_ref[pl.ds(i0, CH), 3:4], yh_c, yl_c)
            ph2, pl3 = dd.dd_mul(ah, al, wyh, wyl)
            rh_c, rl_c = dd.dd_reduce(ph2, pl3, axis=0)
            return dd.dd_add(hh, hl, rh_c, rl_c)

        hxh, hxl = foreach_a(body, (zer, zer))
        ych, ycl = dd.dd_matvec_cols(chi_m, clo_m, xh, xl)
        wych, wycl = dd.dd_mul(wh_c, wl_c, ych, ycl)
        ph2, pl3 = dd.dd_mul(chi_m, clo_m, wych, wycl)
        ch_t, cl_t = dd.dd_reduce(ph2, pl3, axis=0)
        hxh, hxl = dd.dd_add(hxh, hxl, ch_t, cl_t)
        zg = jnp.zeros_like(Gw32)
        ygh, ygl = dd.dd_matvec_cols(Gw32, zg, xh, xl)
        ph2, pl3 = dd.dd_mul(Gw32, zg, ygh, ygl)
        gh_t, gl_t = dd.dd_reduce(ph2, pl3, axis=0)
        hxh, hxl = dd.dd_add(hxh, hxl, gh_t, gl_t)
        if has_P:
            pxh, pxl = _pmatvec_hi(tPhi, xh, xl)
            hxh, hxl = dd.dd_add(hxh, hxl, pxh, pxl)
        return hxh, hxl

    xh, xl, rh, rl, rn2, bn2 = _refined_solve(
        _precond_solve, _dd_apply, None, dsc_r, gh, gl, refine, rp,
        stall_rel2=stall_rel2)

    sig = sig_ref[:]
    gxh, gxl = dd.dd_mul(gh, gl, xh, xl)
    gxh, gxl = dd.dd_reduce(gxh, gxl, axis=1)
    gdx32 = gxh[0, 0]
    if has_P:
        pdh, pdl = _pmatvec_hi(tPhi, xh, xl)
        qh, ql = dd.dd_mul(pdh, pdl, xh, xl)
        qh, _ = dd.dd_reduce(qh, ql, axis=1)
        q2 = 0.5 * qh[0, 0]
    else:
        q2 = jnp.zeros((), jnp.float32)

    # per-cone line-search coefficients from the A·dx side channel
    # (vdx holds A·dx of the FINAL direction: _refined_solve's last act
    # on every path is a dd_apply on the returned iterate)
    zerk = jnp.zeros((1, KP), jnp.float32)

    def ls_body(ic, acc):
        i1h, i1l, i2h, i2l = acc
        i0 = pl.multiple_of(ic * CH, CH)
        adh = vdx_ref[pl.ds(i0, CH), 0:1]
        adl = vdx_ref[pl.ds(i0, CH), 1:2]
        lh = vec_ref[pl.ds(i0, CH), 0:1]
        ll = vec_ref[pl.ds(i0, CH), 1:2]
        q1h, q1l = dd.dd_mul(lh, ll, adh, adl)
        q2h, q2l = dd.dd_mul(adh, adl, adh, adl)
        E_s = _cone_mask(i0, CH, M, km)
        r1h, r1l = dd.dd_reduce(q1h * E_s, q1l * E_s, axis=0)
        r2h, r2l = dd.dd_reduce(q2h * E_s, q2l * E_s, axis=0)
        i1h, i1l = dd.dd_add(i1h, i1l, r1h, r1l)
        i2h, i2l = dd.dd_add(i2h, i2l, r2h, r2l)
        return i1h, i1l, i2h, i2l

    ip1h, ip1l, ip2h, ip2l = lax.fori_loop(
        0, nck, ls_body, (zerk, zerk, zerk, zerk))
    ip1h_c, ip1l_c = _row_to_col(ip1h), _row_to_col(ip1l)
    ip2h_c, ip2l_c = _row_to_col(ip2h), _row_to_col(ip2l)

    cdh, cdl = dd.dd_matvec_cols(chi_m, clo_m, xh, xl)
    rch, rcl = dd.dd_mul(rhsh, rhsl, cdh, cdl)
    p1h, p1l = dd.dd_add(rch, rcl, -ip1h_c, -ip1l_c)
    p1h, p1l = dd.dd_mul_f32(p1h, p1l, 2.0)
    c2h, c2l = dd.dd_mul(cdh, cdl, cdh, cdl)
    p2h, p2l = dd.dd_add(c2h, c2l, -ip2h_c, -ip2l_c)

    a32, _ = dd.dd_mul(p1h, p1l, ish, isl)
    b32, _ = dd.dd_mul(p2h, p2l, ish, isl)
    irh, irl = _dd_recip(rhsh, rhsl)
    v32, _ = dd.dd_mul(cdh, cdl, irh, irl)

    u = a32 * sig + b32 * (sig * sig)
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
    xnh_ref[:] = xnh
    xnl_ref[:] = xnl
    dxh_ref[:] = xh
    dxl_ref[:] = xl
    stats_ref[0, 0] = -0.5 * gxh[0, 0]
    stats_ref[0, 1] = -0.5 * gxl[0, 0]
    stats_ref[0, 2] = sigma
    stats_ref[0, 3] = any_acc.astype(jnp.float32)
    stats_ref[0, 4] = rn2
    stats_ref[0, 5] = gdx32
    stats_ref[0, 6] = bn2
    stats_ref[0, 7] = q2


def socp_newton_step_xl_prepared(consts: SOCPConsts, tq, z, tP, sigmas,
                                 *, alpha: float, refine: int = 3,
                                 interpret: bool = False,
                                 dir_tol: float = 1e-6):
    """One full SOCP Newton iteration in the XL regime.  Same contract
    as pallas_socp.socp_newton_step_prepared:
    returns (x_new, nd, sigma, any_acc, dir_ok, dx)."""
    r = consts.r
    rp = _pad(r)
    ch = _xl_ch(rp, tP is not None)
    kmp = consts.Ahi.shape[0]
    nck = kmp // ch
    km = consts.K * consts.M
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

    kernel_a = functools.partial(_xl_socp_gram_kernel, nck=nck, rp=rp,
                                 M=consts.M, km=km, CH=ch)
    kernel_c = functools.partial(
        _xl_socp_step_kernel, nck=nck, refine=refine,
        has_P=tP is not None, rp=rp, M=consts.M, km=km,
        alpha=float(alpha), stall_rel2=float(dir_tol) ** 2, CH=ch)

    with jax.enable_x64(False):
        bgh, bgl, H32, Gw32, vec, csc = pl.pallas_call(
            kernel_a,
            out_shape=(
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((rp, rp), jnp.float32),
                jax.ShapeDtypeStruct((KP, rp), jnp.float32),
                jax.ShapeDtypeStruct((kmp, 4), jnp.float32),
                jax.ShapeDtypeStruct((KP, 8), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 6,
            scratch_shapes=[
                pltpu.VMEM((2, ch, rp), jnp.float32),
                pltpu.VMEM((2, ch, rp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )(consts.Ahi, consts.Alo, consts.bhi, consts.blo, consts.chi,
          consts.clo, consts.dhi, consts.dlo, zhi, zlo)

        if tP is not None:
            H32 = H32 + tPhi
            gph, gpl = _dd_pmatvec_row(tPhi, tPlo, zhi, zlo)
        else:
            gph = gpl = jnp.zeros((1, rp), jnp.float32)
        Hs, dsc = _equilibrate_xla(H32, r, rp)
        W = _factor_w_xla(Hs, rp)

        xnh, xnl, dxh, dxl, stats = pl.pallas_call(
            kernel_c,
            out_shape=(
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, 8), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 17,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4
            + (pl.BlockSpec(memory_space=pltpu.SMEM),),
            scratch_shapes=[
                pltpu.VMEM((kmp, 2), jnp.float32),
                pltpu.VMEM((2, ch, rp), jnp.float32),
                pltpu.VMEM((2, ch, rp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )(consts.Ahi, consts.Alo, consts.chi, consts.clo, vec, csc, Gw32,
          tqhi, tqlo, zhi, zlo, tPhi, gph, gpl, bgh, bgl, W,
          dsc[None, :], sig32)

    x_new = dd.join_f64(xnh, xnl)[0, :r].astype(f64)
    dx = dd.join_f64(dxh, dxl)[0, :r].astype(f64)
    nd = (stats[0, 0].astype(f64) + stats[0, 1].astype(f64))
    sigma = stats[0, 2]
    any_acc = stats[0, 3] > 0.5
    dir_ok = stats[0, 4] <= 1e-4 * stats[0, 6] + 1e-30
    return x_new, nd, sigma, any_acc, dir_ok, dx
