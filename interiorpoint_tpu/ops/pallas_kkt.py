"""Fused dense-KKT direction kernel: one Pallas call per Newton/Mehrotra
direction solves the equality-constrained KKT system

    [ H   Fᵀ ] [dx]   [ r1  ]
    [ F   0  ] [dy] = [ -rpe ]

given the ASSEMBLED dense Hessian H (as a double-float pair) — the
complement of ops/pallas_newton.py (which assembles H from the C/G
structure in-kernel).  Used by the conic Mehrotra engine
(ops/socp_pd.py), whose per-iteration cost on TPU was dominated not by
FLOPs but by the ~18 SEQUENTIAL mixed-precision solve dispatches of the
XLA block elimination (each an adaptive-refinement while_loop of
Pallas-trisolve + emulated-f64 residual steps); one fused kernel per
direction removes the entire dispatch chain.

In-kernel pipeline (all f32 on the MXU, dd residuals on the VPU):
  1. Jacobi equilibration of H's f32 high part, blocked Cholesky with
     the jitter-retry ladder, in-place triangular inversion W = L⁻¹
     (pallas_newton building blocks) — the H preconditioner.
  2. Schur complement S = (F D Wᵀ)(F D Wᵀ)ᵀ ≈ F H⁻¹ Fᵀ, equilibrated,
     factored as ONE diagonal block (pallas_chol._factor_diag_block,
     pe ≤ BLK) with its own jitter retry — the S preconditioner.
  3. dd-refined H-solves (pallas_newton._refined_solve: refine rounds
     + the cond-gated dd-PCG stall escalation against the TRUE dd H),
     and a Schur-CG for the equality multipliers: CG with the
     double-float residual recurrence on S = F H⁻¹ Fᵀ, whose operator
     applications go through the refined H-solves while the f32
     S̃ = (F D Wᵀ)(F D Wᵀ)ᵀ factor serves only as preconditioner —
     a Richardson refinement of dy (the XLA engine's scheme) diverges
     once κ(Hs)·eps32 > 1 (measured ×30 error growth per round), CG
     converges for any SPD preconditioner error.

The factor/solve accuracy story is identical to the other fused
kernels: f32 factors are only preconditioners; every correction is
measured against the double-float operator, so jitter and κ·eps32
noise affect the convergence RATE, never the answer; the returned
(rn2, bn2) KKT residual norms let the caller detect stalls.

Reference parity: this is the block-elimination strategy of
NewtonSolverInfeasibleStart.py:356-538 (factor H, Schur S = A·H⁻¹Aᵀ,
two factors per step) re-built as one TPU kernel.
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
from .pallas_chol import BLK, _factor_diag_block
from .pallas_newton import (_chol_invert_ref, _dd_pmatvec_row, _dot,
                            _dot_nt, _equilibrate, _factor_jittered,
                            _pad, _pad2, _refined_solve, _w_solve)


def kkt_supported(r: int, pe: int) -> bool:
    """VMEM envelope: H pair + factor + ~4 rp² dd temporaries must fit,
    and the Schur block must be a single (BLK, BLK) tile."""
    rp = _pad(r)
    words = 8 * rp * rp + 4 * BLK * rp
    return (words * 4 <= 110 * 1024 * 1024 and rp <= 1536
            and 0 <= pe <= BLK)


def _col_to_row(c):
    """Exact (n, 1) -> (1, n) transpose via a 1x1 ones MXU dot."""
    one = jnp.ones((1, 1), jnp.float32)
    return lax.dot_general(
        one, c, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _sfactor_jittered(S):
    """Equilibrated + jitter-laddered factor of the (BLK, BLK) Schur
    block.  Returns (LsInv, ds): S⁻¹ ≈ ds·LsInvᵀ·LsInv·ds."""
    dg = jnp.sum(S * jnp.where(
        lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
        == lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1),
        jnp.ones((), jnp.float32), jnp.zeros((), jnp.float32)),
        axis=1, keepdims=True)                       # (BLK, 1)
    ds_c = lax.rsqrt(jnp.maximum(dg, 1e-30))
    Ss = S * ds_c * _col_to_row(ds_c)
    rows = lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    cols = lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    eye = jnp.where(rows == cols, jnp.ones((), jnp.float32),
                    jnp.zeros((), jnp.float32))

    def cond(c):
        i, _, bad = c
        return bad & (i < 4)

    def body(c):
        i, _, _ = c
        delta = jnp.where(
            i == 0, 0.0,
            jnp.where(i == 1, 1e-6, jnp.where(i == 2, 3e-3, 1.0))
        ).astype(jnp.float32)
        _, LsInv = _factor_diag_block(Ss + delta * eye)
        # sum-then-isfinite: a boolean all-reduction lowers to an f64
        # multi_reduction that v5e Mosaic rejects (same workaround as
        # _factor_jittered / the SOCP line search)
        ok = jnp.isfinite(jnp.sum(LsInv))
        return i + 1, LsInv, ~ok

    _, LsInv, _ = lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32),
                     jnp.zeros((BLK, BLK), jnp.float32),
                     jnp.ones((), bool)))
    return LsInv, _col_to_row(ds_c)                  # ds as (1, BLK)


def _kkt_dir_kernel(Hhi_ref, Hlo_ref, Fhi_ref, Flo_ref, r1h_ref, r1l_ref,
                    rpeh_ref, rpel_ref,
                    dxh_ref, dxl_ref, dyh_ref, dyl_ref, stats_ref,
                    l_ref, dinv_ref,
                    *, nb: int, refine: int, rounds: int, has_eq: bool,
                    r: int, rp: int, pe: int,
                    stall_rel2: float = 1e-12,
                    cg_rel2: float = 1e-26):  # rounds = max Schur-CG iters
    """See module docstring.  All row-space vectors are (1, rp) f32
    pairs; equality-space vectors are (1, BLK) f32 pairs (rows ≥ pe of
    F are zero, so padded components stay exactly zero)."""
    H32 = Hhi_ref[:]
    Hs, dsc_r, eye = _equilibrate(H32, r, rp)
    _factor_jittered(l_ref, dinv_ref, Hs, eye, nb)
    _chol_invert_ref(l_ref, dinv_ref, nb)   # l_ref now holds W = L⁻¹

    def _precond_solve(rhs_row):
        """Hs⁻¹-grade application in the EQUILIBRATED metric (the form
        _refined_solve expects)."""
        return _w_solve(l_ref, rhs_row)

    def h_dd(xh, xl):
        """True dd H x (row form; H is symmetric by construction)."""
        return _dd_pmatvec_row(Hhi_ref[:], Hlo_ref[:], xh, xl)

    r1h, r1l = r1h_ref[:], r1l_ref[:]

    def solve_h_refined(bh, bl):
        """dd-refined H x = b (refine rounds + dd-PCG stall
        escalation)."""
        xh, xl, _, _, rn2, bn2 = _refined_solve(
            _precond_solve, h_dd, Hs, dsc_r, -bh, -bl, refine, rp,
            stall_rel2=stall_rel2, exit_rel2=1e-25)
        return xh, xl, rn2, bn2

    if not has_eq:
        dxh, dxl, rn2, bn2 = solve_h_refined(r1h, r1l)
        dxh_ref[:] = dxh
        dxl_ref[:] = dxl
        dyh_ref[:] = jnp.zeros((1, BLK), jnp.float32)
        dyl_ref[:] = jnp.zeros((1, BLK), jnp.float32)
        stats_ref[0, 0] = rn2
        stats_ref[0, 1] = bn2
        return

    Fhi, Flo = Fhi_ref[:], Flo_ref[:]
    rpeh, rpel = rpeh_ref[:], rpel_ref[:]

    # Schur block S = (F D Wᵀ)(F D Wᵀ)ᵀ ≈ F H⁻¹ Fᵀ (f32): Zt = (F·D) Wᵀ
    Zt = _dot_nt(Fhi * dsc_r, l_ref[:])              # (BLK, rp)
    S = _dot_nt(Zt, Zt)                              # (BLK, BLK)
    # identity on padded equality rows keeps the factor finite
    prow = lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    pcol = lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    pad_eye = jnp.where((prow == pcol) & (prow >= pe),
                        jnp.ones((), jnp.float32),
                        jnp.zeros((), jnp.float32))
    LsInv, ds_row = _sfactor_jittered(S + pad_eye)

    def f_dd(xh, xl):
        """dd F x: (1, rp) pair -> (1, BLK) pair."""
        ph, pl_ = dd.dd_mul(Fhi, Flo, xh, xl)
        ch, cl = dd.dd_reduce(ph, pl_, axis=1)       # (BLK, 1)
        return _col_to_row(ch), _col_to_row(cl)

    def ft_dd(uh, ul):
        """dd Fᵀ u: (1, BLK) pair -> (1, rp) pair."""
        uc_h, ul_c = dd.dd_mul(Fhi, Flo,
                               *_broadcast_col(uh, ul))
        rh, rl = dd.dd_reduce(uc_h, ul_c, axis=0)
        return rh, rl

    def _broadcast_col(uh, ul):
        # (1, BLK) rows -> (BLK, 1) columns broadcast against F's rows
        c_h = lax.dot_general(
            uh, jnp.ones((1, 1), jnp.float32),
            dimension_numbers=(((0,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        c_l = lax.dot_general(
            ul, jnp.ones((1, 1), jnp.float32),
            dimension_numbers=(((0,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return c_h, c_l

    # ---- Schur-CG for dy -------------------------------------------------
    # S dy = F t1 + rpe with S = F H⁻¹ Fᵀ, solved by CG with the dd
    # residual recurrence: operator applications go through the
    # dd-REFINED H-solves (so each S·y is f64-grade), while S̃ (built
    # from the f32 factor inverse) serves only as the preconditioner on
    # the Ds-equilibrated system.  A Richardson iteration on dy (the
    # XLA engine's refinement rounds) DIVERGES here once
    # κ(Hs)·eps32 > 1: S̃'s relative error is O(κ·eps32) and each round
    # multiplies the dy error by it (measured ×30/round); CG converges
    # for any SPD error spectrum.
    t1h, t1l, _, _ = solve_h_refined(r1h, r1l)
    fth, ftl = f_dd(t1h, t1l)
    uh, ul = dd.dd_add(fth, ftl, rpeh, rpel)
    zpe = jnp.zeros((1, BLK), jnp.float32)
    ueh, uel = dd.dd_mul(uh, ul, ds_row, zpe)     # û = Ds u

    def precond_pe(v):
        """(LsInvᵀLsInv) v ≈ Ŝ⁻¹ v in the equilibrated pe-space."""
        return _dot(_dot_nt(v, LsInv), LsInv)

    def shat_apply(yh, yl):
        """Ŝ ŷ = Ds·F·H⁻¹·Fᵀ·Ds·ŷ, dd, via the refined H-solve."""
        syh, syl = dd.dd_mul(yh, yl, ds_row, zpe)
        fh_, fl_ = ft_dd(syh, syl)
        th_, tl_, _, _ = solve_h_refined(fh_, fl_)
        qh_, ql_ = f_dd(th_, tl_)
        return dd.dd_mul(qh_, ql_, ds_row, zpe)

    un2 = jnp.sum((ueh + uel) ** 2) + 1e-30
    z0 = precond_pe(ueh)

    def cg_body(c):
        i, yh, yl, rh_, rl_, p, rz = c
        hph, hpl = shat_apply(p, jnp.zeros_like(p))
        denom = jnp.sum(p * hph)
        a = rz / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        ch_, cl_ = dd.dd_mul_f32(p, jnp.zeros_like(p), a)
        yh, yl = dd.dd_add(yh, yl, ch_, cl_)
        sh_, sl_ = dd.dd_mul_f32(hph, hpl, a)
        rh_, rl_ = dd.dd_add(rh_, rl_, -sh_, -sl_)
        z = precond_pe(rh_)
        rz2 = jnp.sum(rh_ * z)
        beta = rz2 / jnp.where(jnp.abs(rz) > 1e-30, rz, 1e-30)
        return i + 1, yh, yl, rh_, rl_, z + beta * p, rz2

    def cg_cond(c):
        i, yh, yl, rh_, rl_, p, rz = c
        rn2c = jnp.sum(rh_ * rh_)
        return ((i < rounds) & (rn2c > cg_rel2 * un2)
                & jnp.isfinite(rn2c) & jnp.isfinite(rz))

    out = lax.while_loop(cg_cond, cg_body,
                         (jnp.zeros((), jnp.int32), zpe, zpe,
                          ueh, uel, z0, jnp.sum(ueh * z0)))
    _, yh, yl, _, _, _, _ = out
    dyh, dyl = dd.dd_mul(yh, yl, ds_row, zpe)     # dy = Ds ŷ

    # back-substitution: dx = H⁻¹(r1 − Fᵀ dy), dd-refined
    vh, vl = ft_dd(dyh, dyl)
    r1mh, r1ml = dd.dd_add(r1h, r1l, -vh, -vl)
    dxh, dxl, _, _ = solve_h_refined(r1mh, r1ml)

    # final KKT residual norms (unscaled; relative gate is the caller's)
    hxh, hxl = h_dd(dxh, dxl)
    fyh, fyl = ft_dd(dyh, dyl)
    e1h, e1l = dd.dd_add(r1h, r1l, -hxh, -hxl)
    e1h, e1l = dd.dd_add(e1h, e1l, -fyh, -fyl)
    fxh, fxl = f_dd(dxh, dxl)
    e2h, e2l = dd.dd_add(-rpeh, -rpel, -fxh, -fxl)
    rn2 = jnp.sum((e1h + e1l) ** 2) + jnp.sum((e2h + e2l) ** 2)
    bn2 = (jnp.sum((r1h + r1l) ** 2)
           + jnp.sum((rpeh + rpel) ** 2) + 1e-30)

    dxh_ref[:] = dxh
    dxl_ref[:] = dxl
    dyh_ref[:] = dyh
    dyl_ref[:] = dyl
    stats_ref[0, 0] = rn2
    stats_ref[0, 1] = bn2


class KKTConsts(typing.NamedTuple):
    """Per-solve constants: the dd-split, (BLK, rp)-padded equality
    matrix.  ``pe == 0`` means no equality block."""
    Fhi: jax.Array
    Flo: jax.Array
    pe: int
    r: int


def prep_kkt_consts(F, n: int) -> KKTConsts:
    """Split/pad the equality matrix once per solve (or build the empty
    block when ``F is None``)."""
    rp = _pad(n)
    if F is None:
        z = jnp.zeros((BLK, rp), jnp.float32)
        return KKTConsts(Fhi=z, Flo=z, pe=0, r=n)
    pe = F.shape[0]
    Fhi, Flo = dd.split_f64(_pad2(F, BLK, rp))
    return KKTConsts(Fhi=Fhi, Flo=Flo, pe=pe, r=n)


def kkt_dir_prepared(Hhi, Hlo, consts: KKTConsts, r1, rpe=None, *,
                     refine: int = 3, rounds: int = 24,
                     interpret: bool = False,
                     dir_tol: float = 1e-6, cg_tol: float = 1e-13):
    """One fused KKT direction from a pre-split H pair.

    Args:
      Hhi/Hlo: (rp, rp) f32 dd pair of the SYMMETRIC dense H, zero
        outside the leading (r, r) block (see ``prep_kkt_h``).
      consts: ``prep_kkt_consts(F, n)``.
      r1: (r,) f64 right-hand side; ``rpe``: (pe,) f64 equality rhs in
        the convention F dx = −rpe (ops/socp_pd.py's ``direction``).

    ``refine``: dd refinement rounds per H-solve; ``rounds``: max
    Schur-CG iterations; ``cg_tol``: L2-relative Schur-CG exit
    tolerance (default the dd residual floor 1e-13); ``dir_tol``:
    L2-relative H-solve residual above which the dd-PCG stall
    escalation fires (pallas_newton.dir_stall_tol derives both from
    the solve's requested ε — an ε=1e-4 Mehrotra direction does not
    need 1e-13-grade multipliers, and each saved CG round saves a
    full dd-refined H-solve).

    Returns (dx (r,) f64, dy (pe,) f64, rn2, bn2) — the KKT residual
    norms let the caller gate direction quality.
    """
    r, pe = consts.r, consts.pe
    rp = _pad(r)
    nb = rp // BLK
    f64 = r1.dtype

    r1h, r1l = dd.split_f64(_pad2(r1[None, :], 1, rp))
    if pe:
        rpeh, rpel = dd.split_f64(_pad2(rpe[None, :], 1, BLK))
    else:
        rpeh = rpel = jnp.zeros((1, BLK), jnp.float32)

    kernel = functools.partial(
        _kkt_dir_kernel, nb=nb, refine=refine, rounds=rounds,
        has_eq=pe > 0, r=r, rp=rp, pe=pe,
        stall_rel2=float(dir_tol) ** 2, cg_rel2=float(cg_tol) ** 2)
    with jax.enable_x64(False):
        dxh, dxl, dyh, dyl, stats = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, BLK), jnp.float32),
                jax.ShapeDtypeStruct((1, BLK), jnp.float32),
                jax.ShapeDtypeStruct((1, 2), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4
            + (pl.BlockSpec(memory_space=pltpu.SMEM),),
            scratch_shapes=[
                pltpu.VMEM((rp, rp), jnp.float32),
                pltpu.VMEM((rp, BLK), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )(Hhi, Hlo, consts.Fhi, consts.Flo, r1h, r1l, rpeh, rpel)

    dx = dd.join_f64(dxh, dxl)[0, :r].astype(f64)
    dy = dd.join_f64(dyh, dyl)[0, :pe].astype(f64)
    return dx, dy, stats[0, 0], stats[0, 1]


def prep_kkt_h(H, n: int):
    """dd-split/pad the dense symmetric H once per iteration (shared by
    the predictor and corrector directions)."""
    rp = _pad(n)
    return dd.split_f64(_pad2(H, rp, rp))
