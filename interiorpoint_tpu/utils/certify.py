"""Solver-independent KKT certificates for solved LP/QP/SOCP drivers.

The reference verifies solutions by re-solving with CVXPY/CLARABEL
(reference: LPSolver.py:471-505).  This module is the in-framework
alternative: given a SOLVED driver it evaluates the first-order KKT
conditions directly at (x*, λ*, v*) — no external solver, O(problem
size) work — so production deployments can certify every solve:

  * stationarity     ‖∇f + Σλ_j∇g_j + Aᵀv‖∞ / max(1, ‖∇f‖∞)
  * eq_residual      ‖Ax* − b‖∞  (Fx* − g for SOCP)
  * min_slack        min_j(−g_j(x*)) — strict primal inequality
                     feasibility (> 0 for interior-point iterates)
  * complementarity  max_j λ_j·(−g_j(x*))
  * dual_gap         m/t — the barrier duality gap the stopping rule
                     guarantees (reference: LPSolver.py:629-634)

Dual variables.  The barrier's analytic multipliers λ = 1/(t·slacks)
(reference: LPSolver.py:641-646) carry the final centering's
inexactness — their stationarity residual is only ~√inner_epsilon at
deep barrier stages (measured ~1e-3 at gap 1e-10).  ``polish=True``
(default) therefore recovers high-accuracy multipliers the way a
simplex/crossover dual would: identify the active set from the slack
magnitudes, least-squares-fit (λ_active, v) to the stationarity
equation, clip negative λ to zero and refit — typically reaching
~1e-9 relative stationarity on problems where the analytic duals give
~1e-3.  ``polish=False`` certifies the raw barrier duals.

SOCP uses the squared-cone form: slack_k = (c_kᵀx+d_k)² − ‖A_kx+b_k‖²
with ∇(−slack_k) = 2(A_kᵀlhs_k − c_k·rhs_k); the appended rhs domain
entries carry no barrier force and are excluded from stationarity
(ops/socp.py newton_obj).

Usage::

    solver = LPSolver(...); solver.solve()
    cert = certify(solver)
    assert cert.ok(1e-6), cert
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass(frozen=True)
class Certificate:
    """KKT residuals at the returned iterate; see module docstring."""

    kind: str
    objective: float
    stationarity: float
    eq_residual: float
    min_slack: float
    complementarity: float
    dual_gap: float
    polished: bool

    def ok(self, tol: float = 1e-6, gap_tol: Optional[float] = None) -> bool:
        """True when the iterate is a tol-accurate KKT point: primal
        feasible to ``tol``, stationary and equality-feasible to ``tol``
        (relative), complementarity below ``tol``, duality gap below
        ``gap_tol`` (defaults to ``tol``).  Barrier iterates are strictly
        interior (min_slack > 0); primal-dual (algorithm="pd") solutions
        legitimately sit ON active constraints to rounding, hence ≥ −tol."""
        return (self.min_slack >= -tol
                and self.stationarity <= tol
                and self.eq_residual <= tol
                and self.complementarity <= tol
                and self.dual_gap <= (tol if gap_tol is None else gap_tol))


def _ineq_system(solver, x):
    """(G, slacks, grad_f): stacked inequality constraint gradients
    (rows ∇g_j for g_j ≤ 0), the matching slack vector −g_j(x) in the
    same order, and the objective gradient.

    LP/QP rows follow the oracle slack order [Cx≤d, ub, lb]
    (ops/barrier.py full_linear_slacks); SOCP rows are [cones, ub, lb]
    — the trailing rhs domain entries of socp_full_slacks are excluded
    (no barrier force)."""
    prob = solver._prob
    n = x.shape[0]
    slacks = np.asarray(solver._slacks_at(x), dtype=np.float64)
    rows, segs = [], []

    if hasattr(prob, "num_cones"):
        Ak = np.asarray(prob.A, dtype=np.float64)      # (K, M, n)
        ck = np.asarray(prob.c, dtype=np.float64)      # (K, n)
        lhs = np.einsum("kmn,n->km", Ak, x) + np.asarray(prob.b)
        rhs = ck @ x + np.asarray(prob.d)
        K = Ak.shape[0]
        rows.append(2.0 * (np.einsum("kmn,km->kn", Ak, lhs)
                           - ck * rhs[:, None]))
        segs.append(K)
        grad_f = np.zeros_like(x)
        if prob.P is not None:
            grad_f += np.asarray(prob.P) @ x
        if prob.q is not None:
            grad_f += np.asarray(prob.q)
    else:
        if prob.C is not None:
            rows.append(np.asarray(prob.C, dtype=np.float64))
            segs.append(prob.C.shape[0])
        if getattr(prob, "P", None) is not None:
            grad_f = np.asarray(prob.P) @ x
            if prob.q is not None:
                grad_f = grad_f + np.asarray(prob.q)
        else:
            grad_f = np.asarray(prob.c, dtype=np.float64).copy()

    if prob.ub is not None:
        rows.append(np.eye(n))
        segs.append(n)
    if prob.lb is not None:
        rows.append(-np.eye(n))
        segs.append(n)

    used = sum(segs)
    G = (np.concatenate(rows, axis=0) if rows
         else np.zeros((0, n)))
    return G, slacks[:used], slacks, grad_f


def certify(solver, x=None, polish: bool = True) -> Certificate:
    """Evaluate the KKT certificate for a solved LP/QP/SOCP driver (or
    at an explicit iterate ``x``).  See the module docstring for the
    residuals and the ``polish`` dual-recovery semantics."""
    # a solve must have run either way: the barrier parameter t (analytic
    # duals, duality gap) only exists afterwards.  x= evaluates the
    # certificate at a DIFFERENT iterate of the solved problem.
    if not getattr(solver, "optimal", False):
        raise ValueError("certify() needs a solved problem — call "
                         "solver.solve() first")
    at_solution = x is None
    x = (np.asarray(solver.xstar, dtype=np.float64) if at_solution
         else np.asarray(x, dtype=np.float64))

    t = float(solver._result.t)
    A, b = solver._eq
    A = None if A is None else np.asarray(A, dtype=np.float64)
    b = None if b is None else np.asarray(b, dtype=np.float64)
    has_eq = A is not None and A.shape[0] > 0

    G, sl, all_slacks, grad_f = _ineq_system(solver, x)
    min_slack = float(all_slacks.min()) if all_slacks.size else np.inf
    eq_residual = float(np.abs(A @ x - b).max()) if has_eq else 0.0

    if polish and G.shape[0]:
        # active set from the slack scale: at duality gap m/t the active
        # slacks sit at O(1/(t·λ_j)) while inactive ones are O(1), so
        # √(gap)·scale separates them robustly.
        gap = max(G.shape[0] / t, 1e-300)
        finite = sl[np.isfinite(sl)]
        scale = float(np.median(np.abs(finite))) if finite.size else 1.0
        tau = np.sqrt(gap) * max(1.0, scale)
        active = sl < tau
        lam = np.zeros(G.shape[0])
        for _ in range(2):          # fit, clip negatives, refit once
            na = int(active.sum())
            cols = [G[active].T] + ([A.T] if has_eq else [])
            M = np.concatenate(cols, axis=1) if cols else None
            if M is None or M.shape[1] == 0:
                v = None
                break
            y, *_ = np.linalg.lstsq(M, -grad_f, rcond=None)
            lam_a, v = y[:na], (y[na:] if has_eq else None)
            if (lam_a >= 0).all():
                lam[active] = lam_a
                break
            keep = lam_a >= 0
            idx = np.where(active)[0]
            active = np.zeros_like(active)
            active[idx[keep]] = True
            lam[:] = 0.0
            lam[idx[keep]] = np.maximum(lam_a[keep], 0.0)
    else:
        lam = 1.0 / (t * np.maximum(sl, 1e-300))
        v = None

    r = grad_f + (G.T @ lam if G.shape[0] else 0.0)
    if has_eq:
        if v is None:
            v_solver = getattr(solver, "v_star", None)
            v = (np.asarray(v_solver, dtype=np.float64)
                 if v_solver is not None
                 else np.linalg.lstsq(A.T, -r, rcond=None)[0])
        r = r + A.T @ v

    stationarity = float(np.abs(r).max() / max(1.0, np.abs(grad_f).max()))
    # infinite slacks (a ±inf bound kept as a vector, e.g.
    # lower_bound=-inf) are vacuous constraints: λ = 0 there, and
    # 0·inf must read as 0, not NaN
    fin = np.isfinite(sl)
    comp = float((lam[fin] * sl[fin]).max()) if fin.any() else 0.0
    m_ineq = max(int(getattr(solver, "num_constraints", sl.size)), 0)
    return Certificate(
        kind=type(solver).__name__,
        objective=(float(solver.value) if at_solution
                   else _obj(solver._prob, x)),
        stationarity=stationarity,
        eq_residual=eq_residual,
        min_slack=min_slack,
        complementarity=comp,
        dual_gap=m_ineq / t if m_ineq else 0.0,
        polished=bool(polish and G.shape[0]),
    )


def _obj(prob, x):
    val = 0.0
    if getattr(prob, "P", None) is not None:
        val += 0.5 * x @ (np.asarray(prob.P) @ x)
    if getattr(prob, "q", None) is not None:
        val += float(np.asarray(prob.q) @ x)
    if (getattr(prob, "c", None) is not None
            and not hasattr(prob, "num_cones")):
        val += float(np.asarray(prob.c) @ x)
    return float(val)
