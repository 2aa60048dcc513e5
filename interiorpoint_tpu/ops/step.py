"""Single-step entry points: one Newton iteration as a standalone jittable
function (used by __graft_entry__ and as building blocks for custom loops).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.problem import LPProblem
from ..utils.config import SolverConfig
from .barrier import make_qp_oracle
from .newton import newton_infeasible

_STEP_CFG = SolverConfig(max_inner_iters=1, dtype="float32")
_STEP_CFG_64 = SolverConfig(max_inner_iters=1, dtype="float64")


def lp_newton_step(c, A, b, C, d, lb, ub, x, v, t):
    """One infeasible-start Newton iteration on a boxed, inequality- and
    equality-constrained LP: KKT block elimination + fused candidate line
    search + iterate update.  Returns (x', v', residual_norm).

    This is the per-iteration hot path of the flagship LP solve
    (reference analogue: one trip through
    NewtonSolverInfeasibleStart.solve's loop body,
    NewtonSolverInfeasibleStart.py:96-138).
    """
    prob = LPProblem(c=c, A=A, b=b, C=C, d=d, lb=lb, ub=ub)
    oracle = make_qp_oracle(prob, try_diag=False)
    cfg = _STEP_CFG if x.dtype == jnp.float32 else _STEP_CFG_64
    res = newton_infeasible(oracle, A, b, x, v, t, cfg)
    return res.x, res.v, res.resid
