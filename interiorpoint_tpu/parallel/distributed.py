"""Constraint-row sharding for single huge instances.

The barrier Hessian H = CᵀD²C + diag and the Schur products A·H⁻¹Aᵀ are the
FLOP-dominant pieces of each Newton step (SURVEY.md §3.2 hot loops).  For
one instance too large for a chip — or to cut wall-clock per step — the
constraint rows of C and A are sharded across the mesh:

  * each chip forms its partial Hessian C_dᵀ D_d² C_d; a ``psum`` over the
    row axis yields the replicated H (the factorization itself is
    replicated — it is the serial core of the method);
  * the Schur complement is assembled from per-chip panels
    Y_d = H⁻¹A_dᵀ with an ``all_gather`` of the panels;
  * gradients reduce with the same psum pattern.

Also: ``initialize()`` wraps jax.distributed.initialize for multi-host
pods.  This whole module is new TPU-native capability — the reference is
single-device (SURVEY.md §2.2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.barrier import SLACK_EPS


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host init (ICI within a slice, DCN across hosts).  No-op when
    JAX is already initialized or single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def row_sharded_lp_newton_step(mesh: Mesh, axis: str = "rows"):
    """Build a jitted infeasible-start LP Newton step with C and A rows
    sharded over ``axis``.

    Returns step(c, A, b, C, d, lb, ub, x, v, t) -> (x_new, v_new, resid)
    where A, b, C, d enter pre-sharded on their row axis (use
    ``shard_rows``); x, v, c, lb, ub, t are replicated.

    Constraints of this single-step demo (lifted by the full distributed
    solve in ``solve_lp_row_sharded``): both bounds must be finite arrays
    (the slack terms use ub−x and x−lb unconditionally), and the row
    counts of A and C must divide evenly by the mesh axis size (the
    back-substitution slices ``w`` by equal per-shard row counts).

    The math matches ops/kkt.py's block elimination (reference:
    NewtonSolverInfeasibleStart.py:386-511) with communication only at the
    psum/all_gather points noted inline.
    """
    def step(c, A, b, C, d, lb, ub, x, v, t):
        # --- slacks & gradient: per-shard inequality rows, psum-reduced ---
        s_C = d - C @ x                       # local rows
        inv_C = 1.0 / (s_C + SLACK_EPS)
        g_local = C.T @ inv_C                 # (n,) partial
        g = lax.psum(g_local, axis)           # ICI all-reduce
        g = g + t * c + 1.0 / (ub - x + SLACK_EPS) \
            - 1.0 / (x - lb + SLACK_EPS)

        # --- Hessian: partial CᵀD²C, psum, replicated bound diagonal -----
        H_local = C.T @ (inv_C[:, None] ** 2 * C)
        H = lax.psum(H_local, axis)
        db = 1.0 / (ub - x + SLACK_EPS) ** 2 + 1.0 / (x - lb + SLACK_EPS) ** 2
        H = H + jnp.diag(db)

        # --- replicated factorization (serial core) ----------------------
        L = jnp.linalg.cholesky(H)
        solve = lambda B: jax.scipy.linalg.solve_triangular(
            L.T, jax.scipy.linalg.solve_triangular(L, B, lower=True),
            lower=False)

        # --- Schur panels: local solve, all_gather ------------------------
        rpri_local = A @ x - b                # local equality rows
        Y_local = solve(A.T)                  # (n, m_local) panel
        Y = lax.all_gather(Y_local, axis, axis=1, tiled=True)   # (n, m)
        Hinv_g = solve(g)
        S_rows = A @ Y                        # (m_local, m)
        S = lax.all_gather(S_rows, axis, axis=0, tiled=True)    # (m, m)
        S = 0.5 * (S + S.T)
        rpri = lax.all_gather(rpri_local, axis, axis=0, tiled=True)
        rhs = rpri - lax.all_gather(A @ Hinv_g, axis, axis=0, tiled=True)
        Ls = jnp.linalg.cholesky(S)
        w = jax.scipy.linalg.solve_triangular(
            Ls.T, jax.scipy.linalg.solve_triangular(Ls, rhs, lower=True),
            lower=False)

        # --- back-substitution: AᵀW reduces over sharded rows -------------
        m_local = A.shape[0]
        idx = lax.axis_index(axis) * m_local
        w_local = lax.dynamic_slice_in_dim(w, idx, m_local)
        ATw = lax.psum(A.T @ w_local, axis)
        dx = -solve(g + ATw)
        dv = w - v

        # --- fixed damped step (full line search lives in ops/newton) ----
        ds_C = C @ dx
        # largest sigma keeping local slacks positive, reduced via psum-min
        limit_local = jnp.min(jnp.where(ds_C > 0, s_C / ds_C, jnp.inf))
        limit_bound = jnp.minimum(
            jnp.min(jnp.where(dx > 0, (ub - x) / dx, jnp.inf)),
            jnp.min(jnp.where(dx < 0, (lb - x) / dx, jnp.inf)),
        )
        limit = jnp.minimum(-lax.pmax(-limit_local, axis), limit_bound)
        sigma = jnp.minimum(1.0, 0.99 * limit)
        x_new = x + sigma * dx
        v_new = v + sigma * dv

        # --- KKT residual at the new iterate ------------------------------
        s_C_new = d - C @ x_new
        g_new = lax.psum(C.T @ (1.0 / (s_C_new + SLACK_EPS)), axis)
        g_new = g_new + t * c + 1.0 / (ub - x_new + SLACK_EPS) \
            - 1.0 / (x_new - lb + SLACK_EPS)
        v_new_local = lax.dynamic_slice_in_dim(v_new, idx, m_local)
        r_dual = g_new + lax.psum(A.T @ v_new_local, axis)
        rpri_sq = lax.psum(jnp.sum((A @ x_new - b) ** 2), axis)
        resid = jnp.sqrt(jnp.sum(r_dual**2) + rpri_sq)
        return x_new, v_new, resid

    spec_rows = P(axis, None)
    spec_vec_rows = P(axis)
    rep = P()
    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(rep, spec_rows, spec_vec_rows, spec_rows, spec_vec_rows,
                  rep, rep, rep, rep, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    ))


def shard_rows(mesh: Mesh, arr, axis: str = "rows"):
    """Place a constraint matrix/vector with its row axis on ``axis``."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
