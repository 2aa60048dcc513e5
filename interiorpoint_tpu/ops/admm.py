"""Batched ADMM for LASSO: one jitted while_loop over matrix-shaped state.

The reference iterates ADMM in Python with periodic host-synced stopping
checks (reference: LassoSolver.py:240-337).  Here the x-update matmul,
soft-threshold prox, dual update, and stopping-norm evaluation all live in
a single ``lax.while_loop`` — the stopping norms are computed on device and
feed the loop condition directly, so the whole batch of problems runs with
zero host round trips.

Batch semantics follow the reference: a (n × B) iterate matrix solves B
problem instances simultaneously, with a per-problem regularization vector
(reference: LassoSolver.py:109-111) and a *global* (whole-batch) stopping
criterion (reference: LassoSolver.py:273-298).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class ADMMResult(NamedTuple):
    X: jax.Array           # (n, B) solution (the alpha iterate, as in ref)
    solutions: jax.Array   # (B,) final objective values
    gaps: jax.Array        # (max_iters, B) per-iteration objectives, or (0, B)
    iterations: jax.Array  # scalar int: iterations executed


def soft_threshold(v, eta, positive: bool, add_bias: bool):
    """Proximal operator of η‖·‖₁ (reference: LassoSolver.py:517-543);
    the bias row is passed through unregularized."""
    x = jnp.maximum(v - eta, 0.0)
    if not positive:
        x = x - jnp.maximum(-v - eta, 0.0)
    if add_bias:
        x = x.at[0].set(v[0])
    return x


def lasso_objective(A, b, reg, alpha, positive: bool, add_bias: bool):
    """1/(2m)‖Aα−b‖² + reg·‖α‖₁ column-wise, bias row unregularized
    (reference: LassoSolver.py:487-515)."""
    m = A.shape[0]
    f = (0.5 / m) * jnp.sum((A @ alpha - b) ** 2, axis=0)
    x_abs = alpha if positive else jnp.abs(alpha)
    norm1 = jnp.sum(x_abs[1:], axis=0) if add_bias else jnp.sum(x_abs, axis=0)
    return f + reg * norm1


@partial(jax.jit, static_argnames=("cfg", "num_samples"))
def admm_core(A, b, reg, cfg, num_samples: int) -> ADMMResult:
    """Solve the batched LASSO with cached-Cholesky ADMM.

    Factors Q = AᵀA + mρI once (reference: LassoSolver.py:158-189).
    Deviation (bugfix): the reference only builds AtA_cache when
    ``add_bias=True`` and crashes otherwise (reference:
    LassoSolver.py:122-130 vs :161); here it is always computed.
    """
    dtype = A.dtype
    m, n = A.shape
    B = num_samples
    rho = jnp.asarray(cfg.rho, dtype)

    from .kkt import mixed_posdef_solve

    AtA = A.T @ A
    Q = AtA + (m * cfg.rho) * jnp.eye(n, dtype=dtype)
    # One-time factorization; mixed f32-factor + f64-refined solves avoid
    # XLA:TPU's slow emulated f64 Cholesky (see ops/kkt.py).
    eye = jnp.eye(n, dtype=dtype)
    if dtype == jnp.float64:
        Qinv = mixed_posdef_solve(Q, eye)
    else:
        L = jnp.linalg.cholesky(Q)
        Y = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        Qinv = jax.scipy.linalg.solve_triangular(L.T, Y, lower=False)
    bA = Qinv @ (A.T @ b)                         # (n, b_cols)
    Qs = -(m * cfg.rho) * Qinv                    # (reference: :219)

    # TPU f64 is emulated (bf16-limb matmuls, ~50x slower than f32).  The
    # per-iteration x-update matmul runs as two f32 MXU matmuls on a
    # split of Qs: the result error is ~1e-7 * ||u - alpha||, which both
    # sits ~100x below the ADMM stopping tolerances and shrinks with the
    # residual itself, so convergence and final accuracy are unaffected.
    # (||Qs|| <= 1 since Q >= m*rho*I, so no amplification.)
    split_matmul = (dtype == jnp.float64
                    and jax.default_backend() == "tpu")
    if split_matmul:
        from .dd import split_f64
        Qs_hi, Qs_lo = split_f64(Qs)

    def _qs_matmul(v):
        if not split_matmul:
            return Qs @ v
        v32 = v.astype(jnp.float32)
        hi = jnp.dot(Qs_hi, v32, precision=jax.lax.Precision.HIGHEST)
        lo = jnp.dot(Qs_lo, v32, precision=jax.lax.Precision.HIGHEST)
        return hi.astype(dtype) + lo.astype(dtype)

    eta = reg / rho                               # (B,) or (1,)
    stop_multiplier = cfg.eps_abs * jnp.sqrt(jnp.asarray(n * B, dtype))

    gaps_rows = cfg.max_iters if cfg.compute_loss else 0

    class S(NamedTuple):
        x: jax.Array
        alpha: jax.Array
        u: jax.Array
        gaps: jax.Array
        it: jax.Array
        done: jax.Array

    def cond(s: S):
        return (~s.done) & (s.it < cfg.max_iters)

    def body(s: S):
        x = bA + _qs_matmul(s.u - s.alpha)
        last_alpha = s.alpha
        alpha = soft_threshold(x + s.u, eta, cfg.positive, cfg.add_bias)
        u = s.u + x - alpha

        if cfg.compute_loss:
            f = lasso_objective(A, b, reg, alpha, cfg.positive, cfg.add_bias)
            gaps = s.gaps.at[s.it].set(f)
        else:
            gaps = s.gaps

        def check_stop(_):
            r_norm = jnp.linalg.norm(x - alpha)
            d_norm = rho * jnp.linalg.norm(alpha - last_alpha)
            tol_primal = stop_multiplier + cfg.eps_rel * jnp.linalg.norm(alpha)
            tol_dual = (stop_multiplier
                        + cfg.eps_rel * rho * jnp.linalg.norm(u))
            return (r_norm < tol_primal) & (d_norm < tol_dual)

        is_check = (s.it % cfg.check_stop) == (cfg.check_stop - 1)
        done = lax.cond(is_check, check_stop, lambda _: jnp.zeros((), bool),
                        None)
        return S(x=x, alpha=alpha, u=u, gaps=gaps, it=s.it + 1, done=done)

    zeros = jnp.zeros((n, B), dtype)
    init = S(x=zeros, alpha=zeros, u=zeros,
             gaps=jnp.zeros((gaps_rows, B), dtype),
             it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool))
    out = lax.while_loop(cond, body, init)

    solutions = lasso_objective(A, b, reg, out.alpha, cfg.positive,
                                cfg.add_bias)
    return ADMMResult(X=out.alpha, solutions=solutions, gaps=out.gaps,
                      iterations=out.it)
