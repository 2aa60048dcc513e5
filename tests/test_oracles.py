"""Barrier-oracle unit tests: analytic gradients/Hessians cross-checked
against jax.grad / jax.hessian of the Newton objective.

Mirrors the reference's hand-computed derivative tests
(reference: AutomatedTestsPhaseOne.py:15-193) with autodiff as the oracle,
per SURVEY.md §4.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interiorpoint_tpu.models.problem import make_lp, make_qp
from interiorpoint_tpu.ops.barrier import (
    full_linear_slacks,
    make_phase1_linear_oracle,
    make_qp_oracle,
)

RNG = np.random.default_rng(0)


def _random_lp(n=7, m=4, k=5, bounds=True, eq=True, ineq=True):
    A = RNG.uniform(-2, 2, (m, n)) if eq else None
    C = RNG.uniform(-2, 2, (k, n)) if ineq else None
    x_feas = RNG.uniform(-1, 1, n)
    c = RNG.uniform(-2, 2, n)
    b = A @ x_feas if eq else None
    # strict interior for the barrier
    d = C @ x_feas + RNG.uniform(0.5, 1.5, k) if ineq else None
    lb, ub = (-3.0, 3.0) if bounds else (None, None)
    return make_lp(c, A, b, C, d, lb, ub), x_feas


def _random_qp(n=6, m=3, k=4):
    Pp = RNG.uniform(-1, 1, (m, n))
    P = Pp.T @ Pp + np.eye(n)
    q = RNG.uniform(-2, 2, n)
    A = RNG.uniform(-2, 2, (m, n))
    C = RNG.uniform(-2, 2, (k, n))
    x_feas = RNG.uniform(-1, 1, n)
    return make_qp(P, q, A, A @ x_feas, C, C @ x_feas + 1.0, -3.0, 3.0), x_feas


@pytest.mark.parametrize("bounds,ineq", [(True, True), (True, False),
                                         (False, True)])
def test_lp_oracle_grad_hess_vs_autodiff(bounds, ineq):
    prob, x = _random_lp(bounds=bounds, ineq=ineq)
    oracle = make_qp_oracle(prob, try_diag=False)
    t = jnp.asarray(3.7)
    x = jnp.asarray(x)

    g_auto = jax.grad(lambda xx: oracle.newton_obj(xx, t))(x)
    np.testing.assert_allclose(oracle.grad(x, t), g_auto, rtol=1e-9)

    H_auto = jax.hessian(lambda xx: oracle.newton_obj(xx, t))(x)
    np.testing.assert_allclose(oracle.hess(x, t), H_auto, rtol=1e-8,
                               atol=1e-10)


def test_lp_oracle_diag_path_matches_dense():
    prob, x = _random_lp(ineq=False, bounds=True)
    x = jnp.asarray(x)
    t = jnp.asarray(2.0)
    dense = make_qp_oracle(prob, try_diag=False)
    diag = make_qp_oracle(prob, try_diag=True)
    assert diag.diag_hessian and not dense.diag_hessian
    np.testing.assert_allclose(jnp.diag(dense.hess(x, t)), diag.hess(x, t),
                               rtol=1e-12)


def test_qp_oracle_grad_hess_vs_autodiff():
    prob, x = _random_qp()
    oracle = make_qp_oracle(prob)
    t = jnp.asarray(0.9)
    x = jnp.asarray(x)
    g_auto = jax.grad(lambda xx: oracle.newton_obj(xx, t))(x)
    np.testing.assert_allclose(oracle.grad(x, t), g_auto, rtol=1e-9)
    H_auto = jax.hessian(lambda xx: oracle.newton_obj(xx, t))(x)
    np.testing.assert_allclose(oracle.hess(x, t), H_auto, rtol=1e-8,
                               atol=1e-10)


def test_qp_objective_value():
    prob, x = _random_qp()
    oracle = make_qp_oracle(prob)
    x = jnp.asarray(x)
    expect = 0.5 * x @ (np.asarray(prob.P) @ x) + np.asarray(prob.q) @ x
    np.testing.assert_allclose(oracle.obj(x), expect, rtol=1e-12)


def test_phase1_oracle_grad_hess_vs_autodiff():
    prob, x = _random_lp()
    oracle = make_phase1_linear_oracle(prob)
    # z = [x, s] with s large enough for strictly positive phase-1 slacks
    z = jnp.concatenate([jnp.asarray(x), jnp.asarray([5.0])])
    t = jnp.asarray(1.3)
    g_auto = jax.grad(lambda zz: oracle.newton_obj(zz, t))(z)
    np.testing.assert_allclose(oracle.grad(z, t), g_auto, rtol=1e-9)
    H_auto = jax.hessian(lambda zz: oracle.newton_obj(zz, t))(z)
    np.testing.assert_allclose(oracle.hess(z, t), H_auto, rtol=1e-8,
                               atol=1e-10)


def test_phase1_objective_is_slack_var():
    prob, x = _random_lp()
    oracle = make_phase1_linear_oracle(prob)
    z = jnp.concatenate([jnp.asarray(x), jnp.asarray([2.5])])
    assert float(oracle.obj(z)) == 2.5


def test_linesearch_candidates_match_pointwise_eval():
    """ls_grads/ls_objs closed forms must equal direct evaluation at
    x + σ·dx for every candidate σ."""
    prob, x = _random_lp()
    oracle = make_qp_oracle(prob, try_diag=False)
    x = jnp.asarray(x)
    dx = jnp.asarray(RNG.uniform(-0.2, 0.2, x.shape[0]))
    t = jnp.asarray(4.2)
    sigmas = jnp.asarray(0.6) ** jnp.arange(8, dtype=x.dtype)

    ok, grads = oracle.ls_grads(x, dx, t, sigmas)
    ok2, nobjs = oracle.ls_objs(x, dx, t, sigmas)
    for j, s in enumerate(np.asarray(sigmas)):
        xs = x + s * dx
        slack_min = float(oracle.min_slack(xs))
        assert bool(ok[j]) == (slack_min > 0.0)
        assert bool(ok2[j]) == (slack_min > 0.0)
        if slack_min > 0:
            np.testing.assert_allclose(grads[:, j], oracle.grad(xs, t),
                                       rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(nobjs[j], oracle.newton_obj(xs, t),
                                       rtol=1e-9)


def test_full_linear_slacks_order():
    """Slack ordering must be [Cx≤d, ub, lb]
    (reference: FunctionManager.py:50-62)."""
    prob, x = _random_lp()
    x = jnp.asarray(x)
    s = np.asarray(full_linear_slacks(prob, x))
    k = prob.C.shape[0]
    n = prob.n
    np.testing.assert_allclose(s[:k], np.asarray(prob.d - prob.C @ x))
    np.testing.assert_allclose(s[k:k + n], np.asarray(prob.ub - x))
    np.testing.assert_allclose(s[k + n:], np.asarray(x - prob.lb))


@pytest.mark.parametrize("is_qp", [False, True])
def test_lp_qp_oracle_dd_path_matches_f64(is_qp):
    """The dd contraction path (ops/barrier.py use_dd) must agree with the
    plain-f64 oracle: grad/objective/slacks to dd accuracy, Hessian to
    f32-Gram (preconditioner) accuracy."""
    rng = np.random.default_rng(12)
    n, m, k = 14, 6, 9
    C = rng.standard_normal((k, n))
    xf = rng.standard_normal(n) * 0.2
    d = C @ xf + 1.0
    lb, ub = np.full(n, -3.0), np.full(n, 3.0)
    if is_qp:
        Pp = rng.standard_normal((m, n))
        P = Pp.T @ Pp + np.eye(n)
        q = rng.standard_normal(n)
        prob = make_qp(P, q, None, None, C, d, lb, ub, dtype=jnp.float64)
    else:
        c = rng.standard_normal(n)
        prob = make_lp(c, None, None, C, d, lb, ub, dtype=jnp.float64)

    o64 = make_qp_oracle(prob, dd_override=False)
    odd = make_qp_oracle(prob, dd_override=True)
    x = jnp.asarray(xf, jnp.float64)
    t = jnp.asarray(11.0, jnp.float64)

    np.testing.assert_allclose(odd.grad(x, t), o64.grad(x, t),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(odd.newton_obj(x, t), o64.newton_obj(x, t),
                               rtol=1e-13)
    np.testing.assert_allclose(odd.min_slack(x), o64.min_slack(x),
                               rtol=1e-13)
    H64, Hdd = o64.hess(x, t), odd.hess(x, t)
    scale = np.linalg.norm(np.asarray(H64))
    assert np.linalg.norm(np.asarray(Hdd - H64)) <= 1e-6 * scale

    g = np.asarray(o64.grad(x, t))
    dx = -jnp.asarray(np.linalg.solve(np.asarray(H64), g))
    sigmas = jnp.asarray(0.5 ** np.arange(8), jnp.float64)
    ok64, v64 = o64.ls_objs(x, dx, t, sigmas)
    okdd, vdd = odd.ls_objs(x, dx, t, sigmas)
    np.testing.assert_array_equal(np.asarray(okdd), np.asarray(ok64))
    np.testing.assert_allclose(np.asarray(vdd)[np.asarray(ok64)],
                               np.asarray(v64)[np.asarray(ok64)],
                               rtol=1e-11, atol=1e-9)


def test_phase1_lin_form_matches_oracle():
    """The phase-one oracle's augmented linear form ([C | -1] z <= d,
    cost e_s) must agree with its own slack/gradient definitions — the
    fused Pallas kernel consumes the form on TPU (round 3)."""
    rng = np.random.default_rng(7)
    k, r = 12, 5
    C = jnp.asarray(rng.standard_normal((k, r)))
    d = jnp.asarray(rng.standard_normal(k))
    prob = make_lp(c=rng.standard_normal(r), C=C, d=d)
    oracle = make_phase1_linear_oracle(prob)
    Cp, dp, cost, P = oracle.lin_form
    assert P is None and Cp.shape == (k, r + 1)

    x = jnp.asarray(rng.standard_normal(r))
    s = jnp.asarray(float(jnp.max(C @ x - d)) + 2.0)  # strictly feasible
    z = jnp.concatenate([x, s[None]])
    # slack parity: d' - C' z == the oracle's slack parts
    slack_form = dp - Cp @ z
    np.testing.assert_allclose(np.asarray(slack_form),
                               np.asarray(d - C @ x + s), rtol=1e-14)
    # gradient parity: t*cost + C'^T (1/slack) == oracle.grad
    t = 3.7
    g_form = t * cost + Cp.T @ (1.0 / slack_form)
    np.testing.assert_allclose(np.asarray(g_form),
                               np.asarray(oracle.grad(z, t)),
                               rtol=1e-12, atol=1e-12)
