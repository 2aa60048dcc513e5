"""Interpret-mode parity for the fused SOCP Newton-step kernel.

``socp_newton_step_prepared`` (ops/pallas_socp.py) is the ONE kernel the
feasible-start engine calls per Newton step for pure-cone (reduced) SOCPs
on TPU (ops/newton.py use_socp_fused path).  These tests pin its gradient,
direction quality, selected step and iterate against the float64 XLA
oracle (ops/socp.py make_socp_oracle) it replaces.

Tolerance notes: under interpret mode the kernel body is compiled by
XLA:CPU, whose algebraic simplifier degrades the double-float error-free
transforms to ~f32 (see tests/test_pallas_step.py); and the kernel's
refined direction solves the operator {exact curvature + Gram(G32)} whose
~1e-7 distance from the oracle Hessian is the same scale as the XLA
path's _split_gram error (ops/pallas_socp.py module docstring).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from interiorpoint_tpu.models.problem import make_socp
from interiorpoint_tpu.ops.socp import make_socp_oracle
from interiorpoint_tpu.ops.pallas_socp import (
    prep_socp_consts, socp_newton_step_prepared, supported)

ALPHA, BETA, J = 0.2, 0.6, 40


def _sigmas():
    return BETA ** np.arange(J)


def _make_problem(K, M, r, seed, with_P=True, tight_cone=None):
    """Random pure-cone SOCP with z0 strictly interior by construction:
    d_k = |A_k z0 + b_k| - c_k.z0 + margin_k gives squared-cone slack
    s_k = 2*margin*|lhs| + margin^2 > 0."""
    rng = np.random.default_rng(seed)
    A = [rng.standard_normal((M, r)) for _ in range(K)]
    b = [rng.standard_normal(M) for _ in range(K)]
    c = [rng.standard_normal(r) for _ in range(K)]
    z0 = rng.standard_normal(r) * 0.3
    margins = rng.uniform(0.5, 1.5, K)
    if tight_cone is not None:
        margins[tight_cone] = 1e-3
    d = [float(np.linalg.norm(A[i] @ z0 + b[i]) - c[i] @ z0 + margins[i])
         for i in range(K)]
    P = q = None
    if with_P:
        Mm = rng.standard_normal((r, r))
        P = Mm @ Mm.T / r + np.eye(r)
    q = rng.standard_normal(r)
    prob = make_socp(A, b, c, d, P, q, None, None, None, None,
                     dtype=jnp.float64)
    return prob, z0


def _ref_select(oracle, z, dx, t):
    """Largest candidate passing domain + Armijo on the true f64 barrier
    Newton objective — the rule ops/newton.py's non-fused path applies."""
    sig = _sigmas()
    g = np.asarray(oracle.grad(jnp.asarray(z), t))
    gdx = g @ dx
    f0 = float(oracle.newton_obj(jnp.asarray(z), t))
    ok, nobjs = oracle.ls_objs(jnp.asarray(z), jnp.asarray(dx), t,
                               jnp.asarray(sig))
    ok, nobjs = np.asarray(ok), np.asarray(nobjs)
    for j, s_ in enumerate(sig):
        if ok[j] and nobjs[j] <= f0 + ALPHA * s_ * gdx:
            return s_
    return 0.0


def _run_kernel(prob, z, t):
    consts = prep_socp_consts(prob)
    r = prob.A.shape[2]
    tq = t * prob.q if prob.q is not None else jnp.zeros((r,), jnp.float64)
    tP = t * prob.P if prob.P is not None else None
    return socp_newton_step_prepared(
        consts, tq, jnp.asarray(z), tP, jnp.asarray(_sigmas()),
        alpha=ALPHA, interpret=True)


@pytest.mark.parametrize("with_P", [True, False])
def test_socp_step_matches_f64_oracle(with_P):
    K, M, r = 3, 24, 40
    prob, z0 = _make_problem(K, M, r, seed=3, with_P=with_P)
    oracle = make_socp_oracle(prob, dd=False)
    t = 5.0
    x_new, nd, sigma, any_acc, dir_ok, dx = _run_kernel(prob, z0, t)
    x_new, dx = np.asarray(x_new), np.asarray(dx)

    assert any_acc and dir_ok
    # direction solves the oracle's Newton system to the Gram(G32) gap
    g = np.asarray(oracle.grad(jnp.asarray(z0), t))
    H = np.asarray(oracle.hess(jnp.asarray(z0), t))
    resid = np.linalg.norm(H @ dx + g) / np.linalg.norm(g)
    assert resid < 1e-4
    # selected step matches the f64 sweep on the kernel's own direction
    sigma_ref = _ref_select(oracle, z0, dx, t)
    assert sigma == pytest.approx(sigma_ref, rel=1e-6)
    np.testing.assert_allclose(x_new, z0 + sigma * dx, rtol=5e-6, atol=1e-8)
    # Newton decrement from the kernel's own (g, dx)
    assert float(nd) == pytest.approx(-0.5 * g @ dx, rel=1e-4)


def test_socp_step_near_boundary():
    """One cone at slack ~1e-3: the full step exits the cone, the sweep
    must backtrack, and the accepted iterate stays strictly interior."""
    K, M, r = 3, 24, 40
    prob, z0 = _make_problem(K, M, r, seed=9, with_P=True, tight_cone=1)
    oracle = make_socp_oracle(prob, dd=False)
    t = 50.0
    x_new, nd, sigma, any_acc, dir_ok, dx = _run_kernel(prob, z0, t)
    x_new, dx = np.asarray(x_new), np.asarray(dx)

    assert any_acc
    sigma_ref = _ref_select(oracle, z0, dx, t)
    assert sigma == pytest.approx(sigma_ref, rel=1e-6)
    # accepted iterate strictly inside every cone (checked in f64 on the
    # dd-accurate direction)
    xs = z0 + sigma * dx
    lhs = np.einsum("kmn,n->km", np.asarray(prob.A), xs) + np.asarray(prob.b)
    rhs = np.asarray(prob.c) @ xs + np.asarray(prob.d)
    assert (rhs**2 - np.sum(lhs**2, axis=1)).min() > 0
    assert rhs.min() > 0


def test_socp_supported_gates():
    assert supported(5, 800, 950, True)          # the n=1000 bench shape
    assert not supported(200, 8, 64, False)      # K > KP cone cap
    assert not supported(5, 1600, 1950, True)    # rp beyond factor envelope
