"""Pure-XLA step (ops/xl_step.py) parity against the fused mega-kernels
(interpret mode) — same algorithm, no Mosaic; the production path for
rp beyond the kernel envelopes (LP n=10000-class, SOCP n≥3000)."""

import numpy as np
import jax.numpy as jnp
import pytest

from interiorpoint_tpu.ops.pallas_newton import (
    kernel_mode, prep_reduced_consts, reduced_newton_step_prepared)
from interiorpoint_tpu.ops.xl_step import (
    reduced_newton_step_xla, socp_newton_step_xla, xla_step_supported,
    xla_socp_step_supported)

ALPHA, BETA, J = 0.2, 0.6, 40


def _sigmas():
    return jnp.asarray(BETA ** np.arange(J))


@pytest.mark.parametrize("qp", [False, True])
def test_xla_step_matches_mega_kernel(qp):
    rng = np.random.default_rng(31)
    k, r = 1100, 96
    C = rng.standard_normal((k, r))
    z = rng.standard_normal(r) * 0.1
    d = C @ z + rng.uniform(0.05, 2.0, k)
    tc = 10.0 * rng.standard_normal(r)
    tP = None
    if qp:
        M = rng.standard_normal((r, r))
        tP = jnp.asarray((M @ M.T / r + np.eye(r)) * 2.0)
    consts = prep_reduced_consts(jnp.asarray(C), jnp.asarray(d))

    x_ref, nd_ref, sig_ref, acc_ref, _ = reduced_newton_step_prepared(
        consts, jnp.asarray(tc), jnp.asarray(z), tP, _sigmas(),
        alpha=ALPHA, interpret=True)
    x_xla, nd_xla, sig_xla, acc_xla, _ = reduced_newton_step_xla(
        consts, jnp.asarray(tc), jnp.asarray(z), tP, _sigmas(),
        alpha=ALPHA)

    assert bool(acc_xla) == bool(acc_ref)
    assert float(sig_xla) == pytest.approx(float(sig_ref))
    np.testing.assert_allclose(np.asarray(x_xla), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-9)
    assert float(nd_xla) == pytest.approx(float(nd_ref), rel=1e-6)


@pytest.mark.parametrize("with_P", [False, True])
def test_xla_socp_step_matches_mega_kernel(with_P):
    from interiorpoint_tpu.models.problem import make_socp
    from interiorpoint_tpu.ops.pallas_socp import (
        prep_socp_consts, socp_newton_step_prepared)

    rng = np.random.default_rng(47)
    K, M, r = 3, 170, 96
    A = [rng.standard_normal((M, r)) for _ in range(K)]
    b = [rng.standard_normal(M) for _ in range(K)]
    c = [rng.standard_normal(r) for _ in range(K)]
    z0 = rng.standard_normal(r) * 0.3
    d = [float(np.linalg.norm(A[i] @ z0 + b[i]) - c[i] @ z0 + 1.0)
         for i in range(K)]
    P = None
    if with_P:
        Mm = rng.standard_normal((r, r))
        P = Mm @ Mm.T / r + np.eye(r)
    q = rng.standard_normal(r)
    prob = make_socp(A, b, c, d, P, q, None, None, None, None,
                     dtype=jnp.float64)
    consts = prep_socp_consts(prob)
    t = 10.0
    tq = t * prob.q
    tP = None if prob.P is None else t * prob.P
    z = jnp.asarray(z0)

    ref = socp_newton_step_prepared(consts, tq, z, tP, _sigmas(),
                                    alpha=ALPHA, interpret=True)
    xla = socp_newton_step_xla(consts, tq, z, tP, _sigmas(), alpha=ALPHA)
    x_ref, nd_ref, sig_ref, acc_ref, _, dx_ref = ref
    x_xla, nd_xla, sig_xla, acc_xla, _, dx_xla = xla
    assert bool(acc_xla) == bool(acc_ref)
    assert float(sig_xla) == pytest.approx(float(sig_ref))
    np.testing.assert_allclose(np.asarray(x_xla), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dx_xla), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-6)
    assert float(nd_xla) == pytest.approx(float(nd_ref), rel=1e-5)


def test_xla_step_selection():
    """Beyond-kernel shapes route to the pure-XLA step by default (the
    Pallas xl pipeline stays opt-in behind its Mosaic gate)."""
    assert xla_step_supported(22000, 2000, False)
    assert kernel_mode(22000, 2000, False) == "xla"
    assert xla_socp_step_supported(5, 2401, 2950, True)   # SOCP n=3000
    assert xla_socp_step_supported(5, 4001, 4950, True)   # SOCP n=5000
    # inside the mega-kernel envelope the mega-kernel stays selected
    assert kernel_mode(2200, 200, False) == "resident"
    assert kernel_mode(11000, 1000, False) == "stream"
