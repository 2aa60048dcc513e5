"""Interpret-mode parity for the XL split-pipeline Newton step
(ops/pallas_xl.py): Pallas Gram/gradient pass + XLA jitter-laddered
factor/inverse + Pallas refine/line-search must land on the same
iterate as the single mega-kernel — the factor is preconditioner-only,
so only data movement differs, never semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from interiorpoint_tpu.ops.pallas_newton import (
    kernel_mode, prep_reduced_consts, reduced_newton_step_prepared)
from interiorpoint_tpu.ops.pallas_xl import (
    reduced_newton_step_xl_prepared, xl_supported)

ALPHA, BETA, J = 0.2, 0.6, 40


def _sigmas():
    return jnp.asarray(BETA ** np.arange(J))


@pytest.mark.parametrize("qp", [False, True])
def test_xl_step_matches_mega_kernel(qp):
    """Same Newton iterate / decrement / step as the fused mega-kernel
    (k > CH so the streamed slab loop runs multiple DMA'd chunks)."""
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

    x_ref, nd_ref, sig_ref, acc_ref, ok_ref = reduced_newton_step_prepared(
        consts, jnp.asarray(tc), jnp.asarray(z), tP, _sigmas(),
        alpha=ALPHA, interpret=True)
    x_xl, nd_xl, sig_xl, acc_xl, ok_xl = reduced_newton_step_xl_prepared(
        consts, jnp.asarray(tc), jnp.asarray(z), tP, _sigmas(),
        alpha=ALPHA, interpret=True)

    # Different factor implementations (in-kernel blocked vs XLA
    # cholesky+solve_triangular) -> different preconditioners; the dd
    # refinement drives both to the same direction at its floor, so the
    # iterates agree to f64-grade, not bit-exact.  With P the xl
    # operator carries tP at f32 (hi-half only, ~1e-8 relative
    # perturbation — pallas_xl._pmatvec_hi), so the qp case gets the
    # correspondingly looser bar.
    assert bool(acc_xl) == bool(acc_ref)
    assert float(sig_xl) == pytest.approx(float(sig_ref))
    rtol = 1e-6 if qp else 1e-8
    np.testing.assert_allclose(np.asarray(x_xl), np.asarray(x_ref),
                               rtol=rtol, atol=1e-8)
    assert float(nd_xl) == pytest.approx(float(nd_ref), rel=1e-6)


@pytest.mark.parametrize("with_P", [False, True])
def test_socp_xl_step_matches_mega_kernel(with_P):
    """SOCP split pipeline ≡ the resident SOCP mega-kernel on the same
    step (in-kernel iota cone masks replace the E matrix; the A·dx side
    channel replaces the resident kernel's extra line-search pass)."""
    from interiorpoint_tpu.models.problem import make_socp
    from interiorpoint_tpu.ops.pallas_socp import (
        prep_socp_consts, socp_newton_step_prepared)
    from interiorpoint_tpu.ops.pallas_xl import socp_newton_step_xl_prepared

    rng = np.random.default_rng(47)
    K, M, r = 3, 170, 96           # K*M > CH: multiple streamed chunks
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
    xl = socp_newton_step_xl_prepared(consts, tq, z, tP, _sigmas(),
                                      alpha=ALPHA, interpret=True)
    x_ref, nd_ref, sig_ref, acc_ref, ok_ref, dx_ref = ref
    x_xl, nd_xl, sig_xl, acc_xl, ok_xl, dx_xl = xl
    assert bool(acc_xl) == bool(acc_ref)
    assert float(sig_xl) == pytest.approx(float(sig_ref))
    np.testing.assert_allclose(np.asarray(x_xl), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dx_xl), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-6)
    assert float(nd_xl) == pytest.approx(float(nd_ref), rel=1e-5)


def test_xl_envelope(monkeypatch):
    """xl extends the fused regime past the mega-kernel cap and is
    selected exactly there (with the hardware opt-in gate on — the
    Mosaic compile of these shapes crashes the v5e compile helper, so
    engine selection currently defaults xl off; see pallas_xl.XL_ENABLED)."""
    import interiorpoint_tpu.ops.pallas_xl as px
    monkeypatch.setattr(px, "XL_ENABLED", True)
    # LP n=10000-class reduced shape: r=2000, k=22000
    assert xl_supported(22000, 2000, False)
    assert kernel_mode(22000, 2000, False) == "xl"
    # SOCP n=3000-class factor size (the LP/QP envelope check)
    assert xl_supported(12000, 2850, False)
    # beyond the xl cap: the pure-XLA step regime (ops/xl_step.py)
    # picks these shapes up now
    assert not xl_supported(12000, 3200, False)
    assert kernel_mode(12000, 3200, False) == "xla"
    # QP keeps tP hi-half-only resident: same rp cap as LP
    assert xl_supported(18000, 2000, True)
    assert xl_supported(18000, 2500, True)
    assert not xl_supported(18000, 3200, True)
    # inside the mega-kernel envelope the mega-kernel stays selected
    assert kernel_mode(2200, 200, False) == "resident"
    assert kernel_mode(11000, 1000, False) == "stream"
    # SOCP n=3000-class stacked-cone shape (K=5, M=2400, r=2950) —
    # WITH the quadratic term: the benchmark recipe has P, which is
    # what routed n=3000 to the staged XLA path in the first xl cut
    from interiorpoint_tpu.ops.pallas_xl import xl_socp_supported
    assert xl_socp_supported(5, 2400, 2950, False)
    assert xl_socp_supported(5, 2401, 2950, True)
    assert not xl_socp_supported(5, 4000, 4750, False)   # n=5000-class
    assert not xl_socp_supported(200, 100, 500, False)   # K > KP
