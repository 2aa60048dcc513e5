"""Fused PD iteration kernel (ops/pallas_pd.py) — interpret-mode parity
against an independent float64 implementation of the same Mehrotra
iteration (the math of ops/pd.py, re-derived here so the test does not
share code with either implementation)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interiorpoint_tpu.ops.pallas_newton import prep_reduced_consts
from interiorpoint_tpu.ops.pallas_pd import pd_step_prepared

_GAMMA = 0.99995


def _ref_pd_iteration(C, d, q, z, s, lam, P=None):
    """One f64 Mehrotra iteration (predictor + corrector, γ-damped)."""
    k = C.shape[0]
    rd = q + C.T @ lam + (P @ z if P is not None else 0.0)
    rp = C @ z + s - d
    w = lam / s
    H = (C.T * w) @ C + (P if P is not None else 0.0)
    Hf = np.linalg.cholesky(H)

    def solve(rhs):
        y = np.linalg.solve(Hf, rhs)
        return np.linalg.solve(Hf.T, y)

    def direction(rc):
        rhs = -rd + C.T @ ((rc - lam * rp) / s)
        dz = solve(rhs)
        ds = -rp - C @ dz
        dlam = (-rc - lam * ds) / s
        return dz, ds, dlam

    def max_step(v, dv):
        r = np.where(dv < 0, -v / np.where(dv < 0, dv, -1.0), np.inf)
        return min(1.0, r.min())

    mu = s @ lam / k
    dz_a, ds_a, dl_a = direction(s * lam)
    ap_a = max_step(s, ds_a)
    ad_a = max_step(lam, dl_a)
    mu_aff = (s + ap_a * ds_a) @ (lam + ad_a * dl_a) / k
    sigma = float(np.clip((mu_aff / mu) ** 3, 0.0, 1.0))
    rc = s * lam - sigma * mu + ds_a * dl_a
    dz, ds, dlam = direction(rc)
    ap = min(1.0, _GAMMA * max_step(s, ds))
    ad = min(1.0, _GAMMA * max_step(lam, dlam))
    return z + ap * dz, s + ap * ds, lam + ad * dlam, sigma, ap, ad


def _mk(seed, k, r, quad=False):
    rng = np.random.default_rng(seed)
    C = rng.uniform(-2, 2, (k, r))
    zf = rng.uniform(-0.5, 0.5, r)
    d = C @ zf + rng.uniform(0.3, 1.2, k)
    lamt = rng.uniform(0.1, 1.0, k)
    q = -C.T @ lamt
    P = None
    if quad:
        M = rng.uniform(-1, 1, (r, r))
        P = M.T @ M + np.eye(r)
    z0 = zf
    s0 = np.maximum(d - C @ z0, 1e-2)
    lam0 = np.clip(1.0 / s0, 1e-6, 1e6)
    return C, d, q, P, z0, s0, lam0


@pytest.mark.parametrize("quad", [False, True])
def test_pd_step_kernel_matches_f64_reference(quad):
    k, r = 96, 24
    C, d, q, P, z, s, lam = _mk(5 if quad else 3, k, r, quad)
    consts = prep_reduced_consts(jnp.asarray(C), jnp.asarray(d))
    tP = None if P is None else jnp.asarray(P)

    zr, sr, lr = z.copy(), s.copy(), lam.copy()
    for it in range(3):
        z2, s2, l2, stats = pd_step_prepared(
            consts, jnp.asarray(q), jnp.asarray(z), jnp.asarray(s),
            jnp.asarray(lam), tP, interpret=True)
        zr, sr, lr, sigma_r, ap_r, ad_r = _ref_pd_iteration(
            C, d, q, zr, sr, lr, P)
        z, s, lam = np.asarray(z2), np.asarray(s2), np.asarray(l2)
        # interpret-mode caveat (tests/test_pallas_step.py): XLA:CPU
        # simplifies away some dd error terms, so interpret accuracy is
        # ~f32 on dd outputs; on hardware Mosaic compiles verbatim.
        scale = max(1.0, np.abs(zr).max())
        assert np.abs(z - zr).max() / scale < 5e-5, it
        assert np.abs(s - sr).max() / max(1.0, sr.max()) < 5e-5, it
        assert np.abs(lam - lr).max() / max(1.0, lr.max()) < 5e-5, it
        assert abs(float(stats[3]) - ap_r) < 1e-3, it
        assert abs(float(stats[4]) - ad_r) < 1e-3, it
        # the exact (1-α)-contraction bookkeeping
        rp_now = C @ z + s - d
        assert np.abs(rp_now).max() <= float(stats[1]) * 1.01 + 1e-6


def test_pd_step_kernel_stream_matches_resident():
    """HBM-streaming variant ≡ resident: identical arithmetic, different
    data movement (exercises the scratch ordering around the DMA
    window)."""
    k, r = 96, 24
    C, d, q, P, z, s, lam = _mk(7, k, r)
    consts = prep_reduced_consts(jnp.asarray(C), jnp.asarray(d))
    outs = {}
    for stream in (False, True):
        outs[stream] = pd_step_prepared(
            consts, jnp.asarray(q), jnp.asarray(z), jnp.asarray(s),
            jnp.asarray(lam), None, interpret=True, stream=stream)
    # identical arithmetic modulo interpret-mode op reordering (~1e-14);
    # stats (gap/norms/steps) agree exactly, the solve-quality residual²
    # entries only to rounding noise (~1e-28)
    for a, b in zip(outs[False][:3], outs[True][:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)
    sa, sb = np.asarray(outs[False][3]), np.asarray(outs[True][3])
    np.testing.assert_array_equal(sa[:6], sb[:6])
    np.testing.assert_allclose(sa[6:], sb[6:], rtol=0, atol=1e-20)


def test_pd_solve_fused_matches_xla_engine():
    """The fused-kernel while_loop driver (ops/pd.py pd_solve_fused) must
    reach the same optimum as the XLA engine at the same tolerances."""
    from scipy.optimize import linprog

    from interiorpoint_tpu.models.problem import LPProblem
    from interiorpoint_tpu.ops.pd import pd_solve, pd_solve_fused
    from interiorpoint_tpu.utils.config import SolverConfig

    k, r = 96, 24
    C, d, q, P, z0, s0, lam0 = _mk(17, k, r)
    ref = linprog(q, A_ub=C, b_ub=d, bounds=[(None, None)] * r,
                  method="highs")
    assert ref.status == 0
    prob = LPProblem(c=jnp.asarray(q), C=jnp.asarray(C), d=jnp.asarray(d))
    cfg = SolverConfig(dtype="float64", epsilon=1e-7)
    res_x = pd_solve(prob, jnp.asarray(z0), cfg)
    res_f = pd_solve_fused(prob, jnp.asarray(z0), cfg, interpret=True)
    assert bool(res_f.converged)
    vf = float(q @ np.asarray(res_f.z))
    vx = float(q @ np.asarray(res_x.z))
    assert vf == pytest.approx(ref.fun, rel=1e-6, abs=1e-6)
    assert vf == pytest.approx(vx, rel=1e-6, abs=1e-6)
    assert int(res_f.iters) <= int(res_x.iters) + 5


def test_pd_step_kernel_converges_interpret():
    """Driving the kernel in a loop must reach the HiGHS optimum."""
    from scipy.optimize import linprog

    k, r = 96, 24
    C, d, q, P, z, s, lam = _mk(11, k, r)
    ref = linprog(q, A_ub=C, b_ub=d, bounds=[(None, None)] * r,
                  method="highs")
    assert ref.status == 0
    consts = prep_reduced_consts(jnp.asarray(C), jnp.asarray(d))
    for it in range(40):
        z, s, lam, stats = pd_step_prepared(
            consts, jnp.asarray(q), jnp.asarray(z), jnp.asarray(s),
            jnp.asarray(lam), None, interpret=True)
        z, s, lam = np.asarray(z), np.asarray(s), np.asarray(lam)
        if float(stats[0]) < 1e-7:
            break
    val = q @ z
    assert val == pytest.approx(ref.fun, rel=1e-6, abs=1e-6)
