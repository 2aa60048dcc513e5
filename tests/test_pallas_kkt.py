"""Fused dense-KKT direction kernel (ops/pallas_kkt.py) — interpret-mode
parity against dense NumPy solves and the conic Mehrotra engine's XLA
block elimination (reference math: the factor-H / Schur-S strategy of
NewtonSolverInfeasibleStart.py:356-538)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interiorpoint_tpu.ops.pallas_kkt import (kkt_dir_prepared,
                                              kkt_supported,
                                              prep_kkt_consts, prep_kkt_h)


def _spd(rng, n, diag_spread=6.0):
    M = rng.standard_normal((n, n))
    H = M @ M.T + np.eye(n) * 1e-3
    H += np.diag(10.0 ** rng.uniform(-3, diag_spread, n))
    return 0.5 * (H + H.T)


@pytest.mark.parametrize("n,pe", [(60, 12), (200, 50), (130, 0)])
def test_kkt_dir_matches_dense_solve(n, pe):
    """dx/dy match the dense f64 KKT solve to ~1e-12 relative, across
    a barrier-like diagonal spread (1e-3..1e6)."""
    rng = np.random.default_rng(n + pe)
    H = _spd(rng, n)
    r1 = rng.standard_normal(n)
    if pe:
        F = rng.standard_normal((pe, n))
        rpe = rng.standard_normal(pe)
        KKT = np.block([[H, F.T], [F, np.zeros((pe, pe))]])
        sol = np.linalg.solve(KKT, np.concatenate([r1, -rpe]))
        dx_ref, dy_ref = sol[:n], sol[n:]
    else:
        F = rpe = None
        dx_ref, dy_ref = np.linalg.solve(H, r1), np.zeros(0)

    Hhi, Hlo = prep_kkt_h(jnp.asarray(H), n)
    kc = prep_kkt_consts(None if F is None else jnp.asarray(F), n)
    dx, dy, rn2, bn2 = kkt_dir_prepared(
        Hhi, Hlo, kc, jnp.asarray(r1),
        None if rpe is None else jnp.asarray(rpe), interpret=True)
    assert np.linalg.norm(dx - dx_ref) / np.linalg.norm(dx_ref) < 1e-11
    if pe:
        assert np.linalg.norm(dy - dy_ref) / np.linalg.norm(dy_ref) < 1e-11
    assert float(rn2) < 1e-18 * float(bn2) + 1e-20


def test_kkt_dir_ill_conditioned_stays_refined():
    """κ ~ 1e9 system: the dd refinement (+ PCG escalation) still
    recovers ~1e-9-relative directions from the f32 factor."""
    rng = np.random.default_rng(7)
    n, pe = 150, 20
    H = _spd(rng, n, diag_spread=9.0)
    F = rng.standard_normal((pe, n))
    r1 = rng.standard_normal(n)
    rpe = rng.standard_normal(pe)
    KKT = np.block([[H, F.T], [F, np.zeros((pe, pe))]])
    sol = np.linalg.solve(KKT, np.concatenate([r1, -rpe]))

    Hhi, Hlo = prep_kkt_h(jnp.asarray(H), n)
    kc = prep_kkt_consts(jnp.asarray(F), n)
    dx, dy, rn2, bn2 = kkt_dir_prepared(Hhi, Hlo, kc, jnp.asarray(r1),
                                        jnp.asarray(rpe), interpret=True)
    err = np.linalg.norm(np.concatenate([dx, dy]) - sol) \
        / np.linalg.norm(sol)
    assert err < 1e-8


def test_supported_envelope():
    assert kkt_supported(1000, 50)
    assert kkt_supported(1536, 128)
    assert kkt_supported(200, 0)
    assert not kkt_supported(2000, 50)      # rp beyond the factor cap
    assert not kkt_supported(1000, 200)     # Schur block beyond one tile


def test_socp_pd_kernel_path_matches_xla():
    """End-to-end conic Mehrotra: the fused-kernel direction path
    reaches the same optimum as the XLA block elimination (quadratic
    SOCP with equalities, and the no-equality form)."""
    from interiorpoint_tpu.models.problem import make_socp
    from interiorpoint_tpu.ops.socp_pd import cone_operator, socp_pd_solve
    from interiorpoint_tpu.utils.config import SolverConfig

    rng = np.random.default_rng(3)
    K, M, n, m_eq = 4, 30, 60, 12
    As = rng.standard_normal((K, M, n))
    bs = rng.standard_normal((K, M))
    cs = rng.standard_normal((K, n))
    x0 = rng.standard_normal(n) * 0.1
    ds = np.array([np.linalg.norm(As[k] @ x0 + bs[k]) - cs[k] @ x0 + 1.0
                   for k in range(K)])
    q = rng.uniform(-1, 1, n)
    Mq = rng.uniform(-1, 1, (n, n))
    P = Mq.T @ Mq + np.eye(n)
    F = rng.standard_normal((m_eq, n))
    g = F @ x0
    prob = make_socp(A=list(As), b=list(bs), c=list(cs), d=list(ds),
                     P=P, q=q, F=F, g=g)
    G, h, qv = cone_operator(prob)
    cfg = SolverConfig(epsilon=1e-6)
    obj = lambda x: float(0.5 * x @ jnp.asarray(P) @ x    # noqa: E731
                          + jnp.asarray(q) @ x)

    kw = dict(P=jnp.asarray(P), F=jnp.asarray(F), g=jnp.asarray(g))
    r_xla = socp_pd_solve(G, h, qv, jnp.asarray(x0), cfg,
                          kkt_kernel=False, **kw)
    r_ker = socp_pd_solve(G, h, qv, jnp.asarray(x0), cfg,
                          kkt_kernel="interpret", **kw)
    # The XLA path on CPU re-factors in exact f64 when refinement stalls
    # (ops/kkt.py exact_fallback — disabled on TPU); the kernel path is
    # capped by the f32-preconditioner wall, exactly like the TPU XLA
    # path, so it certifies the gap but may stall on the dual-residual
    # gate at tight tolerances.  Assert what both must deliver: the same
    # optimum, primal feasibility, and a closed gap.
    assert bool(r_xla.converged)
    assert float(r_ker.gap) < 1e-6
    assert float(r_ker.rp_norm) < 1e-8
    assert obj(r_ker.x) == pytest.approx(obj(r_xla.x), rel=1e-6, abs=1e-6)

    r_x2 = socp_pd_solve(G, h, qv, jnp.asarray(x0), cfg, kkt_kernel=False,
                         P=jnp.asarray(P))
    r_k2 = socp_pd_solve(G, h, qv, jnp.asarray(x0), cfg,
                         kkt_kernel="interpret", P=jnp.asarray(P))
    assert bool(r_x2.converged) and bool(r_k2.converged)
    assert obj(r_k2.x) == pytest.approx(obj(r_x2.x), rel=1e-6, abs=1e-6)


def test_lp_pd_eq_kernel_path_matches_xla():
    """pd_solve's equality path: the fused-KKT direction kernel reaches
    the XLA block elimination's optimum (functional solve_lp/solve_qp
    entries pass A/b straight to pd_solve)."""
    from interiorpoint_tpu.models.problem import make_lp
    from interiorpoint_tpu.models.reduced import full_space_pd_problem
    from interiorpoint_tpu.ops.pd import pd_solve
    from interiorpoint_tpu.utils.config import SolverConfig
    from scipy.optimize import linprog

    rng = np.random.default_rng(11)
    n, m_eq, k_in = 80, 20, 40
    A = rng.uniform(-2, 2, (m_eq, n))
    C = rng.uniform(-2, 2, (k_in, n))
    xf = rng.uniform(-1, 1, n)
    c = rng.uniform(-2, 2, n)
    b, d = A @ xf, C @ xf + 1.0
    prob = full_space_pd_problem(
        make_lp(c=c, C=C, d=d, lb=-3, ub=3), jnp.float64)
    cfg = SolverConfig(epsilon=1e-8)
    z0 = jnp.zeros(n, jnp.float64)

    r_xla = pd_solve(prob, z0, cfg, A=jnp.asarray(A), b=jnp.asarray(b),
                     kkt_kernel=False)
    r_ker = pd_solve(prob, z0, cfg, A=jnp.asarray(A), b=jnp.asarray(b),
                     kkt_kernel="interpret")
    ref = linprog(c, A_ub=C, b_ub=d, A_eq=A, b_eq=b,
                  bounds=[(-3, 3)] * n, method="highs")
    assert ref.success
    vx = float(c @ np.asarray(r_xla.z))
    vk = float(c @ np.asarray(r_ker.z))
    assert vx == pytest.approx(ref.fun, rel=1e-6, abs=1e-6)
    assert vk == pytest.approx(ref.fun, rel=1e-6, abs=1e-6)
