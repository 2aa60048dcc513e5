"""Utility-layer tests: CSV IO, MIPLIB loader, generators, error analysis."""

import os

import numpy as np
import pytest

from interiorpoint_tpu.utils import csvio, generators, miplib, plotting


def test_csvio_roundtrip(tmp_path):
    arr = np.array([[1.5, 2.5, 0.0], [3.5, 0.0, 0.0]])
    path = str(tmp_path / "res.csv")
    csvio.write_results(path, arr)
    back = csvio.read_results(path)
    # zeros (skipped runs) come back as NaN (reference: parseAndPlot.py:86-93)
    assert np.isnan(back[0, 2]) and np.isnan(back[1, 1])
    np.testing.assert_allclose(back[0, :2], [1.5, 2.5])
    means = csvio.mean_over_reps(back)
    np.testing.assert_allclose(means, [2.0, 3.5])


def test_csvio_reads_reference_format(tmp_path):
    """Header line 'num_tests,N' then row-major values
    (reference: testSolver.py:248-271)."""
    path = str(tmp_path / "ref.csv")
    with open(path, "w") as f:
        f.write("2,3\n")
        f.write("1.0,2.0,3.0\n")
        f.write("4.0,5.0,6.0\n")
    arr = csvio.read_results(path)
    assert arr.shape == (2, 3)
    np.testing.assert_allclose(arr[1], [4, 5, 6])


def test_miplib_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, m, k = 10, 4, 6
    data = (rng.normal(size=n), rng.normal(size=(m, n)), rng.normal(size=m),
            rng.normal(size=(k, n)), rng.normal(size=k),
            np.full(n, 3.0), np.full(n, -3.0))
    path = str(tmp_path / "inst.npy")
    miplib.save_lp_npy(path, *data)
    back = miplib.load_lp_npy(path)
    for a, b in zip(data, back):
        np.testing.assert_array_equal(a, b)


def test_miplib_solve(tmp_path):
    """End-to-end: save a feasible instance in the reference .npy format
    (testSolver.py:292-301) and solve it."""
    rng = np.random.default_rng(1)
    n, m, k = 20, 10, 5
    A = rng.uniform(-1, 1, (m, n))
    C = rng.uniform(-1, 1, (k, n))
    xf = rng.uniform(-1, 1, n)
    c = rng.uniform(-1, 1, n)
    path = str(tmp_path / "inst.npy")
    miplib.save_lp_npy(path, c, A, A @ xf, C, C @ xf, np.full(n, 3.0),
                       np.full(n, -3.0))
    solver = miplib.solve_lp_npy(path, suppress_print=True,
                                 check_cvxpy=False, epsilon=1e-8)
    from scipy.optimize import linprog
    ref = linprog(c, A_ub=C, b_ub=C @ xf, A_eq=A, b_eq=A @ xf,
                  bounds=[(-3, 3)] * n, method="highs")
    assert abs(solver.value - ref.fun) / abs(ref.fun) < 1e-4


def test_generators_feasible_by_construction():
    rng = np.random.default_rng(2)
    lp = generators.generate_lp(50, rng=rng)
    # x_feas satisfies Ax=b, Cx<=d by construction; any solver sees a
    # feasible instance (reference recipe: testSolver.py:82-87)
    assert lp["A"].shape == (40, 50) and lp["C"].shape == (10, 50)
    qp = generators.generate_qp(30, rng=rng)
    w = np.linalg.eigvalsh(qp["P"])
    assert w.min() >= 0.99  # P = MᵀM + I
    socp = generators.generate_socp(20, rng=rng)
    x0 = socp["x0"]
    for Ai, bi, ci, di in zip(socp["A"], socp["b"], socp["c"], socp["d"]):
        assert np.linalg.norm(Ai @ x0 + bi) <= ci @ x0 + di + 1e-9
    lasso = generators.generate_lasso(20, num_problems=5, rng=rng)
    assert lasso["b"].shape[1] == 5 and (lasso["reg"] > 0).all()


def test_average_relative_error_masking():
    truth = np.array([[1.0, 1.0, 1.0], [2.0, 2.0, 2.0]])
    res = np.array([[1.01, np.inf, 0.0], [2.02, 2.02, 2.02]])
    err = plotting.calculate_average_relative_error(truth, res)
    np.testing.assert_allclose(err, (0.01 + 0.01) / 2)


def test_average_relative_error_lasso_shape():
    truth = np.ones((1, 2, 3))
    res = np.full((1, 2, 3), 1.1)
    err = plotting.calculate_average_relative_error(truth, res, lasso=True)
    np.testing.assert_allclose(err, 0.1, rtol=1e-9)


# ---------------------------------------------------------------------------
# Matrix-free mixed-precision solve (ops/kkt.py matrix_free_posdef_solve).
# ---------------------------------------------------------------------------


def test_matrix_free_posdef_solve_accuracy():
    import jax.numpy as jnp
    from interiorpoint_tpu.ops.kkt import matrix_free_posdef_solve

    rng = np.random.default_rng(4)
    n = 60
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    # kappa ~ 1e9 barrier-style spectrum
    eigs = np.logspace(0, 9, n)
    H = (Q * eigs) @ Q.T
    H = 0.5 * (H + H.T)
    b = rng.standard_normal(n)
    Hj = jnp.asarray(H)
    x, rel = matrix_free_posdef_solve(
        Hj.astype(jnp.float32), lambda v: Hj @ v, jnp.asarray(b))
    ref = np.linalg.solve(H, b)
    err = np.linalg.norm(np.asarray(x) - ref) / np.linalg.norm(ref)
    assert float(rel) < 1e-8
    assert err < 1e-6


def test_matrix_free_survives_indefinite_preconditioner():
    """An f32-assembly-perturbed (slightly indefinite) H_pre must still
    produce an accurate solve via the jitter ladder + refinement."""
    import jax.numpy as jnp
    from interiorpoint_tpu.ops.kkt import matrix_free_posdef_solve

    rng = np.random.default_rng(5)
    n = 40
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.logspace(0, 8, n)
    H = (Q * eigs) @ Q.T
    H = 0.5 * (H + H.T)
    # perturb the preconditioner at the f32-rounding magnitude (relative
    # to ||H||) -> possibly indefinite after scaling
    Hp = H + rng.standard_normal((n, n)) * 1e-7 * np.linalg.norm(H, 2)
    Hp = 0.5 * (Hp + Hp.T)
    b = rng.standard_normal(n)
    Hj = jnp.asarray(H)
    x, rel = matrix_free_posdef_solve(
        jnp.asarray(Hp).astype(jnp.float32), lambda v: Hj @ v,
        jnp.asarray(b))
    ref = np.linalg.solve(H, b)
    assert float(rel) < 1e-7
    assert np.linalg.norm(np.asarray(x) - ref) / np.linalg.norm(ref) < 1e-4


def test_lp_qp_hess_op_matches_dense():
    """oracle.hess_op's apply_h must equal hess(x,t)@v to f64 accuracy and
    H_pre must match to f32-Gram accuracy."""
    import jax.numpy as jnp
    from interiorpoint_tpu.models.problem import make_qp
    from interiorpoint_tpu.ops.barrier import make_qp_oracle

    rng = np.random.default_rng(6)
    n, m, k = 16, 7, 11
    Pp = rng.standard_normal((m, n))
    P = Pp.T @ Pp + np.eye(n)
    C = rng.standard_normal((k, n))
    xf = rng.standard_normal(n) * 0.1
    prob = make_qp(P, rng.standard_normal(n), None, None, C, C @ xf + 1.0,
                   np.full(n, -3.0), np.full(n, 3.0), dtype=jnp.float64)
    o = make_qp_oracle(prob)
    assert o.hess_op is not None
    x = jnp.asarray(xf)
    t = jnp.asarray(7.0, jnp.float64)
    H = np.asarray(o.hess(x, t))
    Hp, apply_h = o.hess_op(x, t)
    v = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(apply_h(jnp.asarray(v))), H @ v,
                               rtol=1e-11, atol=1e-9)
    assert (np.linalg.norm(np.asarray(Hp, dtype=np.float64) - H)
            <= 1e-6 * np.linalg.norm(H))
